"""Train a PRODUCTION-CONFIG checkpoint for the serving-accuracy harness
(VERDICT r3 next #2: every committed accuracy bound was measured on n@160
while the shipping recommendation is m/mt@640 — re-bound on the variant
the plan recommends, at full resolution).

Same recipe as scripts/train_demo_ckpt.py (the committed n160 fixture) but
variant/img/batch parameterized and hardened for a multi-hour CPU run:
periodic EMA checkpoints, --resume, and a --max-hours budget that saves
and exits cleanly.

    python scripts/train_prod_ckpt.py --out /tmp/aq_prod --variant mt \
        --img 640 --batch 4 --images 12 --epochs 800 --max-hours 7
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--variant", default="mt")
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--size", type=int, default=1024,
                    help="rendered world tile size (1280 for P6-native "
                         "training: tiles serve 1:1 at m6's img)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--augment", action="store_true",
                    help="full augmented recipe (mosaic/HSV/flip); default "
                         "is the fixture-style no-aug overfit regime")
    ap.add_argument("--clutter", type=float, default=0.0)
    ap.add_argument("--rotate", action="store_true")
    ap.add_argument("--contrast-jitter", type=float, default=0.0)
    ap.add_argument("--save-every", type=int, default=25,
                    help="checkpoint the EMA every N epochs")
    ap.add_argument("--max-hours", type=float, default=0.0,
                    help=">0: save + exit once the budget is spent")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/ckpt (EMA-only warm start: "
                         "params <- saved EMA, optimizer fresh)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the tunneled TPU (default forces CPU — "
                         "during a tunnel outage even probing the axon "
                         "backend hangs, see CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.dataset import DetectionDataset
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step
    from aquaculture_tpu.utils.checkpoint import load_params, save_params
    from aquaculture_tpu.utils.logging import log_info

    img_dir, lab_dir = render_world(
        args.out, n_images=args.images, seed=args.seed, size=args.size,
        clutter=args.clutter, rotate=args.rotate,
        contrast_jitter=args.contrast_jitter,
    )
    cfg = TrainConfig(
        img_size=args.img, batch_size=args.batch, epochs=args.epochs,
        mosaic=0.5,
    )
    ds = DetectionDataset(img_dir, lab_dir, cfg, augment=args.augment, seed=0)
    model, params = yolov5_init(args.variant, num_classes=2, seed=0)

    ckpt = os.path.join(args.out, "ckpt")
    meta = {"variant": args.variant, "num_classes": 2, "img_size": args.img,
            "world_images": args.images, "world_seed": args.seed,
            "world_size": args.size,
            "augment": bool(args.augment), "clutter": args.clutter,
            "rotate": bool(args.rotate),
            "contrast_jitter": args.contrast_jitter}
    start_epoch = 0
    if args.resume and os.path.exists(os.path.join(ckpt, "params.npz")):
        loaded = load_params(ckpt)
        params = jax.tree_util.tree_map(jnp.asarray, loaded)
        meta_prev = {}
        try:
            import json

            with open(os.path.join(ckpt, "metadata.json")) as f:
                meta_prev = json.load(f)
        except OSError:
            pass
        start_epoch = int(meta_prev.get("epoch", 0))
        log_info("resumed EMA warm start at epoch %d", start_epoch)

    state = init_train_state(model, params)
    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)

    t0 = time.time()
    last = {}
    for epoch in range(start_epoch, cfg.epochs):
        for batch in ds.epoch(epoch):
            state, last = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        done = epoch + 1
        if done % 5 == 0 or done == start_epoch + 1:
            dt = time.time() - t0
            log_info("epoch %d/%d: loss %.3f  (%.1f s/epoch, %.2f h elapsed)",
                     done, cfg.epochs, float(last["total"]),
                     dt / max(done - start_epoch, 1), dt / 3600)
        out_of_time = args.max_hours > 0 and (time.time() - t0) > args.max_hours * 3600
        if done % args.save_every == 0 or done == cfg.epochs or out_of_time:
            save_params(ckpt, state.ema, metadata={**meta, "epoch": done})
            log_info("checkpoint @ epoch %d -> %s", done, ckpt)
        if out_of_time:
            log_info("max-hours budget spent; exiting at epoch %d", done)
            break
    log_info("done: %s", ckpt)


if __name__ == "__main__":
    main()
