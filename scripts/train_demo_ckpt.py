"""Train the demo-world checkpoint used by the serving-accuracy harness.

Renders the synthetic cage world (examples/end_to_end_demo.render_world)
and trains the "n" detector at 160px exactly like the demo, saving the EMA
checkpoint. The committed test fixture (tests/data/demo_ckpt_n160) is this
checkpoint stored float16.

    python scripts/train_demo_ckpt.py --out /tmp/aq_acc [--epochs 200]
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fixture", default=None,
                    help="also save a float16 copy of the EMA params here")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.dataset import DetectionDataset
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step
    from aquaculture_tpu.utils.checkpoint import save_params
    from aquaculture_tpu.utils.logging import log_info

    img_dir, lab_dir = render_world(args.out, n_images=args.images, seed=args.seed)
    cfg = TrainConfig(img_size=args.img, batch_size=4, epochs=args.epochs, mosaic=0.5)
    ds = DetectionDataset(img_dir, lab_dir, cfg, augment=False, seed=0)
    model, params = yolov5_init("n", num_classes=2, seed=0)
    state = init_train_state(model, params)
    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)
    for epoch in range(cfg.epochs):
        last = {}
        for batch in ds.epoch(epoch):
            state, last = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if (epoch + 1) % 20 == 0:
            log_info("epoch %d/%d: loss %.3f", epoch + 1, cfg.epochs, float(last["total"]))

    ckpt = os.path.join(args.out, "ckpt")
    meta = {"variant": "n", "num_classes": 2, "img_size": args.img,
            "world_images": args.images, "world_seed": args.seed}
    save_params(ckpt, state.ema, metadata=meta)
    log_info("checkpoint -> %s", ckpt)
    if args.fixture:
        f16 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16), jax.device_get(state.ema)
        )
        save_params(args.fixture, f16, metadata=meta)
        log_info("float16 fixture -> %s", args.fixture)


if __name__ == "__main__":
    main()
