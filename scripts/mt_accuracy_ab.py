"""Demo-world training parity check for the lane-aligned mt variant.

mt's capacity case is on paper (useful FLOPs and params >= m — see
scripts/lane_search.py and BENCHMARKS.md); this study is the learnability
half: train m and mt from scratch on the same rendered world with the
SAME budget/seed/recipe and compare held-out mAP@.5. PASS = mt within
epsilon of m (it is not a distillation of m, so exact equality is not
expected; the claim being defended is "mt is not an accuracy demotion").

    python scripts/mt_accuracy_ab.py --out /tmp/aq_mt --epochs 300
"""

import argparse
import json
import os
import sys
import time


def train_arm(variant, img_dir, lab_dir, cfg, seed=0):
    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.dataset import DetectionDataset
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    ds = DetectionDataset(img_dir, lab_dir, cfg, augment=False, seed=seed)
    model, params = yolov5_init(variant, num_classes=2, seed=seed)
    state = init_train_state(model, params)
    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)
    t0 = time.perf_counter()
    metrics = {}
    for epoch in range(cfg.epochs):
        for batch in ds.epoch(epoch):
            state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
    dt = time.perf_counter() - t0
    return model, state.ema, float(metrics["total"]), dt


def arm_map(model, ema, world_dir, img):
    import glob

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.eval.accuracy import world_map

    paths = sorted(glob.glob(os.path.join(world_dir, "images", "*.jpeg")))
    return world_map(
        paths, os.path.join(world_dir, "labels"), model, model.fuse(ema),
        DetectConfig(img_size=img, conf_threshold=1e-3), num_classes=2,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-images", type=int, default=24)
    ap.add_argument("--val-images", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--arms", default="m,mt")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    from aquaculture_tpu.config import TrainConfig

    train_dir = os.path.join(args.out, "train")
    val_dir = os.path.join(args.out, "val")
    t_img, t_lab = render_world(train_dir, n_images=args.train_images, seed=0)
    render_world(val_dir, n_images=args.val_images, seed=777)

    cfg = TrainConfig(img_size=args.img, batch_size=4, epochs=args.epochs)
    for arm in args.arms.split(","):
        model, ema, loss, dt = train_arm(arm, t_img, t_lab, cfg)
        m_tr = arm_map(model, ema, train_dir, args.img)
        m_va = arm_map(model, ema, val_dir, args.img)
        rec = {
            "arm": arm,
            "epochs": args.epochs,
            "train_images": args.train_images,
            "final_loss": round(loss, 4),
            "train_map50": round(m_tr["map50"], 4),
            "val_map50": round(m_va["map50"], 4),
            "val_map50_95": round(m_va["map"], 4),
            "train_seconds": round(dt, 1),
        }
        print(json.dumps(rec), flush=True)
        with open(os.path.join(args.out, "results.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
