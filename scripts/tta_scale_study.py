"""TTA scale-shift study: where test-time augmentation actually pays.

The round-3 serving-accuracy A/B measured TTA neutral (-0.004 mAP@.5) on a
world whose serving scales match the trained distribution — the honest but
incomplete verdict, because multi-scale TTA exists for scale MISMATCH: its
down-scale passes (0.83, 0.67; ops/tta.py, the ultralytics detect.py
--augment transform) map objects LARGER than the trained range back into
it. Protocol:

* train ONE generalizing checkpoint with the proven augmented recipe
  (aug_study.py winner: mosaic 0.5, scale 0.3, 2,400 epochs on the
  16-image r(12,52) world) — or reuse it via --ckpt;
* render held-out val worlds (unseen seed) at 1.0x / 1.5x / 2.0x the
  trained cage-scale range;
* evaluate bf16 vs TTA on each world (same conf 1e-3 protocol as
  scripts/accuracy_ab.py).

PASS shape: TTA ~neutral at 1.0x (confirming the A/B row) and ahead of
single-scale on the up-scaled worlds.

    python scripts/tta_scale_study.py --out /tmp/aq_tta
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="reuse a trained aug-recipe checkpoint (skips training)")
    ap.add_argument("--train-images", type=int, default=16)
    ap.add_argument("--val-images", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=2400)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--scales", default="1.0,1.5,2.0",
                    help="val-world cage-scale multipliers vs the trained r(12,52)")
    ap.add_argument("--configs", default="bf16,tta",
                    help="comma list of serving configs per world: bf16, tta "
                    "(ultralytics down-scale passes), tta_up (adds up-scale "
                    "passes 1.33/1.67 — the small-object symmetric tool), "
                    "bf16_2x / bf16_half (serve at 2x / half img_size — the "
                    "single-pass alternatives for small / oversized objects)")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    from aquaculture_tpu.config import DetectConfig, TrainConfig
    from aquaculture_tpu.eval.accuracy import world_map
    from aquaculture_tpu.utils.checkpoint import load_params, save_params

    base_r = (12, 52)
    results_path = os.path.join(args.out, "results.jsonl")
    bench_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "BENCH_TTA.jsonl")
    os.makedirs(args.out, exist_ok=True)

    CONFIGS = {
        "bf16": {},
        "tta": {"augment": True},
        "tta_up": {"augment": True, "tta_scales": (1.0, 1.33, 1.67),
                   "tta_flips": (None, "lr", None)},
        "bf16_2x": {"img_size": 2 * args.img},
        # img_size must be a multiple of the stride pyramid (32): snap the
        # half-resolution serve to the nearest valid size
        "bf16_half": {"img_size": max(32, round(args.img / 64) * 32)},
    }
    # validate BEFORE the (possibly hour-long) training block
    for name in args.configs.split(","):
        if name not in CONFIGS:
            raise SystemExit(f"unknown config {name!r}; one of {sorted(CONFIGS)}")

    if args.ckpt:
        from aquaculture_tpu.eval.accuracy import load_checkpoint_f32
        from aquaculture_tpu.utils.checkpoint import load_metadata

        meta = load_metadata(args.ckpt) if os.path.isdir(args.ckpt) else {}
        variant = meta.get("variant", "n")
        nc = int(meta.get("num_classes", 2))
        if "img_size" in meta and int(meta["img_size"]) != args.img:
            raise SystemExit(
                f"--ckpt was trained at img_size={meta['img_size']} but the "
                f"study would serve at --img {args.img}; pass --img "
                f"{meta['img_size']} (a silent mismatch scores garbage mAP)")
        model, fused = load_checkpoint_f32(args.ckpt, variant, nc)
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from aug_study import train_arm  # scripts/ sibling: the proven recipe

        train_dir = os.path.join(args.out, "train")
        t_img, t_lab = render_world(
            train_dir, n_images=args.train_images, seed=0, r_range=base_r
        )
        cfg = TrainConfig(img_size=args.img, batch_size=4, epochs=args.epochs,
                          mosaic=0.5, scale=0.3)
        model, ema, loss, dt = train_arm(t_img, t_lab, True, cfg)
        ckpt = os.path.join(args.out, "ckpt")
        save_params(ckpt, ema, metadata={"variant": "n", "num_classes": 2,
                                         "img_size": args.img, "recipe": "aug"})
        print(json.dumps({"trained": ckpt, "final_loss": round(loss, 4),
                          "train_seconds": round(dt, 1)}), flush=True)
        fused = model.fuse(ema)

    import glob

    for mult in [float(s) for s in args.scales.split(",")]:
        r = (base_r[0] * mult, base_r[1] * mult)
        wdir = os.path.join(args.out, f"val_x{mult:g}")
        render_world(wdir, n_images=args.val_images, seed=777, r_range=r)
        paths = sorted(glob.glob(os.path.join(wdir, "images", "*.jpeg")))
        for name in args.configs.split(","):
            kw = dict(img_size=args.img, conf_threshold=1e-3)
            kw.update(CONFIGS[name])
            cfg = DetectConfig(**kw)
            m = world_map(paths, os.path.join(wdir, "labels"), model, fused,
                          cfg, num_classes=2)
            rec = {"world_scale": mult, "config": name, "img": kw["img_size"],
                   "map50": round(m["map50"], 4), "map50_95": round(m["map"], 4)}
            print(json.dumps(rec), flush=True)
            for path in (results_path, bench_path):
                with open(path, "a") as f:
                    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
