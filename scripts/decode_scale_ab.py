"""mAP A/B for decode-at-scale serving (VERDICT r3 next #4 accuracy gate).

Renders the committed accuracy fixture's own world (seed 0 = its training
distribution) and scores the trained n160 fixture three ways at img 128
(the 1/8 N/8 fraction of the 1024px tiles — same DCT-scaled-decode code
path production uses at 640-from-1024 = 5/8):

  full           full decode -> device resize (the baseline every bound
                 in BENCH_ACCURACY.jsonl uses)
  scaled_native  libaquatile DCT-domain decode (the production path)
  scaled_python  Python-loader bilinear twin (stale-.so fallback)

The mAP deltas bound what the decode filter change (DCT box vs bilinear)
does to detection accuracy. Appends JSON lines to BENCH_FEED.jsonl.

Once a production-config (mt@640) checkpoint exists, re-run with
--ckpt/--variant/--img 640 --world-size 1024 for the exact 5/8 row.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
RESULTS = os.path.join(ROOT, "BENCH_FEED.jsonl")


def _emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=os.path.join(ROOT, "tests/data/demo_ckpt_n160"))
    ap.add_argument("--variant", default="n")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--world-size", type=int, default=1024)
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/aq_decode_ab")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the tunneled TPU (default forces CPU — "
                         "probing the axon backend hangs during an outage)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(ROOT, "examples"))
    from end_to_end_demo import render_world

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.data import native_loader
    from aquaculture_tpu.eval.accuracy import (
        detections_by_image,
        load_checkpoint_f32,
        load_world_ground_truths,
    )
    from aquaculture_tpu.eval.map import evaluate_map

    img_dir, lab_dir = render_world(
        args.out, n_images=args.images, size=args.world_size, seed=args.seed
    )
    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpeg")))
    if not paths:  # render_world may save .jpg/.png depending on version
        paths = sorted(
            p for ext in ("jpg", "png") for p in glob.glob(os.path.join(img_dir, f"*.{ext}"))
        )
    if not paths:
        sys.exit(f"no rendered images found under {img_dir} "
                 "(expected *.jpeg/*.jpg/*.png)")
    model, params = load_checkpoint_f32(args.ckpt, args.variant, args.num_classes)
    cfg = DetectConfig(img_size=args.img, conf_threshold=1e-3)
    gts = load_world_ground_truths(lab_dir, tile=args.world_size)

    def score(decode_scale, use_native):
        dets = detections_by_image(
            paths, model, params, cfg, batch_size=4,
            decode_scale=decode_scale, use_native=use_native,
        )
        d_list, g_list = [], []
        import numpy as np

        for stem, gb, gk in gts:
            db, dc, dk = dets.get(
                stem, (np.zeros((0, 4)), np.zeros(0), np.zeros(0, int))
            )
            d_list.append((db, dc, dk))
            g_list.append((gb, gk))
        return evaluate_map(d_list, g_list, num_classes=args.num_classes)

    rows = [("full", False, False), ("scaled_python", True, False)]
    if native_loader.supports_scaled() and paths[0].lower().endswith((".jpeg", ".jpg", ".tif", ".tiff")):
        rows.append(("scaled_native", True, True))
    base = None
    for name, ds, un in rows:
        m = score(ds, un)
        if name == "full":
            base = m
        _emit({
            "bench": "decode_scale_ab", "mode": name,
            "variant": args.variant, "img": args.img,
            "world_size": args.world_size, "seed": args.seed,
            "map50": round(float(m["map50"]), 4),
            "map": round(float(m["map"]), 4),
            "d_map50_vs_full": (
                round(float(m["map50"] - base["map50"]), 4) if base else 0.0
            ),
        })


if __name__ == "__main__":
    main()
