"""Measure what the AOT serving artifact actually buys at cold start.

The artifact (models/aot.py) removes the host-side TRACE + LOWER of the
serving program; backend (XLA) compilation is the persistent cache's job
either way. This script times the three host-side phases for the
production program (m@640, batch 128, 1024px tiles):

  live_lower   — make_infer_fn + jax.jit(...).lower()   (what a serving
                 host pays per process without an artifact)
  aot_export   — the above + export + serialize          (paid ONCE)
  aot_load     — deserialize(blob)                       (what a serving
                 host pays per process WITH an artifact)

Runs on any backend (the phases measured are backend-independent host
work; pass --variant n --batch 2 for a quick check). Appends one JSON
line per phase to BENCH_AOT.jsonl.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_AOT.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="m")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aquaculture_tpu.config import IM_WIDTH, DetectConfig
    from aquaculture_tpu.models import aot
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.pipeline import make_infer_fn

    model, params = yolov5_init(args.variant, num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig(img_size=args.img)

    rows = []

    # live path: trace + lower (per serving process, every cold start)
    t0 = time.perf_counter()
    infer = make_infer_fn(model, params, cfg, tile=IM_WIDTH, batch_size=1)
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def infer_flat(lv, images_u8):
        return infer(jax.tree_util.tree_unflatten(treedef, lv), images_u8)

    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in leaves]
    img_spec = jax.ShapeDtypeStruct(
        (args.batch, IM_WIDTH, IM_WIDTH, 3), jnp.uint8
    )
    lowered = jax.jit(infer_flat).lower(leaf_specs, img_spec)
    live_lower = time.perf_counter() - t0
    rows.append({"phase": "live_lower", "seconds": round(live_lower, 3)})

    # export path (paid once per release, not per host)
    t0 = time.perf_counter()
    blob, meta = aot.export_serving(model, params, cfg, batch_size=args.batch)
    export_s = time.perf_counter() - t0
    rows.append({
        "phase": "aot_export", "seconds": round(export_s, 3),
        "blob_bytes": len(blob),
    })

    # artifact path: deserialize (per serving process with an artifact)
    t0 = time.perf_counter()
    exported = jax.export.deserialize(bytearray(blob))
    load_s = time.perf_counter() - t0
    rows.append({"phase": "aot_load", "seconds": round(load_s, 3)})
    del exported

    stamp = {
        "variant": args.variant, "batch": args.batch, "img": args.img,
        "backend": jax.default_backend(), "jax": jax.__version__,
    }
    with open(RESULTS, "a") as f:
        for r in rows:
            r.update(stamp)
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r))
    print(
        f"cold-start host work: {live_lower:.2f}s live -> {load_s:.3f}s "
        f"artifact ({live_lower / max(load_s, 1e-9):.0f}x)"
    )


if __name__ == "__main__":
    main()
