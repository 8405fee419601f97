"""P6 throughput datapoint: YOLOv5m6 at its native 1280px, infer + NMS,
steady-state windows (same harness shape as bench.py). Appends to
BENCH_P6.jsonl.

--batch sweeps the dispatch-amortization hypothesis from the round-3e
roofline: m6@b32 runs at only 56% of its tile-model bound while m@640
climbs 24->44% MFU purely from b32->b128 batch growth, so a larger P6
batch should recover the same scheduling slack if HBM allows it.

    python scripts/p6_bench_tpu.py [--batch 64]
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

IMG = 1280
WARMUP = 3
WINDOWS = 3
BPW = 4
RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_P6.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--int8", action="store_true",
                    help="localization-safe int8 split (variant-aware skip "
                         "list), mirroring bench.py --int8; closes the "
                         "'int8 on m6 unmeasured at b128' caveat")
    args = ap.parse_args()
    BATCH = args.batch
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    model, params = yolov5_init("m6", num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    def infer(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16))
        return batched_nms(
            preds, conf_thresh=cfg.conf_threshold, iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections, pre_topk=cfg.pre_nms_topk,
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32))
    if args.int8:
        from aquaculture_tpu.models.quantize import quantize_model, serving_int8_safe_skip

        params = quantize_model(
            model, params, images[:2], skip=serving_int8_safe_skip(model.variant)
        )
    images = jax.device_put(images)
    params = jax.device_put(params)
    t0 = time.perf_counter()
    compiled = jax.jit(infer).lower(params, images).compile()
    compile_s = time.perf_counter() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    for _ in range(WARMUP):
        det, valid = compiled(params, images)
    jax.block_until_ready(det)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(BPW):
            det, valid = compiled(params, images)
        jax.block_until_ready(det)
        rates.append(BATCH * BPW / (time.perf_counter() - t0))
    v = float(np.median(rates))
    out = {
        "metric": ("yolov5m6_1280px_int8_infer_nms_tiles_per_sec_per_chip"
                   if args.int8 else
                   "yolov5m6_1280px_infer_nms_tiles_per_sec_per_chip"),
        "value": round(v, 2),
        "batch": BATCH,
        "compile_s": round(compile_s, 1),
    }
    if flops:
        out["mfu_pct"] = round(100.0 * flops * (v / BATCH) / 197e12, 2)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
