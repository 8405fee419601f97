"""Mixed-precision serving A/B on the real chip: bf16 vs full int8 vs
int8-with-float-early-layers (skip b0..b4).

Rationale: the int8 end-to-end gain is only ~3% while the isolated deep-
layer chain runs 2.76x faster in int8 (BENCH_INT8_MICRO) — the early
large-spatial/small-channel layers tile poorly in int8. Keeping them bf16
and quantizing from the stride-16 backbone onwards should dominate both
pure paths if the hypothesis is right.

Appends one JSON line per variant to BENCH_INT8_MIXED.jsonl; resumable
(--one runs the first missing variant).
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_INT8_MIXED.jsonl")
VARIANTS = [
    "bf16", "int8_full", "int8_mixed_b5plus", "int8_mixed_b7plus",
    # round 3: the localization-safe split — mixed PLUS the neck C3s that
    # feed the detect head (n17/n20/n23) kept float; recovers the int8
    # mAP@.5:.95 cost entirely (BENCH_ACCURACY int8_safe row)
    "int8_safe",
    "bf16_r3",  # same-session bf16 pair for the int8_safe measurement
]
BATCH = 128
IMG = 640
WARMUP = 3
WINDOWS = 3
BPW = 8
# "CANONICAL_*" sentinels resolve to models.quantize constants inside run()
# (deferred like every aquaculture import here) — a local copy of the skip
# list would let this benchmark silently measure a stale split while
# labeling the row with the shipped default's name.
SKIPS = {
    "bf16": None,
    "int8_full": (),
    "int8_mixed_b5plus": "CANONICAL_MIXED",
    "int8_mixed_b7plus": ("b0", "b1", "b2", "b3", "b4", "b5", "b6"),
    "int8_safe": "CANONICAL_SAFE",
    "bf16_r3": None,
}


def done():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    out.add(json.loads(line)["variant"])
                except Exception:
                    pass
    return out


def run(variant: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    model, params = yolov5_init("m", num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32))

    skip = SKIPS[variant]
    if skip is not None:
        from aquaculture_tpu.models.quantize import (
            SERVING_INT8_SAFE_SKIP,
            SERVING_INT8_SKIP,
            quantize_model,
        )

        if skip == "CANONICAL_MIXED":
            skip = SERVING_INT8_SKIP
        elif skip == "CANONICAL_SAFE":
            skip = SERVING_INT8_SAFE_SKIP
        params = quantize_model(model, params, images[:2], skip=skip)

    def infer(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16))
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
        )

    images = jax.device_put(images)
    params = jax.device_put(params)
    jitted = jax.jit(infer)
    t0 = time.perf_counter()
    compiled = jitted.lower(params, images).compile()
    compile_s = time.perf_counter() - t0
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
    return {
        "variant": variant,
        "tiles_per_s": round(float(np.median(rates)), 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    seen = done()
    for v in [v for v in VARIANTS if v not in seen]:
        print(f"running {v} ...", flush=True)
        try:
            r = run(v)
        except Exception as e:
            r = {"variant": v, "error": f"{type(e).__name__}: {e}"[:300]}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        if "--one" in sys.argv:
            break


if __name__ == "__main__":
    main()
