"""P6 serving-efficiency study on the real chip (VERDICT r2 next #5).

Round 2 measured yolov5m6@1280 at 27.7% MFU vs 44.1% for m@640 as a single
datapoint. This ablates where the 1280px step goes (conv stack vs decode vs
NMS over the 4x candidate pool) and adds the batch-matched m@640 comparator
so the equal-ground-coverage recommendation (one 1280px tile == four 640px
tiles) can be computed from measured rates.

Configs (one per invocation, resumable, append to BENCH_P6.jsonl):
  m6_full        — forward + decode + NMS (matches the round-2 datapoint)
  m6_fwd_decode  — forward + decode, no NMS
  m6_fwd_raw     — conv pyramid only (features)
  m6_full_topk512— full with pre_nms_topk halved (NMS pool sensitivity)
  m_full_b32     — m@640 at the SAME batch 32 (batch-fair comparator)

    python scripts/p6_ablation_tpu.py [--one]
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_P6.jsonl")
CONFIGS = [
    "m6_full", "m6_fwd_decode", "m6_fwd_raw", "m6_full_topk512", "m_full_b32",
    # round-3b: same full configs with the exact two-stage blocked top-k
    # active in the candidate prep (ops/nms.py _two_stage_topk)
    "m6_full_2stage",
    # round-3c: P6 + the localization-safe int8 split (two-stage top-k on)
    "m6_full_int8safe",
]
WARMUP = 3
WINDOWS = 3
BPW = 4
PEAK_FLOPS = 197e12


def done():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "config" in r and "error" not in r:
                        out.add(r["config"])
                except Exception:
                    pass
    return out


def run(config: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    variant = "m6" if config.startswith("m6") else "m"
    img = 1280 if variant == "m6" else 640
    batch = 32
    topk = 512 if config.endswith("topk512") else 1024
    # the pre-round-3b records were measured with the global top_k; force
    # single-stage for them so the _2stage suffix is the only A/B axis
    import importlib

    N = importlib.import_module("aquaculture_tpu.ops.nms")
    two_stage = config.endswith("_2stage") or config.endswith("_int8safe")
    N._TWO_STAGE_RATIO = 8 if two_stage else 10**9

    model, params = yolov5_init(variant, num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig(img_size=img)
    if config.endswith("_int8safe"):
        import numpy as _np

        from aquaculture_tpu.models.quantize import (
            quantize_model,
            serving_int8_safe_skip,
        )

        calib = jnp.asarray(
            _np.random.default_rng(0).random((2, img, img, 3), dtype=_np.float32)
        )
        params = quantize_model(model, params, calib, skip=serving_int8_safe_skip(variant))

    def fn(params, images):
        x = images.astype(jnp.bfloat16)
        if config == "m6_fwd_raw":
            feats, _ = model.features(params, x)
            return [f.sum() for f in feats]
        preds, _ = model.apply(params, x)
        if config == "m6_fwd_decode":
            return preds.sum()
        return batched_nms(
            preds, conf_thresh=cfg.conf_threshold, iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections, pre_topk=topk,
        )

    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.random((batch, img, img, 3), dtype=np.float32)))
    params = jax.device_put(params)
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(params, images).compile()
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    out = compiled(params, images)
    for _ in range(WARMUP):
        out = compiled(params, images)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(BPW):
            out = compiled(params, images)
        jax.block_until_ready(out)
        rates.append(batch * BPW / (time.perf_counter() - t0))
    v = float(np.median(rates))
    rec = {
        "config": config,
        "variant": variant,
        "img": img,
        "batch": batch,
        "tiles_per_s": round(v, 1),
        "ms_per_img": round(1000.0 / v, 3),
        "compile_s": round(compile_s, 1),
    }
    if flops:
        rec["mfu_pct"] = round(100.0 * flops * (v / batch) / PEAK_FLOPS, 2)
    # equal ground coverage: one 1280px tile covers 4x a 640px tile
    rec["eq640_tiles_per_s"] = round(v * (4 if img == 1280 else 1), 1)
    return rec


def main():
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    seen = done()
    todo = [c for c in CONFIGS if c not in seen]
    if not todo:
        print("all configs done")
        return
    for c in todo:
        print(f"running {c} ...", flush=True)
        try:
            r = run(c)
        except Exception as e:
            r = {"config": c, "error": f"{type(e).__name__}: {e}"[:300]}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        if "--one" in sys.argv:
            break


if __name__ == "__main__":
    main()
