"""Inference ablation on the real chip: where does the batch-128 YOLOv5m
640px serving step spend its time? (Decides VERDICT r1 next #6: whether an
int8 activation pipeline can pay, or the --int8 claim gets demoted.)

Configs ablate one stage at a time:
  full        — forward + decode + NMS (the bench.py headline)
  fwd_decode  — forward + decode, no NMS
  fwd_raw     — backbone+neck+head only (features), no decode
  fwd_relu    — features with SiLU swapped for ReLU (VPU sigmoid cost)
  conv_id     — features with identity activation (pure conv pyramid)

Resumable like train_sweep: one config per --one invocation, appends to
BENCH_ABLATION.jsonl.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_ABLATION.jsonl")
CONFIGS = [
    "full", "fwd_decode", "fwd_raw", "fwd_relu", "conv_id",
    # round-2b: NMS-internal attribution (prep = conf/top_k/gather;
    # supp = Pallas greedy scan; full adds the max_det compaction top_k)
    "fwd_prep", "fwd_prep_supp", "full_v2",
    # round-2c: TPU-native approximate candidate top_k (lax.approx_max_k)
    "full_approx",
]
BATCH = 128
IMG = 640
WARMUP = 3
WINDOWS = 3
BPW = 8


def done():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    out.add(json.loads(line)["config"])
                except Exception:
                    pass
    return out


def run(config: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import layers as L
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    model, params = yolov5_init("m", num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    orig_silu = L.silu
    if config == "fwd_relu":
        L.silu = lambda x: jax.nn.relu(x)
    elif config == "conv_id":
        L.silu = lambda x: x

    def fn(params, images):
        x = images.astype(jnp.bfloat16)
        if config in ("fwd_raw", "fwd_relu", "conv_id"):
            feats, _ = model.features(params, x)
            return [f.sum() for f in feats]
        preds, _ = model.apply(params, x)
        if config == "fwd_decode":
            return preds.sum()
        if config in ("fwd_prep", "fwd_prep_supp"):
            # NB: both `from aquaculture_tpu.ops import nms` AND
            # `import aquaculture_tpu.ops.nms as N` resolve the function
            # re-exported by ops/__init__ (PEP 328 getattr binding); only
            # importlib reliably returns the MODULE.
            import importlib

            N = importlib.import_module("aquaculture_tpu.ops.nms")

            prep = jax.vmap(
                lambda p: N._prepare_candidates(
                    p, cfg.conf_threshold, cfg.pre_nms_topk, False
                )
            )
            boxes, nms_boxes, top_scores, cls_top, valid = prep(preds)
            if config == "fwd_prep":
                return boxes.sum() + top_scores.sum() + valid.sum()
            from aquaculture_tpu.ops.nms_pallas import greedy_suppress_pallas

            keep = greedy_suppress_pallas(nms_boxes, valid, cfg.iou_threshold)
            return boxes.sum() + keep.sum()
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
            approx_topk=(config == "full_approx"),
        )

    try:
        rng = np.random.default_rng(0)
        images = jax.device_put(jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32)))
        params = jax.device_put(params)
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        compiled = jitted.lower(params, images).compile()
        compile_s = time.perf_counter() - t0

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
            rates.append(BATCH * BPW / (time.perf_counter() - t0))
        v = float(np.median(rates))
    finally:
        L.silu = orig_silu
    return {
        "config": config,
        "tiles_per_s": round(v, 1),
        "ms_per_img": round(1000.0 / v, 4),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
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
