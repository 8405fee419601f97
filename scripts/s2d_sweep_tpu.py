"""Downsample space-to-depth A/B on the real chip.

fuse(down_s2d=...) exactly rewrites k3/s2/p1 downsample convs into
space-to-depth + k2/s1 over 4x the input channels (same FLOPs; see
layers.down_weights_to_s2d). Hypothesis: YOLOv5m's early downsamples
(b1: 48 in-channels at 320px) sit far below the 128-lane MXU tile and the
large-spatial layers dominate the serving step (BENCHMARKS.md ablation),
so deepening their contraction should raise MFU — unless XLA's own conv
lowering already pads/reblocks them as well on its own.

Full serving program (m@640, batch 128, bf16, decode+NMS), same 8-batch
steady-state windows as bench.py. Appends one JSON line per variant to
BENCH_S2D.jsonl; resumable (--one runs the first missing variant).
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_S2D.jsonl")
VARIANTS = [
    "base",          # stem s2d only (the shipping default)
    "b1",            # + the worst-tiled downsample (48 -> 96 at 320px on m)
    "b1_b3",         # + 96 -> 192 at 160px
    "all_down",      # every backbone + neck downsample (b1..b7, n18, n21)
]
DOWNS = {
    "base": (),
    "b1": ("b1",),
    "b1_b3": ("b1", "b3"),
    "all_down": ("b1", "b3", "b5", "b7", "n18", "n21"),
}
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
    params = model.fuse(params, down_s2d=DOWNS[variant])
    cfg = DetectConfig()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32))

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
        # one jit program per run by default (CLAUDE.md tunnel time-box);
        # the JSONL resume makes repeat invocations continue the sweep
        if "--all" not in sys.argv:
            break


if __name__ == "__main__":
    main()
