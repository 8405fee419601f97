"""Measure a lane-aligned channel-map candidate on the real chip.

One jit program per invocation (tunnel compiles are 1-10 min). Runs the
FULL serving program (fused conv stack + decode + batched NMS) in the
same 8-batch-window steady-state harness as bench.py and appends one
JSON line to BENCH_MT.jsonl.

    python scripts/mt_bench_tpu.py m                      # baseline
    python scripts/mt_bench_tpu.py 32,64,256,256,1024     # candidate A
    python scripts/mt_bench_tpu.py 48,96,256,256,1024     # candidate B
    python scripts/mt_bench_tpu.py 32,64,256,256,768,768 --img 1280 --batch 32
                                                          # P6 candidates:
                                                          # a 6-channel spec
                                                          # runs as P6
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 128
IMG = 640
WARMUP = 3
WINDOWS = 3
BATCHES_PER_WINDOW = 8
PEAK_FLOPS = 197e12

sys.path.insert(0, "/root/repo")


def main():
    global BATCH, IMG
    spec = sys.argv[1] if len(sys.argv) > 1 else "m"
    if "--img" in sys.argv:
        IMG = int(sys.argv[sys.argv.index("--img") + 1])
    if "--batch" in sys.argv:
        BATCH = int(sys.argv[sys.argv.index("--batch") + 1])

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import aquaculture_tpu.models.yolov5 as Y
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.ops.nms import batched_nms

    if "," in spec:
        ch = tuple(int(x) for x in spec.split(","))
        # a 6-channel spec is a P6 candidate (variant name must end in
        # "6": is_p6 dispatches on the suffix)
        variant = "__cand_p6" if len(ch) == 6 else "__cand__"
        Y.VARIANTS[variant] = Y.VARIANTS["m6" if len(ch) == 6 else "m"]
        Y.CHANNEL_OVERRIDES[variant] = {
            f"c{i + 1}": c for i, c in enumerate(ch)}
    else:
        variant = spec

    model, params = Y.yolov5_init(variant, num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    def infer(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16))
        return batched_nms(preds, conf_thresh=cfg.conf_threshold,
                           iou_thresh=cfg.iou_threshold,
                           max_det=cfg.max_detections,
                           pre_topk=cfg.pre_nms_topk)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32)))
    params = jax.device_put(params)

    t0 = time.time()
    compiled = jax.jit(infer).lower(params, images).compile()
    t_compile = time.time() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    for _ in range(WARMUP):
        det, valid = compiled(params, images)
    jax.block_until_ready(det)

    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(BATCHES_PER_WINDOW):
            det, valid = compiled(params, images)
        jax.block_until_ready(det)
        rates.append(BATCH * BATCHES_PER_WINDOW / (time.perf_counter() - t0))

    value = float(np.median(rates))
    out = {
        "spec": spec,
        "tiles_per_s": round(value, 1),
        "ms_per_img": round(1000.0 / value, 4),
        "batch": BATCH,
        "img": IMG,
        "compile_s": round(t_compile, 1),
    }
    if flops:
        out["mfu_pct"] = round(100.0 * flops * (value / BATCH) / PEAK_FLOPS, 2)
    line = json.dumps(out)
    print(line)
    with open("/root/repo/BENCH_MT.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
