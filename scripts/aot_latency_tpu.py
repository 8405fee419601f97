"""AOT-served batch-1 latency on the real chip (VERDICT r4 weak #8).

Round 4 attributed the p50 tile->geojson latency to tunnel dispatch
(26.3 ms/call) over device compute (3.98 ms), but no AOT-served batch-1
path had demonstrated the low-latency serving mode aq-plan recommends.
This drives it end to end: export the EXACT serving program (resize +
forward + decode + NMS) at batch 1 via models/aot.py, load the artifact,
and measure single-call p50 plus the pipelined (k in flight) device rate
through the AOT path.

Appends to BENCH_AOT.jsonl.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/aot_latency_tpu.py
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_AOT.jsonl")
VARIANT = "mt"
TILE = 1024
ITERS = 50
K_PIPE = 32


def main() -> None:
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.aot import export_serving, load_aot, save_aot, serving_fn_loaded
    from aquaculture_tpu.models.yolov5 import yolov5_init

    model, params = yolov5_init(VARIANT, num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    t0 = time.perf_counter()
    blob, meta = export_serving(model, params, cfg, batch_size=1, tile=TILE)
    export_s = time.perf_counter() - t0
    path = "/tmp/aq_aot_b1.aqaot"
    save_aot(path, blob, meta)

    t0 = time.perf_counter()
    exported, meta2 = load_aot(path)
    infer = serving_fn_loaded(exported, meta2, params, anchors=model.anchor_table)
    load_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (1, TILE, TILE, 3), dtype=np.uint8))

    # compile/warmup (first call compiles the loaded executable's wrapper)
    t0 = time.perf_counter()
    det, valid = infer(params, img)
    jax.block_until_ready(det)
    first_call_s = time.perf_counter() - t0
    for _ in range(3):
        det, valid = infer(params, img)
    jax.block_until_ready(det)

    # single-call p50: one dispatch, one sync per call
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        det, valid = infer(params, img)
        jax.block_until_ready(det)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times)) * 1e3
    p90 = float(np.percentile(times, 90)) * 1e3

    # pipelined: K dispatches in flight, one sync — amortizes the tunnel
    # dispatch out of the per-tile number (device-true batch-1 rate)
    t0 = time.perf_counter()
    out = None
    for _ in range(K_PIPE):
        out = infer(params, img)
    jax.block_until_ready(out[0])
    pipelined_ms = (time.perf_counter() - t0) / K_PIPE * 1e3

    row = {
        "mode": "aot_latency_b1",
        "variant": VARIANT,
        "tile": TILE,
        "export_s": round(export_s, 2),
        "load_s": round(load_s, 3),
        "first_call_s": round(first_call_s, 2),
        "single_call_p50_ms": round(p50, 2),
        "single_call_p90_ms": round(p90, 2),
        "pipelined_ms_per_tile": round(pipelined_ms, 2),
        "k_pipe": K_PIPE,
        "blob_mb": round(len(blob) / 1e6, 2),
        "round": 5,
    }
    print(json.dumps(row))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
