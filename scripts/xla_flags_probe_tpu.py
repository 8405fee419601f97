"""XLA:TPU flag probe on the production serving program.

Round-3e follow-up to the serving ablation: the conv stack is ~89% of the
batch-128 m@640 step and BENCHMARKS.md calls the remaining MFU gap
"structural" (early-layer lane padding). Before accepting that, probe the
two compiler knobs that can actually move a single-chip conv program:

  scoped-VMEM limit  — how much VMEM a fusion may claim for temporaries;
                       a higher limit admits deeper fusions / bigger tiles.
  (baseline)         — same harness, no flags: the same-session anchor.

TPU-only flags cannot ride XLA_FLAGS here: the LOCAL client (axon
plugin) parses the env var and fatally rejects flags its own CPU build
doesn't know, while the real compile happens in the remote tunnel
helper. They go through `jit(...).lower(...).compile(compiler_options=)`
instead, which travels inside the PJRT compile request. One config per
PROCESS invocation: AQ_PROBE_NAME names the config, AQ_PROBE_FLAGS is a
comma-separated k=v list (empty = baseline). Measures the FULL serving
program (forward + decode + NMS, the bench.py headline) in the standard
8-batch steady-state windows and appends one line to
BENCH_XLA_FLAGS.jsonl. Compiler options change the program, so each
probe pays one tunnel compile; re-runs hit the persistent cache.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_XLA_FLAGS.jsonl")
BATCH = 128
IMG = 640
WARMUP = 3
WINDOWS = 3
BPW = 8
PEAK_FLOPS = 197e12


def main() -> None:
    name = os.environ.get("AQ_PROBE_NAME", "baseline")
    flags = os.environ.get("AQ_PROBE_FLAGS", "")

    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    model, params = yolov5_init("m", num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    def fn(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16))
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
        )

    options = {}
    for kv in filter(None, flags.split(",")):
        k, _, v = kv.partition("=")
        options[k.strip()] = v.strip()

    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32)))
    params = jax.device_put(params)
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(params, images).compile(
        compiler_options=options or None
    )
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
        rates.append(BATCH * BPW / (time.perf_counter() - t0))
    v = float(np.median(rates))
    rec = {
        "config": name,
        "xla_flags": flags,
        "tiles_per_s": round(v, 1),
        "compile_s": round(compile_s, 1),
    }
    if flops:
        rec["mfu_pct"] = round(100.0 * flops * (v / BATCH) / PEAK_FLOPS, 1)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
