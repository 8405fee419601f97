"""Compiler-option probe on the full training step (m@640 b128 bf16).

The train roofline (scripts/roofline.py --train) puts the fwd+bwd conv
ceiling at 48.1% useful MFU while the measured step runs 27.1% — only
~56% of its bound (serving runs 88% of its). That gap is scheduling /
fusion, not tile padding, so the compiler knobs that were useless for
serving get one probe here on the training program. Same mechanism as
scripts/xla_flags_probe_tpu.py: options via `.compile(compiler_options=)`
(XLA_FLAGS is parsed — and TPU flags fatally rejected — by the local
axon client). One config per process: AQ_PROBE_NAME + AQ_PROBE_FLAGS
(comma-separated k=v). Appends to BENCH_TRAIN_FLAGS.jsonl.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_TRAIN_FLAGS.jsonl")
BATCH = 128
IMG = 640
WARMUP = 2
STEPS = 8
PEAK_FLOPS = 197e12


def main() -> None:
    name = os.environ.get("AQ_PROBE_NAME", "baseline")
    flags = os.environ.get("AQ_PROBE_FLAGS", "")
    options = {}
    for kv in filter(None, flags.split(",")):
        k, _, v = kv.partition("=")
        options[k.strip()] = v.strip()

    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    model, params = yolov5_init("m", num_classes=5, seed=0)
    cfg = TrainConfig(
        img_size=IMG, batch_size=BATCH, max_boxes_per_image=32,
        compute_dtype="bfloat16",
    )
    state = init_train_state(model, params)
    step = jax.jit(make_train_step(model, cfg, steps_per_epoch=100), donate_argnums=0)

    rng = np.random.default_rng(0)
    m = cfg.max_boxes_per_image
    batch_data = {
        "images": jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32)),
        "labels": jnp.asarray(
            np.stack(
                [
                    rng.integers(0, 5, (BATCH, m)).astype(np.float32),
                    rng.uniform(32, 600, (BATCH, m)).astype(np.float32),
                    rng.uniform(32, 600, (BATCH, m)).astype(np.float32),
                    rng.uniform(8, 64, (BATCH, m)).astype(np.float32),
                    rng.uniform(8, 64, (BATCH, m)).astype(np.float32),
                ],
                axis=-1,
            )
        ),
        "label_mask": jnp.asarray(rng.random((BATCH, m)) > 0.3),
    }
    state = jax.device_put(state)

    t0 = time.perf_counter()
    compiled = step.lower(state, batch_data).compile(compiler_options=options or None)
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    for _ in range(WARMUP):
        state, metrics = compiled(state, batch_data)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch_data)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / STEPS

    rec = {
        "config": name,
        "compiler_options": flags,
        "ms_per_step": round(dt * 1000, 2),
        "img_per_s": round(BATCH / dt, 1),
        "compile_s": round(compile_s, 1),
    }
    if flops:
        rec["mfu_pct"] = round(100 * flops / dt / PEAK_FLOPS, 2)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
