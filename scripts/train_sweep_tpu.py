"""Training-throughput characterization on the real TPU chip (VERDICT r1
weak #3 / next #5): batch sweep x remat on/off for the full YOLOv5m 640px
train step (loss + grouped SGD + EMA), reporting ms/step, img/s and MFU.

Resumable: one (batch, remat) config per invocation (the remote-compile
tunnel makes each program a multi-minute compile; the persistent
compilation cache makes re-runs cheap). Results append to
BENCH_TRAIN.jsonl; configs already present are skipped.

Run: python scripts/train_sweep_tpu.py [--one] [--variant m]
     [--config BATCH,REMAT,DTYPE]   e.g. --config 128,false,bfloat16
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_TRAIN.jsonl")
CONFIGS = [
    # (batch, remat, compute_dtype)
    (32, False, "float32"),
    (32, False, "bfloat16"),
    (64, False, "bfloat16"),
    (128, False, "bfloat16"),
    (128, True, "bfloat16"),
    (192, True, "bfloat16"),
    (256, True, "bfloat16"),
    # round-2b retries: non-remat large batches (the remat variants hit a
    # compile-helper HTTP 500 in this environment — env failure, not HBM)
    (192, False, "bfloat16"),
    (256, False, "bfloat16"),
]
IMG = 640
WARMUP = 2
STEPS = 8
PEAK_FLOPS = 197e12  # v5e bf16 peak


def done_keys(include_errors: bool = True):
    """Configs already recorded. --retry-errors treats past error records
    (e.g. the round-2 tunnel compile-helper HTTP 500s at batch 192/256) as
    not-done so they re-run."""
    keys = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if not include_errors and "error" in r:
                        continue
                    keys.add((r.get("variant", "m"), r["batch"], r["remat"], r.get("dtype", "float32")))
                except Exception:
                    pass
    return keys


def run_config(batch: int, remat: bool, dtype: str, variant: str = "m") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    model, params = yolov5_init(variant, num_classes=5, seed=0)
    cfg = TrainConfig(
        img_size=IMG, batch_size=batch, max_boxes_per_image=32, remat=remat,
        compute_dtype=dtype,
    )
    state = init_train_state(model, params)
    step = jax.jit(make_train_step(model, cfg, steps_per_epoch=100), donate_argnums=0)

    rng = np.random.default_rng(0)
    m = cfg.max_boxes_per_image
    batch_data = {
        "images": jnp.asarray(rng.random((batch, IMG, IMG, 3), dtype=np.float32)),
        "labels": jnp.asarray(
            np.stack(
                [
                    rng.integers(0, 5, (batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (batch, m)).astype(np.float32),
                ],
                axis=-1,
            )
        ),
        "label_mask": jnp.asarray(rng.random((batch, m)) > 0.3),
    }
    state = jax.device_put(state)

    t_compile = time.perf_counter()
    lowered = step.lower(state, batch_data)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t_compile
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

    img_s = batch / dt
    mfu = (flops / dt / PEAK_FLOPS) if flops else None
    return {
        "variant": variant,
        "batch": batch,
        "remat": remat,
        "dtype": dtype,
        "ms_per_step": round(dt * 1000, 2),
        "img_per_s": round(img_s, 1),
        "step_tflops": round(flops / 1e12, 2) if flops else None,
        "mfu_pct": round(100 * mfu, 2) if mfu else None,
        "compile_s": round(compile_s, 1),
        "loss": float(metrics["total"]),
    }


def main() -> None:
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variant = "m"
    if "--variant" in sys.argv:
        variant = sys.argv[sys.argv.index("--variant") + 1]
    configs = CONFIGS
    if "--config" in sys.argv:
        b, r, d = sys.argv[sys.argv.index("--config") + 1].split(",")
        configs = [(int(b), r.lower() in ("true", "1", "yes"), d)]
    done = done_keys(include_errors="--retry-errors" not in sys.argv)
    todo = [c for c in configs if (variant, *c) not in done]
    if not todo:
        print("all configs done")
        return
    one = "--one" in sys.argv
    for batch, remat, dtype in todo:
        print(f"running batch={batch} remat={remat} dtype={dtype} ...", flush=True)
        try:
            r = run_config(batch, remat, dtype, variant)
        except Exception as e:
            r = {"variant": variant, "batch": batch, "remat": remat, "dtype": dtype,
                 "error": f"{type(e).__name__}: {e}"[:300]}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        if one:
            break


if __name__ == "__main__":
    main()
