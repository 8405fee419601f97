"""Microbenchmark: does an int8-activation conv pipeline beat bf16 on v5e?

Times a chain of Conv+SiLU blocks at YOLOv5m P3-scale (80x80x192, k3) in
three flavors:
  bf16   — bf16 activations in HBM (the current serving path)
  int8   — int8 activations in HBM: conv s8xs8->s32, dequant+SiLU+requant
           fused in the epilogue, next layer consumes int8
  int8_f32act — int8 conv but f32 activations between layers (round-1's
           PTQ layout, for reference)

Appends to BENCH_INT8_MICRO.jsonl. One config per --one invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_INT8_MICRO.jsonl")
CONFIGS = ["bf16", "int8", "int8_f32act"]
B, H, W, C = 128, 80, 80, 192
DEPTH = 12
WARMUP = 3
WINDOWS = 3
REPS = 8


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

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((DEPTH, 3, 3, C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((DEPTH, C)).astype(np.float32) * 0.1)
    x0 = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))

    def conv(x, wi, dtype):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), wi.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if dtype == jnp.int8 else dtype,
        )

    if config == "bf16":
        def fn(x):
            y = x.astype(jnp.bfloat16)
            for i in range(DEPTH):
                y = conv(y, w[i], jnp.bfloat16)
                y = y * jax.nn.sigmoid(y) + b[i].astype(y.dtype)
            return y.sum()
    elif config == "int8":
        wq = jnp.clip(jnp.round(w / 0.01), -127, 127).astype(jnp.int8)
        def fn(x):
            q = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
            s = jnp.float32(1 / 127.0)
            for i in range(DEPTH):
                acc = conv(q, wq[i], jnp.int8)
                yf = acc.astype(jnp.float32) * (s * 0.01) + b[i]
                act = yf * jax.nn.sigmoid(yf)
                s = jnp.float32(0.05)  # static output scale (calibrated IRL)
                q = jnp.clip(jnp.round(act / s), -127, 127).astype(jnp.int8)
            return q.astype(jnp.float32).sum()
    else:  # int8_f32act
        wq = jnp.clip(jnp.round(w / 0.01), -127, 127).astype(jnp.int8)
        def fn(x):
            y = x
            for i in range(DEPTH):
                q = jnp.clip(jnp.round(y / 0.05), -127, 127).astype(jnp.int8)
                acc = conv(q, wq[i], jnp.int8)
                y = acc.astype(jnp.float32) * (0.05 * 0.01) + b[i]
                y = y * jax.nn.sigmoid(y)
            return y.sum()

    jit = jax.jit(fn)
    t0 = time.perf_counter()
    compiled = jit.lower(x0).compile()
    compile_s = time.perf_counter() - t0
    out = compiled(x0)
    for _ in range(WARMUP):
        out = compiled(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = compiled(x0)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / REPS)
    dt = float(np.median(ts))
    flops = 2.0 * B * H * W * C * C * 9 * DEPTH
    return {
        "config": config,
        "ms": round(dt * 1000, 3),
        "tflops": round(flops / dt / 1e12, 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    seen = done()
    for c in [c for c in CONFIGS if c not in seen]:
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
