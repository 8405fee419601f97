"""Per-stage backward-kernel probe on the real chip (VERDICT r3 next #3).

Training runs at ~30% MFU against a 48% roofline ceiling; the scoped-VMEM
probe recovered nothing. This measures the top-K conv layers' isolated
forward, dW and dX kernels against their own tile-aware bounds
(scripts/roofline.py analyze_train math) to attribute the residual:
if each isolated kernel hits ~its bound but the full step doesn't, the
gap is XLA scheduling/overlap, not kernel inefficiency — and SCALING.md
can close the question with data.

One invocation = up to --top x 3 small jit programs (each compiles in
seconds through the tunnel; the shapes are tiny compared to the full
step). Appends JSON lines to BENCH_TRAIN_BWD.jsonl.

    python scripts/train_backward_probe_tpu.py --variant mt --img 640 \
        --batch 128 --top 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")
RESULTS = os.path.join(ROOT, "BENCH_TRAIN_BWD.jsonl")
sys.path.insert(0, os.path.dirname(__file__))

from roofline import (  # noqa: E402
    PEAK_FLOPS, capture_convs_subprocess, train_gemm_rows)


def _emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def time_kernel(rec, which, iters=30):
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, hi, wi, cin = rec["in_shape"]
    kh, kw, _, cout = rec["w_shape"]
    stride = rec["stride"]
    dn = lax.conv_dimension_numbers(
        rec["in_shape"], rec["w_shape"], ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return lax.conv_general_dilated(x, w, stride, "SAME", dimension_numbers=dn)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, rec["in_shape"], jnp.bfloat16)
    w = jax.random.normal(key, rec["w_shape"], jnp.bfloat16)

    if which == "fwd":
        fn = jax.jit(conv)
        args = (x, w)
    elif which == "dW":
        fn = jax.jit(lambda x_, w_: jax.grad(
            lambda ww: (conv(x_, ww.astype(jnp.bfloat16)).astype(jnp.float32)).sum()
        )(w_))
        args = (x, w)
    else:  # dX
        fn = jax.jit(lambda x_, w_: jax.grad(
            lambda xx: (conv(xx.astype(jnp.bfloat16), w_).astype(jnp.float32)).sum()
        )(x_))
        args = (x, w)

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", default="mt")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # shape capture in a CHILD process: capture_convs pins the caller to
    # CPU, which would silently demote this probe's own backend
    records = capture_convs_subprocess(args.variant, args.img, args.batch)
    backend = jax.default_backend()
    rows = train_gemm_rows(records)
    # dedup identical (shape, which) pairs; keep the most expensive ones
    seen = set()
    picked = []
    for r in sorted(rows, key=lambda r: -r["t_bound"]):
        key = (r["which"], r["rec"]["in_shape"], r["rec"]["w_shape"], r["rec"]["stride"])
        if key in seen:
            continue
        seen.add(key)
        picked.append(r)
        if len(picked) >= args.top * 3:
            break

    for r in picked:
        t = time_kernel(r["rec"], r["which"], iters=args.iters)
        rec = r["rec"]
        _emit({
            "bench": "train_bwd_probe", "backend": backend,
            "variant": args.variant, "img": args.img, "batch": args.batch,
            "which": r["which"],
            "shape": f"{rec['in_shape']}->{rec['w_shape']} s{rec['stride'][0]}",
            "t_measured_ms": round(t * 1e3, 4),
            "t_bound_ms": round(r["t_bound"] * 1e3, 4),
            "pct_of_bound": round(100 * r["t_bound"] / t, 1),
            "bound": r["bound"],
            "mfu": round(r["useful"] / t / PEAK_FLOPS * 100, 1),
        })


if __name__ == "__main__":
    main()
