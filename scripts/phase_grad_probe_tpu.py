"""On-chip A/B for the phase-decomposed strided-conv input gradient.

models/phase_grad.py rewrites dX of the k3s2/k6s2 downsamples — the
kernel class that owns 44% of the mt@640 training bound at 46% lane
efficiency (docs/SCALING.md round 4) — as ONE fused stride-1 conv with
s*s*C_in output lanes. This measures, per strided-conv shape in the
variant:

  native  XLA's conv transpose (lhs_dilation) via jax.linear_transpose
  phase   the fused phase conv (the exact same values — CI-pinned by
          tests/test_phase_grad.py)

and with --step, the full train step with TrainConfig.phase_grad_dx
off/on. Appends JSON lines to BENCH_TRAIN_BWD.jsonl. The result gates
the phase_grad_dx default exactly like down_s2d was gated (negative ->
stays opt-in, documented).

    python scripts/phase_grad_probe_tpu.py --variant mt --img 640 --batch 128
    python scripts/phase_grad_probe_tpu.py --step --batch 64
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
sys.path.insert(0, ROOT)


def _emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _time(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe_kernels(args):
    import jax
    import jax.numpy as jnp

    from roofline import PEAK_FLOPS, capture_convs_subprocess, train_gemm_rows

    from aquaculture_tpu.models import phase_grad

    # shape capture runs in a CHILD process: capture_convs pins the caller
    # to CPU, which would make this "on-chip" probe time CPU kernels
    records = capture_convs_subprocess(args.variant, args.img, args.batch)
    # the same per-layer dX tile bounds roofline.analyze_train prints,
    # native and phase-composed, from the single shared formula
    dx_native = {r["li"]: r for r in train_gemm_rows(records)
                 if r["which"] == "dX"}
    dx_phase = {r["li"]: r for r in train_gemm_rows(records, phase_dx=True)
                if r["which"] == "dX"}
    seen = set()
    for li, r in enumerate(records):
        if r["stride"][0] != 2 or li == 0:
            continue  # layer 0's dX is never computed (input is a leaf)
        key = (tuple(r["in_shape"]), tuple(r["w_shape"]))
        if key in seen:
            continue
        seen.add(key)
        b, hi, wi, cin = r["in_shape"]
        kh, kw, _, cout = r["w_shape"]
        _, ho, wo, _ = r["out_shape"]
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        if not phase_grad.phase_dx_supported(kh, 2, pad):
            continue

        key_ = jax.random.PRNGKey(0)
        dy = jax.random.normal(key_, (b, ho, wo, cout), jnp.bfloat16)
        w = jax.random.normal(key_, (kh, kw, cin, cout), jnp.bfloat16)
        x_shape = (b, hi, wi, cin)

        native = jax.jit(lambda dy_, w_: jax.linear_transpose(
            lambda xx: phase_grad._plain_conv(xx, w_, 2, pad),
            jnp.zeros(x_shape, jnp.bfloat16))(dy_)[0])
        phased = jax.jit(lambda dy_, w_: phase_grad._phase_dx(
            dy_, w_, 2, pad, x_shape))

        t_nat = _time(native, (dy, w), args.iters)
        t_ph = _time(phased, (dy, w), args.iters)

        useful = dx_native[li]["useful"]
        pad_nat = dx_native[li]["padded"]
        pad_ph = dx_phase[li]["padded"]
        _emit({
            "bench": "phase_grad_dx", "backend": jax.default_backend(),
            "variant": args.variant, "img": args.img, "batch": args.batch,
            "shape": f"{x_shape}->{(kh, kw, cin, cout)} s2",
            "t_native_ms": round(t_nat * 1e3, 4),
            "t_phase_ms": round(t_ph * 1e3, 4),
            "speedup": round(t_nat / t_ph, 3),
            "lane_eff_native": round(useful / pad_nat, 3),
            "lane_eff_phase": round(useful / pad_ph, 3),
            "mfu_native": round(useful / t_nat / PEAK_FLOPS * 100, 1),
            "mfu_phase": round(useful / t_ph / PEAK_FLOPS * 100, 1),
        })


def probe_step(args):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import (
        init_train_state, make_train_step)

    model, params = yolov5_init(args.variant, num_classes=2, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.random((args.batch, args.img, args.img, 3), np.float32)),
        "labels": jnp.asarray(
            rng.random((args.batch, 120, 5), np.float32) * 32.0),
        "label_mask": jnp.asarray(
            np.arange(120)[None, :] < 3).repeat(args.batch, 0),
    }
    base = TrainConfig(img_size=args.img, batch_size=args.batch, epochs=1)
    times = {}
    for on in (False, True):
        cfg = dataclasses.replace(base, phase_grad_dx=on)
        state = init_train_state(model, params)
        step = jax.jit(make_train_step(model, cfg, steps_per_epoch=10))
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        times[on] = (time.perf_counter() - t0) / args.iters
    _emit({
        "bench": "phase_grad_step", "backend": jax.default_backend(),
        "variant": args.variant, "img": args.img, "batch": args.batch,
        "t_step_native_ms": round(times[False] * 1e3, 2),
        "t_step_phase_ms": round(times[True] * 1e3, 2),
        "speedup": round(times[False] / times[True], 4),
        "img_per_s_native": round(args.batch / times[False], 1),
        "img_per_s_phase": round(args.batch / times[True], 1),
    })


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", default="mt")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--step", action="store_true",
                    help="time the FULL train step phase on/off (two big "
                         "compiles) instead of the isolated kernels")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.step:
        probe_step(args)
    else:
        probe_kernels(args)


if __name__ == "__main__":
    main()
