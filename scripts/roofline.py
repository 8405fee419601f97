"""Tile-aware roofline for the serving conv stack (no TPU needed).

Turns BENCHMARKS.md's "the remaining MFU gap is structural" claim into a
per-layer, hardware-derived bound. For every conv in the FUSED m@640
serving forward (captured by tracing `model.apply` under `jax.eval_shape`
with `lax.conv_general_dilated` instrumented), compute:

  useful FLOPs   2·M·K·N with M=B·Ho·Wo, K=kh·kw·Cin, N=Cout
  padded FLOPs   same with K,N padded to the 128-lane MXU tile and M to
                 the 8-row sublane (the implicit-GEMM model of XLA:TPU's
                 conv emitter; v5e MXU is a 128×128 systolic array)
  HBM bytes      bf16 input + weights + output once each (perfect-fusion
                 assumption — elementwise epilogues ride along free)
  bound time     max(padded FLOPs / 197 TF/s, bytes / 819 GB/s)

The sum of bound times is the speed-of-light step time for this program
shape on v5e — optimistic by construction (concat/upsample/SPPF traffic
and the NMS stage are excluded). Comparing it with the measured conv
time (BENCH_ABLATION.jsonl fwd_raw) yields "measured is X% of the
tile-aware roofline", and the per-layer table shows exactly which layers
own the padding waste (lane_eff = useful/padded).

Usage: python scripts/roofline.py [variant] [img] [batch]   (default m 640 128)
"""

from __future__ import annotations

import sys
from math import ceil

PEAK_FLOPS = 197e12   # v5e bf16
HBM_BPS = 819e9       # v5e HBM bandwidth
LANE = 128
SUBLANE = 8


def capture_convs(variant: str, img: int, batch: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aquaculture_tpu.models.yolov5 import yolov5_init

    jax.config.update("jax_platforms", "cpu")
    model, params = yolov5_init(variant, num_classes=5, seed=0)
    params = model.fuse(params)

    records = []
    real_conv = lax.conv_general_dilated

    def spy(lhs, rhs, window_strides, padding, *args, **kwargs):
        out = real_conv(lhs, rhs, window_strides, padding, *args, **kwargs)
        records.append(
            dict(
                in_shape=tuple(lhs.shape),
                w_shape=tuple(rhs.shape),
                out_shape=tuple(out.shape),
                stride=tuple(window_strides),
            )
        )
        return out

    lax.conv_general_dilated = spy
    try:
        x = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
        jax.eval_shape(lambda p, im: model.apply(p, im)[0], params, x)
    finally:
        lax.conv_general_dilated = real_conv
    return records


def analyze(records, batch):
    rows = []
    for r in records:
        b, hi, wi, cin = r["in_shape"]
        kh, kw, _, cout = r["w_shape"]
        _, ho, wo, _ = r["out_shape"]
        m = b * ho * wo
        k = kh * kw * cin
        n = cout
        useful = 2.0 * m * k * n
        padded = 2.0 * ceil(m / SUBLANE) * SUBLANE * ceil(k / LANE) * LANE * ceil(n / LANE) * LANE
        bytes_ = 2.0 * (b * hi * wi * cin + kh * kw * cin * cout + m * n)
        t_mxu = padded / PEAK_FLOPS
        t_hbm = bytes_ / HBM_BPS
        rows.append(
            dict(
                shape=f"{hi}x{wi}x{cin}->{ho}x{wo}x{cout} k{kh}s{r['stride'][0]}",
                useful=useful,
                padded=padded,
                bytes=bytes_,
                t_bound=max(t_mxu, t_hbm),
                bound="mxu" if t_mxu >= t_hbm else "hbm",
                lane_eff=useful / padded,
            )
        )
    tot_t = sum(r["t_bound"] for r in rows)
    tot_useful = sum(r["useful"] for r in rows)
    tot_padded = sum(r["padded"] for r in rows)
    print(f"convs: {len(rows)}   batch {batch}")
    print(f"useful FLOPs/img: {tot_useful / batch / 1e9:.2f} GF")
    print(f"padded FLOPs/img: {tot_padded / batch / 1e9:.2f} GF  (lane efficiency {tot_useful / tot_padded:.1%})")
    print(f"roofline step time: {tot_t * 1e3 / batch:.4f} ms/img "
          f"(= {tot_useful / tot_t / PEAK_FLOPS:.1%} useful-MFU ceiling)")
    mxu_t = sum(r["t_bound"] for r in rows if r["bound"] == "mxu")
    print(f"MXU-bound share of time: {mxu_t / tot_t:.1%}   HBM-bound share: {1 - mxu_t / tot_t:.1%}")
    print()
    print("| layer (per-img shapes) | t_bound ms | bound | lane_eff | % of step |")
    print("|---|---|---|---|---|")
    agg = {}
    for r in rows:
        a = agg.setdefault(r["shape"], dict(t=0.0, n=0, **r))
        a["t"] += r["t_bound"]
        a["n"] += 1
    for a in sorted(agg.values(), key=lambda a: -a["t"])[:15]:
        print(
            f"| {a['n']}x {a['shape']} | {a['t'] * 1e3 / batch:.4f} | {a['bound']} "
            f"| {a['lane_eff']:.2f} | {100 * a['t'] / tot_t:.1f}% |"
        )
    return tot_t / batch, tot_useful / batch


def train_gemm_rows(records, phase_dx: bool = False):
    """Per-(pass, layer) GEMM bound rows for the training step — the ONE
    copy of the fwd/dW/dX padded-FLOP and HBM-byte model. The on-chip
    probes (train_backward_probe_tpu.py, phase_grad_probe_tpu.py) import
    this instead of re-deriving it, so a constant or formula change here
    propagates to every 'pct_of_bound' they report.

      dX = dY ⊛ Wᵀ : M=B·Hi·Wi, K=k²·Cout (→128), N=Cin (→128)
      dW = Xᵀ · dY : contraction M (→128), rows k²·Cin (→8), cols Cout (→128)
    Strided convs are modeled at FLOP-equivalence (the dilated input-grad
    conv has identical useful FLOPs). First-layer dX is skipped (no input
    gradient needed). HBM: each GEMM reads its two operands and writes its
    result once (perfect fusion)."""
    rows = []
    for li, r in enumerate(records):
        b, hi, wi, cin = r["in_shape"]
        kh, kw, _, cout = r["w_shape"]
        _, ho, wo, _ = r["out_shape"]
        m = b * ho * wo
        k = kh * kw * cin
        n = cout
        shape = f"{hi}x{wi}x{cin}->{ho}x{wo}x{cout} k{kh}s{r['stride'][0]}"
        gemms = []
        # forward
        gemms.append(("fwd", 2.0 * m * k * n,
                      2.0 * ceil(m / SUBLANE) * SUBLANE * ceil(k / LANE) * LANE * ceil(n / LANE) * LANE,
                      2.0 * (b * hi * wi * cin + k * n + m * n)))
        # dW
        gemms.append(("dW", 2.0 * m * k * n,
                      2.0 * ceil(m / LANE) * LANE * ceil(k / SUBLANE) * SUBLANE * ceil(n / LANE) * LANE,
                      2.0 * (b * hi * wi * cin + m * n + k * n)))
        # dX (skip first conv)
        if li > 0:
            s = r["stride"][0]
            if phase_dx and s == 2:
                # models/phase_grad.py: ONE stride-1 conv over dY with
                # ceil(k/2)² taps and s²·Cin output lanes — M shrinks to
                # dY space (no dilation zeros), N fills the lane tile.
                kq = (ceil(kh / 2)) * (ceil(kw / 2)) * cout
                nq = s * s * cin
                gemms.append(("dX", 2.0 * m * k * n,
                              2.0 * ceil(m / SUBLANE) * SUBLANE * ceil(kq / LANE) * LANE * ceil(nq / LANE) * LANE,
                              2.0 * (m * n + kq * nq + b * hi * wi * cin)))
            else:
                mi = b * hi * wi
                k2 = kh * kw * cout
                gemms.append(("dX", 2.0 * m * k * n,
                              2.0 * ceil(mi / SUBLANE) * SUBLANE * ceil(k2 / LANE) * LANE * ceil(cin / LANE) * LANE,
                              2.0 * (m * n + k * n + b * hi * wi * cin)))
        for which, useful, padded, bytes_ in gemms:
            t = max(padded / PEAK_FLOPS, bytes_ / HBM_BPS)
            rows.append(dict(
                rec=r, li=li, shape=shape, which=which, t_bound=t,
                useful=useful, padded=padded, bytes=bytes_,
                bound="mxu" if padded / PEAK_FLOPS >= bytes_ / HBM_BPS else "hbm",
            ))
    return rows


def analyze_train(records, batch, phase_dx: bool = False):
    """Backward-pass ceiling over train_gemm_rows (see its docstring for
    the model). Prints a per-layer table split by pass (fwd / dW / dX) so
    the on-chip probe (scripts/train_backward_probe_tpu.py) can compare
    each isolated backward kernel against its own tile bound
    (VERDICT r3 next #3)."""
    rows = train_gemm_rows(records, phase_dx=phase_dx)
    t_tot = sum(r["t_bound"] for r in rows)
    useful_tot = sum(r["useful"] for r in rows)
    padded_tot = sum(r["padded"] for r in rows)
    tag = " [phase-dX]" if phase_dx else ""
    print(f"TRAIN{tag} (fwd+bwd convs only): useful {useful_tot / batch / 1e9:.2f} GF/img, "
          f"padded {padded_tot / batch / 1e9:.2f} GF/img (lane eff {useful_tot / padded_tot:.1%})")
    print(f"roofline step time {t_tot * 1e3 / batch:.4f} ms/img "
          f"-> useful-MFU ceiling {useful_tot / t_tot / PEAK_FLOPS:.1%}")
    for which in ("fwd", "dW", "dX"):
        sub = [r for r in rows if r["which"] == which]
        st = sum(r["t_bound"] for r in sub)
        su = sum(r["useful"] for r in sub)
        sp = sum(r["padded"] for r in sub)
        print(f"  {which}: {st * 1e3 / batch:.4f} ms/img ({100 * st / t_tot:.1f}% of bound, "
              f"lane eff {su / sp:.1%})")
    print()
    print("| pass | layer (per-img shapes) | t_bound ms | bound | lane_eff | % of step |")
    print("|---|---|---|---|---|---|")
    agg = {}
    for r in rows:
        key = (r["which"], r["shape"])
        a = agg.setdefault(key, dict(
            t=0.0, useful_s=0.0, padded_s=0.0, n=0,
            which=r["which"], shape=r["shape"], bound=r["bound"],
        ))
        a["t"] += r["t_bound"]
        a["useful_s"] += r["useful"]
        a["padded_s"] += r["padded"]
        a["n"] += 1
    for a in sorted(agg.values(), key=lambda a: -a["t"])[:20]:
        print(
            f"| {a['which']} | {a['n']}x {a['shape']} | {a['t'] * 1e3 / batch:.4f} "
            f"| {a['bound']} | {a['useful_s'] / a['padded_s']:.2f} "
            f"| {100 * a['t'] / t_tot:.1f}% |"
        )


def capture_convs_subprocess(variant: str, img: int, batch: int):
    """Capture the conv shapes in a CHILD process.

    capture_convs force-sets jax_platforms=cpu (shape capture must not pay
    tunnel compiles), which would silently pin a not-yet-initialized CALLER
    to the CPU backend too — the on-chip probes
    (train_backward_probe_tpu.py, phase_grad_probe_tpu.py) would then time
    CPU kernels while labeling them with the TPU backend. Run the capture
    out-of-process so the caller's backend choice is untouched.
    """
    import json
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [_sys.executable, os.path.abspath(__file__),
         variant, str(img), str(batch), "--dump-convs"],
        capture_output=True, text=True, check=True, env=env,
    )
    # JSON lists -> the tuples capture_convs produces in-process (callers
    # use the shapes as dict keys)
    return [
        {k: tuple(v) if isinstance(v, list) else v for k, v in r.items()}
        for r in json.loads(out.stdout)
    ]


def main():
    train = "--train" in sys.argv
    phase_dx = "--phase-dx" in sys.argv
    dump = "--dump-convs" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    variant = args[0] if args else "m"
    img = int(args[1]) if len(args) > 1 else 640
    batch = int(args[2]) if len(args) > 2 else 128
    recs = capture_convs(variant, img, batch)
    if dump:
        import json

        print(json.dumps(recs))
        return
    if train:
        analyze_train(recs, batch, phase_dx=phase_dx)
    else:
        analyze(recs, batch)


if __name__ == "__main__":
    main()
