"""Offline search for a TPU-lane-aligned channel map ("mt" variant).

The round-3e roofline (scripts/roofline.py, BENCHMARKS.md) showed the
m@640 conv stack already runs at 88% of its tile-aware bound, and that
the remaining serving-MFU gap (44.6% vs 57.3% ceiling) is the
architecture's own channel widths (48/96/192) padding against the
128-lane MXU tile. That gap is unreachable by kernel work — but it IS
reachable by choosing a different variant whose channels land on the
tile. This script searches candidate (c1..c5) maps with m's depths,
scoring each by the same implicit-GEMM roofline used for the published
bound, and reports the Pareto set:

  maximize useful FLOPs (capacity proxy)  /  minimize bound step time

subject to useful >= m's useful FLOPs (so the winner is at least
m-capacity) — i.e. "same or more model, strictly less bound time".

No TPU needed: captures conv shapes via jax.eval_shape on CPU exactly
like scripts/roofline.py. Usage:

  python scripts/lane_search.py            # coarse grid, prints table
  python scripts/lane_search.py --fine     # denser grid near winners
"""

from __future__ import annotations

import sys
import time
from itertools import product
from math import ceil

sys.path.insert(0, "/root/repo")

PEAK_FLOPS = 197e12
HBM_BPS = 819e9
LANE = 128
SUBLANE = 8

IMG = 640
BATCH = 128  # P6 bases switch to IMG=1280, BATCH=32 (the measured config)


def capture(variant: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aquaculture_tpu.models.yolov5 import yolov5_init

    model, params = yolov5_init(variant, num_classes=5, seed=0)
    params = model.fuse(params)

    records = []
    real_conv = lax.conv_general_dilated

    def spy(lhs, rhs, window_strides, padding, *args, **kwargs):
        out = real_conv(lhs, rhs, window_strides, padding, *args, **kwargs)
        records.append(
            dict(in_shape=tuple(lhs.shape), w_shape=tuple(rhs.shape),
                 out_shape=tuple(out.shape)))
        return out

    lax.conv_general_dilated = spy
    try:
        x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
        jax.eval_shape(lambda p, im: model.apply(p, im)[0], params, x)
    finally:
        lax.conv_general_dilated = real_conv
    return records


def score(records):
    t_tot = useful_tot = padded_tot = params_tot = 0.0
    for r in records:
        b, hi, wi, cin = r["in_shape"]
        kh, kw, _, cout = r["w_shape"]
        _, ho, wo, _ = r["out_shape"]
        m = b * ho * wo
        k = kh * kw * cin
        n = cout
        useful = 2.0 * m * k * n
        padded = (2.0 * ceil(m / SUBLANE) * SUBLANE * ceil(k / LANE) * LANE
                  * ceil(n / LANE) * LANE)
        bytes_ = 2.0 * (b * hi * wi * cin + k * n + m * n)
        t_tot += max(padded / PEAK_FLOPS, bytes_ / HBM_BPS)
        useful_tot += useful
        padded_tot += padded
        params_tot += kh * kw * cin * cout
    return dict(
        t_ms=t_tot * 1e3 / BATCH,
        useful_gf=useful_tot / BATCH / 1e9,
        lane_eff=useful_tot / padded_tot,
        ceiling=useful_tot / t_tot / PEAK_FLOPS,
        params_m=params_tot / 1e6,
    )


def main():
    import aquaculture_tpu.models.yolov5 as Y
    import jax

    jax.config.update("jax_platforms", "cpu")

    base_variant = "m"
    if "--base" in sys.argv:
        base_variant = sys.argv[sys.argv.index("--base") + 1]
    if base_variant.endswith("6"):
        # 1280px serving at the measured batch-32 config, BEFORE the
        # baseline capture.
        global IMG, BATCH
        IMG, BATCH = 1280, 32
    t0 = time.time()
    base = score(capture(base_variant))
    print(f"[baseline {base_variant}] t={base['t_ms']:.4f} ms/img  useful={base['useful_gf']:.2f} GF  "
          f"lane_eff={base['lane_eff']:.1%}  ceiling={base['ceiling']:.1%}  "
          f"params={base['params_m']:.1f}M   (capture {time.time()-t0:.1f}s)")

    targeted = "--targeted" in sys.argv
    if base_variant.endswith("6"):
        # P6 grid (m6 is 48,96,192,384,576,768 — c5=576 pads 4.5x128).
        # early stages fixed at the mt-established "small early" point —
        # the P6 trace is ~35s/capture, so the grid stays tight
        grid = dict(
            c1=[32],
            c2=[64],
            c3=[192, 256],
            c4=[256, 384],
            c5=[512, 768],
            c6=[768, 1024],
        )
        targeted = False
    elif base_variant == "n":
        # n-class grid: n is (16,32,64,128,256); nearly every conv sits
        # below the 128-lane tile (lane eff 22.4%, ceiling 19.1%).
        grid = dict(
            c1=[16, 32],
            c2=[32, 64],
            c3=[64, 128],
            c4=[128, 256],
            c5=[128, 256, 512],
        )
        targeted = False
    elif targeted:
        # Hand-picked refinements around the coarse winners: keep the early
        # (HBM-bound) stages at or above m's widths, align the MXU-bound
        # mid/late stages to the 128-lane tile.
        combos = [
            (32, 64, 256, 256, 1024),
            (64, 64, 256, 256, 1024),
            (48, 96, 256, 256, 1024),
            (48, 96, 256, 384, 768),
            (48, 96, 256, 256, 768),
            (64, 128, 256, 256, 768),
            (48, 96, 192, 384, 1024),
            (64, 96, 256, 384, 1024),
            (48, 96, 256, 384, 1024),
            (64, 128, 256, 384, 768),
        ]
        grid = None
    elif "--fine" in sys.argv:
        grid = dict(
            c1=[32, 48, 64],
            c2=[64, 96, 128],
            c3=[128, 192, 256],
            c4=[256, 384, 512],
            c5=[512, 640, 768, 896, 1024],
        )
    else:
        grid = dict(
            c1=[32, 64],
            c2=[64, 128],
            c3=[128, 256],
            c4=[256, 512],
            c5=[512, 768, 1024],
        )

    # the scratch variant's name must END in "6" for P6 bases (is_p6
    # dispatches on the name suffix)
    search = "__search_p6" if base_variant.endswith("6") else "__search__"
    Y.VARIANTS[search] = Y.VARIANTS[base_variant]
    rows = []
    if not targeted:
        combos = [c for c in product(*grid.values()) if
                  all(a <= b for a, b in zip(c, c[1:])) and c[0] < c[-1]]
    print(f"{len(combos)} candidates")
    for ch in combos:
        Y.CHANNEL_OVERRIDES[search] = {
            f"c{i + 1}": c for i, c in enumerate(ch)}
        s = score(capture(search))
        s["ch"] = tuple(ch)
        rows.append(s)
        print(f"  {s['ch']}: t={s['t_ms']:.4f}  useful={s['useful_gf']:.2f}  "
              f"eff={s['lane_eff']:.1%}  ceil={s['ceiling']:.1%}  params={s['params_m']:.1f}M",
              flush=True)

    ok = [r for r in rows if r["useful_gf"] >= base["useful_gf"] * 0.999]
    ok.sort(key=lambda r: r["t_ms"])
    print("\n=== candidates with useful >= m, by bound time ===")
    print("| channels | t_bound ms/img | vs m | useful GF | lane eff | ceiling | params |")
    print("|---|---|---|---|---|---|---|")
    for r in ok[:12]:
        print(f"| {r['ch']} | {r['t_ms']:.4f} | {r['t_ms']/base['t_ms']:.2f}x "
              f"| {r['useful_gf']:.2f} | {r['lane_eff']:.1%} | {r['ceiling']:.1%} "
              f"| {r['params_m']:.1f}M |")


if __name__ == "__main__":
    main()
