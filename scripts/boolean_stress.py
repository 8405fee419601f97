"""Differential stress of the C++ boolean sweep vs the Python engine.

Runs N random operand pairs (stars, integer-lattice hulls, hole-bearing
rings, slivers) through all four ops on BOTH engines and compares area and
polygon/hole counts. A segfault, exception, or area mismatch is a finding.
This is the production-derisk pass for native/src/booleanop.cc — ctypes
errors would take the whole process down, so this runs as a script, not in
the default suite (the suite's 120-pair differential is the regression
gate).

    python scripts/boolean_stress.py [N]        # default 10000 pairs
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from aquaculture_tpu.geo import native_boolean as NB
from aquaculture_tpu.geo import polygon as P
from aquaculture_tpu.geo.boolean import boolean_op


def _star(rng):
    n = int(rng.integers(3, 16))
    cx, cy = rng.uniform(-5, 5, 2)
    th = np.sort(rng.uniform(0, 2 * np.pi, 2 * n))
    if np.min(np.diff(th)) < 1e-3:
        th = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + rng.uniform(0, 1)
    r = rng.uniform(0.2, 4.0, 2 * n)
    return P.Polygon(np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1))


def _hull_int(rng):
    pts = rng.integers(-6, 7, (14, 2)).astype(float)
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return None
    c = pts.mean(0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    return P.Polygon(pts[np.argsort(ang)])


def _ring(rng):
    x0, y0 = rng.integers(-6, 0, 2).astype(float)
    w, h = rng.integers(6, 12, 2).astype(float)
    m = float(rng.integers(1, int(min(w, h)) // 2 + 1))
    outer = P.box(x0, y0, x0 + w, y0 + h)
    return P.Polygon(outer.exterior, [P.box(x0 + m, y0 + m, x0 + w - m, y0 + h - m).exterior])


def _sliver(rng):
    x0, y0 = rng.uniform(-5, 5, 2)
    L = rng.uniform(4, 12)
    eps = 10.0 ** rng.uniform(-6, -2)
    if rng.random() < 0.5:
        return P.Polygon([(x0, y0), (x0 + L, y0), (x0 + L, y0 + eps), (x0, y0 + eps)])
    return P.Polygon([(x0, y0), (x0 + eps, y0), (x0 + eps, y0 + L), (x0, y0 + L)])


GENS = (_star, _hull_int, _ring, _sliver)


def _stats(g):
    polys = g.geoms if isinstance(g, P.MultiPolygon) else ([] if g.is_empty else [g])
    return len(polys), sum(len(p.holes) for p in polys), g.area


def main() -> None:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    assert NB.load_library() is not None, "build native first: make -C native"
    rng = np.random.default_rng(20260816)
    bad = 0
    t0 = time.perf_counter()
    done = 0
    while done < n_cases:
        a = GENS[int(rng.integers(len(GENS)))](rng)
        b = GENS[int(rng.integers(len(GENS)))](rng)
        if a is None or b is None or a.is_empty or b.is_empty:
            continue
        if rng.random() < 0.5:
            # projected-CRS magnitudes: translate both operands to
            # EPSG:3857-scale coordinates so the lattice normalization runs
            # where the pipeline actually operates (span-relative precision)
            off = rng.uniform(3e5, 1e6, 2) * np.where(rng.random(2) < 0.5, 1, 5)
            a = P.Polygon(np.asarray(a.exterior) + off,
                          [np.asarray(h) + off for h in a.holes])
            b = P.Polygon(np.asarray(b.exterior) + off,
                          [np.asarray(h) + off for h in b.holes])
        done += 1
        for op in ("intersection", "union", "difference", "xor"):
            g_native = boolean_op(a, b, op)
            lib, NB._lib = NB._lib, None
            try:
                g_py = boolean_op(a, b, op)
            finally:
                NB._lib = lib
            n1, h1, a1 = _stats(g_native)
            n2, h2, a2 = _stats(g_py)
            tol = 1e-9 * max(a.area, b.area, 1.0)
            if abs(a1 - a2) > tol or (n1, h1) != (n2, h2):
                bad += 1
                print(f"MISMATCH case={done} op={op} native=({n1},{h1},{a1!r}) "
                      f"py=({n2},{h2},{a2!r})")
                print("  A:", np.asarray(a.exterior).tolist())
                print("  B:", np.asarray(b.exterior).tolist())
        if done % 1000 == 0:
            print(f"{done}/{n_cases} pairs, {bad} mismatches, "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
    print(f"DONE {done} pairs x 4 ops, {bad} mismatches, "
          f"{time.perf_counter() - t0:.0f}s")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
