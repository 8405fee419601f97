"""Benchmark the GeoFrame spatial join at pod-corpus scale.

VERDICT r2 weak #5: the round-2 candidate sweep was one-sided and degraded
toward O(N*M) on large frames. This drives the round-3 two-sided sweep with
a coastal-like clustered workload: 1e5 detections joined against 1e4 image
boxes strung along a synthetic coastline.

    python scripts/sjoin_bench.py
"""


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

from aquaculture_tpu import frame as gf
from aquaculture_tpu.frame import _candidate_pairs
from aquaculture_tpu.geo import polygon as _poly


def coastal_bounds(rng, n, n_clusters, box_w):
    """Boxes clustered around n_clusters sites along a 400 km 'coast'."""
    sites = np.linspace(0, 400_000.0, n_clusters)
    cx = rng.choice(sites, n) + rng.normal(0, 300.0, n)
    cy = rng.normal(0, 300.0, n)
    w = rng.uniform(0.5, 1.0, n) * box_w
    return np.stack([cx - w / 2, cy - w / 2, cx + w / 2, cy + w / 2], axis=1)


def main():
    rng = np.random.default_rng(0)
    n_det, n_box = 100_000, 10_000
    det_b = coastal_bounds(rng, n_det, 200, 30.0)   # ~cage-sized
    box_b = coastal_bounds(rng, n_box, 200, 1200.0)  # download boxes

    t0 = time.perf_counter()
    li, ri = _candidate_pairs(det_b, box_b)
    t_pairs = time.perf_counter() - t0

    # full sjoin on the same data (rectangle fast path covers the exact test)
    L = gf.GeoFrame(
        {"det": range(n_det)}, geometry=[_poly.box(*b) for b in det_b], crs=3857
    )
    R = gf.GeoFrame(
        {"bx": range(n_box)}, geometry=[_poly.box(*b) for b in box_b], crs=3857
    )
    t0 = time.perf_counter()
    joined = L.sjoin(R, how="inner", predicate="intersects")
    t_sjoin = time.perf_counter() - t0

    print(json.dumps({
        "n_left": n_det,
        "n_right": n_box,
        "pairs": int(len(li)),
        "pairs_per_left": round(len(li) / n_det, 2),
        "candidate_sweep_s": round(t_pairs, 3),
        "full_sjoin_s": round(t_sjoin, 3),
        "joined_rows": int(len(joined)),
    }))


if __name__ == "__main__":
    main()
