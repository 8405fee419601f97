"""GeoFrame sjoin: candidate-pair pruning correctness/scaling + exact within.

Round-3 hardening of the spatial join (reference: geopandas sjoin semantics
used throughout src/utils.py:276-322): the candidate sweep must be two-sided
(near-linear on clustered data) and `within` must be exact for concave
containers, both property-tested against brute force.
"""

import numpy as np
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.frame import _candidate_pairs, _within
from aquaculture_tpu.geo import polygon as _poly


def _brute_pairs(ab, bb):
    li, ri = [], []
    for i in range(len(ab)):
        if not np.all(np.isfinite(ab[i])):
            continue
        for j in range(len(bb)):
            if not np.all(np.isfinite(bb[j])):
                continue
            if (
                ab[i, 0] <= bb[j, 2]
                and ab[i, 2] >= bb[j, 0]
                and ab[i, 1] <= bb[j, 3]
                and ab[i, 3] >= bb[j, 1]
            ):
                li.append(i)
                ri.append(j)
    return set(zip(li, ri))


def _rand_bounds(rng, n, extent=1000.0, wmax=20.0):
    x0 = rng.uniform(0, extent, n)
    y0 = rng.uniform(0, extent, n)
    w = rng.uniform(0.1, wmax, n)
    h = rng.uniform(0.1, wmax, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_candidate_pairs_match_brute_force(seed):
    rng = np.random.default_rng(seed)
    ab = _rand_bounds(rng, 120)
    bb = _rand_bounds(rng, 150)
    got = set(zip(*_candidate_pairs(ab, bb)))
    assert got == _brute_pairs(ab, bb)


def test_candidate_pairs_wide_outlier_and_nan():
    rng = np.random.default_rng(3)
    ab = _rand_bounds(rng, 80)
    bb = _rand_bounds(rng, 90)
    # one giant right box (land-polygon bbox) + NaN rows on both sides
    bb[0] = [-10.0, -10.0, 2000.0, 2000.0]
    bb[1] = [np.nan] * 4
    ab[0] = [np.nan] * 4
    got = set(zip(*_candidate_pairs(ab, bb)))
    assert got == _brute_pairs(ab, bb)


def test_candidate_pairs_identical_boxes():
    # degenerate: many identical boxes (median width == every width)
    ab = np.tile([5.0, 5.0, 6.0, 6.0], (7, 1))
    bb = np.tile([5.5, 5.5, 7.0, 7.0], (9, 1))
    got = set(zip(*_candidate_pairs(ab, bb)))
    assert got == {(i, j) for i in range(7) for j in range(9)}


def test_candidate_pairs_near_linear_on_clusters():
    """Clustered data: K well-separated clusters of boxes on a long x-range.
    The round-2 one-sided sweep produced O(N*M) candidates here (every left
    row swept all right rows with smaller minx); the two-sided window must
    keep candidates near the true pair count."""
    rng = np.random.default_rng(7)
    K, per = 40, 50
    centers = np.arange(K) * 10_000.0
    def clustered():
        xs = np.repeat(centers, per) + rng.uniform(0, 100, K * per)
        ys = rng.uniform(0, 100, K * per)
        w = rng.uniform(1, 10, K * per)
        return np.stack([xs, ys, xs + w, ys + w], axis=1)

    ab, bb = clustered(), clustered()
    li, ri = _candidate_pairs(ab, bb)
    # exactness on a sample of clusters
    sel = ab[:, 0] < 3 * 10_000.0
    got = {(i, j) for i, j in zip(li, ri) if sel[i]}
    want = {(i, j) for i, j in _brute_pairs(ab, bb) if sel[i]}
    assert got == want
    # scaling: the exact filter output is the final pair set; the internal
    # window is bounded by cluster width / max box width, so the pair count
    # must be << N*M (cross-cluster pairs are impossible)
    assert len(li) < (K * per) ** 2 / 100


def test_within_concave_container_exact():
    """All four vertices of `a` are inside the U-shaped container, but the
    notch cuts through a's interior: the round-2 vertex-only approximation
    said within=True; the exact predicate must say False."""
    u = _poly.Polygon(
        [(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10), (0, 10)]
    )
    a = _poly.box(0.5, 8.0, 9.5, 9.0)  # spans the notch, corners in the arms
    for v in a.exterior:
        assert u.contains_point(float(v[0]), float(v[1]))
    assert not _within(a, u)

    inside_arm = _poly.box(0.4, 3.0, 1.6, 9.0)  # strictly inside the left arm
    assert _within(inside_arm, u)
    outside = _poly.box(3.0, 3.0, 7.0, 9.0)  # strictly inside the notch
    assert not _within(outside, u)


def test_within_shared_boundary():
    b = _poly.box(0, 0, 10, 10)
    assert _within(_poly.box(0, 0, 10, 10), b)  # equal -> within (a \ b empty)
    assert _within(_poly.box(0, 0, 5, 5), b)  # shares two edges
    assert not _within(_poly.box(-1, 0, 5, 5), b)


def test_sjoin_within_uses_exact_predicate():
    u = _poly.Polygon(
        [(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10), (0, 10)]
    )
    L = gf.GeoFrame(
        {"name": ["spans_notch", "in_arm"]},
        geometry=[_poly.box(0.5, 8.0, 9.5, 9.0), _poly.box(0.4, 3.0, 1.6, 9.0)],
        crs=3857,
    )
    R = gf.GeoFrame({"zone": ["u"]}, geometry=[u], crs=3857)
    joined = L.sjoin(R, how="inner", predicate="within")
    assert list(joined["name"]) == ["in_arm"]


def test_sjoin_intersects_unchanged_by_new_sweep():
    rng = np.random.default_rng(11)
    lg = [_poly.box(*b) for b in _rand_bounds(rng, 40, extent=100.0, wmax=15.0)]
    rgs = [_poly.box(*b) for b in _rand_bounds(rng, 40, extent=100.0, wmax=15.0)]
    L = gf.GeoFrame({"i": range(40)}, geometry=lg, crs=3857)
    R = gf.GeoFrame({"j": range(40)}, geometry=rgs, crs=3857)
    joined = L.sjoin(R, how="inner", predicate="intersects")
    want = {
        (i, j)
        for i, a in enumerate(lg)
        for j, b in enumerate(rgs)
        if _poly.intersects(a, b)
    }
    got = set(zip(joined["i"], joined["j"]))
    assert got == want


def test_candidate_pairs_chunked_expansion_identical():
    # The vectorized window expansion is chunked to bound peak temporaries
    # (review r3: heavy-tailed widths below the wide cutoff can push the
    # un-chunked expansion toward N*M pairs). Forcing tiny chunks must not
    # change the pair set or its (left, insertion) order.
    from aquaculture_tpu import frame

    rng = np.random.default_rng(7)
    ab = _rand_bounds(rng, 300, extent=500.0, wmax=60.0)
    bb = _rand_bounds(rng, 250, extent=500.0, wmax=60.0)
    ref = frame._candidate_pairs(ab, bb)
    old = frame._PAIR_CHUNK
    try:
        frame._PAIR_CHUNK = 17
        got = frame._candidate_pairs(ab, bb)
    finally:
        frame._PAIR_CHUNK = old
    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[1], got[1])


def test_sjoin_with_empty_frame():
    # Regression (review r3c): the vectorized rectangle fast path built its
    # bool masks via np.asarray([...]) which defaults to float64 on an empty
    # frame; `valid & l_rect[li]` then raised TypeError. Empty operands must
    # join to an empty result, both orders and both predicates.
    L = gf.GeoFrame({"i": [0]}, geometry=[_poly.box(0, 0, 1, 1)], crs=3857)
    E = gf.GeoFrame({"j": []}, geometry=[], crs=3857)
    for predicate in ("intersects", "within"):
        assert len(L.sjoin(E, predicate=predicate)) == 0
        assert len(E.sjoin(L, predicate=predicate)) == 0
        assert len(E.sjoin(E, predicate=predicate)) == 0
    # how="left" keeps the unmatched left rows
    assert len(L.sjoin(E, how="left")) == 1
