"""Martinez-Rueda boolean overlay (geo/boolean.py): known cases, degeneracy
suite, algebraic-invariant fuzz cross-checked against the independent
triangle-soup engine (geo/triangulate.py) and the raster oracle.

The reference gets these ops from GEOS (gpd.overlay, reference
src/utils.py:241-273; polygon dissection, create_land_filter.py:129-137;
unary_union, utils_tonnage.py:617,1165)."""

import numpy as np
import pytest

from aquaculture_tpu.geo import polygon as P
from aquaculture_tpu.geo.boolean import boolean_op, unary_union_tree, union_area
from aquaculture_tpu.geo.polygon import _raster_boolean_area
from aquaculture_tpu.geo.triangulate import exact_intersection_area


def _star(cx, cy, r1, r2, n=7, rot=0.0):
    th = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + rot
    r = np.where(np.arange(2 * n) % 2 == 0, r1, r2)
    return P.Polygon(np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1))


# ------------------------------------------------------------------ known


def test_known_overlap_cases():
    cases = [
        (P.box(0, 0, 2, 2), P.box(0, 0, 2, 1), 2.0, 4.0, 2.0),
        (P.box(0, 0, 2, 2), P.box(0, -1, 2, 0), 0.0, 6.0, 4.0),  # edge touch
        (P.box(0, 0, 1, 1), P.box(0, 0, 1, 1), 1.0, 1.0, 0.0),   # identical
        (P.box(0, 0, 1, 1), P.box(1, 1, 2, 2), 0.0, 2.0, 1.0),   # corner touch
    ]
    for a, b, i, u, d in cases:
        assert boolean_op(a, b, "intersection").area == pytest.approx(i, abs=1e-6)
        assert boolean_op(a, b, "union").area == pytest.approx(u, abs=1e-6)
        assert boolean_op(a, b, "difference").area == pytest.approx(d, abs=1e-6)


def test_inscribed_diamond_full_degeneracy():
    """All four box corners lie exactly ON the diamond's edges."""
    a = P.box(0, 0, 2, 2)
    diamond = P.Polygon([(1, -1), (3, 1), (1, 3), (-1, 1)])
    assert boolean_op(a, diamond, "intersection").area == pytest.approx(4.0, abs=1e-6)
    assert boolean_op(a, diamond, "union").area == pytest.approx(8.0, abs=1e-6)
    assert boolean_op(a, diamond, "difference").area == pytest.approx(0.0, abs=1e-6)


def test_difference_creates_hole():
    big = P.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    pts = (np.asarray(P.box(3, 3, 6, 6).exterior) - 4.5) @ np.array([[c, -s], [s, c]]).T + 4.5
    small = P.Polygon(pts)
    d = boolean_op(big, small, "difference")
    assert isinstance(d, P.Polygon) and len(d.holes) == 1
    assert d.area == pytest.approx(100 - small.area, abs=1e-5)


def test_union_two_c_shapes_forms_ring():
    c1 = P.Polygon([(0, 0), (5, 0), (5, 1), (1, 1), (1, 4), (5, 4), (5, 5), (0, 5)])
    c2 = P.Polygon([(4.5, 0.5), (5.5, 0.5), (5.5, 4.5), (4.5, 4.5)])
    u = boolean_op(c1, c2, "union")
    polys = u.geoms if isinstance(u, P.MultiPolygon) else [u]
    assert sum(len(p.holes) for p in polys) == 1  # enclosed courtyard
    r = _raster_boolean_area(c1, c2, "union", n=2048)
    assert u.area == pytest.approx(r, rel=2e-3)


def test_hole_touching_shell():
    """Subtracting a region that touches the subject boundary at one point:
    the contour walk must traverse the touching hole with correct winding."""
    a = P.Polygon([(0, 0), (0, 1), (-1, 1), (-1, 2), (-3, 2), (-3, 0)])
    b = P.Polygon([(-4, -2), (-2, -3), (-1, -4), (3, -4), (3, -3), (1, 0),
                   (2, 1), (2, 3), (-1, 4), (-4, 2), (-3, 0)])
    assert boolean_op(b, a, "difference").area == pytest.approx(b.area - 5.0, abs=1e-5)
    assert boolean_op(a, b, "intersection").area == pytest.approx(5.0, abs=1e-5)


def test_nonconvex_pair_matches_raster_and_triangulation():
    a = _star(0, 0, 2, 0.8)
    b = _star(1, 0.5, 2, 0.9, rot=0.3)
    gi = boolean_op(a, b, "intersection")
    assert gi.area == pytest.approx(exact_intersection_area(a, b), abs=1e-6)
    for op in ("intersection", "union", "difference"):
        g = boolean_op(a, b, op)
        r = _raster_boolean_area(a, b, op, n=2048)
        assert g.area == pytest.approx(r, rel=5e-3, abs=1e-3), op


def test_polygon_api_general_operands():
    """polygon.difference / union / intersection accept non-convex
    non-rectilinear operands now (the former NotImplementedError path)."""
    a = _star(0, 0, 2, 0.9, n=5)
    b = _star(0.7, 0.2, 1.8, 0.8, n=6, rot=0.4)
    d = P.difference(a, b)
    u = P.union(a, b)
    i = P.intersection(a, b)
    assert d.area == pytest.approx(a.area - i.area, abs=1e-6)
    assert u.area == pytest.approx(a.area + b.area - i.area, abs=1e-6)
    # union dissolves: no double counting
    assert u.area < a.area + b.area - 1e-6


def test_union_area_overlapping_circles():
    t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    circ = lambda cx: P.Polygon(np.stack([cx + np.cos(t), np.sin(t)], 1))
    geoms = [circ(0.0), circ(1.0), circ(2.0)]
    ua = union_area(geoms)
    # analytic: 3 unit circles at distance 1: area = 3A - 2*lens(1)
    # lens area for d=1, r=1: 2r^2 cos^-1(d/2r) - d/2 sqrt(4r^2-d^2)
    lens = 2 * np.arccos(0.5) - 0.5 * np.sqrt(3)
    # polygonal circles are slightly smaller; compare against the polygon math
    a1 = geoms[0].area
    i12 = exact_intersection_area(geoms[0], geoms[1])
    assert ua == pytest.approx(3 * a1 - 2 * i12, rel=1e-5)
    assert abs(ua - (3 * np.pi - 2 * lens)) < 0.02  # sanity vs analytic
    # single-geometry and MultiPolygon forms
    assert union_area(geoms[0]) == pytest.approx(a1, rel=1e-9)
    assert union_area(P.MultiPolygon(geoms)) == pytest.approx(ua, rel=1e-6)


def test_unary_union_tree_matches_left_fold():
    rng = np.random.default_rng(3)
    boxes = [P.box(x, y, x + 2, y + 2) for x, y in rng.uniform(0, 6, (12, 2))]
    u = unary_union_tree(boxes)
    r = _raster_boolean_area(u, P.box(-1, -1, 9, 9), "intersection", n=2048)
    assert u.area == pytest.approx(r, rel=2e-3)


def test_projected_crs_magnitudes():
    """EPSG:3857-scale coordinates: the lattice normalization must keep
    precision (span-relative, not absolute)."""
    off = np.asarray([2_600_000.0, 5_100_000.0])
    a = P.Polygon(np.asarray(_star(0, 0, 20, 8).exterior) + off)
    b = P.Polygon(np.asarray(_star(9, 4, 18, 9, rot=0.5).exterior) + off)
    gi = boolean_op(a, b, "intersection")
    gd = boolean_op(a, b, "difference")
    assert gi.area + gd.area == pytest.approx(a.area, rel=1e-6)
    assert gi.area == pytest.approx(exact_intersection_area(a, b), rel=1e-6)


# ------------------------------------------------------------------ fuzz


def _is_simple(poly):
    r = P._close_ring(poly.exterior)
    n = len(r) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if P._segments_intersect(r[i], r[i + 1], r[j], r[j + 1]):
                return False
    return True


def _rand_star(rng):
    n = rng.integers(3, 12)
    cx, cy = rng.uniform(-3, 3, 2)
    th = np.sort(rng.uniform(0, 2 * np.pi, 2 * n))
    if np.min(np.diff(th)) < 1e-3:
        th = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + rng.uniform(0, 1)
    r = rng.uniform(0.3, 3.0, 2 * n)
    return P.Polygon(np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1))


def _rand_hull_int(rng):
    """Convex-ish integer-vertex polygon: maximally degenerate operands
    (shared vertices, vertex-on-edge, collinear overlapping edges)."""
    pts = rng.integers(-4, 5, (12, 2)).astype(float)
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return None
    c = pts.mean(0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    return P.Polygon(pts[np.argsort(ang)])


def test_fuzz_boolean_invariants():
    rng = np.random.default_rng(2024)
    trials = 0
    while trials < 150:
        kind = trials % 3
        if kind == 0:
            a, b = _rand_star(rng), _rand_star(rng)
        elif kind == 1:
            a, b = _rand_star(rng), _rand_hull_int(rng)
        else:
            a, b = _rand_hull_int(rng), _rand_hull_int(rng)
        if a is None or b is None or a.is_empty or b.is_empty:
            continue
        if not (_is_simple(a) and _is_simple(b)):
            continue
        trials += 1
        gi = boolean_op(a, b, "intersection")
        gu = boolean_op(a, b, "union")
        gd = boolean_op(a, b, "difference")
        gdr = boolean_op(b, a, "difference")
        A, B = a.area, b.area
        tol = 3e-5 * max(A, B) + 1e-12
        ti = exact_intersection_area(a, b)
        assert abs(gi.area + gd.area - A) < tol, (trials, a.exterior, b.exterior)
        assert abs(gi.area + gdr.area - B) < tol, (trials, a.exterior, b.exterior)
        assert abs(gu.area - (A + B - gi.area)) < tol, (trials, a.exterior, b.exterior)
        assert abs(gi.area - ti) < tol, (trials, a.exterior, b.exterior)


def test_native_sweep_matches_python_sweep():
    """Differential test: the C++ sweep (native/src/booleanop.cc) and the
    Python sweep are the same algorithm on the same lattice, so on every
    random operand pair their results must agree (area to float-exact
    tolerance, polygon count, hole count)."""
    from aquaculture_tpu.geo import native_boolean

    if native_boolean.load_library() is None:
        pytest.skip("libaquatile.so not built")

    def _stats(g):
        polys = g.geoms if isinstance(g, P.MultiPolygon) else ([] if g.is_empty else [g])
        return (len(polys), sum(len(p.holes) for p in polys), g.area)

    def _both(a, b, op):
        g_native = boolean_op(a, b, op)
        lib, native_boolean._lib = native_boolean._lib, None
        try:
            g_py = boolean_op(a, b, op)
        finally:
            native_boolean._lib = lib
        return g_native, g_py

    rng = np.random.default_rng(77)
    trials = 0
    while trials < 120:
        kind = trials % 3
        if kind == 0:
            a, b = _rand_star(rng), _rand_star(rng)
        elif kind == 1:
            a, b = _rand_star(rng), _rand_hull_int(rng)
        else:
            a, b = _rand_hull_int(rng), _rand_hull_int(rng)
        if a is None or b is None or a.is_empty or b.is_empty:
            continue
        if not (_is_simple(a) and _is_simple(b)):
            continue
        trials += 1
        for op in ("intersection", "union", "difference", "xor"):
            gn, gp = _both(a, b, op)
            n_n, h_n, a_n = _stats(gn)
            n_p, h_p, a_p = _stats(gp)
            tol = 1e-9 * max(a.area, b.area) + 1e-12
            assert abs(a_n - a_p) < tol, (trials, op, a_n, a_p)
            assert (n_n, h_n) == (n_p, h_p), (trials, op, (n_n, h_n), (n_p, h_p))

    # hole-bearing operands through both engines
    ring = P.Polygon(P.box(0, 0, 20, 20).exterior, [P.box(5, 5, 15, 15).exterior])
    other = P.Polygon([(10, -2), (24, 10), (10, 22), (3, 10)])
    for op in ("intersection", "union", "difference", "xor"):
        gn, gp = _both(ring, other, op)
        assert gn.area == pytest.approx(gp.area, abs=1e-9)

    # adversarial degeneracies through both engines: shared edges, slivers,
    # vertex-on-edge chains, nested rings touching their shell
    tri = P.Polygon([(0, 0), (8, 0), (4, 6)])
    adversarial = [
        (P.box(0, 0, 4, 4), P.box(4, 0, 8, 4)),                 # full shared edge
        (P.box(0, 0, 4, 4), P.box(2, 4, 6, 8)),                 # partial edge touch
        (tri, P.Polygon([(0, 0), (8, 0), (4, -6)])),            # shared base edge
        (tri, P.Polygon([(2, 0), (6, 0), (4, 3)])),             # collinear sub-edge + interior apex
        (P.box(0, 0, 10, 1e-4), P.box(5, -1, 6, 1)),            # sliver crossing
        (P.Polygon([(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)]),  # notch vertex on edge
         P.Polygon([(5, 5), (15, 5), (15, 15), (5, 15)])),
        (ring, P.box(5, 5, 15, 15)),                            # clip exactly the hole
        (ring, P.Polygon(P.box(2, 2, 18, 18).exterior, [P.box(6, 6, 14, 14).exterior])),
    ]
    for a, b in adversarial:
        for op in ("intersection", "union", "difference", "xor"):
            gn, gp = _both(a, b, op)
            tol = 1e-9 * max(a.area, b.area, 1.0)
            assert abs(gn.area - gp.area) < tol, (op, a.exterior[:3], gn.area, gp.area)
            assert _stats(gn)[:2] == _stats(gp)[:2], (op, _stats(gn), _stats(gp))

    # and a few known-value checks so the degenerate cases are CORRECT,
    # not just engine-consistent
    assert boolean_op(P.box(0, 0, 4, 4), P.box(4, 0, 8, 4), "union").area == pytest.approx(32.0, abs=1e-9)
    assert boolean_op(P.box(0, 0, 4, 4), P.box(4, 0, 8, 4), "intersection").area == pytest.approx(0.0, abs=1e-9)
    assert boolean_op(ring, P.box(5, 5, 15, 15), "intersection").area == pytest.approx(0.0, abs=1e-6)
    assert boolean_op(ring, P.box(5, 5, 15, 15), "union").area == pytest.approx(400.0, abs=1e-6)
    assert boolean_op(tri, P.Polygon([(2, 0), (6, 0), (4, 3)]), "intersection").area == pytest.approx(6.0, rel=1e-6)


def test_hole_bearing_operands():
    """Operands that THEMSELVES carry holes (boolean.py:683 contract):
    ring ∩ ring, ring ∪ ring, ring − solid, validated against the raster
    oracle and by containment algebra."""
    ring_a = P.Polygon(P.box(0, 0, 10, 10).exterior, [P.box(3, 3, 7, 7).exterior])
    ring_b = P.Polygon(P.box(5, 5, 15, 15).exterior, [P.box(8, 8, 12, 12).exterior])
    solid = P.box(2, 2, 9, 9)
    for x, y, op in [
        (ring_a, ring_b, "intersection"),
        (ring_a, ring_b, "union"),
        (ring_a, ring_b, "difference"),
        (ring_a, solid, "difference"),
        (solid, ring_a, "difference"),
        (ring_a, solid, "union"),
    ]:
        g = boolean_op(x, y, op)
        r = _raster_boolean_area(x, y, op, n=2048)
        assert g.area == pytest.approx(r, rel=5e-3, abs=1e-2), (op, g.area, r)
    # algebra: (a∩b) + (a−b) = a for hole-bearing a, b — to within the
    # engine's documented lattice quantization (span-relative, same
    # tolerance as the fuzz invariants)
    i = boolean_op(ring_a, ring_b, "intersection").area
    d = boolean_op(ring_a, ring_b, "difference").area
    tol = 3e-5 * ring_a.area
    assert i + d == pytest.approx(ring_a.area, abs=tol)
    # a ring minus a solid covering its hole region entirely
    g = boolean_op(ring_a, P.box(3, 3, 7, 7), "difference")
    assert g.area == pytest.approx(ring_a.area, abs=tol)


def test_fuzz_hole_bearing_operands():
    """Random ring pairs (shell + strictly-interior hole): the same
    algebraic invariants as the simple-polygon fuzz."""
    rng = np.random.default_rng(77)
    trials = 0
    while trials < 40:
        def ring():
            x0, y0 = rng.uniform(-4, 0, 2)
            w, h = rng.uniform(4, 8, 2)
            hx0 = x0 + w * rng.uniform(0.15, 0.4)
            hy0 = y0 + h * rng.uniform(0.15, 0.4)
            hx1 = x0 + w * rng.uniform(0.6, 0.85)
            hy1 = y0 + h * rng.uniform(0.6, 0.85)
            return P.Polygon(
                P.box(x0, y0, x0 + w, y0 + h).exterior,
                [P.box(hx0, hy0, hx1, hy1).exterior],
            )
        a, b = ring(), ring()
        trials += 1
        gi = boolean_op(a, b, "intersection")
        gu = boolean_op(a, b, "union")
        gd = boolean_op(a, b, "difference")
        gdr = boolean_op(b, a, "difference")
        A, B = a.area, b.area
        tol = 3e-5 * max(A, B) + 1e-12
        assert abs(gi.area + gd.area - A) < tol, trials
        assert abs(gi.area + gdr.area - B) < tol, trials
        assert abs(gu.area - (A + B - gi.area)) < tol, trials
        r = _raster_boolean_area(a, b, "intersection", n=1024)
        assert gi.area == pytest.approx(r, rel=2e-2, abs=5e-2), trials


def test_symmetric_difference():
    a = _star(0, 0, 2, 0.8)
    b = _star(0.9, 0.4, 1.9, 0.85, rot=0.25)
    x = P.symmetric_difference(a, b)
    i = P.intersection(a, b)
    assert x.area == pytest.approx(a.area + b.area - 2 * i.area, abs=1e-6)
    assert a.symmetric_difference(b).area == pytest.approx(x.area)


def test_buffer_dilation_and_erosion():
    """geo/buffer.py: box dilation matches the analytic rounded-rectangle
    area (n-gon corner arcs), erosion of a box is EXACT, hole margins fill."""
    b = P.box(0, 0, 10, 6)
    d = 1.5
    g = b.buffer(d)
    n = 32  # 4 * quad_segs
    ngon_disc = 0.5 * n * d * d * np.sin(2 * np.pi / n)
    expect = 60 + 32 * d + ngon_disc
    assert g.area == pytest.approx(expect, rel=1e-3)

    e = b.buffer(-1.0)
    assert e.area == pytest.approx(8 * 4, abs=1e-4)  # exact inner box
    x0, y0, x1, y1 = e.bounds
    assert (x0, y0, x1, y1) == pytest.approx((1, 1, 9, 5), abs=1e-6)

    # erode to nothing
    assert P.box(0, 0, 2, 2).buffer(-1.01).is_empty

    # ring: dilation fills the hole margin exactly (hole shrinks to a box)
    ring = P.Polygon(P.box(0, 0, 20, 20).exterior, [P.box(8, 8, 12, 12).exterior])
    g2 = ring.buffer(1.0)
    outer = 400 + 80 * 1.0 + 0.5 * n * np.sin(2 * np.pi / n)
    assert g2.area == pytest.approx(outer - 2 * 2, rel=1e-3)

    # point disc
    disc = P.Point(3, 4).buffer(2.0)
    assert disc.area == pytest.approx(0.5 * n * 4 * np.sin(2 * np.pi / n), rel=1e-9)

    # buffer(0) identity
    assert ring.buffer(0) is ring


def test_buffer_nonconvex_matches_raster():
    a = _star(0, 0, 3, 1.2)
    for d in (0.4, -0.2):
        g = a.buffer(d)
        # raster oracle: dilation/erosion via distance-ish sampling is hard;
        # instead check set relations + area monotonicity and containment
        if d > 0:
            assert g.area > a.area
            assert boolean_op(a, g, "difference").area == pytest.approx(0.0, abs=1e-6)
        else:
            assert 0 < g.area < a.area
            assert boolean_op(g, a, "difference").area == pytest.approx(0.0, abs=1e-6)


def test_geoframe_buffer_roundtrip():
    from aquaculture_tpu import frame as gf

    A = gf.GeoFrame({"k": [0, 1]}, geometry=[P.box(0, 0, 4, 4), P.Point(10, 10)], crs=3857)
    B = A.buffer(1.0)
    assert B.crs == 3857 and len(B) == 2
    assert B["geometry"].iloc[0].area > 16
    assert B["geometry"].iloc[1].area > 3.0  # ~pi


def test_ring_sliver_degenerate_terminates():
    """Regression: a ring x sub-lattice-width sliver sent the event
    comparator into an inconsistent state (cmp(a,b)<0 and cmp(b,a)<0) and
    the _order_events exchange sort cycled forever — in BOTH the Python
    and C++ engines. The comparator is now a strict total order; this case
    must terminate with consistent set algebra."""
    A = P.Polygon(
        [[1.0, -3.0], [1.0, 5.0], [-6.0, 5.0], [-6.0, -3.0]],
        [[[-3.0, 0.0], [-3.0, 2.0], [-2.0, 2.0], [-2.0, 0.0]]],
    )
    B = P.Polygon(
        [[0.01685603041968342, 3.7089485382939635],
         [0.016857236499638426, 3.7089485382939635],
         [0.016857236499638426, 8.178158289721416],
         [0.01685603041968342, 8.178158289721416]],
    )
    from aquaculture_tpu.geo import native_boolean as NB

    engines = [("native", object())] if NB.load_library() is not None else []
    engines.append(("python", None))
    for name, _ in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            gi = boolean_op(A, B, "intersection")
            gu = boolean_op(A, B, "union")
            gd = boolean_op(A, B, "difference")
            gx = boolean_op(A, B, "xor")
        finally:
            NB._lib = lib
        tol = 1e-5
        assert abs(gi.area + gd.area - A.area) < tol, name
        assert abs(gu.area - (A.area + B.area - gi.area)) < 1e-4, name
        assert gx.area <= gu.area + tol, name
        assert 0.0 <= gi.area < 1e-4, name


def test_event_comparator_is_total_order():
    """Property test for the hang fix: on events harvested from degenerate
    operands, _compare_events must be antisymmetric and cycle-free
    (sampled triples) — the exchange-sort hang was exactly a comparator
    cycle."""
    from aquaculture_tpu.geo.boolean import _compare_events, _fill_queue

    rng = np.random.default_rng(11)
    events = []
    for _ in range(6):
        a = _rand_hull_int(rng)
        if a is None:
            continue
        ring = np.round(np.asarray(a.exterior) * 7)  # lattice-ish coords
        q = _fill_queue([ring], [np.roll(ring, 1, axis=0)])
        events.extend(q)
    events = events[:80]
    n = len(events)
    assert n > 20
    # antisymmetry on all pairs
    for i in range(n):
        assert _compare_events(events[i], events[i]) == 0
        for j in range(i + 1, n):
            cij = _compare_events(events[i], events[j])
            cji = _compare_events(events[j], events[i])
            assert cij in (-1, 1) and cji == -cij, (i, j, cij, cji)
    # the reviewer-found near-collinear fan: A->(100,3), B->(150,0),
    # C->(200,-3) from one vertex formed a 3-cycle under the old snapped
    # comparator; the exact comparator must order it consistently
    def _ev(pt, o):
        from aquaculture_tpu.geo.boolean import _SweepEvent
        e = _SweepEvent(pt, True, None, True)
        oe = _SweepEvent(o, False, e, True)
        e.other = oe
        return e

    A, B, C = _ev((0.0, 0.0), (100.0, 3.0)), _ev((0.0, 0.0), (150.0, 0.0)), _ev((0.0, 0.0), (200.0, -3.0))
    ab, bc, ac = _compare_events(A, B), _compare_events(B, C), _compare_events(A, C)
    assert not (ab < 0 and bc < 0 and ac > 0) and not (ab > 0 and bc > 0 and ac < 0)

    # no 3-cycles on sampled triples
    idx = rng.integers(0, n, size=(400, 3))
    for a, b, c in idx:
        if len({a, b, c}) < 3:
            continue
        ab = _compare_events(events[a], events[b])
        bc = _compare_events(events[b], events[c])
        ca = _compare_events(events[c], events[a])
        assert not (ab < 0 and bc < 0 and ca < 0), (a, b, c)
        assert not (ab > 0 and bc > 0 and ca > 0), (a, b, c)


def test_partial_edge_abutment_multipolygon_operand():
    """Round-4c regression: a MultiPolygon whose members abut along PART of
    an edge (exactly what unary_union of staircase rectangles emits) used
    to corrupt union/difference/xor — the sweep ignored same-operand
    collinear overlaps (unsubdivided parity misalignment), and once
    subdivided, the segment comparator returned 0 for the distinct
    coincident seam pieces. Exact expected areas, both engines."""
    mp = P.unary_union([P.box(0, 0, 2, 1), P.box(0.5, 1, 1.5, 2)])
    assert mp.area == pytest.approx(3.0)
    tri = P.Polygon([(0.2, 0.5), (1.8, 0.5), (1.0, 1.8)])  # inside mp
    cbox = P.box(0.8, 0.5, 1.2, 1.5)  # crosses the seam span, inside mp
    cases = [
        (tri, {"union": 3.0, "difference": 1.96, "intersection": 1.04, "xor": 1.96}),
        (cbox, {"union": 3.0, "difference": 2.6, "intersection": 0.4, "xor": 2.6}),
    ]
    for clip, wants in cases:
        for op, want in wants.items():
            got = boolean_op(mp, clip, op).area
            assert got == pytest.approx(want, abs=1e-6), (op, got, want)


def test_fuzz_staircase_dissolve_operands():
    """Fuzz the seam fix: random rectilinear dissolves (members abutting
    along partial edges) against random stars, area checked against the
    raster oracle for every op, on whichever engine boolean_op routes to."""
    rng = np.random.default_rng(11)
    for trial in range(8):
        boxes = []
        x = 0.0
        for _ in range(4):
            w = float(rng.uniform(0.8, 2.0))
            h = float(rng.uniform(0.8, 2.0))
            y = float(rng.uniform(-0.5, 0.5))
            boxes.append(P.box(x, y, x + w, y + h))
            # next box starts inside the previous one's x-span half the
            # time (overlap) or exactly at its edge (abutment)
            x += w if rng.random() < 0.5 else w * float(rng.uniform(0.5, 1.0))
        mp = P.unary_union(boxes)
        clip = _rand_star(rng)
        for op in ("union", "difference", "intersection", "xor"):
            g = boolean_op(mp, clip, op)
            r = _raster_boolean_area(mp, clip, op, n=1024)
            assert g.area == pytest.approx(r, rel=2e-2, abs=2e-2), (trial, op)


def test_vertex_on_edge_union_not_empty():
    """Round-4c regression (semantic-fuzz finding): a subject vertex lying
    EXACTLY on a clipping edge. Lattice-rounding the endpoints displaces
    the computed line-line crossing O(1/sin theta) units from the rounded
    vertex, the contour walk dead-ended on the point-identity mismatch,
    and UNION returned EMPTY (xor lost a face) while intersection and
    difference happened to survive. Fixed by the vertex-on-edge
    perpendicular snap in _possible_intersection — a Chebyshev window
    cannot fix it without bridging sub-lattice slivers
    (test_ring_sliver_degenerate_terminates). Both engines, areas pinned
    against the raster oracle."""
    A = P.Polygon([(5.0, -3.0), (4.0, 0.0), (5.0, 3.0)])
    # B's edge (5,-2)->(3,2) passes exactly through A's vertex (4,0)
    B = P.Polygon([(-6.0, -3.0), (5.0, -2.0), (3.0, 2.0), (6.0, 4.0), (5.0, 6.0)])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            res = {op: boolean_op(A, B, op)
                   for op in ("union", "intersection", "difference", "xor")}
        finally:
            NB._lib = lib
        for op, g in res.items():
            r = _raster_boolean_area(A, B, op, n=2048)
            got = 0.0 if g.is_empty else g.area
            assert got == pytest.approx(r, rel=2e-2, abs=2e-2), (name, op, got, r)
        # same-lattice identities must hold tightly
        au, ai = res["union"].area, res["intersection"].area
        assert au + ai == pytest.approx(A.area + B.area, abs=1e-4), name
        assert res["difference"].area == pytest.approx(A.area - ai, abs=1e-4), name
        assert res["xor"].area == pytest.approx(au - ai, abs=1e-4), name


def test_fuzz_semantic_point_oracle():
    """Compact in-suite version of scripts/boolean_semantic_fuzz.py: the
    stress script is differential (C++ vs Python share the algorithm, so
    shared defects escape it); this checks ground truth neither engine
    produces — point membership via ray casting and same-lattice area
    identities. 40 pairs x 4 ops on whichever engine boolean_op routes to;
    the script runs thousands with both engines forced."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "boolean_semantic_fuzz",
        Path(__file__).resolve().parent.parent / "scripts" / "boolean_semantic_fuzz.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(20260820)
    done = 0
    use_native = mod.NB.load_library() is not None
    while done < 40:
        pair = mod.gen_pair(rng)
        if pair is None:
            continue
        done += 1
        findings = mod.check_pair(*pair, rng, use_native)
        assert not findings, (done, findings[:4])


def test_corner_touch_multipolygon_subject_dissolve_on_lattice():
    """Round-4c regression (semantic-fuzz finding #2): a MultiPolygon
    SUBJECT whose members touch at a corner, with one member's edge
    collinear-overlapping the clipping operand's edge. The old
    _normalize_operand dissolved the members in ORIGINAL coordinates and
    boolean_op re-snapped the result — double quantization: the dissolved
    edge's y sat a sub-quantum off the exact value, flipped its rounding
    on the joint lattice, and the previously exact collinear overlap
    landed one lattice row apart, corrupting union/difference/xor (B\\A
    returned ALL of B). Dissolve now runs on the joint lattice
    (_lattice_dissolve). Areas pinned against the raster oracle, both
    engines, both operand orders."""
    A = P.Polygon([(-2.0, -6.0), (0.0, 4.0), (-4.0, 4.0)])
    B = P.MultiPolygon([
        P.Polygon([(-2.0, 4.0), (-6.0, 4.0), (-6.0, 1.0)]),
        P.Polygon([(-6.0, 4.0), (-6.0, 8.0), (-7.0, 8.0)]),
    ])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            for s, c, tag in ((A, B, "A,B"), (B, A, "B,A")):
                for op in ("union", "intersection", "difference", "xor"):
                    g = boolean_op(s, c, op)
                    r = _raster_boolean_area(s, c, op, n=2048)
                    got = 0.0 if g.is_empty else g.area
                    assert got == pytest.approx(r, rel=2e-2, abs=2e-2), \
                        (name, tag, op, got, r)
        finally:
            NB._lib = lib


def test_seam_hole_parenting_difference():
    """Round-4c regression (semantic-fuzz finding #3): B\\A where B's outer
    boundary partially coincides with A's hole boundary (cross-operand
    collinear seams on three sides) and B carries an interior hole. The
    hole's surrounding face STARTS on a seam edge; _result_transition read
    the seam event's stale other_in_out and mis-signed the transition, so
    _initialize_contour refused to parent the hole and it was emitted as a
    standalone POSITIVE face (B\\A measured larger than B). Seam-typed
    events now derive the transition from seam type + own parity. Both
    engines, exact expected areas."""
    A = P.Polygon([(10., -2.), (10., 5.), (-1., 5.), (-1., -2.)],
                  [[(0., -1.), (0., 4.), (9., 4.), (9., -1.)]])
    B = P.Polygon([(9., -1.), (9., 6.), (-1., 6.), (-1., -1.)],
                  [[(2., 2.), (2., 3.), (6., 3.)]])
    from aquaculture_tpu.geo import native_boolean as NB

    wants = {  # exact rectilinear/triangle algebra: |A|=32, |B|=68, |I|=15
        ("A,B", "intersection"): 15.0, ("A,B", "difference"): 17.0,
        ("A,B", "union"): 85.0, ("A,B", "xor"): 70.0,
        ("B,A", "intersection"): 15.0, ("B,A", "difference"): 53.0,
        ("B,A", "union"): 85.0, ("B,A", "xor"): 70.0,
    }
    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            for s, c, tag in ((A, B, "A,B"), (B, A, "B,A")):
                for op in ("union", "intersection", "difference", "xor"):
                    g = boolean_op(s, c, op)
                    got = 0.0 if g.is_empty else g.area
                    assert got == pytest.approx(wants[(tag, op)], abs=1e-4), \
                        (name, tag, op, got)
        finally:
            NB._lib = lib


def test_diagonal_collinear_overlap_cross_operand():
    """Round-4c regression (semantic-fuzz finding #4): two triangles whose
    DIAGONAL edges are exactly collinear with a partial overlap (A's edge
    (6,-4)->(4,-2) lies on B's edge line (5,-3)->(2,0), both slope -1).
    Lattice-snapping the endpoints bends A's edge by one unit, so the
    exact parallelism test in _segment_intersection missed the overlap and
    computed a 1/sin(theta)-amplified crossing between the nearly-parallel
    segments — UNION returned EMPTY. Collinearity now uses the same
    sa_snap band as the comparator. Both engines, areas pinned against the
    raster oracle."""
    A = P.Polygon([(-2.0, -4.0), (6.0, -4.0), (4.0, -2.0)])
    B = P.Polygon([(-6.0, -1.0), (5.0, -3.0), (2.0, 0.0)])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            res = {op: boolean_op(A, B, op)
                   for op in ("union", "intersection", "difference", "xor")}
            dba = boolean_op(B, A, "difference")
        finally:
            NB._lib = lib
        for op, g in res.items():
            r = _raster_boolean_area(A, B, op, n=2048)
            got = 0.0 if g.is_empty else g.area
            assert got == pytest.approx(r, rel=2e-2, abs=2e-2), (name, op, got, r)
        au, ai = res["union"].area, res["intersection"].area
        assert au + ai == pytest.approx(A.area + B.area, abs=1e-4), name
        assert res["difference"].area + dba.area == pytest.approx(
            res["xor"].area, abs=1e-4), name


def test_vertex_on_vertical_edge_parity():
    """Round-4c regression (semantic-fuzz finding #5): a clipping vertex
    lying exactly ON the subject's VERTICAL edge, with another clipping
    edge passing through the subject's corner. A vertical edge lives in
    the status line only while the sweep sits at its own x, yet it served
    as `prev` for the parity fields of edges starting on it; the published
    algorithm's one-step is_vertical correction mis-signs this cross-
    operand chain, so the star's outside lobe was marked not-in-result and
    UNION lost it entirely (u+i != |A|+|B|). _parity_prev / parity_prev
    now skip verticals when chaining fields (an upward ray at x+eps never
    crosses a vertical at x). Both engines."""
    A = P.Polygon([(9., 0.), (9., 8.), (0., 8.), (0., 0.)])
    B = P.Polygon([(8., 1.), (11., -2.), (9., 4.), (11., 5.), (2., 10.)])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            res = {op: boolean_op(A, B, op)
                   for op in ("union", "intersection", "difference", "xor")}
            dba = boolean_op(B, A, "difference")
        finally:
            NB._lib = lib
        for op, g in res.items():
            r = _raster_boolean_area(A, B, op, n=2048)
            got = 0.0 if g.is_empty else g.area
            assert got == pytest.approx(r, rel=2e-2, abs=2e-2), (name, op, got, r)
        au, ai = res["union"].area, res["intersection"].area
        assert au + ai == pytest.approx(A.area + B.area, abs=1e-4), name
        assert res["difference"].area + dba.area == pytest.approx(
            res["xor"].area, abs=1e-4), name


def test_needle_through_opposite_corners_stale_parity():
    """Round-4d regression (semantic-fuzz --seed 777 case 2034): a needle
    operand whose two long parallel edges pass EXACTLY through opposite
    corners of a box. Processing the box-top's left event at the corner
    splits the needle edge at that same point, but the box-top's parity
    fields were already chained off the UN-split edge — whose fields
    describe the cross-section left of the corner — and every later
    insert above it inherited the stale chain: union and B\\A dropped a
    0.5-area face of the needle (the sliver just outside the corner) and
    difference emitted a degenerate spike through the needle's vertex.
    _subdivide now re-queues a left event when its insertion splits a
    status neighbor exactly at the event's own point, replaying it after
    the neighbor's right event and continuation piece. Both engines."""
    A = P.box(2, 3, 9, 9)
    B = P.Polygon([(12., 0.), (2., 10.), (0., 11.), (5., 6.)])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            res = {op: boolean_op(A, B, op)
                   for op in ("union", "intersection", "difference", "xor")}
            dba = boolean_op(B, A, "difference")
        finally:
            NB._lib = lib
        for op, g in res.items():
            r = _raster_boolean_area(A, B, op, n=2048)
            got = 0.0 if g.is_empty else g.area
            assert got == pytest.approx(r, rel=2e-2, abs=2e-2), (name, op, got, r)
        au, ai = res["union"].area, res["intersection"].area
        assert au + ai == pytest.approx(A.area + B.area, abs=1e-4), name
        assert res["difference"].area + dba.area == pytest.approx(
            res["xor"].area, abs=1e-4), name
        # the B\A sliver outside the corner must survive (1.5, not 1.0)
        assert dba.area == pytest.approx(2.25, abs=1e-4), name


def test_pinwheel_scaled_copy_overlap_remark():
    """Round-5 regression (semantic-fuzz pinwheel + vertex-coincidence
    case): a MultiPolygon pinwheel of wedges sharing ONE apex, unioned
    with a tiny SCALED COPY of itself placed apex-on-apex. The copy's
    edges are near-collinear with the big wedges' edges (off by ~1
    lattice unit), so the _sa_snap collinearity band merges them into
    equal-segment cross-operand overlaps — and the SAME/DIFFERENT
    transition marking in _possible_intersection read the upper event's
    in_out parity from BEFORE the lower operand's base edge was inserted
    below it. The stale comparison typed the kept edge
    DIFFERENT_TRANSITION and union dropped two entire 8-area faces
    (32 -> 16). _remark_overlap re-derives the type after the caller's
    field refresh. Both engines."""
    A = P.MultiPolygon([P.Polygon(np.array(r)) for r in [
        [[-2.0, 2.0], [-3.0, -6.0], [-1.0, -6.0]],
        [[-2.0, 2.0], [-1.0, 10.0], [-3.0, 10.0]],
        [[-2.0, 2.0], [6.0, 1.0], [6.0, 3.0]],
        [[-2.0, 2.0], [-10.0, 3.0], [-10.0, 1.0]]]])
    B = P.MultiPolygon([P.Polygon(np.array(r)) for r in [
        [[-2.0, 2.0], [-2.0003481554517206, 1.9972147563862372],
         [-1.9996518445482794, 1.9972147563862372]],
        [[-2.0, 2.0], [-2.0027852436137623, 2.00034815545172],
         [-2.0027852436137623, 1.9996518445482798]],
        [[-2.0, 2.0], [-1.9972147563862377, 1.9996518445482798],
         [-1.9972147563862377, 2.00034815545172]],
        [[-2.0, 2.0], [-1.9996518445482794, 2.0027852436137628],
         [-2.0003481554517206, 2.0027852436137628]]]])
    from aquaculture_tpu.geo import native_boolean as NB

    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            res = {op: boolean_op(A, B, op)
                   for op in ("union", "intersection", "difference", "xor")}
            dba = boolean_op(B, A, "difference")
        finally:
            NB._lib = lib
        # B is ~4e-6 area: union/difference/xor must essentially equal A
        assert res["union"].area == pytest.approx(32.0, abs=1e-3), name
        assert res["difference"].area == pytest.approx(32.0, abs=1e-3), name
        assert res["xor"].area == pytest.approx(32.0, abs=1e-3), name
        assert res["intersection"].area < 1e-4, name
        # same-lattice identities
        assert res["union"].area == pytest.approx(
            res["intersection"].area + res["difference"].area + dba.area,
            abs=1e-6), name


def test_self_touching_hole_operands_normalized():
    """Round-5 regression (semantic-fuzz pinched-donut class): operands
    whose HOLES touch their own shell or each other at a vertex. After
    the joint-lattice snap the contact rounds ~1 unit off, and before the
    fix the sweep either left zero-width twin seam edges that flipped a
    face's shell/hole classification (union gained a spurious +8 island)
    or the connect walk threaded a figure-eight through the pinch and
    union came back EMPTY. Operands are now normalized on the lattice
    (shell minus dissolved holes — _normalize_polygon_rings) before the
    main sweep; the seam-twin cancellation guards the residual class in
    both engines."""
    from aquaculture_tpu.geo import native_boolean as NB

    cases = [
        # hole pinches the OTHER operand-relevant geometry (minimal case)
        (P.Polygon(np.array([[2., -6], [2, 6], [-6, 6], [-6, -6]]),
                   [np.array([[-5., 0], [-3, 2], [-1, 0], [-3, -2]])]),
         P.Polygon(np.array([[6., -4], [6, 5], [-4, 5], [-4, -4]]),
                   [np.array([[-4., -1], [-1, 2], [2, -1], [-1, -4]])])),
        # two holes sharing a vertex + a hole pinching the shell (the
        # union-returns-EMPTY fuzz case)
        (P.Polygon(np.array([[7., -1], [7, 9], [-3, 9], [-3, -1]]),
                   [np.array([[1., 1], [3, 3], [5, 1], [3, -1]]),
                    np.array([[1., 5], [3, 7], [5, 5], [3, 3]])]),
         P.Polygon(np.array([[6., -5], [6, 3], [-5, 3], [-5, -5]]),
                   [np.array([[-2., -2], [1, 1], [4, -2], [1, -5]])])),
    ]
    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for A, B in cases:
        for name in engines:
            lib = NB._lib
            if name == "python":
                NB._lib = None
            try:
                res = {op: boolean_op(A, B, op)
                       for op in ("union", "intersection", "difference", "xor")}
                dba = boolean_op(B, A, "difference")
            finally:
                NB._lib = lib
            au = res["union"].area
            s = (res["intersection"].area + res["difference"].area + dba.area)
            assert au == pytest.approx(s, rel=1e-6), (name, au, s)
            assert res["xor"].area == pytest.approx(
                res["difference"].area + dba.area, rel=1e-6), name
            assert au > 0, (name, "union must not be empty")
            # cross-check against the rasterized oracle
            for op, g in res.items():
                r = _raster_boolean_area(A, B, op, n=2048)
                got = 0.0 if g.is_empty else g.area
                assert got == pytest.approx(r, rel=2e-2, abs=2e-2), (name, op, got, r)


def test_sublattice_duplicate_vertex_union():
    """Round-5 corpus audit: real humanlabels intermediates carry
    micrometer-scale vertex pairs (1.5e-6 m at ~25 m extents); after the
    joint-lattice snap these became 2-unit micro edges and the union of
    two ordinary overlapping polygons returned EMPTY (-349 m² per such
    merge). _clean_lattice_ring collapses sub-lattice features before the
    sweep. Both engines."""
    from aquaculture_tpu.geo import native_boolean as NB

    A = P.Polygon(np.array([
        [4072616.0560625624, 2268888.755815394], [4072617.655137125, 2268888.690532425],
        [4072617.655137125, 2268888.690530939],  # 1.5 um from its neighbor
        [4072618.5556280357, 2268888.6537671587], [4072622.4769093012, 2268888.493677343],
        [4072623.163526357, 2268888.4656456355], [4072623.0740605104, 2268886.1366072474],
        [4072632.0467418022, 2268885.770300612], [4072632.136204181, 2268888.0993394954],
        [4072632.3906980767, 2268888.0889497856], [4072632.6792181246, 2268895.6001785584],
        [4072627.3517932473, 2268895.8176688966], [4072627.4060637774, 2268897.230492599],
        [4072616.398874443, 2268897.67986886]]))
    B = P.Polygon(np.array([
        [4072609.0057195667, 2268889.0436608577], [4072619.808191085, 2268888.6026299116],
        [4072619.8724212293, 2268890.2746893847], [4072621.693685955, 2268890.2003348973],
        [4072621.6623832504, 2268889.3854517443], [4072623.04217349, 2268889.329121481],
        [4072623.0092467256, 2268888.471944485], [4072631.389784662, 2268888.1298108012],
        [4072631.692815151, 2268896.0187711283], [4072631.4194720965, 2268896.029929947],
        [4072631.5026162495, 2268898.1944561377], [4072626.0989116086, 2268898.41506255],
        [4072626.209605279, 2268901.2967463615], [4072622.1436485536, 2268901.46274258],
        [4072622.2054311144, 2268903.071094556], [4072619.094397878, 2268903.198106578],
        [4072619.2034803345, 2268906.037753475], [4072609.782977541, 2268906.4223642326],
        [4072609.627776384, 2268902.382303215], [4072609.3942782367, 2268902.3918359457],
        [4072609.06709307, 2268893.874816812], [4072609.19111593, 2268893.8697532886]]))
    engines = ["native"] if NB.load_library() is not None else []
    engines.append("python")
    for name in engines:
        lib = NB._lib
        if name == "python":
            NB._lib = None
        try:
            u = boolean_op(A, B, "union")
            i = boolean_op(A, B, "intersection")
        finally:
            NB._lib = lib
        want = A.area + B.area - i.area
        assert u.area == pytest.approx(want, rel=1e-4), (name, u.area, want)
        assert u.area > 300, name


@pytest.mark.xfail(reason="known residual class (round 5): two union-tree "
                   "intermediates sharing a LONG near-duplicate boundary "
                   "run (sub-quantum offsets snap into chained overlap "
                   "merges) can still split the outer ring at a "
                   "degenerate multi-visit point; the corpus-level impact "
                   "after the round-5 fixes is ~1.4% on the 4,142-cage "
                   "dissolve (133.3k vs the 135.2k Monte-Carlo oracle, "
                   "from 6.2% before)", strict=False)
def test_near_duplicate_boundary_run_union():
    from aquaculture_tpu.geo import native_boolean as NB

    A = P.Polygon(np.array([
        [4072597.6312563606, 2268896.2053702455], [4072602.814958491, 2268895.9937248584],
        [4072602.7675134134, 2268894.7587140887], [4072603.357540616, 2268894.7346246643],
        [4072603.2646708, 2268892.3171887165], [4072604.6935305283, 2268892.258850586],
        [4072604.6098377933, 2268890.080244946], [4072613.074947477, 2268889.734634422],
        [4072613.042073359, 2268888.878866744], [4072612.41983342, 2268888.9042715286],
        [4072612.2883130917, 2268885.4806068903], [4072613.8346939054, 2268885.4174737437],
        [4072613.8244079417, 2268885.149720332], [4072625.091799488, 2268884.689717946],
        [4072625.2335975543, 2268888.381135173], [4072621.8896367964, 2268888.5176553484],
        [4072622.0038526193, 2268891.4909824906], [4072614.616432093, 2268891.792583995],
        [4072614.620030206, 2268891.886258327], [4072615.7623537807, 2268891.839619411],
        [4072616.0822584433, 2268900.1673303675], [4072613.7556193243, 2268900.2623208817],
        [4072613.9338896214, 2268904.9029859817], [4072611.849606533, 2268904.988082919],
        [4072611.86975317, 2268905.512536279], [4072606.812593731, 2268905.719011538],
        [4072606.834833097, 2268906.2979030167], [4072598.0327906436, 2268906.657280806]]))
    B = P.Polygon(np.array([
        [4072609.0057195667, 2268889.043661097], [4072619.8081910913, 2268888.60262963],
        [4072623.0092465687, 2268888.471944142], [4072623.163526171, 2268888.465645623],
        [4072623.074060587, 2268886.1366072963], [4072632.0467415764, 2268885.77030052],
        [4072632.136204403, 2268888.099339536], [4072631.3897847054, 2268888.1298105274],
        [4072631.6928153858, 2268896.018771183], [4072631.4194719153, 2268896.029930254],
        [4072631.5026162313, 2268898.1944563836], [4072626.0989119345, 2268898.415062421],
        [4072626.209605121, 2268901.296746362], [4072622.1436485723, 2268901.462742713],
        [4072622.205430864, 2268903.0710944855], [4072619.0943979584, 2268903.1981064687],
        [4072619.2034801524, 2268906.037753635], [4072609.782977675, 2268906.422364514],
        [4072609.6277764225, 2268902.382303104], [4072609.394278308, 2268902.3918360164],
        [4072609.0670930785, 2268893.874817092], [4072609.191116074, 2268893.8697531847]]))
    u = boolean_op(A, B, "union")
    i = boolean_op(A, B, "intersection")
    want = A.area + B.area - i.area
    assert u.area == pytest.approx(want, rel=1e-3), (u.area, want)


def test_corpus_dissolve_tracks_mc_oracle(reference_output_dir):
    """The 4,142-cage humanlabels dissolve vs the round-5 Monte-Carlo
    point oracle (135,200 +/- 700 m²; scripts in the round-5 audit).
    Pre-round-5 the generic union tree measured 127,302 (-5.8%) from
    corpus-span re-quantization, sub-lattice operand features, and
    connect-walk degeneracies; member-level bbox partitioning + Morton
    leaf ordering + lattice ring cleaning recover it to ~133,300 (-1.4%,
    the xfail class above owns most of the residual). This bracket
    guards against regressing toward either failure regime."""
    from aquaculture_tpu import frame
    from aquaculture_tpu.geo.boolean import union_area

    gdf = frame.read_file(str(reference_output_dir / "humanlabels.geojson")).to_crs(3035)
    geoms = [g for g in gdf.geometry if g is not None and not g.is_empty]
    v = union_area(geoms)
    assert 132000.0 < v < 137000.0, v
