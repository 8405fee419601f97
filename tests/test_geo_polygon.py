"""Geometry engine tests: predicates, measures, overlay, region algebra."""

import numpy as np
import pytest

from aquaculture_tpu.geo import polygon as P
from aquaculture_tpu.geo import region as R
from aquaculture_tpu.geo.io import from_wkt, to_wkt


def test_box_area_bounds_centroid():
    b = P.box(0, 0, 4, 2)
    assert b.area == pytest.approx(8.0)
    assert b.bounds == (0, 0, 4, 2)
    c = b.centroid
    assert (c.x, c.y) == (pytest.approx(2.0), pytest.approx(1.0))


def test_polygon_with_hole():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(2, 2), (4, 2), (4, 4), (2, 4)]
    p = P.Polygon(outer, [hole])
    assert p.area == pytest.approx(100 - 4)
    assert p.contains_point(1, 1)
    assert not p.contains_point(3, 3)


def test_intersects_predicate():
    a = P.box(0, 0, 2, 2)
    b = P.box(1, 1, 3, 3)
    c = P.box(5, 5, 6, 6)
    t = P.box(2, 0, 4, 2)  # touching edge
    assert P.intersects(a, b)
    assert not P.intersects(a, c)
    assert P.intersects(a, t)  # boundary contact counts (shapely semantics)
    # containment without edge crossing
    inner = P.box(0.5, 0.5, 1.0, 1.0)
    assert P.intersects(a, inner)
    # point in polygon
    assert P.intersects(P.Point(1, 1), a)
    assert not P.intersects(P.Point(10, 10), a)


def test_intersects_hole_aware():
    """Regression (round 4): a box straddling a HOLE edge intersects the
    polygon even though it crosses no exterior ring and its first vertex
    may sit inside the hole — hole rings are boundary too."""
    lake = P.Polygon(
        np.asarray(P.box(0, 0, 100, 100).exterior, float),
        holes=[np.asarray(P.box(40, 40, 60, 60).exterior, float)],
    )
    straddle = P.box(38, 48, 44, 52)  # 2x4 overlap with solid land
    assert P.intersects(lake, straddle)
    assert P.intersects(straddle, lake)
    assert lake.intersection(straddle).area == pytest.approx(8.0)
    # fully inside the hole: disjoint
    inside_hole = P.box(45, 45, 55, 55)
    assert not P.intersects(lake, inside_hole)
    assert lake.intersection(inside_hole).is_empty
    # touching the hole edge from inside the hole: boundary contact
    assert P.intersects(lake, P.box(40, 45, 50, 55))
    # hole-ring vs hole-ring contact between two hole-y polygons
    donut2 = P.Polygon(
        np.asarray(P.box(30, 30, 70, 70).exterior, float),
        holes=[np.asarray(P.box(40, 40, 60, 60).exterior, float)],
    )
    assert P.intersects(lake, donut2)


def test_intersection_boxes_exact():
    a = P.box(0, 0, 2, 2)
    b = P.box(1, 1, 3, 3)
    i = P.intersection(a, b)
    assert i.area == pytest.approx(1.0)
    assert i.bounds == (1, 1, 2, 2)


def test_difference_box_minus_box():
    a = P.box(0, 0, 4, 4)
    b = P.box(1, 1, 3, 3)
    d = P.difference(a, b)
    assert d.area == pytest.approx(16 - 4)
    # The hole region is excluded
    assert not d.contains_point(2, 2) if hasattr(d, "contains_point") else True
    # Difference with non-overlapping geom is identity
    d2 = P.difference(a, P.box(10, 10, 11, 11))
    assert d2.area == pytest.approx(16)


def test_union_and_unary_union_rectilinear():
    a = P.box(0, 0, 2, 2)
    b = P.box(1, 0, 3, 2)   # overlapping
    u = P.union(a, b)
    assert u.area == pytest.approx(6.0)  # dissolved, not 8
    uu = P.unary_union([a, b, P.box(10, 10, 11, 11)])
    assert uu.area == pytest.approx(7.0)


def test_greedy_coverage_difference_chain():
    # The dedup pattern (reference utils.py:256-269): successively subtract
    # existing coverage.
    boxes = [P.box(0, 0, 2, 2), P.box(1, 0, 3, 2), P.box(2, 0, 4, 2)]
    coverage = boxes[0]
    kept = [boxes[0]]
    for b in boxes[1:]:
        nb = P.difference(b, coverage)
        kept.append(nb)
        coverage = P.union(coverage, nb)
    assert kept[1].area == pytest.approx(2.0)   # [2,3] x [0,2]
    assert kept[2].area == pytest.approx(2.0)   # [3,4] x [0,2]
    assert coverage.area == pytest.approx(8.0)
    total = sum(k.area for k in kept)
    assert total == pytest.approx(8.0)


def test_convex_clip_triangles():
    tri = P.Polygon([(0, 0), (4, 0), (0, 4)])
    sq = P.box(1, 1, 5, 5)
    i = P.intersection(tri, sq)
    # Triangle ∩ square: region x>=1,y>=1,x+y<=4 -> right triangle legs 2
    assert i.area == pytest.approx(2.0)


def test_intersection_area_raster_fallback():
    # Two rotated (non-convex-marked) shapes trigger raster path via
    # intersection_area on non-convex star polygon.
    star = P.Polygon([(0, 0), (4, 1), (8, 0), (7, 4), (8, 8), (4, 7), (0, 8), (1, 4)])
    sq = P.box(0, 0, 8, 8)
    a = P.intersection_area(star, sq)
    assert a == pytest.approx(star.area, rel=0.05)


def test_region_algebra_exactness():
    a = R.Region(np.array([[0, 0, 2, 2], [2, 0, 4, 1]]))
    b = R.Region(np.array([[1, 0, 3, 3]]))
    assert a.intersection(b).area == pytest.approx(1 * 2 + 1 * 1)
    assert a.difference(b).area == pytest.approx(a.area - 3.0)
    assert a.union(b).area == pytest.approx(a.area + b.area - 3.0)


def test_region_from_to_geometry_roundtrip():
    g = P.difference(P.box(0, 0, 4, 4), P.box(1, 1, 3, 3))
    reg = R.from_geometry(g)
    assert reg.area == pytest.approx(12.0)
    g2 = R.to_geometry(reg)
    assert g2.area == pytest.approx(12.0)


def test_centroid_weighted_multipolygon():
    mp = P.MultiPolygon([P.box(0, 0, 1, 1), P.box(2, 0, 4, 1)])
    c = mp.centroid
    # areas 1 and 2, centroids (0.5,0.5) and (3,0.5)
    assert c.x == pytest.approx((0.5 * 1 + 3 * 2) / 3)
    assert c.y == pytest.approx(0.5)


def test_simplify_collinear():
    ring = [(0, 0), (1, 0), (2, 0), (2, 2), (0, 2)]
    p = P.Polygon(ring)
    s = p.simplify(0.01)
    assert s.area == pytest.approx(p.area)
    assert len(s.exterior) == 4


def test_wkt_roundtrip():
    p = P.box(328356.83256960544, 5285567.07623245, 329556.83256960544, 5286767.07623245)
    w = to_wkt(p)
    p2 = from_wkt(w)
    assert p2.area == pytest.approx(p.area)
    assert p2.bounds == pytest.approx(p.bounds)
    mp = P.MultiPolygon([P.box(0, 0, 1, 1), P.box(2, 2, 3, 3)])
    mp2 = from_wkt(to_wkt(mp))
    assert mp2.area == pytest.approx(2.0)
    assert isinstance(from_wkt("POLYGON EMPTY"), P.Empty) or from_wkt("POLYGON EMPTY").is_empty


def test_wkt_parse_reference_format(reference_data_dir):
    # Parse the real wanted_bboxes.csv WKT strings (reference data artifact).
    import pandas as pd

    df = pd.read_csv(reference_data_dir / "wanted_bboxes.csv", index_col=0, nrows=50)
    from aquaculture_tpu.geo.io import from_wkt as fw

    geoms = [fw(w) for w in df["geometry"]]
    for g in geoms:
        assert g.area == pytest.approx(1200.0 * 1200.0, rel=1e-9)


def test_transform_polygon_vertices():
    p = P.box(0, 0, 1, 1)
    q = p.transform(lambda x, y: (x * 2, y + 10))
    assert q.bounds == (0, 10, 2, 11)
    assert q.area == pytest.approx(2.0)


def test_is_rectangle():
    from aquaculture_tpu.geo.polygon import Polygon, box

    assert box(0, 0, 10, 5).is_rectangle
    assert not Polygon([(0, 0), (10, 0), (5, 8)]).is_rectangle          # triangle
    assert not Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                       holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]).is_rectangle
    assert not Polygon([(0, 0), (10, 0), (12, 10), (0, 10)]).is_rectangle  # skewed


def test_sjoin_rect_fast_path_matches_exact():
    import numpy as np

    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo.polygon import Polygon, box, intersects

    rng = np.random.default_rng(0)
    n = 60
    left_geoms, right_geoms = [], []
    for i in range(n):
        x, y = rng.uniform(0, 500, 2)
        w, h = rng.uniform(5, 50, 2)
        left_geoms.append(box(x, y, x + w, y + h))
        x, y = rng.uniform(0, 500, 2)
        if i % 3 == 0:  # mix in non-rectangles on the right
            right_geoms.append(Polygon([(x, y), (x + 40, y), (x + 20, y + 35)]))
        else:
            right_geoms.append(box(x, y, x + 30, y + 30))
    L = gf.GeoFrame({"i": range(n)}, geometry=left_geoms, crs=3857)
    R = gf.GeoFrame({"j": range(n)}, geometry=right_geoms, crs=3857)
    joined = L.sjoin(R, how="inner", predicate="intersects")
    # oracle: brute-force exact predicate
    expected = {
        (i, j)
        for i in range(n)
        for j in range(n)
        if intersects(left_geoms[i], right_geoms[j])
    }
    got = set(zip(joined.index, joined["index_right"].astype(int)))
    assert got == expected


def test_centroid_and_area_precision_at_projected_magnitudes():
    """Regression: shoelace cancellation at EPSG:3035-scale coordinates
    displaced small-polygon centroids by ~100 m (found via DBSCAN giving
    all-noise on correctly spaced cages)."""
    import numpy as np

    from aquaculture_tpu.geo.polygon import Polygon

    ox, oy = 3086730.0, -2291272.0  # real 3035 magnitudes
    # ~2x2 m quadrilateral, slightly rotated
    ring = [
        (ox + 0.0, oy + 0.0),
        (ox + 2.0, oy + 0.1),
        (ox + 1.9, oy + 2.1),
        (ox - 0.1, oy + 2.0),
    ]
    p = Polygon(ring)
    c = p.centroid
    assert abs(c.x - (ox + 0.95)) < 0.01
    assert abs(c.y - (oy + 1.05)) < 0.01
    # area matches the same polygon at the origin
    p0 = Polygon([(x - ox, y - oy) for x, y in ring])
    assert abs(p.area - p0.area) < 1e-6


def test_overlay_intersection_difference_union():
    """GeoFrame.overlay matches gpd.overlay semantics on analytic cases
    (reference consumers: src/utils.py:241-273, create_land_filter.py:134)."""
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo.boolean import union_area
    from aquaculture_tpu.geo.polygon import box

    A = gf.GeoFrame({"ida": [0, 1], "tag": ["a0", "a1"]},
                    geometry=[box(0, 0, 4, 4), box(10, 0, 14, 4)], crs=3857)
    B = gf.GeoFrame({"idb": [7], "tag": ["b"]},
                    geometry=[box(2, 2, 12, 6)], crs=3857)

    inter = A.overlay(B, how="intersection")
    assert len(inter) == 2
    assert sorted(round(g.area, 9) for g in inter["geometry"]) == [4.0, 4.0]
    # gpd suffixes colliding columns _1/_2
    assert {"ida", "idb", "tag_1", "tag_2"} <= set(inter.columns)

    diff = A.overlay(B, how="difference")
    assert len(diff) == 2
    assert sum(g.area for g in diff["geometry"]) == pytest.approx(32 - 8, abs=1e-9)
    assert set(diff.columns) == set(A.columns)  # no other-side columns

    uni = A.overlay(B, how="union")
    total = sum(g.area for g in uni["geometry"])
    all_geoms = list(A["geometry"]) + list(B["geometry"])
    assert total == pytest.approx(union_area(all_geoms), abs=1e-6)

    sym = A.overlay(B, how="symmetric_difference")
    assert sum(g.area for g in sym["geometry"]) == pytest.approx(
        32 + 40 - 2 * 8, abs=1e-6
    )

    ident = A.overlay(B, how="identity")
    assert sum(g.area for g in ident["geometry"]) == pytest.approx(32.0, abs=1e-6)


def test_overlay_fuzz_area_invariants():
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo.boolean import union_area
    from aquaculture_tpu.geo.polygon import box

    rng = np.random.default_rng(11)
    def rand_frame(ox, oy):
        # internally-disjoint layer (grid cells, random sub-boxes): the
        # union-partition invariant only holds when rows within a layer
        # don't overlap each other (same as gpd.overlay)
        geoms = []
        for gx in range(3):
            for gy in range(3):
                x0, y0 = ox + 20 * gx, oy + 20 * gy
                x = x0 + rng.uniform(0, 4)
                y = y0 + rng.uniform(0, 4)
                w, h = rng.uniform(6, 14, 2)
                geoms.append(box(x, y, x + w, y + h))
        return gf.GeoFrame({"k": range(9)}, geometry=geoms, crs=3857), geoms

    A, ag = rand_frame(0, 0)
    B, bg = rand_frame(7, 5)
    uni = A.overlay(B, how="union")
    # union pieces partition A ∪ B exactly (within lattice tolerance)
    ua = union_area(ag + bg)
    assert sum(g.area for g in uni["geometry"]) == pytest.approx(ua, rel=1e-4)
    diff = A.overlay(B, how="difference")
    inter_ab = union_area(ag) - sum(g.area for g in diff["geometry"])
    sym = A.overlay(B, how="symmetric_difference")
    assert sum(g.area for g in sym["geometry"]) == pytest.approx(
        ua - inter_ab, rel=1e-4
    )


def test_boundary_and_total_bounds():
    from aquaculture_tpu import frame as gf

    ring = P.Polygon(P.box(0, 0, 10, 10).exterior, [P.box(3, 3, 5, 5).exterior])
    b = ring.boundary
    assert len(b) == 2 and all(isinstance(l, P.LineString) for l in b)
    assert b[0].length == pytest.approx(40.0)
    assert b[1].length == pytest.approx(8.0)
    # closed rings: polygonize can rebuild the polygon from its boundary
    from aquaculture_tpu.geo.lines import polygonize
    polys = polygonize(b)
    assert sum(p.area for p in polys) == pytest.approx(100 + 4, abs=1e-9) or \
           sum(p.area for p in polys) == pytest.approx(100, abs=1e-9)

    mp = P.MultiPolygon([P.box(0, 0, 1, 1), P.box(2, 2, 3, 3)])
    assert len(mp.boundary) == 2

    A = gf.GeoFrame({"k": [0, 1]},
                    geometry=[P.box(0, 0, 4, 4), P.box(10, -2, 14, 3)], crs=3857)
    tb = A.total_bounds
    np.testing.assert_allclose(tb, [0, -2, 14, 4])

    # gpd edge-case parity: empty / all-missing frames -> NaN array, no raise
    import warnings

    empty = gf.GeoFrame({"geometry": []})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert np.all(np.isnan(empty.total_bounds))
        allnone = gf.GeoFrame({"geometry": [None, None]})
        assert np.all(np.isnan(allnone.total_bounds))


def test_boolean_op_rejects_non_polygonal_operands():
    import pytest as _pt

    from aquaculture_tpu.geo.boolean import boolean_op

    pt = P.Point(100.0, 100.0)
    bx = P.box(0, 0, 1, 1)
    # Silently dropping a Point operand from union/xor would corrupt the
    # dissolve; the engine fails loudly instead.
    for op in ("union", "xor", "intersection", "difference"):
        with _pt.raises(TypeError):
            boolean_op(pt, bx, op)
        with _pt.raises(TypeError):
            boolean_op(bx, pt, op)
    # Empty stays a legal operand
    assert boolean_op(P.EMPTY, bx, "union").area == 1.0


# ---------------------------------------------------------------- round-4c


def test_shapefile_null_shape_roundtrip(tmp_path):
    """read->write round-trip of a frame containing Empty/None geometries
    writes spec SHAPE_NULL records instead of crashing (read_shapefile
    itself emits Empty for null shapes)."""
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo.shapefile import read_shapefile, write_shapefile

    f = gf.GeoFrame(
        {"name": ["a", "b", "c"]},
        geometry=[P.box(0, 0, 1, 1), P.EMPTY, None],
    )
    f.crs = 4326
    base = str(tmp_path / "nulls")
    write_shapefile(base, f)
    back = read_shapefile(base + ".shp")
    assert len(back) == 3
    assert back["geometry"].iloc[0].area == pytest.approx(1.0)
    assert back["geometry"].iloc[1].is_empty
    assert back["geometry"].iloc[2].is_empty


def test_buffer_linestring_capsule_band():
    """Polyline dilation (the reference's shoreline buffer use-case) yields
    a capsule band; erosion of a line is empty."""
    from aquaculture_tpu.geo.buffer import buffer

    line = P.LineString([(0, 0), (10, 0)])
    band = buffer(line, 1.0)
    # capsule area = 2*r*len + pi*r^2
    assert band.area == pytest.approx(20 + np.pi, rel=5e-2)
    assert buffer(line, -1.0).is_empty
    ml = P.MultiLineString([[(0, 0), (10, 0)], [(0, 5), (10, 5)]])
    band2 = buffer(ml, 1.0)
    assert band2.area == pytest.approx(2 * (20 + np.pi), rel=5e-2)


def test_sjoin_within_point_right_frame():
    """predicate='within' against Point right-frame geometries matches
    only identical points instead of raising."""
    from aquaculture_tpu import frame as gf

    left = gf.GeoFrame({"i": [0, 1]}, geometry=[P.Point(1, 1), P.Point(2, 2)])
    left.crs = 3857
    right = gf.GeoFrame({"j": [0]}, geometry=[P.Point(1, 1)])
    right.crs = 3857
    out = left.sjoin(right, how="inner", predicate="within")
    assert list(out["i"]) == [0]


def test_centroid_none_geometry_guarded():
    from aquaculture_tpu import frame as gf

    f = gf.GeoFrame({"i": [0, 1]}, geometry=[P.box(0, 0, 2, 2), None])
    f.crs = 3857
    c = f.centroid
    assert c.iloc[0].x == pytest.approx(1.0)
    assert c.iloc[1] is None


def test_label_is_4_connected_like_rasterio():
    """Diagonal (corner-touching) pixels are SEPARATE shapes — matching
    rasterio.features.shapes' 4-connectivity (reference utils.py:513) and
    guaranteeing single-ring boundaries (the pinched-boundary lobe-drop)."""
    from aquaculture_tpu.geo.rasterize import largest_region_polygon, shapes

    mask = np.zeros((4, 4), bool)
    mask[0, 0] = mask[1, 1] = True
    got = shapes(mask)
    assert len(got) == 2
    assert largest_region_polygon(mask).area == pytest.approx(1.0)


def test_write_feature_collection_numpy_nan_is_null(tmp_path):
    import json

    from aquaculture_tpu.geo.io import write_feature_collection

    path = str(tmp_path / "x.geojson")
    write_feature_collection(
        path, [{"v": np.float64("nan")}], [P.box(0, 0, 1, 1)], crs=4326
    )
    data = json.load(open(path))  # strict parser: bare NaN would raise
    assert data["features"][0]["properties"]["v"] is None
