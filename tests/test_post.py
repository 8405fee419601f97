"""Postprocessing tests: geocode math, areas, dedup region algebra, DBSCAN
vs the sklearn oracle, facility aggregation."""

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import LARGE_TIF_SIZE
from aquaculture_tpu.data.filenames import TileSpec
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.post.areas import cage_areas, circle_areas, square_areas
from aquaculture_tpu.post.cluster import cluster_facilities, dbscan, predictions_cluster
from aquaculture_tpu.post.dedup import deduplicate_download_boxes, deduplicate_gdf_with_bboxes
from aquaculture_tpu.post.geocode import (
    geocode_detections,
    pixels_to_mercator,
    remove_land_detections,
    yolo_norm_to_pixels,
)


def _boxes_frame(bounds_list, crs=3857):
    geoms = [_poly.box(*b) for b in bounds_list]
    out = gf.GeoFrame({"dummy": range(len(geoms))}, geometry=geoms, crs=crs)
    return out


# ---------------------------------------------------------------- geocode


def test_yolo_norm_to_pixels_truncation():
    # reference: int(IM_WIDTH*(cx - w/2)) truncates toward zero
    boxes = np.asarray([[0.5, 0.5, 0.25, 0.125]])
    px = yolo_norm_to_pixels(boxes)
    assert px.tolist() == [[384, 448, 640, 576]]


def test_pixels_to_mercator_matches_reference_formula():
    bounds = np.asarray([[100000.0, 200000.0, 101200.0, 201200.0]])
    # pixel (0,0) of tile at offset (0,0) -> top-left corner (minx, maxy)
    x, y = pixels_to_mercator(np.r_[0.0], np.r_[0.0], np.r_[0.0], np.r_[0.0], bounds)
    assert (x[0], y[0]) == (100000.0, 201200.0)
    # pixel (6144, 6144) -> bottom-right corner
    x, y = pixels_to_mercator(
        np.r_[float(LARGE_TIF_SIZE)], np.r_[float(LARGE_TIF_SIZE)], np.r_[0.0], np.r_[0.0], bounds
    )
    assert (x[0], y[0]) == (101200.0, 200000.0)
    # offset adds linearly: pixel 512 at x_offset 1024 == pixel 1536
    x1, _ = pixels_to_mercator(np.r_[512.0], np.r_[0.0], np.r_[1024.0], np.r_[0.0], bounds)
    x2, _ = pixels_to_mercator(np.r_[1536.0], np.r_[0.0], np.r_[0.0], np.r_[0.0], bounds)
    assert x1[0] == x2[0]


def test_geocode_detections_schema_and_crs():
    dl = _boxes_frame([[0.0, 0.0, 1200.0, 1200.0]])
    specs = [TileSpec(year=2014, bbox_ind=0, x_offset=1024, y_offset=2048)]
    det = geocode_detections(
        boxes_px=np.asarray([[100, 100, 300, 200]]),
        conf=np.asarray([0.9]),
        cls_id=np.asarray([0]),
        specs=specs,
        download_bboxes=dl,
    )
    assert det.crs == 4326
    for c in ("image", "xmin", "xmax", "ymin", "ymax", "xmin_m", "xmax_m",
              "ymin_m", "ymax_m", "type", "year", "det_conf", "geometry"):
        assert c in det.columns, c
    assert det["type"].iloc[0] == "circle_farm"
    assert det["year"].iloc[0] == 2014
    # geometry is in lat/lon range
    g = det["geometry"].iloc[0]
    minx, miny, maxx, maxy = g.bounds
    assert -180 < minx < maxx < 180 and -85 < miny < maxy < 85
    # 3035 corner columns follow the reference's authority-order unpack
    # (geocode_results.py:31,177-178): the transformer returns (northing,
    # easting) and the reference stores the first as x. Verify assembly
    # against the closed-form transform directly.
    from aquaculture_tpu.geo import crs as _crs
    from aquaculture_tpu.post.geocode import pixels_to_mercator as p2m

    b = np.asarray([[0.0, 0.0, 1200.0, 1200.0]])
    xmin_m, ymax_m = p2m(np.r_[100.0], np.r_[100.0], np.r_[1024.0], np.r_[2048.0], b)
    east, north = _crs.transform(3857, 3035, xmin_m, ymax_m)
    east = float(np.asarray(east).reshape(()))
    north = float(np.asarray(north).reshape(()))
    assert det["xmin_m"].iloc[0] == pytest.approx(north)  # swapped
    assert det["ymax_m"].iloc[0] == pytest.approx(east)

    # authority_order=False gives true (easting, northing)
    det2 = geocode_detections(
        boxes_px=np.asarray([[100, 100, 300, 200]]),
        conf=np.asarray([0.9]),
        cls_id=np.asarray([0]),
        specs=specs,
        download_bboxes=dl,
        authority_order=False,
    )
    assert det2["xmin_m"].iloc[0] == pytest.approx(east)
    assert det2["ymax_m"].iloc[0] == pytest.approx(north)


def test_geocode_empty():
    dl = _boxes_frame([[0.0, 0.0, 1200.0, 1200.0]])
    det = geocode_detections(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), [], dl)
    assert len(det) == 0


def test_remove_land_detections():
    dets = gf.GeoFrame(
        {"id": [0, 1]},
        geometry=[_poly.box(0, 0, 1, 1), _poly.box(10, 10, 11, 11)],
        crs=3857,
    )
    land = gf.GeoFrame({"n": [0]}, geometry=[_poly.box(-5, -5, 5, 5)], crs=3857)
    ocean = remove_land_detections(dets, land)
    assert ocean["id"].tolist() == [1]


# ---------------------------------------------------------------- areas


def test_circle_area_no_border():
    est, var, mn, mx = circle_areas(np.r_[10.0], np.r_[6.0], np.r_[False], np.r_[False])
    assert est[0] == pytest.approx(np.pi * 5 * 3)
    assert var[0] == 0 and mn[0] == est[0] and mx[0] == est[0]


def test_circle_area_x_border():
    w, h = 10.0, 6.0
    est, var, mn, mx = circle_areas(np.r_[w], np.r_[h], np.r_[True], np.r_[False])
    assert mn[0] == pytest.approx(w * h / 2)
    assert mx[0] == pytest.approx(np.pi * (h / 2) * w / 2)
    assert est[0] == pytest.approx((mn[0] + mx[0]) / 2)
    assert var[0] == pytest.approx((mx[0] - mn[0]) ** 2 / 12)


def test_circle_area_corner():
    w, h = 8.0, 8.0
    est, var, mn, mx = circle_areas(np.r_[w], np.r_[h], np.r_[True], np.r_[True])
    assert mx[0] == pytest.approx(np.pi * h * w / 4)


def test_square_area():
    est, var, mn, mx = square_areas(np.r_[4.0], np.r_[5.0])
    assert (mn[0], mx[0]) == (10.0, 20.0)
    assert est[0] == 15.0
    assert var[0] == pytest.approx(100 / 12)


def test_cage_areas_frame():
    det = gf.GeoFrame(
        {
            "xmin": [0, 100],
            "xmax": [50, 200],
            "ymin": [10, 20],
            "ymax": [60, 120],
            "xmin_m": [0.0, 0.0],
            "xmax_m": [10.0, 8.0],
            "ymin_m": [0.0, 0.0],
            "ymax_m": [6.0, 8.0],
            "type": ["circle_farm", "square_farm"],
        },
        geometry=[_poly.box(0, 0, 1, 1)] * 2,
        crs=4326,
    )
    out = cage_areas(det)
    # row 0: circle on x border (xmin==0)
    mn = 10 * 6 / 2
    mx = np.pi * 3 * 10 / 2
    assert out["area"].iloc[0] == pytest.approx((mn + mx) / 2)
    # row 1: square
    assert out["area"].iloc[1] == pytest.approx((32 + 64) / 2)


# ---------------------------------------------------------------- dedup


def test_deduplicate_download_boxes_disjoint_cover():
    boxes = _boxes_frame(
        [
            [0.0, 0.0, 10.0, 10.0],
            [5.0, 0.0, 15.0, 10.0],   # overlaps box 0 by 5x10
            [20.0, 0.0, 30.0, 10.0],  # disjoint
            [0.0, 0.0, 10.0, 10.0],   # fully covered -> dropped
        ]
    )
    dd = deduplicate_download_boxes(boxes)
    assert dd["bbox_ind"].tolist() == [0, 1, 2]
    areas = [g.area for g in dd["geometry"]]
    assert areas[0] == pytest.approx(100.0)
    assert areas[1] == pytest.approx(50.0)
    assert areas[2] == pytest.approx(100.0)
    # total area == union area (no double counting)
    assert sum(areas) == pytest.approx(250.0)


def test_deduplicate_gdf_clips_and_drops():
    boxes = _boxes_frame([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 15.0, 10.0]])
    dd = deduplicate_download_boxes(boxes)
    gdf = gf.GeoFrame(
        {"bbox_ind": [1, 1, 0]},
        geometry=[
            _poly.box(6.0, 1.0, 8.0, 3.0),   # inside box 1's surviving strip
            _poly.box(5.5, 1.0, 9.0, 3.0),   # straddles the cut at x=10 -> clipped
            _poly.box(1.0, 1.0, 2.0, 2.0),   # in box 0 entirely
        ],
        crs=3857,
    )
    # detection fully inside the removed overlap of box 1 -> dropped
    gdf2 = gf.GeoFrame(
        {"bbox_ind": [1]}, geometry=[_poly.box(6.0, 1.0, 8.0, 3.0)], crs=3857
    )
    out = deduplicate_gdf_with_bboxes(dd, gdf2)
    assert len(out) == 0

    gdf3 = gf.GeoFrame(
        {"bbox_ind": [1, 0]},
        geometry=[_poly.box(9.0, 1.0, 12.0, 3.0), _poly.box(1.0, 1.0, 2.0, 2.0)],
        crs=3857,
    )
    out = deduplicate_gdf_with_bboxes(dd, gdf3)
    assert len(out) == 2
    # first geometry clipped to x >= 10
    assert out["geometry"].iloc[0].bounds == pytest.approx((10.0, 1.0, 12.0, 3.0))


# ---------------------------------------------------------------- dbscan


def test_dbscan_matches_sklearn():
    from sklearn.cluster import DBSCAN

    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.normal([0, 0], 1.0, (40, 2)),
            rng.normal([20, 20], 1.0, (30, 2)),
            rng.uniform(-50, 50, (20, 2)),
        ]
    )
    for eps, ms in [(2.0, 5), (3.0, 3), (1.0, 10)]:
        ours = dbscan(pts, eps, ms)
        oracle = DBSCAN(eps=eps, min_samples=ms).fit(pts).labels_
        np.testing.assert_array_equal(ours, oracle)


def test_dbscan_empty_and_all_noise():
    assert dbscan(np.zeros((0, 2)), 1.0, 3).shape == (0,)
    pts = np.asarray([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    assert (dbscan(pts, 1.0, 2) == -1).all()


# ---------------------------------------------------------------- facilities


def _cages_frame():
    # two tight clusters of 5 + 2 noise points, in EPSG:3035 meters
    pts = []
    types = []
    for cx, cy, t in [(1000.0, 1000.0, "circle_farm"), (5000.0, 5000.0, "square_farm")]:
        for k in range(5):
            pts.append((cx + 3 * k, cy))
            types.append(t)
    pts += [(9000.0, 9000.0), (12000.0, 12000.0)]
    types += ["circle_farm", "circle_farm"]
    geoms = [_poly.box(x - 5, y - 5, x + 5, y + 5) for x, y in pts]
    df = gf.GeoFrame(
        {
            "index": list(range(len(pts))),
            "type": types,
            "year": [2014] * len(pts),
            "det_conf": [0.9] * len(pts),
            "area": [10.0] * len(pts),
            "area_var": [1.0] * len(pts),
            "min_area": [5.0] * len(pts),
            "max_area": [15.0] * len(pts),
        },
        geometry=geoms,
        crs=3035,
    )
    return df


def test_cluster_facilities():
    fac = cluster_facilities(_cages_frame(), "year", distance_threshold=50.0, min_cluster_size=5)
    assert len(fac) == 2
    assert fac.crs == 3857
    assert set(fac["facility_index"]) == {0, 1}
    counts = sorted(
        (int(r["num_circle_farms"]), int(r["num_square_farms"])) for _, r in fac.iterrows()
    )
    assert counts == [(0, 5), (5, 0)]
    assert fac["noise_points"].iloc[0] == 2
    assert fac["area"].iloc[0] == pytest.approx(50.0)
    assert sorted(len(c) for c in fac["cage_ids"]) == [5, 5]
    # geometry is a Point (cluster centroid transformed to 3857)
    assert isinstance(fac["geometry"].iloc[0], _poly.Point)


def test_predictions_cluster_conf_filter():
    cages = _cages_frame()
    cages.loc[cages.index[:3], "det_conf"] = 0.1  # break up cluster 1
    fac = predictions_cluster(cages, "year", conf_thresh=0.5, distance_threshold=50.0, min_cluster_size=5)
    assert len(fac) == 1  # only the square cluster survives
    assert int(fac["num_square_farms"].iloc[0]) == 5


# ---------------------------------------------------------------- land mask


def test_land_mask_matches_sjoin_filter():
    from aquaculture_tpu.post.landmask import build_land_mask, remove_land_detections_masked

    land = gf.GeoFrame(
        {"n": [0, 1]},
        geometry=[_poly.box(0, 0, 100, 100), _poly.box(300, 0, 400, 100)],
        crs=3857,
    )
    dets = gf.GeoFrame(
        {"id": [0, 1, 2, 3]},
        geometry=[
            _poly.box(10, 10, 20, 20),     # on land 1
            _poly.box(150, 10, 160, 20),   # ocean
            _poly.box(310, 10, 320, 20),   # on land 2
            _poly.box(500, 10, 510, 20),   # outside mask bounds -> ocean
        ],
        crs=3857,
    )
    mask = build_land_mask(land, resolution_m=5.0)
    masked = remove_land_detections_masked(dets, mask)
    assert masked["id"].tolist() == [1, 3]
    # agreement with the exact sjoin path on in-bounds detections
    exact = remove_land_detections(dets, land)
    assert exact["id"].tolist() == [1, 3]


def test_hybrid_land_filter_exact_on_jagged_coast():
    """remove_land_detections_hybrid must select row-for-row the SAME
    detections as the exact sjoin filter — the boundary-cell exact pass is
    what buys that — across resolutions coarse enough that the plain mask
    path disagrees."""
    from aquaculture_tpu.post.landmask import (
        build_land_mask, remove_land_detections_hybrid)

    rng = np.random.default_rng(7)
    # jagged coastline: land is the area under a piecewise line
    xs = np.linspace(0, 1000, 41)
    ys = 400 + rng.uniform(-150, 150, len(xs))
    ring = np.concatenate(
        [np.stack([xs, ys], 1), [[1000, 0], [0, 0]]], 0)
    land = gf.GeoFrame(
        {"n": [0]}, geometry=[_poly.Polygon(ring)], crs=3857)
    n = 400
    cx = rng.uniform(-50, 1050, n)
    cy = rng.uniform(0, 800, n)   # straddles the coast band
    s = rng.uniform(2, 30, n)
    dets = gf.GeoFrame(
        {"id": np.arange(n)},
        geometry=[
            _poly.box(x - w, y - w, x + w, y + w)
            for x, y, w in zip(cx, cy, s)
        ],
        crs=3857,
    )
    exact = remove_land_detections(dets, land)
    for res in (100.0, 25.0):
        mask = build_land_mask(land, resolution_m=res, with_boundary=True)
        hyb = remove_land_detections_hybrid(dets, land, mask=mask)
        assert hyb["id"].tolist() == exact["id"].tolist(), res


def test_hybrid_land_filter_edge_cases():
    from aquaculture_tpu.post.landmask import (
        build_land_mask, remove_land_detections_hybrid)

    # MultiPolygon with a hole: a detection inside the hole is water
    outer = _poly.box(0, 0, 100, 100)
    lake = _poly.Polygon(
        np.asarray(outer.exterior, float),
        holes=[np.asarray(_poly.box(40, 40, 60, 60).exterior, float)],
    )
    land = gf.GeoFrame({"n": [0]}, geometry=[lake], crs=3857)
    dets = gf.GeoFrame(
        {"id": [0, 1, 2, 3]},
        geometry=[
            _poly.box(48, 48, 52, 52),     # inside the lake -> kept
            _poly.box(10, 10, 14, 14),     # solid land -> dropped
            _poly.box(200, 10, 204, 14),   # off-grid -> kept
            _poly.box(38, 48, 44, 52),     # straddles the lake edge -> dropped
        ],
        crs=3857,
    )
    exact = remove_land_detections(dets, land)
    mask = build_land_mask(land, resolution_m=3.0, with_boundary=True)
    hyb = remove_land_detections_hybrid(dets, land, mask=mask)
    assert hyb["id"].tolist() == exact["id"].tolist() == [0, 2]

    # empty input passes through
    empty = dets[np.zeros(4, bool)].copy()
    empty.crs = 3857
    assert len(remove_land_detections_hybrid(empty, land, mask=mask)) == 0


def test_hybrid_land_filter_4326_detections():
    """Pipeline-shaped inputs: detections in 4326 (the output CRS), land
    metric. The hybrid classifies on a mask built in the detections' CRS
    and must select exactly the sjoin-in-4326 rows."""
    from aquaculture_tpu.post.landmask import remove_land_detections_hybrid

    rng = np.random.default_rng(3)
    xs = np.linspace(450_000.0, 470_000.0, 21)
    ys = 5_200_000.0 + rng.uniform(-800, 800, len(xs))
    ring = np.concatenate(
        [np.stack([xs, ys], 1), [[470_000.0, 5_150_000.0], [450_000.0, 5_150_000.0]]], 0)
    land = gf.GeoFrame({"n": [0]}, geometry=[_poly.Polygon(ring)], crs=3857)
    n = 200
    cx = rng.uniform(449_000.0, 471_000.0, n)
    cy = rng.uniform(5_196_000.0, 5_206_000.0, n)
    s = rng.uniform(5, 40, n)
    dets_m = gf.GeoFrame(
        {"id": np.arange(n)},
        geometry=[_poly.box(x - w, y - w, x + w, y + w)
                  for x, y, w in zip(cx, cy, s)],
        crs=3857,
    )
    dets = dets_m.to_crs(4326)
    dets.crs = 4326
    exact = remove_land_detections(dets, land)
    hyb = remove_land_detections_hybrid(dets, land, resolution_m=50.0)
    assert hyb["id"].tolist() == exact["id"].tolist()


def test_hybrid_land_filter_long_chord_4326():
    """Round-4 review regression: a land polygon with one LONG straight
    segment (EEZ-style face) in 4326. The exact sjoin treats the segment
    as straight in 4326; rasterizing in 3857 would test the chord between
    reprojected vertices, which bows away from the true edge by km at this
    scale and silently drops water-side detections. The hybrid must
    classify in the detections' CRS and match the exact filter exactly."""
    from aquaculture_tpu.post.landmask import remove_land_detections_hybrid

    land = gf.GeoFrame(
        {"n": [0]},
        geometry=[_poly.Polygon(
            np.asarray([[0.0, 40.0], [10.0, 50.0], [10.0, 40.0]], float))],
        crs=4326,
    )
    # a column of boxes crossing the hypotenuse's midpoint (5, 45)
    n = 41
    cy = np.linspace(44.8, 45.2, n)
    w = 0.002
    dets = gf.GeoFrame(
        {"id": np.arange(n)},
        geometry=[_poly.box(5.0 - w, y - w, 5.0 + w, y + w) for y in cy],
        crs=4326,
    )
    exact = remove_land_detections(dets, land)
    assert 0 < len(exact) < n  # the column genuinely straddles the edge
    hyb = remove_land_detections_hybrid(dets, land, resolution_m=50.0)
    assert hyb["id"].tolist() == exact["id"].tolist()
    # a caller-provided mask in the WRONG crs must be rebuilt, not trusted
    from aquaculture_tpu.post.landmask import build_land_mask
    mask_3857 = build_land_mask(land, resolution_m=500.0, with_boundary=True)
    hyb2 = remove_land_detections_hybrid(dets, land, mask=mask_3857)
    assert hyb2["id"].tolist() == exact["id"].tolist()


def test_hybrid_land_filter_autocoarsens_at_country_scale():
    """Country-scale land bounds (would exceed max_cells at 50 m) must
    auto-coarsen the mask instead of raising — exactness is
    resolution-independent, only the boundary band widens."""
    from aquaculture_tpu.post.landmask import remove_land_detections_hybrid

    # ~1,500 x 800 km land slab: 50 m cells would be 480M >> max_cells
    land = gf.GeoFrame(
        {"n": [0]},
        geometry=[_poly.box(-500_000.0, 4_800_000.0, 1_000_000.0, 5_600_000.0)],
        crs=3857,
    )
    dets = gf.GeoFrame(
        {"id": [0, 1, 2]},
        geometry=[
            _poly.box(0, 5_000_000.0, 40, 5_000_040.0),              # deep inside
            _poly.box(2_000_000.0, 5_000_000.0, 2_000_040.0, 5_000_040.0),  # far outside
            _poly.box(999_980.0, 5_000_000.0, 1_000_020.0, 5_000_040.0),    # straddles edge
        ],
        crs=3857,
    )
    exact = remove_land_detections(dets, land)
    hyb = remove_land_detections_hybrid(dets, land)
    assert hyb["id"].tolist() == exact["id"].tolist() == [1]


def test_land_mask_contains_vectorized():
    from aquaculture_tpu.post.landmask import build_land_mask

    land = gf.GeoFrame({"n": [0]}, geometry=[_poly.box(0, 0, 10, 10)], crs=3857)
    m = build_land_mask(land, resolution_m=1.0)
    hits = m.contains(np.asarray([5.0, 15.0, -5.0]), np.asarray([5.0, 5.0, 5.0]))
    assert hits.tolist() == [True, False, False]
