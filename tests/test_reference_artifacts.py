"""Parity tests against the reference's REAL data artifacts.

These exercise our IO + geometry stack on the upstream repo's actual files:
output/humanlabels.geojson (4,142 CloudFactory cage labels, README.md:152),
data/wanted_bboxes.csv (download boxes), data/aquaculture_med_dedupe.csv
(Trujillo locations). Skipped when the reference checkout is absent.
"""

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import CRS_AREA
from aquaculture_tpu.data.filenames import decode_tile_name
from aquaculture_tpu.geo import polygon as _poly


@pytest.fixture(scope="module")
def humanlabels(reference_output_dir):
    return gf.read_file(str(reference_output_dir / "humanlabels.geojson"))


def test_humanlabels_load_and_schema(humanlabels):
    hl = humanlabels
    assert len(hl) == 4142
    assert hl.crs == 3857
    assert set(hl["type"].unique()) <= {"circle_cage", "square_cage", "triangle_cage", "other_cage", "rectangle_cage"}
    # every image name parses through our codec
    specs = [decode_tile_name(f) for f in hl["image"]]
    assert all(s.bbox_ind >= 0 for s in specs)
    assert {s.year for s in specs} <= set(range(2000, 2022))


def test_humanlabels_crs_roundtrip(humanlabels):
    # 3857 -> 4326 -> 3857 roundtrip error under 1e-6 m on real geometry
    hl = humanlabels.iloc[:50].copy()
    hl.crs = humanlabels.crs
    b0 = hl.bounds_array()
    rt = hl.to_crs(4326).to_crs(3857)
    b1 = rt.bounds_array()
    np.testing.assert_allclose(b1, b0, atol=1e-6)
    # labels are on the French Mediterranean coast: lat 41..44, lon -1..10
    ll = hl.to_crs(4326).bounds_array()
    assert ll[:, 1].min() > 41 and ll[:, 3].max() < 44.5
    assert ll[:, 0].min() > -2 and ll[:, 2].max() < 10.5


def test_humanlabels_areas_positive(humanlabels):
    hl = humanlabels.iloc[:200].copy()
    hl.crs = humanlabels.crs
    areas = hl.to_crs(CRS_AREA).area.to_numpy()
    assert (areas > 0).all()
    # cage boxes are tens-to-thousands of m2, never km2
    assert areas.max() < 1e6 and areas.min() > 1.0


def test_wanted_bboxes_csv(reference_data_dir):
    from aquaculture_tpu.cli.geocode import load_download_bboxes

    dl = load_download_bboxes(str(reference_data_dir / "wanted_bboxes.csv"))
    assert len(dl) > 1000
    assert dl.crs == 3857
    # every box is ~1200 m square in 3857
    b = dl.bounds_array()
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    np.testing.assert_allclose(w, 1200.0, atol=1.0)
    np.testing.assert_allclose(h, 1200.0, atol=1.0)


def test_trujillo_locations(reference_data_dir):
    from aquaculture_tpu.tonnage.periods import load_trujillo_locations

    t = load_trujillo_locations(str(reference_data_dir / "aquaculture_med_dedupe.csv"))
    assert t.crs == 3857
    assert len(t) > 10
    assert all(isinstance(g, _poly.Point) for g in t["geometry"])


def test_label_matching_on_real_labels(humanlabels):
    """Run the error-matching machinery label-vs-label on real data: every
    label must match itself with error 0."""
    from aquaculture_tpu.tonnage.errors import get_cage_area_errors_from_labels

    hl = humanlabels.iloc[:40].copy()
    hl.crs = humanlabels.crs
    frame = gf.GeoFrame(
        pd.DataFrame({"year": hl["year"].to_numpy(), "area": np.ones(len(hl))}),
        geometry=list(hl["geometry"]),
        crs=3857,
    )
    errors = get_cage_area_errors_from_labels(frame, frame.copy())
    assert len(errors) == len(hl)
    np.testing.assert_allclose(errors.to_numpy(), 0.0, atol=1e-9)


def test_load_cf_labels_and_images(reference_output_dir):
    from aquaculture_tpu.data.labels import load_cf_images, load_cf_labels

    labels = load_cf_labels(str(reference_output_dir / "humanlabels.geojson"))
    assert labels.crs == 3857
    assert len(labels) == 4142
    imgs = load_cf_images(str(reference_output_dir / "cf_images.csv"))
    assert "image" in imgs.columns
    assert len(imgs) > 30000


def test_mark_land_images():
    from aquaculture_tpu.data.labels import mark_land_images
    from aquaculture_tpu.geo import polygon as _poly

    images = gf.GeoFrame(
        {"image": ["a", "b"]},
        geometry=[_poly.box(1, 1, 2, 2), _poly.box(100, 100, 101, 101)],
        crs=3857,
    )
    land = gf.GeoFrame({"n": [0]}, geometry=[_poly.box(0, 0, 10, 10)], crs=3857)
    flags = mark_land_images(images, land, projected_crs=3857)
    assert flags.tolist() == [True, False]


def test_geocoder_bit_parity_on_reference_geometries(humanlabels, reference_data_dir):
    """STRONGEST parity evidence available: humanlabels.geojson geometries
    were produced by the reference's own pixel->EPSG:3857 geocoder from the
    stored pixel columns. Our pixels_to_mercator must reproduce every one
    of the 4,142 boxes to float precision from the same wanted_bboxes.csv."""
    from aquaculture_tpu.cli.geocode import load_download_bboxes
    from aquaculture_tpu.data.filenames import decode_tile_name
    from aquaculture_tpu.post.geocode import pixels_to_mercator

    dl = load_download_bboxes(str(reference_data_dir / "wanted_bboxes.csv"))
    bounds_by_ind = {int(i): g.bounds for i, g in zip(dl.index, dl["geometry"])}

    specs = [decode_tile_name(f) for f in humanlabels["image"]]
    tb = np.asarray([bounds_by_ind[s.bbox_ind] for s in specs])
    xo = np.asarray([float(s.x_offset) for s in specs])
    yo = np.asarray([float(s.y_offset) for s in specs])
    xmin = humanlabels["xmin"].to_numpy(np.float64)
    ymin = humanlabels["ymin"].to_numpy(np.float64)
    xmax = humanlabels["xmax"].to_numpy(np.float64)
    ymax = humanlabels["ymax"].to_numpy(np.float64)

    x0, y1 = pixels_to_mercator(xmin, ymin, xo, yo, tb)
    x1, y0 = pixels_to_mercator(xmax, ymax, xo, yo, tb)
    ours = np.stack([x0, y0, x1, y1], axis=1)
    theirs = np.asarray([g.bounds for g in humanlabels["geometry"]])
    err = np.abs(ours - theirs).max()
    assert err < 1e-6, f"max geocode deviation {err} m on 4142 reference features"


def test_dedup_exact_parity_with_reference_artifact(reference_data_dir):
    """Full-corpus dedup parity: the reference ships its own GEOS-produced
    wanted_bboxes_dedup (4,448 surviving boxes out of 4,545). Our
    Region-algebra dedup must select the SAME boxes with ZERO
    symmetric-difference area on every geometry."""
    from aquaculture_tpu.cli.geocode import load_download_bboxes
    from aquaculture_tpu.geo.region import from_geometry
    from aquaculture_tpu.post.dedup import deduplicate_download_boxes

    ref = gf.read_file(str(reference_data_dir / "wanted_bboxes_dedup.csv"))  # geojson
    dl = load_download_bboxes(str(reference_data_dir / "wanted_bboxes.csv"))
    ours = deduplicate_download_boxes(dl)

    ref_by = {int(b): g for b, g in zip(ref["bbox_ind"], ref["geometry"])}
    ours_by = {int(b): g for b, g in zip(ours["bbox_ind"], ours["geometry"])}
    assert set(ref_by) == set(ours_by)
    worst = 0.0
    for i, rg in ref_by.items():
        ra, oa = from_geometry(rg), from_geometry(ours_by[i])
        worst = max(worst, ra.difference(oa).area + oa.difference(ra).area)
    assert worst == 0.0, f"symmetric difference {worst} m^2"


def test_grid_search_self_consistency_on_real_labels(humanlabels):
    """Run the grid sweep with the real 4,142 labels as both detections
    (conf 1.0) and ground truth: every combination that keeps any cages
    must have precision 1.0, and a permissive combination must reach
    recall ~1 (cages isolated beyond eps stay DBSCAN noise)."""
    from aquaculture_tpu.eval.kfold import GridConfig, grid_search

    hl = humanlabels.copy()
    hl.crs = humanlabels.crs
    hl["type"] = hl["type"].replace({"circle_cage": "circle_farm", "square_cage": "square_farm"})
    hl = hl[hl["type"].isin(["circle_farm", "square_farm"])]
    hl.crs = humanlabels.crs
    dets = hl.copy()
    dets.crs = hl.crs
    dets["det_conf"] = 1.0

    grid = GridConfig(
        confidence_thresholds=(0.5,),
        distance_thresholds=(50.0, 150.0),
        minimum_cluster_sizes=(1, 5),
        folds=2,
    )
    res = grid_search(dets, hl, grid)
    assert len(res) == 4
    kept = res.dropna(subset=["precision"])
    assert (kept["precision"] == 1.0).all()
    # min_size=1 keeps every cage -> recall 1.0 exactly
    permissive = res[(res["min_cluster_size"] == 1) & (res["distance_threshold"] == 150.0)]
    assert float(permissive["recall"].iloc[0]) == 1.0
