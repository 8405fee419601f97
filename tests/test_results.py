"""Results-layer tests: threshold sweep vs the slow oracle, upper-bound
simulation vs binomial expectation, facility classification, map outputs."""

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.eval.metrics import get_stats_total
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.results.maps import (
    classify_facilities,
    facility_map_html,
    plot_facility_map,
    trujillo_1km_boxes,
    unique_locations,
)
from aquaculture_tpu.results.performance import (
    false_positive_reduction,
    plot_precision_recall_curves,
    stats_at_thresholds,
)
from aquaculture_tpu.results.upper_bound import upper_bound_simulation


def _preds_labels():
    preds = gf.GeoFrame(
        {
            "year": [2014] * 4,
            "type": ["circle_farm"] * 4,
            "det_conf": [0.9, 0.7, 0.5, 0.3],
        },
        geometry=[
            _poly.box(0, 0, 10, 10),     # TP (label A)
            _poly.box(20, 0, 30, 10),    # TP (label B)
            _poly.box(50, 0, 60, 10),    # FP
            _poly.box(70, 0, 80, 10),    # FP
        ],
        crs=3857,
    )
    labels = gf.GeoFrame(
        {"year": [2014] * 3, "type": ["circle_farm"] * 3},
        geometry=[
            _poly.box(5, 5, 12, 12),     # matched at conf .9
            _poly.box(25, 5, 32, 12),    # matched at conf .7
            _poly.box(100, 0, 110, 10),  # never matched
        ],
        crs=3857,
    )
    return preds, labels


def test_stats_at_thresholds_matches_per_threshold_oracle():
    preds, labels = _preds_labels()
    sweep = stats_at_thresholds(labels, preds, thresholds=[0.0, 0.6, 0.8, 0.95])
    # oracle: filter + full join per threshold
    for _, row in sweep.iterrows():
        sub = preds[preds["det_conf"] >= row["threshold"]].copy()
        sub.crs = preds.crs
        oracle = get_stats_total(labels=labels, preds=sub)
        if np.isnan(oracle["precision"]):
            assert np.isnan(row["precision"])
        else:
            assert row["precision"] == pytest.approx(oracle["precision"])
        assert row["recall"] == pytest.approx(oracle["recall"])
    # monotone content checks
    assert sweep.loc[0, "recall"] == pytest.approx(2 / 3)
    assert sweep.loc[2, "precision"] == 1.0  # only the conf-.9 TP remains


def test_false_positive_reduction():
    preds, labels = _preds_labels()
    bucket = pd.Series(["ocean", "ocean", "land", "ocean"], index=preds.index)
    out = false_positive_reduction(preds, labels, bucket)
    assert out["fp_share_raw"] == pytest.approx(0.5)
    assert out["fp_removed_by_land_filter"] == pytest.approx(0.5)  # 1 of 2 FPs on land


def test_plot_curves_smoke(tmp_path):
    preds, labels = _preds_labels()
    sweep = stats_at_thresholds(labels, preds, thresholds=np.linspace(0, 1, 10))
    fig = plot_precision_recall_curves(sweep, sweep, sweep, out_path=str(tmp_path / "f.pdf"))
    assert (tmp_path / "f.pdf").exists()


def test_upper_bound_simulation():
    out = upper_bound_simulation(K=2000, seed=0)
    # at rate 7e-5 the expected labels in 10518 samples is ~0.74 -> the
    # median crosses zero near the reference's final rate
    assert out["final_rate"] == pytest.approx(7e-5, abs=2e-5)
    assert out["population_upper_bound_total"] > 4010
    t = out["rate_table"]
    assert (t["all_zeros_50"].diff().fillna(0) >= 0).all()  # monotone in rate


def test_trujillo_classification_and_unique_locations():
    trujillo = gf.GeoFrame({"n": [0]}, geometry=[_poly.Point(1000.0, 1000.0)], crs=3857)
    boxes = trujillo_1km_boxes(trujillo)
    # reference box_size=1000 means +/-1000 m (FacilitiesMaps.py:31-37)
    assert boxes["geometry"].iloc[0].bounds == (0.0, 0.0, 2000.0, 2000.0)

    fac = gf.GeoFrame(
        {"pass": ["2013-2015", "2013-2015"]},
        geometry=[_poly.Point(1100.0, 1100.0), _poly.Point(9000.0, 9000.0)],
        crs=3857,
    )
    tagged = classify_facilities(fac, boxes)
    assert tagged["status"].tolist() == ["known", "additional"]
    assert unique_locations(fac) == 2
    # two nearby points collapse to one with a padding radius (bare
    # centroids have no cage extent)
    fac2 = gf.GeoFrame(
        {"pass": ["a", "b"]},
        geometry=[_poly.Point(0.0, 0.0), _poly.Point(100.0, 0.0)],
        crs=3857,
    )
    assert unique_locations(fac2, radius_m=500.0) == 1
    assert unique_locations(fac2) == 2

    # reference-exact greedy over intersecting bounds boxes
    # (FacilitiesMaps.py:97-114): A-B overlap, B-C overlap, A-C disjoint
    # -> A claims B, C stays unique -> 2
    chain = gf.GeoFrame(
        {"pass": ["a", "b", "c"]},
        geometry=[_poly.box(0, 0, 10, 10), _poly.box(8, 0, 18, 10), _poly.box(16, 0, 26, 10)],
        crs=3857,
    )
    assert unique_locations(chain) == 2


def test_facility_maps_outputs(tmp_path):
    fac = gf.GeoFrame(
        {"pass": ["2013-2015", "2016-2018"], "status": ["known", "additional"]},
        geometry=[_poly.Point(500000.0, 5200000.0), _poly.Point(510000.0, 5210000.0)],
        crs=3857,
    )
    plot_facility_map(fac, period="2013-2015", out_path=str(tmp_path / "map.png"))
    assert (tmp_path / "map.png").exists()
    facility_map_html(fac, str(tmp_path / "map.html"))
    html = (tmp_path / "map.html").read_text()
    assert "2013-2015" in html and "<svg" in html


def test_period_comparison_matches_reference():
    """The missing-imagery adjustment pairs are the reference's exact dict
    (tonnage_estimates.py:111-118): 2005-2009 compares FORWARD to 2010-2012
    and everything from 2016 on compares back to 2010-2012."""
    from aquaculture_tpu.results.tonnage_report import PERIOD_COMPARISON

    assert PERIOD_COMPARISON == {
        "2000-2004": "2005-2009",
        "2005-2009": "2010-2012",
        "2010-2012": "2005-2009",
        "2013-2015": "2010-2012",
        "2016-2018": "2010-2012",
        "2019-2021": "2010-2012",
    }


def test_figure4_classification_pipeline(tmp_path):
    """true_positive_facilities + classify_our_facilities + plot_combined_map
    (reference FacilitiesMaps.py:64-233)."""
    from aquaculture_tpu.results.maps import (
        classify_our_facilities,
        plot_combined_map,
        true_positive_facilities,
        trujillo_1km_boxes,
    )
    from aquaculture_tpu.tonnage.periods import map_year_to_image_pass

    # two facilities: one near a Trujillo point (known), one far (additional);
    # a third in a post-Trujillo period
    def cages(cx, cy):
        return _poly.MultiPolygon([_poly.box(cx, cy, cx + 10, cy + 10)])

    fac = gf.GeoFrame(
        {
            "facility_index": [0, 1, 2],
            "pass": ["2005-2009", "2005-2009", "2013-2015"],
            "cage_ids": [[1, 2], [3], [4, 5, 6]],
            "circle_farm_geoms": [cages(500000, 5300000), cages(600000, 5300000), cages(500000, 5300000)],
            "square_farm_geoms": [_poly.EMPTY] * 3,
        },
        geometry=[_poly.Point(0, 0)] * 3,  # overwritten by bounds boxes
        crs=3857,
    )
    labels = gf.GeoFrame(
        {"year": [2006, 2007, 2014]},
        geometry=[
            _poly.box(500000, 5300000, 500010, 5300010),
            _poly.box(600000, 5300000, 600010, 5300010),
            _poly.box(500000, 5300000, 500010, 5300010),
        ],
        crs=3857,
    )
    tp = true_positive_facilities(fac, labels, map_year_to_image_pass)
    assert sorted(tp["facility_index"]) == [0, 1, 2]

    trujillo = gf.GeoFrame(
        {"num_cages": [40]}, geometry=[_poly.Point(500005.0, 5300005.0)], crs=3857
    )
    boxes = trujillo_1km_boxes(trujillo, box_crs=3035)
    combined = classify_our_facilities(tp, boxes, trujillo)

    # facility 0 inside the box -> dropped from 'additional during';
    # facility 1 far away -> Additional; facility 2 post-period -> Known
    during_add = combined[
        (combined["type"] == "Additional facility") & (combined["pass"] == "2005-2009")
    ]
    assert len(during_add) == 1
    known_rows = combined[combined["type"] == "Known facility"]
    # one Trujillo point repeated across the 3 study periods + facility 2
    assert len(known_rows) == 4
    post = combined[combined["pass"] == "2013-2015"]
    assert post["type"].tolist() == ["Known facility"]
    assert set(combined.columns) >= {"type", "geometry", "pass", "num_cages"}

    fig = plot_combined_map(combined, out_path=str(tmp_path / "fig4.png"))
    assert (tmp_path / "fig4.png").exists()
