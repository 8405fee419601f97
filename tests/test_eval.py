"""Evaluation-harness tests: TP matching, grid search vs direct clustering,
stratified folds, buckets, test-set performance."""

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.eval.buckets import get_bucket_info_table, set_buckets, set_image_stats
from aquaculture_tpu.eval.kfold import (
    GridConfig,
    clustered_detections,
    get_fold_performance,
    grid_search,
    kfold_cluster_performance,
    stratified_kfold_indices,
    test_set_performance as held_out_performance,
)
from aquaculture_tpu.eval.metrics import get_stats_total, get_tp
from aquaculture_tpu.geo import polygon as _poly


def _dets_and_labels():
    """3 detections: 2 TPs (match label year+type), 1 FP. 3 labels: 2 TPs,
    1 FN."""
    dets = gf.GeoFrame(
        {
            "image": ["a", "a", "b"],
            "year": [2014, 2014, 2014],
            "type": ["circle_farm", "square_farm", "circle_farm"],
            "det_conf": [0.9, 0.8, 0.7],
        },
        geometry=[
            _poly.box(0, 0, 10, 10),     # overlaps label 0, same type
            _poly.box(20, 0, 30, 10),    # overlaps label 1, same type
            _poly.box(100, 0, 110, 10),  # no label -> FP
        ],
        crs=3857,
    )
    labels = gf.GeoFrame(
        {
            "image": ["a", "a", "b"],
            "year": [2014, 2014, 2014],
            "type": ["circle_farm", "square_farm", "circle_farm"],
        },
        geometry=[
            _poly.box(5, 5, 12, 12),
            _poly.box(25, 5, 32, 12),
            _poly.box(200, 0, 210, 10),  # unmatched -> FN
        ],
        crs=3857,
    )
    return dets, labels


def test_get_tp_and_stats():
    dets, labels = _dets_and_labels()
    tp = get_tp(dets, labels)
    assert tp.tolist() == [True, True, False]
    stats = get_stats_total(labels=labels, preds=dets)
    assert stats["precision"] == pytest.approx(2 / 3)
    assert stats["recall"] == pytest.approx(2 / 3)


def test_get_tp_type_mismatch_not_tp():
    dets, labels = _dets_and_labels()
    labels2 = labels.copy()
    labels2["type"] = ["square_farm"] * 3  # type mismatch for det 0
    labels2.crs = labels.crs
    tp = get_tp(dets, labels2)
    assert tp.tolist() == [False, True, False]


def test_get_tp_index_zero_key_counts():
    # regression vs the reference's index-0 truthiness bug
    dets = gf.GeoFrame(
        {"year": [2014], "type": ["circle_farm"]}, geometry=[_poly.box(0, 0, 10, 10)], crs=3857
    )
    labels = gf.GeoFrame(
        {"year": [2014], "type": ["circle_farm"]}, geometry=[_poly.box(5, 5, 12, 12)], crs=3857
    )
    assert get_tp(dets, labels).tolist() == [True]


def _cluster_fixture():
    """5 clusterable detections + 1 far-away noise point, with labels on
    the cluster only."""
    geoms = [_poly.box(10 + 12 * i, 10, 18 + 12 * i, 18) for i in range(5)]
    geoms.append(_poly.box(5000, 5000, 5010, 5010))
    dets = gf.GeoFrame(
        {
            "image": ["a"] * 6,
            "year": [2014] * 6,
            "type": ["circle_farm"] * 6,
            "det_conf": [0.9, 0.9, 0.85, 0.8, 0.8, 0.95],
        },
        geometry=geoms,
        crs=3857,
    )
    labels = gf.GeoFrame(
        {"image": ["a"] * 5, "year": [2014] * 5, "type": ["circle_farm"] * 5},
        geometry=[_poly.box(10 + 12 * i, 10, 18 + 12 * i, 18) for i in range(5)],
        crs=3857,
    )
    return dets, labels


def test_clustered_detections_drops_noise():
    dets, _ = _cluster_fixture()
    kept = clustered_detections(dets, conf_thresh=0.5, distance_threshold=50.0, min_cluster_size=5)
    assert len(kept) == 5  # the isolated high-conf point is noise
    kept2 = clustered_detections(dets, conf_thresh=0.88, distance_threshold=50.0, min_cluster_size=5)
    assert len(kept2) == 0  # conf filter breaks the cluster below min size


def test_grid_search_finds_operating_point():
    dets, labels = _cluster_fixture()
    grid = GridConfig(
        confidence_thresholds=(0.5, 0.88),
        distance_thresholds=(50.0,),
        minimum_cluster_sizes=(5,),
        folds=2,
    )
    res = grid_search(dets, labels, grid)
    assert len(res) == 2
    best = res.loc[res["product"].idxmax()]
    assert best["conf_thresh"] == 0.5
    assert best["precision"] == 1.0 and best["recall"] == 1.0
    # the tight threshold kills the cluster -> nan precision, 0 recall
    worst = res[res["conf_thresh"] == 0.88].iloc[0]
    assert worst["recall"] == 0.0


def test_stratified_folds_disjoint_and_stratified():
    strata = np.array([0] * 50 + [1] * 25)
    folds = stratified_kfold_indices(strata, 5, seed=1)
    all_test = np.concatenate([t for _, t in folds])
    assert sorted(all_test.tolist()) == list(range(75))
    for train, test in folds:
        assert set(train) & set(test) == set()
        assert (strata[test] == 0).sum() == 10
        assert (strata[test] == 1).sum() == 5


def test_kfold_cluster_performance_smoke():
    dets, labels = _cluster_fixture()
    images = pd.DataFrame({"image": ["a", "b", "c", "d"]})
    # all detections are on image 'a'; folds split images
    grid = GridConfig(
        confidence_thresholds=(0.5,),
        distance_thresholds=(50.0,),
        minimum_cluster_sizes=(1, 5),
        folds=2,
        seed=1,
    )
    res = kfold_cluster_performance(images, dets, labels, strata=[0, 0, 1, 1], grid=grid)
    assert set(res["metric"]) == {"product", "f_score"}
    assert set(res["fold"]) == {0, 1}
    assert len(res) == 4


def test_test_set_performance_cage_and_facility():
    dets, labels = _cluster_fixture()
    images = pd.DataFrame({"image": ["a"]})
    res = held_out_performance(
        images, dets, labels,
        confidence_threshold=0.5, distance_threshold=50.0, minimum_cluster_size=5,
    )
    assert list(res.index) == ["cage-level", "facility-level"]
    assert float(res.loc["cage-level", "precision"]) == 1.0
    assert float(res.loc["cage-level", "recall"]) == 1.0
    assert float(res.loc["facility-level", "precision"]) == 1.0
    assert float(res.loc["facility-level", "recall"]) == 1.0


def test_buckets_assignment():
    images = gf.GeoFrame(
        {
            "image": ["a", "b", "c", "d"],
            "in_sample": [True, True, False, True],
            "only_land": [False, False, False, True],
        },
        geometry=[
            _poly.box(0, 0, 10, 10),
            _poly.box(100, 100, 110, 110),
            _poly.box(200, 200, 210, 210),
            _poly.box(300, 300, 310, 310),
        ],
        crs=3857,
    )
    dets = gf.GeoFrame(
        {"image": ["a"], "det_conf": [0.8], "year": [2014], "type": ["circle_farm"]},
        geometry=[_poly.box(1, 1, 2, 2)],
        crs=3857,
    )
    labels = gf.GeoFrame(
        {"image": ["a"], "year": [2014], "type": ["circle_farm"]},
        geometry=[_poly.box(1, 1, 2, 2)],
        crs=3857,
    )
    trujillo = gf.GeoFrame({"n": [0]}, geometry=[_poly.box(95, 95, 120, 120)], crs=3857)

    stats = set_image_stats(images, dets, labels)
    assert stats["num_detections"].tolist() == [1, 0, 0, 0]
    assert float(stats["det_conf"].iloc[0]) == 0.8

    bucketed = set_buckets(stats, trujillo)
    b = bucketed["bucket"].astype(str).tolist()
    assert b[0] == "(0.5, 0.8]"
    assert b[1] == "No detection, in jennifer area"
    assert b[2] == "No detection, outside jennifer area"
    assert b[3] == "land"

    info = get_bucket_info_table(bucketed)
    assert info.loc["land", "num_images_bucket"] == 1
    assert info.loc["(0.5, 0.8]", "num_detections_bucket"] == 1


def test_assemble_evaluation_datasets():
    from aquaculture_tpu.eval.datasets import assemble_evaluation_datasets

    dl = gf.GeoFrame({"d": [0]}, geometry=[_poly.box(0, 0, 1200, 1200)], crs=3857)
    img_name = "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    land_img = "ORTHOIMAGERY.ORTHOPHOTOS2014_0_1024_0.jpeg"
    image_boxes = gf.GeoFrame(
        {"image": [img_name, land_img], "year": [2014, 2014], "bbox_ind": [0, 0],
         "x_offset": [0, 1024], "y_offset": [0, 0]},
        geometry=[_poly.box(0, 1000, 200, 1200), _poly.box(170, 1000, 370, 1200)],
        crs=3857,
    )
    dets = gf.GeoFrame(
        {"image": [img_name, img_name], "year": [2014, 2014],
         "type": ["circle_farm", "triangle_farm"], "det_conf": [0.9, 0.9]},
        geometry=[_poly.box(10, 1010, 20, 1020), _poly.box(30, 1030, 40, 1040)],
        crs=3857,
    )
    labels = gf.GeoFrame(
        {"image": [img_name], "year": [2014], "type": ["circle_cage"]},
        geometry=[_poly.box(12, 1012, 22, 1022)],
        crs=3857,
    )
    trujillo = gf.GeoFrame({"n": [0]}, geometry=[_poly.Point(15.0, 1015.0)], crs=3857)
    sampled = pd.DataFrame({"image": [img_name]})
    land = gf.GeoFrame({"n": [0]}, geometry=[_poly.box(150, 990, 400, 1210)], crs=3857)

    ds = assemble_evaluation_datasets(dets, labels, image_boxes, dl, trujillo, sampled, land)
    # triangle detections filtered, circle kept with label match
    assert len(ds["detections"]) == 1
    assert ds["detections"]["type"].iloc[0] == "circle_farm"
    assert len(ds["labels"]) == 1
    assert ds["labels"]["type"].iloc[0] == "circle_farm"  # renamed from _cage
    # land image flagged and excluded from ocean set
    ai = ds["all_images"].set_index("image")
    assert bool(ai.loc[land_img, "only_land"])
    assert land_img not in set(ds["ocean_images"]["image"])
    # buckets exist and detections inherit them
    assert "bucket" in ds["detections"].columns
    assert str(ai.loc[img_name, "bucket"]) != "nan"


def test_grid_search_matches_per_combo_oracle():
    from aquaculture_tpu.eval.kfold import clustered_detections

    rng = np.random.default_rng(5)
    n = 40
    geoms, years, types, confs = [], [], [], []
    for i in range(n):
        x, y = rng.uniform(0, 400, 2)
        geoms.append(_poly.box(x, y, x + 12, y + 12))
        years.append(int(rng.choice([2014, 2016])))
        types.append(str(rng.choice(["circle_farm", "square_farm"])))
        confs.append(float(rng.uniform(0.3, 1.0)))
    dets = gf.GeoFrame(
        {"image": ["a"] * n, "year": years, "type": types, "det_conf": confs},
        geometry=geoms,
        crs=3857,
    )
    labels = dets.iloc[::2].copy()
    labels = labels.drop(columns=["det_conf"])
    labels.crs = 3857

    grid = GridConfig(
        confidence_thresholds=(0.4, 0.7, 0.95),
        distance_thresholds=(30.0, 300.0),
        minimum_cluster_sizes=(1, 3),
        folds=2,
    )
    res = grid_search(dets, labels, grid)
    assert len(res) == 12
    for _, row in res.iterrows():
        sub = clustered_detections(
            dets, float(row["conf_thresh"]), float(row["distance_threshold"]),
            int(row["min_cluster_size"]),
        )
        oracle = get_stats_total(labels=labels, preds=sub)
        if np.isnan(oracle["precision"]):
            assert np.isnan(row["precision"])
        else:
            assert row["precision"] == pytest.approx(oracle["precision"]), row
        assert row["recall"] == pytest.approx(oracle["recall"]), row


def test_default_grid_matches_reference_cfg():
    """Reference grid (get_kfold_cluster_performance_cfg.py:20-26):
    np.arange(0.6, 1.01, 0.005) -> 82 conf values ending at 1.005,
    8 distance thresholds, 10 cluster sizes = 6,560 combos."""
    g = GridConfig()
    assert len(g.confidence_thresholds) == 82
    assert g.confidence_thresholds[0] == pytest.approx(0.6)
    assert g.confidence_thresholds[-1] == pytest.approx(1.005)
    assert len(g.distance_thresholds) == 8
    assert len(g.minimum_cluster_sizes) == 10
    assert (
        len(g.confidence_thresholds)
        * len(g.distance_thresholds)
        * len(g.minimum_cluster_sizes)
        == 6560
    )
    assert g.folds == 5 and g.seed == 1
