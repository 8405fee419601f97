"""CI accuracy bounds for the serving options (VERDICT r2 weak #1).

Loads the committed trained fixture (tests/data/demo_ckpt_n160: the "n"
detector trained on the 24-image seed-0 demo world at 160px, float16
storage) and measures mAP on a freshly rendered demo world for the serving
configurations that change the math. The mixed-int8 default must stay
within epsilon of bf16 — a quantization regression fails CI, mirroring the
accuracy-selected operating point the reference pins
(reference: src/get_kfold_cluster_performance.py:538-546).
"""

import os
import sys

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "demo_ckpt_n160")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "params.npz")),
    reason="trained fixture not present",
)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    out = str(tmp_path_factory.mktemp("accworld"))
    img_dir, lab_dir = render_world(out, n_images=12, seed=0)
    return img_dir, lab_dir


@pytest.fixture(scope="module")
def table(world):
    from aquaculture_tpu.eval.accuracy import serving_accuracy_table

    img_dir, lab_dir = world
    rows = serving_accuracy_table(
        img_dir, lab_dir, FIXTURE,
        variant="n", num_classes=2, img_size=160,
        configs=("bf16", "int8_mixed", "int8_safe", "multi_label", "topk512"),
    )
    return {r.name: r for r in rows}


def test_fixture_is_trained(table):
    # the fixture must actually detect cages, not noise
    assert table["bf16"].map50 >= 0.5, table["bf16"]


def test_int8_mixed_within_epsilon_of_bf16(table):
    """The --int8 default (mixed split) ships only while its accuracy is
    bounded: mAP@.5 within 0.05 of bf16 on the demo world at fixed seed."""
    d = table["int8_mixed"].map50 - table["bf16"].map50
    assert abs(d) <= 0.05, (table["int8_mixed"], table["bf16"])


def test_int8_safe_default_localization_neutral(table):
    """The --int8 DEFAULT (localization-safe split) must hold BOTH bounds:
    mAP@.5 within 0.05 of bf16 AND mAP@.5:.95 within 0.03 — the tight-IoU
    bound is the reason this split exists (the plain mixed split loses
    ~0.03 there)."""
    safe, bf16 = table["int8_safe"], table["bf16"]
    assert abs(safe.map50 - bf16.map50) <= 0.05, (safe, bf16)
    assert abs(safe.map - bf16.map) <= 0.03, (safe, bf16)


def test_topk512_within_epsilon_of_bf16(table):
    """--pre-topk 512 ships only while this gate holds: +3.3% measured
    bulk throughput at mt/b128 (BENCH_MT_SLACK full_topk512), and the
    candidate-pool truncation must stay within epsilon of the 1024
    default on the gate world (it measured IDENTICAL — the pool rarely
    exceeds 512 candidates per tile)."""
    d50 = table["topk512"].map50 - table["bf16"].map50
    d = table["topk512"].map - table["bf16"].map
    assert abs(d50) <= 0.02, (table["topk512"], table["bf16"])
    assert abs(d) <= 0.02, (table["topk512"], table["bf16"])


def test_multi_label_not_catastrophic(table):
    """multi_label emits strictly more candidates; its mAP must not fall
    below bf16 by more than epsilon (it usually matches or beats it)."""
    d = table["multi_label"].map50 - table["bf16"].map50
    assert d >= -0.05, (table["multi_label"], table["bf16"])


def _mt640_rows():
    """Committed production-config confirmation rows (VERDICT r3 #2).

    The live fixture above is n@160 because an mt@640 checkpoint is 96 MB
    (too large to commit); the transfer argument is CI-enforced instead:
    the SAME bounds the n@160 fixture is measured against must hold in
    the committed mt@640 measurement rows (BENCH_ACCURACY.jsonl, tagged
    ckpt=prod_mt640_e215 — scripts/train_prod_ckpt.py +
    scripts/accuracy_ab.py --variant mt --img 640). A re-measurement that
    violates the bounds fails CI exactly like a live regression would.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_ACCURACY.jsonl")
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if (
                r.get("variant") == "mt"
                and r.get("img") == 640
                and r.get("ckpt") == "prod_mt640_e215"
            ):
                rows[r["config"]] = r
    return rows


def test_mt640_confirmation_rows_present():
    rows = _mt640_rows()
    for cfg in ("f32", "bf16", "int8_mixed", "int8_safe", "tta", "multi_label"):
        assert cfg in rows, f"missing mt@640 confirmation row for {cfg!r}"
    # the production-config checkpoint must actually detect (overfit
    # regime, its own world): far above the n160 fixture's 0.5 floor
    assert rows["bf16"]["map50"] >= 0.9, rows["bf16"]


def test_mt640_int8_bounds_transfer():
    """The int8 bounds asserted live on n@160 hold in the mt@640
    measurement: the safe split within 0.05 mAP@.5 AND 0.03 mAP@.5:.95
    of bf16; the tight-IoU split motivation (mixed loses localization)
    must also be visible at the production config."""
    rows = _mt640_rows()
    bf16, safe, mixed = rows["bf16"], rows["int8_safe"], rows["int8_mixed"]
    assert abs(safe["map50"] - bf16["map50"]) <= 0.05, (safe, bf16)
    assert abs(safe["map50_95"] - bf16["map50_95"]) <= 0.03, (safe, bf16)
    # and the safe split must beat plain mixed at tight IoU — the reason
    # it exists (measured: 0.7325 vs 0.6826 here; 0.03 margin floor)
    assert safe["map50_95"] >= mixed["map50_95"] + 0.03, (safe, mixed)


def test_mt640_multi_label_not_catastrophic():
    rows = _mt640_rows()
    d = rows["multi_label"]["map50"] - rows["bf16"]["map50"]
    assert d >= -0.05, rows["multi_label"]


def _m6_1280_rows():
    """Committed P6 production-geometry confirmation rows (round 4d).

    Same committed-row discipline as _mt640_rows: the m6@1280 checkpoint
    (96+ MB, uncommittable) backs the BENCH_ACCURACY.jsonl rows tagged
    ckpt=prod_m6_1280_e400 — scripts/train_prod_ckpt.py --variant m6
    --img 1280 --size 1024 (1024px world tiles served at 1280: the exact
    geometry recommend_serving(boundary_accuracy=True) picks) +
    scripts/accuracy_ab.py --variant m6 --img 1280 --tpu. These bounds
    license the plan's int8=True on m6@1280 b128; a re-measurement that
    violates them fails CI like a live regression.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_ACCURACY.jsonl")
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if (
                r.get("variant") == "m6"
                and r.get("img") == 1280
                and r.get("ckpt") == "prod_m6_1280_e400"
            ):
                rows[r["config"]] = r
    return rows


def test_m6_1280_confirmation_rows_present():
    rows = _m6_1280_rows()
    for cfg in ("f32", "bf16", "int8_mixed", "int8_safe", "tta", "multi_label"):
        assert cfg in rows, f"missing m6@1280 confirmation row for {cfg!r}"
    assert rows["bf16"]["map50"] >= 0.9, rows["bf16"]


def test_m6_1280_int8_bounds_license_the_plan_flip():
    """recommend_serving's int8=True on m6@1280 b128 rests on these rows:
    the safe split within 0.05 mAP@.5 AND 0.03 mAP@.5:.95 of bf16, and
    the tight-IoU reason for the SAFE (not mixed) split visible on P6
    too (measured: mixed loses 0.109 mAP@.5:.95, safe loses 0.015)."""
    rows = _m6_1280_rows()
    bf16, safe, mixed = rows["bf16"], rows["int8_safe"], rows["int8_mixed"]
    assert abs(safe["map50"] - bf16["map50"]) <= 0.05, (safe, bf16)
    assert abs(safe["map50_95"] - bf16["map50_95"]) <= 0.03, (safe, bf16)
    assert safe["map50_95"] >= mixed["map50_95"] + 0.03, (safe, mixed)


def test_world_map_rejects_unmatched_detection_stems(monkeypatch, tmp_path):
    # A detection stem with no GT label file must raise, not silently
    # vanish from the evaluation (review r3: unlabeled images or >tile
    # rasters inflated precision / zeroed mAP with no warning).
    from aquaculture_tpu.eval import accuracy

    lab = tmp_path / "labels"
    lab.mkdir()
    (lab / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.txt").write_text(
        "0 0.5 0.5 0.1 0.1\n"
    )
    monkeypatch.setattr(
        accuracy,
        "detections_by_image",
        lambda *a, **k: {
            "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0": (
                np.zeros((0, 4)), np.zeros(0), np.zeros(0, int)),
            "ORTHOIMAGERY.ORTHOPHOTOS2014_1_512_0": (
                np.zeros((1, 4)), np.ones(1), np.zeros(1, int)),
        },
    )
    with pytest.raises(ValueError, match="no ground-truth"):
        accuracy.world_map(
            ["unused"], str(lab), model=None, params=None, cfg=None
        )
