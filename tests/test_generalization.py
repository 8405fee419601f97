"""CI bounds for GENERALIZATION — the aug-trained fixture on unseen worlds.

tests/test_accuracy.py bounds the serving options on the fixture's own
training world (the no-aug fixture memorizes; unseen-seed worlds score
~0.02 there by design). This file holds the complementary guarantees on
the aug-recipe fixture (tests/data/aug_ckpt_n160, trained by
scripts/tta_scale_study.py with the aug-study winner recipe):

* the recipe generalizes: held-out (unseen seed, same distribution)
  mAP@.5 stays >= 0.35 (measured 0.62 at seed 777 / 24 images —
  BENCH_TTA.jsonl);
* the TTA scale-shift rule holds: on a 2x-scale world TTA beats the
  single-scale pass (measured 0.35 vs 0.19), the measured fact behind
  recommend_serving(scale_shifted=True).

Both worlds render fresh per run, so these catch regressions anywhere in
train-serve consistency (resize operator, decode, NMS, TTA de-scaling),
not just in the numerics of one stored prediction set.
"""

import glob
import os
import sys

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "aug_ckpt_n160")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "params.npz")),
    reason="aug-trained fixture not present",
)


@pytest.fixture(scope="module")
def model_and_params():
    from aquaculture_tpu.eval.accuracy import load_checkpoint_f32

    return load_checkpoint_f32(FIXTURE, "n", 2)


def _world(tmp_path_factory, name, seed, r_range):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    out = str(tmp_path_factory.mktemp(name))
    img_dir, lab_dir = render_world(out, n_images=8, seed=seed, r_range=r_range)
    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpeg")))
    return paths, lab_dir


@pytest.fixture(scope="module")
def heldout_world(tmp_path_factory):
    """Unseen seed, trained scale range — shared by the held-out tests."""
    return _world(tmp_path_factory, "heldout", seed=999, r_range=(12, 52))


def _map50(paths, lab_dir, model, params, **cfg_kw):
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.eval.accuracy import world_map

    cfg = DetectConfig(img_size=160, conf_threshold=1e-3, **cfg_kw)
    return world_map(paths, lab_dir, model, params, cfg, num_classes=2)["map50"]


def test_aug_recipe_generalizes(heldout_world, model_and_params):
    """Held-out world (unseen seed, trained scale range): the aug recipe
    must keep most of its measured 0.62 mAP@.5 (vs the no-aug fixture's
    ~0.02 here — the 8x gap from BENCH_AUG.jsonl)."""
    model, params = model_and_params
    paths, lab_dir = heldout_world
    m = _map50(paths, lab_dir, model, params)
    assert m >= 0.35, f"held-out mAP@.5 collapsed: {m:.3f}"


def test_int8_safe_holds_out_of_distribution(heldout_world, model_and_params):
    """The --int8 default's accuracy bound, on a GENERALIZING checkpoint
    and an unseen world (test_accuracy.py bounds it on the overfit
    fixture's own training world). The localization-safe split must stay
    within epsilon of bf16 where the model actually generalizes."""
    from aquaculture_tpu.cli.detect import quantize_for_serving
    from aquaculture_tpu.models.quantize import serving_int8_safe_skip

    model, params = model_and_params
    paths, lab_dir = heldout_world
    bf16 = _map50(paths, lab_dir, model, params)
    qparams = quantize_for_serving(
        model, params, list(paths), 160, skip=serving_int8_safe_skip("n")
    )
    int8 = _map50(paths, lab_dir, model, qparams)
    assert bf16 >= 0.35
    drift = abs(int8 - bf16)
    assert drift <= 0.08, f"int8_safe drifted {drift:.3f} mAP@.5 from bf16 held-out"


def test_tta_pays_under_scale_shift(tmp_path_factory, model_and_params):
    """The measured rule behind recommend_serving(scale_shifted=True):
    at 2x the trained object scale, TTA's down-scale passes must beat the
    single-scale forward (measured 0.352 vs 0.192, BENCH_TTA.jsonl)."""
    model, params = model_and_params
    paths, lab_dir = _world(tmp_path_factory, "shifted", seed=999, r_range=(24, 104))
    base = _map50(paths, lab_dir, model, params)
    tta = _map50(paths, lab_dir, model, params, augment=True)
    assert tta > base, f"TTA no longer pays at 2x scale: {tta:.3f} <= {base:.3f}"
