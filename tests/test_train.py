"""Training-stack tests: CIoU analytics, assignment properties, overfit
convergence, optimizer schedules, EMA ramp, sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aquaculture_tpu.config import TrainConfig
from aquaculture_tpu.models.yolov5 import YoloV5, yolov5_init
from aquaculture_tpu.train.ema import ema_update
from aquaculture_tpu.train.loss import ciou, yolo_loss, _level_matches
from aquaculture_tpu.train.optimizer import (
    G_BIAS,
    G_BN_SCALE,
    G_WEIGHT,
    group_tree,
    lr_at,
    sgd_init,
    sgd_update,
)
from aquaculture_tpu.train.trainer import init_train_state, make_train_step


def test_ciou_identical_boxes_is_one():
    b = jnp.asarray([10.0, 20.0, 8.0, 6.0])
    assert float(ciou(b, b)) == pytest.approx(1.0, abs=1e-6)


def test_ciou_disjoint_is_negative():
    b1 = jnp.asarray([0.0, 0.0, 2.0, 2.0])
    b2 = jnp.asarray([100.0, 100.0, 2.0, 2.0])
    assert float(ciou(b1, b2)) < 0.0


def test_ciou_matches_plain_iou_for_same_center_same_aspect():
    # concentric boxes, same aspect: v=0, rho2=0 -> ciou == iou
    b1 = jnp.asarray([5.0, 5.0, 4.0, 4.0])
    b2 = jnp.asarray([5.0, 5.0, 8.0, 8.0])
    assert float(ciou(b1, b2)) == pytest.approx(16.0 / 64.0, abs=1e-6)


def test_level_matches_center_cell_and_neighbors():
    # One target at grid (10.3, 12.7) -> center cell (10,12); frac x<0.5 ->
    # left neighbor valid; frac y>=0.5 -> 'down' (inverse) neighbor valid.
    labels = jnp.asarray([[[0.0, 10.3, 12.7, 2.0, 2.0]]])  # grid units
    mask = jnp.asarray([[True]])
    anchors = jnp.asarray([[2.0, 2.0]])
    mt = _level_matches(labels, mask, anchors, gh=20, gw=20, anchor_t=4.0)
    valid = np.asarray(mt["valid"])[0, 0, 0]  # (O,)
    # offsets order: center, left, up, right, down
    assert valid.tolist() == [True, True, False, False, True]
    gi = np.asarray(mt["gi"])[0, 0, 0]
    gj = np.asarray(mt["gj"])[0, 0, 0]
    assert (gi[0], gj[0]) == (10, 12)       # center
    assert (gi[1], gj[1]) == (9, 12)        # left
    assert (gi[4], gj[4]) == (10, 13)       # down


def test_level_matches_anchor_ratio_gate():
    labels = jnp.asarray([[[0.0, 5.0, 5.0, 16.0, 16.0]]])
    mask = jnp.asarray([[True]])
    anchors = jnp.asarray([[2.0, 2.0], [8.0, 8.0]])  # ratio 8 (fail), 2 (pass)
    mt = _level_matches(labels, mask, anchors, gh=10, gw=10, anchor_t=4.0)
    v = np.asarray(mt["valid"])[0, 0]
    assert not v[0].any()
    assert v[1, 0]


def test_loss_finite_and_components():
    model, params = yolov5_init("n", num_classes=5, seed=0)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    labels = jnp.asarray([[[1.0, 32.0, 32.0, 10.0, 10.0]] * 4] * 2)
    mask = jnp.ones((2, 4), bool)
    feats, _ = model.features(params, imgs, training=False)
    loss, m = yolo_loss(feats, labels, mask, model.anchor_table, 5)
    assert np.isfinite(float(loss))
    assert float(m["box"]) > 0 and float(m["obj"]) > 0 and float(m["cls"]) > 0


def test_loss_no_labels_only_obj():
    model, params = yolov5_init("n", num_classes=5, seed=0)
    imgs = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 4, 5))
    mask = jnp.zeros((1, 4), bool)
    feats, _ = model.features(params, imgs, training=False)
    loss, m = yolo_loss(feats, labels, mask, model.anchor_table, 5)
    assert float(m["box"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["cls"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["obj"]) > 0


@pytest.mark.slow
def test_overfit_single_batch_loss_decreases():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    cfg = TrainConfig(epochs=50, lr0=0.01, warmup_epochs=0.0)
    state = init_train_state(model, params)
    step_fn = jax.jit(make_train_step(model, cfg, steps_per_epoch=1))
    rng = np.random.default_rng(1)
    batch = {
        "images": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
        "labels": jnp.asarray([[[0.0, 20.0, 20.0, 12.0, 12.0]], [[1.0, 40.0, 40.0, 16.0, 16.0]]]),
        "label_mask": jnp.ones((2, 1), bool),
    }
    losses = []
    for _ in range(30):
        state, m = step_fn(state, batch)
        losses.append(float(m["total"]))
    assert all(np.isfinite(losses))
    # The bf16 step's loss trajectory is noisy step-to-step, and the
    # exact wiggle depends on XLA CPU codegen details (the 8-device
    # virtual-mesh flag changes reduction order enough to flip a
    # single-step comparison — the round-5 slow-suite flake: step-12
    # loss 0.3125 with the flag vs 0.2806 without, same code). Assert
    # the DESCENT, not one sample: the last-5 average must sit below
    # the starting loss.
    assert float(np.mean(losses[-5:])) < losses[0], losses


def test_group_classification():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    g = group_tree(params)
    assert g["b0"]["bn"]["scale"] == G_BN_SCALE
    assert g["b0"]["bn"]["bias"] == G_BIAS
    assert g["b0"]["w"] == G_WEIGHT
    assert g["head"][0]["b"] == G_BIAS
    assert g["head"][0]["w"] == G_WEIGHT


def test_lr_schedule_warmup_and_decay():
    cfg = TrainConfig(epochs=10, lr0=0.01, lrf=0.1, warmup_epochs=1.0)
    spe = 200
    lr0, lrb0, m0 = lr_at(0, spe, cfg)
    assert float(lr0) == pytest.approx(0.0, abs=1e-9)
    assert float(lrb0) == pytest.approx(cfg.warmup_bias_lr)
    assert float(m0) == pytest.approx(cfg.warmup_momentum)
    # after warmup (step 400 > nw=200): linear-decayed target, momentum full
    lr1, lrb1, m1 = lr_at(400, spe, cfg)
    lf = (1 - (400 / spe) / 10) * (1 - 0.1) + 0.1
    assert float(lr1) == pytest.approx(0.01 * lf, rel=1e-5)
    assert float(lrb1) == pytest.approx(0.01 * lf, rel=1e-5)
    assert float(m1) == pytest.approx(cfg.momentum)
    # end of training decays to ~lr0*lrf
    lr_end, _, _ = lr_at(10 * spe, spe, cfg)
    assert float(lr_end) == pytest.approx(0.01 * 0.1, rel=1e-5)


def test_sgd_moves_params_and_no_decay_on_bias():
    cfg = TrainConfig(warmup_epochs=0.0)
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,)), "bn": {"scale": jnp.ones((4,))}}
    grads = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,)), "bn": {"scale": jnp.zeros((4,))}}
    st = sgd_init(params)
    st = type(st)(momentum=st.momentum, step=jnp.asarray(1000, jnp.int32))  # past warmup
    new_p, _ = sgd_update(params, grads, st, steps_per_epoch=10, cfg=cfg)
    # zero grad: biases and bn scale unchanged; weights shrink via decay
    assert float(jnp.abs(new_p["b"] - 1).max()) == 0.0
    assert float(jnp.abs(new_p["bn"]["scale"] - 1).max()) == 0.0
    assert float(new_p["w"][0, 0]) < 1.0


def test_ema_ramp():
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    e1 = ema_update(ema, params, step=1, decay=0.9999)
    # d ~ 0 at step 1 -> ema ~ params
    assert float(e1["w"][0]) == pytest.approx(1.0, abs=1e-3)
    e2 = ema_update(ema, params, step=100000, decay=0.5)
    assert float(e2["w"][0]) == pytest.approx(0.5, abs=1e-6)


@pytest.mark.slow
def test_sharded_train_step_8dev():
    from aquaculture_tpu.parallel.mesh import make_mesh, shard_batch
    from aquaculture_tpu.parallel.sharded import sharded_train_step

    model, params = yolov5_init("n", num_classes=5, seed=0)
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = TrainConfig(img_size=64, batch_size=4, max_boxes_per_image=4)
    state = init_train_state(model, params)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((4, 64, 64, 3), dtype=np.float32)),
        "labels": jnp.asarray(rng.uniform(4, 30, (4, 4, 5)).astype(np.float32)),
        "label_mask": jnp.ones((4, 4), bool),
    }
    with mesh:
        step_fn, sh_state = sharded_train_step(model, cfg, mesh, 10, state)
        batch = shard_batch(batch, mesh)
        new_state, metrics = step_fn(sh_state, batch)
    assert np.isfinite(float(metrics["total"]))
    assert int(jax.device_get(new_state.step)) == 1


@pytest.mark.slow
def test_remat_train_step_matches_plain():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
        "labels": jnp.asarray([[[0.0, 20.0, 20.0, 12.0, 12.0]], [[1.0, 40.0, 40.0, 16.0, 16.0]]]),
        "label_mask": jnp.ones((2, 1), bool),
    }
    outs = {}
    for remat in (False, True):
        cfg = TrainConfig(epochs=50, lr0=0.01, warmup_epochs=0.0, remat=remat)
        state = init_train_state(model, params)
        step_fn = jax.jit(make_train_step(model, cfg, steps_per_epoch=1))
        state, m = step_fn(state, batch)
        outs[remat] = (float(m["total"]), jax.tree_util.tree_leaves(state.params)[0])
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs[False][1]), np.asarray(outs[True][1]), rtol=1e-5, atol=1e-7
    )


def test_loss_gain_scaling_matches_ultralytics():
    """Round-4c: ultralytics rescales its hyp gains at train setup
    (box*3/nl, cls*nc/80*3/nl, obj*(img/640)^2*3/nl); yolo_loss applies
    that scaling internally. Property pinned here: with zero labels and
    constant logits the obj term scales exactly with (img/640)^2 — the
    per-level mean BCE is resolution-invariant, so doubling the input
    size must exactly 4x lobj."""
    model, _ = yolov5_init("n", num_classes=2, seed=0)
    vals = {}
    for img in (64, 128):
        feats = [jnp.zeros((1, img // s, img // s, 3 * 7), jnp.float32)
                 for s in (8, 16, 32)]
        labels = jnp.zeros((1, 1, 5), jnp.float32)
        mask = jnp.zeros((1, 1), bool)
        _, m = yolo_loss(feats, labels, mask, model.anchor_table, 2)
        vals[img] = float(m["obj"])
    assert vals[128] / vals[64] == pytest.approx(4.0, rel=1e-5)


def test_dataset_cache_budget_bounds_memory(tmp_path):
    """cache_gb bounds the decoded-image caches: with a zero budget
    nothing is stored (every sample recomputed), with a generous budget
    the caches fill — identical batches either way."""
    import os

    from PIL import Image

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.train.dataset import DetectionDataset

    img_dir = tmp_path / "images"; lab_dir = tmp_path / "labels"
    os.makedirs(img_dir); os.makedirs(lab_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(a).save(img_dir / f"im{i}.jpeg")
        (lab_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")

    batches = {}
    for gb in (0.0, 4.0):
        cfg = TrainConfig(img_size=64, batch_size=2, cache_gb=gb)
        ds = DetectionDataset(str(img_dir), str(lab_dir), cfg,
                              augment=True, seed=7)
        batches[gb] = next(iter(ds.epoch(0)))
        if gb == 0.0:
            assert not ds._cache and not ds._resized_cache
        else:
            assert ds._cache_bytes > 0
    np.testing.assert_array_equal(batches[0.0]["images"], batches[4.0]["images"])
    np.testing.assert_array_equal(batches[0.0]["labels"], batches[4.0]["labels"])
