"""NMS tests vs a NumPy greedy oracle, plus letterbox geometry checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from aquaculture_tpu.ops.letterbox import letterbox, unletterbox_boxes
from aquaculture_tpu.ops.nms import batched_nms, nms


def _oracle_nms(boxes, scores, classes, iou_th, class_agnostic=False):
    """Reference greedy NMS in plain numpy."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if not class_agnostic and classes[i] != classes[j]:
                continue
            # IoU
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.maximum(rb - lt, 0)
            inter = wh[0] * wh[1]
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > iou_th:
                suppressed[j] = True
    return keep


def _make_preds(rng, n=200, nc=5, size=640):
    cx = rng.uniform(50, size - 50, n)
    cy = rng.uniform(50, size - 50, n)
    w = rng.uniform(10, 120, n)
    h = rng.uniform(10, 120, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.dirichlet(np.ones(nc), n)  # peaked-ish class probs
    pred = np.concatenate(
        [np.stack([cx, cy, w, h, obj], 1), cls], axis=1
    ).astype(np.float32)
    return pred


def test_nms_matches_oracle():
    rng = np.random.default_rng(0)
    pred = _make_preds(rng)
    det, valid = nms(jnp.asarray(pred), conf_thresh=0.1, iou_thresh=0.45, max_det=300)
    det, valid = np.asarray(det), np.asarray(valid)

    # Build oracle candidate set
    obj = pred[:, 4]
    cls_scores = pred[:, 5:] * obj[:, None]
    conf = cls_scores.max(1)
    cls = cls_scores.argmax(1)
    cand = conf >= 0.1
    boxes = np.stack(
        [
            pred[:, 0] - pred[:, 2] / 2,
            pred[:, 1] - pred[:, 3] / 2,
            pred[:, 0] + pred[:, 2] / 2,
            pred[:, 1] + pred[:, 3] / 2,
        ],
        axis=1,
    )
    idx = np.where(cand)[0]
    keep = _oracle_nms(boxes[idx], conf[idx], cls[idx], 0.45)
    oracle_idx = idx[keep]
    oracle_order = oracle_idx[np.argsort(-conf[oracle_idx], kind="stable")]

    n_valid = int(valid.sum())
    assert n_valid == len(oracle_order)
    np.testing.assert_allclose(det[:n_valid, 4], conf[oracle_order], rtol=1e-6)
    np.testing.assert_allclose(det[:n_valid, :4], boxes[oracle_order], rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(det[:n_valid, 5].astype(int), cls[oracle_order])

    # max_det truncation keeps the top-confidence survivors, like ultralytics.
    det_t, valid_t = nms(jnp.asarray(pred), conf_thresh=0.1, iou_thresh=0.45, max_det=50)
    det_t, valid_t = np.asarray(det_t), np.asarray(valid_t)
    assert int(valid_t.sum()) == 50
    np.testing.assert_allclose(det_t[:50, 4], conf[oracle_order[:50]], rtol=1e-6)


def test_nms_class_aware_keeps_overlapping_different_classes():
    # Two perfectly-overlapping boxes of different classes both survive.
    pred = np.zeros((2, 10), np.float32)
    pred[:, :4] = [100, 100, 50, 50]
    pred[:, 4] = 0.9
    pred[0, 5] = 1.0  # class 0
    pred[1, 6] = 0.9  # class 1
    det, valid = nms(jnp.asarray(pred), conf_thresh=0.25, iou_thresh=0.45, max_det=10)
    assert int(np.asarray(valid).sum()) == 2
    det, valid = nms(jnp.asarray(pred), conf_thresh=0.25, iou_thresh=0.45, max_det=10, class_agnostic=True)
    assert int(np.asarray(valid).sum()) == 1


def test_nms_multi_label_emits_per_class_candidates():
    """multi_label=True: one candidate per (box, class) above conf_thresh
    (ultralytics non_max_suppression multi_label branch, used by val.py).
    A single box with two strong classes yields two detections (they
    survive class-aware NMS because classes differ)."""
    pred = np.zeros((4, 10), np.float32)
    pred[0, :5] = [100, 100, 40, 40, 0.9]
    pred[0, 5] = 0.8   # class 0 -> conf 0.72
    pred[0, 6] = 0.7   # class 1 -> conf 0.63
    det_s, valid_s = nms(jnp.asarray(pred), conf_thresh=0.25, multi_label=False)
    det_m, valid_m = nms(jnp.asarray(pred), conf_thresh=0.25, multi_label=True)
    det_s, det_m = np.asarray(det_s), np.asarray(det_m)
    assert int(np.asarray(valid_s).sum()) == 1
    assert int(np.asarray(valid_m).sum()) == 2
    rows = det_m[np.asarray(valid_m)]
    assert sorted(rows[:, 5].astype(int)) == [0, 1]
    np.testing.assert_allclose(sorted(rows[:, 4]), [0.9 * 0.7, 0.9 * 0.8], rtol=1e-6)
    # both carry the same box
    np.testing.assert_allclose(rows[0, :4], rows[1, :4], atol=1e-5)


def test_nms_multi_label_matches_single_when_one_class_dominates():
    """When only the argmax class clears conf_thresh for every box,
    multi_label and argmax selection give identical detections."""
    rng = np.random.default_rng(5)
    pred = _make_preds(rng, n=80)
    # sharpen: zero all but the argmax class so only it can pass 0.25
    cls = pred[:, 5:]
    keep_col = cls.argmax(1)
    sharp = np.zeros_like(cls)
    sharp[np.arange(len(cls)), keep_col] = cls.max(1)
    pred[:, 5:] = sharp
    det_s, valid_s = nms(jnp.asarray(pred), conf_thresh=0.25)
    det_m, valid_m = nms(jnp.asarray(pred), conf_thresh=0.25, multi_label=True)
    ns, nm = int(np.asarray(valid_s).sum()), int(np.asarray(valid_m).sum())
    assert ns == nm
    a = np.asarray(det_s)[np.asarray(valid_s)]
    b = np.asarray(det_m)[np.asarray(valid_m)]
    np.testing.assert_allclose(
        a[np.lexsort(a.T)], b[np.lexsort(b.T)], rtol=1e-6, atol=1e-5
    )


def test_batched_nms_multi_label_shape():
    rng = np.random.default_rng(9)
    preds = np.stack([_make_preds(rng, n=64) for _ in range(3)])
    det, valid = batched_nms(jnp.asarray(preds), conf_thresh=0.1, multi_label=True)
    assert det.shape == (3, 300, 6) and valid.shape == (3, 300)
    assert int(np.asarray(valid).sum()) > 0


def test_two_stage_topk_exact_parity():
    """The blocked top-k for large pools must return lax.top_k's exact
    result (values AND indices) on distinct scores, at P5/P6 pool sizes
    and awkward block boundaries."""
    import importlib

    import jax

    N = importlib.import_module("aquaculture_tpu.ops.nms")
    rng = np.random.default_rng(0)
    for n, k in ((100_800, 1024), (25_200, 1024), (8193, 512)):
        s = rng.permutation(n).astype(np.float32) / n
        v1, i1 = jax.lax.top_k(jnp.asarray(s), k)
        v2, i2 = N._two_stage_topk(jnp.asarray(s), k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # sparse pool with -1 below-threshold fill: real candidates first,
    # padding never leaks a finite score
    s = np.full(50_000, -1.0, np.float32)
    s[[5, 777, 49_999]] = [0.9, 0.8, 0.7]
    v2, i2 = N._two_stage_topk(jnp.asarray(s), 1024)
    assert list(np.asarray(i2[:3])) == [5, 777, 49_999]
    assert (np.asarray(v2[3:]) <= -1.0).all()


def test_nms_large_pool_two_stage_end_to_end():
    """End-to-end nms over a P6-sized pool (two-stage path active) equals
    the forced single-stage result."""
    import importlib

    N = importlib.import_module("aquaculture_tpu.ops.nms")
    rng = np.random.default_rng(1)
    n = 40_000
    pred = rng.random((n, 7)).astype(np.float32)
    pred[:, 0:2] = rng.uniform(0, 1200, (n, 2))
    pred[:, 2:4] = rng.uniform(10, 60, (n, 2))
    pred[:, 4] = rng.random(n) * 0.02  # sparse survivors
    pred[rng.choice(n, 200, replace=False), 4] = rng.uniform(0.5, 1.0, 200)

    det1, v1 = N.nms(jnp.asarray(pred), conf_thresh=0.25, pre_topk=1024)
    ratio = N._TWO_STAGE_RATIO
    try:
        N._TWO_STAGE_RATIO = 10**9  # force single-stage
        det2, v2 = N.nms(jnp.asarray(pred), conf_thresh=0.25, pre_topk=1024)
    finally:
        N._TWO_STAGE_RATIO = ratio
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det2), rtol=1e-6)


def test_nms_conf_threshold():
    rng = np.random.default_rng(1)
    pred = _make_preds(rng, n=100)
    det, valid = nms(jnp.asarray(pred), conf_thresh=0.99, iou_thresh=0.45, max_det=10)
    assert int(np.asarray(valid).sum()) == 0


def test_batched_nms_shape():
    rng = np.random.default_rng(2)
    preds = np.stack([_make_preds(rng, n=50) for _ in range(4)])
    det, valid = batched_nms(jnp.asarray(preds), max_det=20)
    assert det.shape == (4, 20, 6)
    assert valid.shape == (4, 20)


def test_batched_nms_approx_topk_agrees_when_pool_sparse():
    """WIRING test only: approx_topk threads through batched_nms and, on
    this CPU mesh (where lax.approx_max_k lowers to exact top_k), matches
    the exact path. It does NOT validate the TPU approximation — the real
    TPU lowering can drop same-block candidates (see _select_topk), which
    is why the flag is opt-in and unexposed; the TPU throughput A/B lives
    in scripts/infer_ablation_tpu.py (measured neutral)."""
    rng = np.random.default_rng(7)
    preds = np.stack([_make_preds(rng, n=4000) for _ in range(3)])
    # push most candidates below threshold
    preds[..., 4] *= rng.random(preds.shape[:2]) < 0.02
    kw = dict(conf_thresh=0.25, iou_thresh=0.45, max_det=50, pre_topk=512)
    det_e, val_e = batched_nms(jnp.asarray(preds), **kw)
    det_a, val_a = batched_nms(jnp.asarray(preds), approx_topk=True, **kw)
    np.testing.assert_array_equal(np.asarray(val_e), np.asarray(val_a))
    np.testing.assert_allclose(np.asarray(det_e), np.asarray(det_a), atol=1e-6)


def test_letterbox_square_1024_to_640():
    img = jnp.ones((1024, 1024, 3), jnp.uint8) * 200
    out, gain, pad = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert gain == pytest.approx(0.625)
    assert pad == (0, 0)
    assert float(np.asarray(out, np.float32).mean()) == pytest.approx(200 / 255, abs=1e-2)


def test_letterbox_rect_pads_centered():
    img = jnp.zeros((512, 1024, 3), jnp.uint8)
    out, gain, pad = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert gain == pytest.approx(0.625)
    assert pad == (0, 160)
    o = np.asarray(out, np.float32)
    # top pad rows are gray 114
    assert o[0, 0, 0] == pytest.approx(114 / 255, abs=1e-2)
    assert o[320, 0, 0] == pytest.approx(0, abs=1e-3)
    # inverse box map
    boxes = jnp.asarray([[0.0, 160.0, 640.0, 480.0]])
    src = np.asarray(unletterbox_boxes(boxes, gain, pad))
    np.testing.assert_allclose(src[0], [0, 0, 1024, 512], atol=1e-5)


@pytest.mark.slow
def test_tta_predict_identity_and_merge():
    """ops/tta.py: the identity config equals the plain forward exactly;
    the full 3-pass TTA concatenates per-pass pools with de-scaled,
    de-flipped coordinates inside the input frame."""
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.tta import TTA_FLIPS, TTA_SCALES, tta_predict

    model, params = yolov5_init("n", num_classes=2, seed=0)
    params = model.fuse(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))

    plain, _ = model.apply(params, x)
    ident = tta_predict(model, params, x, scales=(1.0,), flips=(None,))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(ident))

    full = tta_predict(model, params, x)
    # per-pass pool sizes: scale 1 -> 128px grid; 0.83 -> 106 -> pad 128;
    # 0.67 -> 85 -> pad 96
    def n_rows(size):
        return sum((size // s) ** 2 * 3 for s in model.strides)

    assert full.shape == (1, n_rows(128) * 2 + n_rows(96), 7)
    # the scale-1 pass is the literal plain forward
    np.testing.assert_array_equal(
        np.asarray(full[:, : plain.shape[1]]), np.asarray(plain)
    )
    f = np.asarray(full)
    assert np.isfinite(f).all()
    # de-scaled centers stay in (generous) input-frame bounds for all passes
    assert f[..., 0].min() > -200 and f[..., 0].max() < 350
    # NMS consumes the merged pool directly
    det, valid = batched_nms(full, conf_thresh=1e-5, max_det=25)
    assert det.shape == (1, 25, 6) and bool(valid.any())

    # flip de-mirroring: a flip-only pass maps the mirrored forward's cx
    # back through w0 - cx
    flip_only = tta_predict(model, params, x, scales=(1.0,), flips=("lr",))
    mirrored, _ = model.apply(params, x[:, :, ::-1, :])
    np.testing.assert_allclose(
        np.asarray(flip_only[..., 0]), 128.0 - np.asarray(mirrored[..., 0]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(flip_only[..., 1:]), np.asarray(mirrored[..., 1:])
    )


def test_feats_path_matches_rows_path():
    """The lane-efficient serving fast path (batched_nms_feats, straight
    from raw head maps, round 5) must produce the same detections as
    batched_nms(model.decode(feats)) — same box decode, same score math,
    same NMS; only the flat candidate ordering differs (anchor-major vs
    position-major), which can matter solely for exactly-tied scores.
    Implanted well-separated candidates make the comparison tie-free."""
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms_feats

    model, _ = yolov5_init("n", num_classes=5, seed=0)
    na, no = 3, 10
    rng = np.random.default_rng(7)
    B = 2
    feats = []
    for s in (8, 16, 32):
        h = w = 320 // s
        feats.append(rng.normal(-8.0, 0.3, (B, h, w, na * no)).astype(np.float32))
    for b in range(B):
        for _ in range(40):
            li = int(rng.integers(0, 3))
            h = w = 320 // (8 << li)
            y, x, a = int(rng.integers(0, h)), int(rng.integers(0, w)), int(rng.integers(0, na))
            base = a * no
            feats[li][b, y, x, base:base + 4] = rng.normal(0, 1, 4)
            feats[li][b, y, x, base + 4] = rng.uniform(1.0, 4.0)
            feats[li][b, y, x, base + 5:base + 10] = rng.normal(0, 2, 5)
    feats = [jnp.asarray(f) for f in feats]

    preds = model.decode(feats)
    det_a, val_a = batched_nms(preds, conf_thresh=0.01)
    det_b, val_b = batched_nms_feats(
        feats, model.anchor_table, model.strides, conf_thresh=0.01
    )
    da, db, va, vb = map(np.asarray, (det_a, det_b, val_a, val_b))
    assert va.sum() == vb.sum() and va.sum() > 40
    for i in range(B):
        ra, rb = da[i][va[i]], db[i][vb[i]]
        assert len(ra) == len(rb)
        np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-4)


def test_feats_path_p6_and_class_agnostic():
    """feats path on a P6 4-level head + class_agnostic parity."""
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms_feats

    model, _ = yolov5_init("n6", num_classes=2, seed=0)
    na = 3
    no = 7
    rng = np.random.default_rng(11)
    feats = []
    for s in model.strides:
        h = w = 256 // int(s)
        f = rng.normal(-8.0, 0.3, (1, h, w, na * no)).astype(np.float32)
        for _ in range(10):
            y, x, a = int(rng.integers(0, h)), int(rng.integers(0, w)), int(rng.integers(0, na))
            f[0, y, x, a * no + 4] = rng.uniform(1.0, 4.0)
            f[0, y, x, a * no + 5:a * no + 7] = rng.normal(0, 2, 2)
        feats.append(f)
    feats = [jnp.asarray(f) for f in feats]
    preds = model.decode(feats)
    for agn in (False, True):
        det_a, val_a = batched_nms(preds, conf_thresh=0.01, class_agnostic=agn)
        det_b, val_b = batched_nms_feats(
            feats, model.anchor_table, model.strides, conf_thresh=0.01,
            class_agnostic=agn,
        )
        da, db, va, vb = map(np.asarray, (det_a, det_b, val_a, val_b))
        assert va.sum() == vb.sum() > 0
        ra, rb = da[0][va[0]], db[0][vb[0]]
        np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-4)
