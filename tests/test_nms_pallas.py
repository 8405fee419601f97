"""Pallas NMS suppression kernel vs the XLA reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aquaculture_tpu.ops.nms import _greedy_suppress, _iou_matrix
from aquaculture_tpu.ops.nms_pallas import greedy_suppress_pallas


def _random_sorted_boxes(rng, b=2, k=256, size=640.0):
    cx = rng.uniform(50, size - 50, (b, k))
    cy = rng.uniform(50, size - 50, (b, k))
    w = rng.uniform(10, 120, (b, k))
    h = rng.uniform(10, 120, (b, k))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    valid = rng.random((b, k)) > 0.1
    return jnp.asarray(boxes, jnp.float32), jnp.asarray(valid)


def _xla_reference(boxes, valid, thresh):
    def one(bx, v):
        iou = _iou_matrix(bx)
        return _greedy_suppress(iou, v, thresh)

    return jax.vmap(one)(boxes, valid)


@pytest.mark.parametrize("k", [128, 256, 384, 512, 640])
def test_pallas_suppress_matches_xla(k):
    rng = np.random.default_rng(0)
    boxes, valid = _random_sorted_boxes(rng, b=3, k=k)
    ours = greedy_suppress_pallas(boxes, valid, 0.45, interpret=True)
    ref = _xla_reference(boxes, valid, 0.45)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_pallas_suppress_invalid_stay_suppressed():
    rng = np.random.default_rng(1)
    boxes, valid = _random_sorted_boxes(rng, b=1, k=128)
    valid = valid.at[0, :64].set(False)
    keep = greedy_suppress_pallas(boxes, valid, 0.45, interpret=True)
    assert not np.asarray(keep)[0, :64].any()


def test_pallas_suppress_all_identical_keeps_first():
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 50.0, 50.0]]), (1, 128, 1)).reshape(1, 128, 4)
    valid = jnp.ones((1, 128), bool)
    keep = greedy_suppress_pallas(boxes, valid, 0.45, interpret=True)
    k = np.asarray(keep)[0]
    assert k[0] and not k[1:].any()


def test_batched_nms_backends_agree():
    from aquaculture_tpu.ops.nms import batched_nms

    rng = np.random.default_rng(3)
    n, nc = 300, 5
    preds = np.concatenate(
        [
            np.stack(
                [
                    rng.uniform(50, 590, (2, n)),
                    rng.uniform(50, 590, (2, n)),
                    rng.uniform(10, 120, (2, n)),
                    rng.uniform(10, 120, (2, n)),
                    rng.uniform(0, 1, (2, n)),
                ],
                axis=-1,
            ),
            rng.dirichlet(np.ones(nc), (2, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    p = jnp.asarray(preds)
    det_x, val_x = batched_nms(p, conf_thresh=0.1, max_det=100, pre_topk=256, backend="xla")
    det_p, val_p = batched_nms(p, conf_thresh=0.1, max_det=100, pre_topk=256, backend="pallas")
    np.testing.assert_array_equal(np.asarray(val_x), np.asarray(val_p))
    np.testing.assert_allclose(np.asarray(det_x), np.asarray(det_p), atol=1e-5)
