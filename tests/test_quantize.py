"""int8 PTQ tests: quantized conv error bounds, full-model agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aquaculture_tpu.models import layers as L
from aquaculture_tpu.models.quantize import calibrate, quantize, quantize_model
from aquaculture_tpu.models.yolov5 import yolov5_init


def test_calibration_records_every_conv_block():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    fused = model.fuse(params)
    imgs = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32))
    stats = calibrate(model, fused, imgs)
    # count conv_block call sites = conv dicts outside the head
    def count(node):
        if isinstance(node, dict):
            if "w" in node and "b" in node:
                return 1
            return sum(count(v) for v in node.values())
        if isinstance(node, (list, tuple)):
            return sum(count(v) for v in node)
        return 0

    n_convs = count({k: v for k, v in fused.items() if k != "head"})
    in_keys = [k for k in stats if isinstance(k, int)]
    out_keys = [k for k in stats if isinstance(k, tuple) and k[0] == "out"]
    sum_keys = [k for k in stats if isinstance(k, tuple) and k[0] == "sum"]
    assert len(in_keys) == n_convs
    assert len(out_keys) == n_convs  # post-SiLU scale for the int8 pipeline
    assert len(sum_keys) > 0         # shortcut-bottleneck sums (backbone C3s)
    assert all(v > 0 for v in stats.values())


def test_quantized_conv_block_error_bound():
    rng = np.random.default_rng(1)
    cin, cout = 8, 16
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32) * 0.01
    x = rng.random((1, 16, 16, cin)).astype(np.float32)

    exact, _ = L.conv_block(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)})

    wmax = np.abs(w).max(axis=(0, 1, 2))
    wscale = wmax / 127.0
    wq = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
    xscale = np.float32(np.abs(x).max() / 127.0)
    qp = {
        "wq": jnp.asarray(wq),
        "wscale": jnp.asarray(wscale.astype(np.float32)),
        "xscale": jnp.asarray(xscale),
        "b": jnp.asarray(b),
    }
    qout, _ = L.conv_block(jnp.asarray(x), qp)
    err = np.abs(np.asarray(qout, np.float32) - np.asarray(exact, np.float32))
    # int8 quantization noise: small relative to activation magnitudes
    assert err.mean() < 0.02
    assert err.max() < 0.2


def test_full_model_quantized_agreement():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    fused = model.fuse(params)
    rng = np.random.default_rng(2)
    calib_imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    qparams = quantize_model(model, fused, calib_imgs)

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    p_f, _ = model.apply(fused, x)
    p_q, _ = model.apply(qparams, x)
    a = np.asarray(p_f, np.float32).ravel()
    b = np.asarray(p_q, np.float32).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos
    # decoded box centers stay within a few pixels
    xy_f = np.asarray(p_f[0, :, :2])
    xy_q = np.asarray(p_q[0, :, :2])
    assert np.median(np.abs(xy_f - xy_q)) < 2.0


def test_mixed_precision_skip_prefix():
    """skip=(early layers) keeps them float; agreement with the full-float
    model must be at least as good as full int8 (fewer quantized stages)."""
    model, params = yolov5_init("n", num_classes=2, seed=0)
    fused = model.fuse(params)
    rng = np.random.default_rng(3)
    calib_imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    skip = ("b0", "b1", "b2", "b3", "b4")
    qmix = quantize_model(model, fused, calib_imgs, skip=skip)
    # b0..b4 stay float (no int8 leaf anywhere in the subtree), b5+ quantized
    import jax

    for k in skip:
        assert not any(
            a.dtype == np.int8 for a in jax.tree_util.tree_leaves(qmix[k])
        ), k
    assert "wq" in qmix["b5"]

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    p_f, _ = model.apply(fused, x)
    p_m, _ = model.apply(qmix, x)
    a = np.asarray(p_f, np.float32).ravel()
    b = np.asarray(p_m, np.float32).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos


def test_head_stays_float():
    model, params = yolov5_init("n", num_classes=2, seed=0)
    fused = model.fuse(params)
    imgs = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), dtype=np.float32))
    qparams = quantize_model(model, fused, imgs)
    assert "wq" not in qparams["head"][0]
    assert "wq" in qparams["b0"]


def test_p6_quantization_pipeline():
    """The int8 walk handles the P6 topology: b10 is a shortcut C3, the
    4-level head stays float, and the mixed skip-prefix works."""
    model, params = yolov5_init("n6", num_classes=2, seed=0)
    fused = model.fuse(params)
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
    q = quantize_model(model, fused, calib, skip=("b0", "b1", "b2", "b3", "b4"))
    assert "wq" in q["b5"] and "wq" not in q["b0"]
    assert all("wq" not in hp for hp in q["head"])  # 4-level head stays float
    x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    p_f, _ = model.apply(fused, x)
    p_q, _ = model.apply(q, x)
    a = np.asarray(p_f, np.float32).ravel()
    b = np.asarray(p_q, np.float32).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos
