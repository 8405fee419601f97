"""YOLOv5 model tests: architecture shapes, param counts, torch-oracle layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aquaculture_tpu.models import layers as L
from aquaculture_tpu.models.yolov5 import VARIANTS, YoloV5, yolov5_init


def test_channel_widths_m():
    m = YoloV5(variant="m")
    ch = m.channels()
    assert ch == {"c1": 48, "c2": 96, "c3": 192, "c4": 384, "c5": 768}
    assert m.depths() == {"n3": 2, "n6": 4, "n9": 6}


def test_param_count_yolov5m():
    # Public YOLOv5m has 21.2M params at nc=80; at nc=5 the detect head
    # shrinks by 3*(192+384+768+3)*75 params. Expect ~20.9M.
    model, params = yolov5_init("m", num_classes=5, seed=0)
    n = model.num_params(params)
    assert 20.5e6 < n < 21.5e6


def test_param_count_yolov5s():
    model, params = yolov5_init("s", num_classes=80, seed=0)
    n = model.num_params(params)
    # Public figure: 7.2M
    assert 7.0e6 < n < 7.5e6


def test_forward_shapes_and_decode():
    model, params = yolov5_init("m", num_classes=5, seed=0)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    feats, _ = jax.jit(lambda p, t: model.features(p, t))(params, x)
    assert [f.shape for f in feats] == [
        (1, 40, 40, 30),
        (1, 20, 20, 30),
        (1, 10, 10, 30),
    ]
    preds = model.decode(feats)
    assert preds.shape == (1, (40 * 40 + 20 * 20 + 10 * 10) * 3, 10)
    p = np.asarray(preds)
    assert p[..., 2:4].min() >= 0
    assert np.isfinite(p).all()


def test_fused_matches_unfused():
    model, params = yolov5_init("n", num_classes=5, seed=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    apply = jax.jit(lambda p, t: model.apply(p, t)[0])
    preds = apply(params, x)
    preds_fused = apply(model.fuse(params), x)
    # BN folding reorders f32 arithmetic; coordinates are O(100) so compare
    # with a relative tolerance.
    np.testing.assert_allclose(
        np.asarray(preds), np.asarray(preds_fused), rtol=2e-3, atol=2e-2
    )


def test_conv_block_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 8), dtype=np.float32)
    w = rng.standard_normal((3, 3, 8, 12), dtype=np.float32) * 0.1
    scale = rng.uniform(0.5, 1.5, 12).astype(np.float32)
    bias = rng.standard_normal(12).astype(np.float32)
    mean = rng.standard_normal(12).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, 12).astype(np.float32)

    p = {
        "w": jnp.asarray(w),
        "bn": {
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(bias),
            "mean": jnp.asarray(mean),
            "var": jnp.asarray(var),
        },
    }
    y, _ = L.conv_block(jnp.asarray(x), p, stride=1)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    yt = torch.nn.functional.conv2d(xt, wt, padding=1)
    bn = torch.nn.BatchNorm2d(12, eps=1e-3)
    bn.weight.data = torch.from_numpy(scale)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    bn.eval()
    with torch.no_grad():
        yt = bn(yt)
        yt = yt * torch.sigmoid(yt)
    yt = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-4)


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    y = L.max_pool(jnp.asarray(x), k=5)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.nn.functional.max_pool2d(xt, 5, stride=1, padding=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-6)


def test_upsample2x():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    y = L.upsample2x(x)
    assert y.shape == (1, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :2, :2, 0]), np.asarray(x[0, 0, 0, 0]) * np.ones((2, 2)))


@pytest.mark.slow
def test_variants_all_build():
    x = jnp.zeros((1, 64, 64, 3))
    n = (8 * 8 + 4 * 4 + 2 * 2) * 3
    for v in ("n", "s"):
        model, params = yolov5_init(v, num_classes=5, seed=0)
        preds = jax.jit(lambda p, t: model.apply(p, t)[0])(params, x)
        assert preds.shape == (1, n, 10)
    # l/x: architecture construction only (forward covered by n/s/m paths)
    for v in ("l", "x"):
        model, params = yolov5_init(v, num_classes=5, seed=0)
        assert model.num_params(params) > 0


def test_stem_s2d_reparametrization_exact():
    """fuse(stem_s2d=True) must be EXACTLY the k6/s2 stem: space-to-depth
    plus a k3/s1 conv with rearranged taps computes the same sums."""
    import numpy as np

    model, params = yolov5_init("n", num_classes=3, seed=4)
    x = jnp.asarray(np.random.default_rng(1).random((2, 96, 96, 3), dtype=np.float32))
    p_plain, _ = model.apply(model.fuse(params, stem_s2d=False), x)
    p_s2d, _ = model.apply(model.fuse(params, stem_s2d=True), x)
    np.testing.assert_allclose(np.asarray(p_plain), np.asarray(p_s2d), atol=1e-4)


@pytest.mark.slow
def test_p6_family_forward_decode_and_train_step():
    """P6 variants (extra stride-64 level, 4-level PANet; public
    yolov5-p6 yaml): decode emits sum((S/s)^2*3) rows over strides
    8/16/32/64, fuse (incl. stem s2d) matches unfused, and the 4-level
    loss is finite."""
    import numpy as np

    from aquaculture_tpu.train.loss import yolo_loss

    model, params = yolov5_init("n6", num_classes=2, seed=0)
    assert model.strides == (8, 16, 32, 64)
    assert len(params["head"]) == 4 and "b11" in params and "n32" in params
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3), dtype=np.float32))
    preds, _ = model.apply(params, x)
    n = sum((128 // s) ** 2 * 3 for s in model.strides)
    assert preds.shape == (1, n, 7)
    fused = model.fuse(params)
    pf, _ = model.apply(fused, x)
    assert np.allclose(np.asarray(preds), np.asarray(pf), atol=2e-2)

    feats, _ = model.features(params, x, training=True)
    assert len(feats) == 4
    labels = jnp.asarray([[[0.0, 40.0, 40.0, 24.0, 24.0]]])
    mask = jnp.asarray([[True]])
    loss, metrics = yolo_loss(
        feats, labels, mask, model.anchor_table, 2, strides=model.strides
    )
    assert bool(jnp.isfinite(loss)) and float(loss) > 0

    # x6: construction only (heaviest variant)
    m6, p6 = yolov5_init("x6", num_classes=5, seed=0)
    assert m6.num_params(p6) > 0


def test_down_s2d_reparametrization_exact():
    """fuse(down_s2d=...) must be EXACTLY the k3/s2/p1 downsample convs:
    space-to-depth plus a k2/s1/(1,0)-pad conv with rearranged taps
    computes the same sums (layers.down_weights_to_s2d), on both the P5
    backbone+neck downsamples and the P6 family's."""
    import numpy as np

    for variant, size, downs in [
        ("n", 96, ("b1", "b3", "b5", "b7", "n18", "n21")),
        ("n6", 128, ("b1", "b3", "b5", "b7", "b9", "n24", "n27", "n30")),
    ]:
        model, params = yolov5_init(variant, num_classes=3, seed=4)
        x = jnp.asarray(
            np.random.default_rng(1).random((2, size, size, 3), dtype=np.float32)
        )
        p_plain, _ = model.apply(model.fuse(params, down_s2d=()), x)
        p_s2d, _ = model.apply(model.fuse(params, down_s2d=downs), x)
        np.testing.assert_allclose(
            np.asarray(p_plain), np.asarray(p_s2d), atol=1e-3,
            err_msg=variant,
        )


def test_down_s2d_rejects_ineligible_names():
    """A typo'd name, a wrong-family neck name, or a quantized tree must
    raise instead of silently no-opping (review r3c: a silent skip would
    mislabel any A/B measurement built on the flag)."""
    import pytest

    model, params = yolov5_init("n", num_classes=3, seed=0)
    with pytest.raises(ValueError, match="not a stride-2 downsample"):
        model.fuse(params, down_s2d=("b2",))  # a C3 block, not a downsample
    with pytest.raises(ValueError, match="not a stride-2 downsample"):
        model.fuse(params, down_s2d=("n24",))  # P6-only name on a P5 model
    with pytest.raises(ValueError, match="not a stride-2 downsample"):
        model.fuse(params, down_s2d=("nope",))


def test_mt_lane_aligned_variant():
    """mt (TPU-lane-aligned channel map; scripts/lane_search.py) must build,
    forward to the same head geometry as m, fuse exactly, and dominate m's
    capacity proxies (params and useful FLOPs) — the accuracy-class claim
    BENCHMARKS.md makes for it. No reference analogue: the reference only
    ships the public GPU-tuned width table (its yolov5 submodule contract,
    /root/reference/README.md:52)."""
    from aquaculture_tpu.models.yolov5 import CHANNEL_OVERRIDES

    assert "mt" in VARIANTS and "mt" in CHANNEL_OVERRIDES
    model, params = yolov5_init("mt", num_classes=5, seed=0)
    ch = model.channels()
    assert ch == CHANNEL_OVERRIDES["mt"]
    # MXU-bound stages land on the 128-lane tile, INCLUDING their C3
    # hidden halves (c/2 — so c must be a multiple of 256); early
    # HBM-bound stages are unconstrained.
    for key in ("c3", "c4", "c5"):
        assert ch[key] % 256 == 0, (key, ch[key])

    m_model, m_params = yolov5_init("m", num_classes=5, seed=0)
    assert model.num_params(params) > m_model.num_params(m_params)

    x = jnp.zeros((1, 128, 128, 3))
    n_rows = (16 * 16 + 8 * 8 + 4 * 4) * 3
    preds = jax.jit(lambda p, t: model.apply(p, t)[0])(params, x)
    assert preds.shape == (1, n_rows, 10)

    # fuse (BN fold + stem s2d default) stays numerically faithful
    xr = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    apply = jax.jit(lambda p, t: model.apply(p, t)[0])
    np.testing.assert_allclose(
        np.asarray(apply(params, xr)), np.asarray(apply(model.fuse(params), xr)),
        rtol=2e-3, atol=2e-2,
    )


def test_serving_plan_recommendations():
    """plan.recommend_serving encodes ONLY the measured decision rules
    (BENCHMARKS.md): mt for batched throughput, m for latency/.pt interop,
    int8 on m and (at its measured 1280/b128 geometry) m6, batch knee 128,
    P6-or-overlap for boundary accuracy."""
    from aquaculture_tpu.models.plan import recommend_serving

    p = recommend_serving()
    assert (p.variant, p.batch, p.int8, p.overlap_px) == ("mt", 128, False, 0)
    # decode-at-scale: mAP-gated on the mt@640 production config (r4)
    assert p.decode_scale

    p = recommend_serving(pt_interop=True)
    assert (p.variant, p.int8) == ("m", True)

    # round 4: batch-1 device compute is variant-equal (3.95 vs 3.98
    # ms/tile), so the latency path keeps the batched winner mt
    p = recommend_serving(latency_sensitive=True)
    assert (p.variant, p.batch, p.int8) == ("mt", 1, False)

    # round 4: the P6 amortization ladder erased P6's throughput penalty
    # (m6@1280 b128 = 44.5% MFU, same as m@640 b128) — boundary accuracy
    # now picks the P6 family at its native resolution, no seams
    p = recommend_serving(boundary_accuracy=True)
    assert (p.variant, p.img_size, p.batch, p.overlap_px) == ("m6", 1280, 128, 0)
    assert not p.decode_scale  # 1280 is not a sub-tile fraction
    # round 4d: int8-safe on m6@1280 b128 measured +5.9% AND mAP-bounded
    # at the production geometry (BENCH_ACCURACY prod_m6_1280_e400)
    assert p.int8

    # a pinned non-P6 variant falls back to overlap serving
    p = recommend_serving(boundary_accuracy=True, variant="mt")
    assert p.overlap_px > 0 and p.variant == "mt"
    assert not p.decode_scale  # overlap slices at source resolution

    # the m6@1280 pick is a b128 amortization result — it must NOT be
    # applied on the batch-1 latency path (m6 is dispatch-bound
    # unamortized); boundary accuracy there is overlap serving
    p = recommend_serving(boundary_accuracy=True, latency_sensitive=True)
    assert not p.variant.endswith("6")
    assert (p.batch, p.overlap_px) == (1, 64)

    # an explicitly stated img is honored verbatim, never rewritten to
    # 1280; the unmeasured m6@<img> pick falls back to overlap serving
    p = recommend_serving(boundary_accuracy=True, img=640)
    assert p.img_size == 640 and not p.variant.endswith("6")
    assert p.overlap_px == 64

    # a pinned P6 variant defaults to its native resolution...
    p = recommend_serving(variant="m6")
    assert p.img_size == 1280
    # ...and with boundary_accuracy serves whole tiles (no seams)
    p = recommend_serving(boundary_accuracy=True, variant="m6")
    assert (p.img_size, p.overlap_px) == (1280, 0)
    # ...but pinned P6 BELOW the tile size still slices -> overlap
    p = recommend_serving(boundary_accuracy=True, variant="m6", img=640)
    assert (p.img_size, p.overlap_px) == (640, 64)

    p = recommend_serving(variant="m6", img=1280)
    assert not p.decode_scale  # 1280 is not a sub-tile fraction

    p = recommend_serving(variant="n")
    assert not p.int8  # measured net loss on n

    p = recommend_serving(variant="m6", img=1280)
    assert p.int8 and p.img_size == 1280
    # ...but the m6 int8 pair (throughput + accuracy) exists only at
    # 1280/b128: any other P6 geometry stays bf16
    assert not recommend_serving(variant="m6", img=640).int8
    assert not recommend_serving(
        variant="m6", boundary_accuracy=True, latency_sensitive=True).int8

    import pytest as _pytest
    with _pytest.raises(ValueError):
        recommend_serving(variant="zz")

    # every choice carries provenance
    assert all(isinstance(n, str) and n for n in p.notes)
