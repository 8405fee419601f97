"""Exactness of the phase-decomposed strided-conv input gradient.

models/phase_grad.py rewrites dX of stride-2 convs as one fused stride-1
phase conv (full-lane GEMM instead of XLA's dilated transpose). These
tests pin it to autodiff: same dX, same dW, for every (k, padding, C)
shape the detector family uses, odd spatial sizes included, through the
full conv_block and a real train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aquaculture_tpu.models import layers, phase_grad


def _grads(fn, x, w):
    (dx, dw) = jax.grad(lambda x_, w_: jnp.sum(jnp.sin(fn(x_, w_))), argnums=(0, 1))(x, w)
    return np.asarray(dx, np.float64), np.asarray(dw, np.float64)


@pytest.mark.parametrize(
    "k,ci,co,h,w",
    [
        (3, 32, 64, 16, 16),    # the worst measured dX shape class (k3s2)
        (3, 64, 128, 10, 14),   # non-square
        (3, 3, 16, 9, 11),      # odd spatial: phase slice path
        (6, 3, 32, 20, 20),     # the stem (k6s2, pad 2)
        (6, 8, 24, 13, 17),     # stem geometry, odd spatial
        (4, 8, 16, 12, 12),     # even k, robustness (not in the family)
        (5, 8, 16, 12, 14),     # odd k>3, robustness
    ],
)
def test_phase_dx_matches_autodiff(k, ci, co, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
    p = k // 2
    pad = ((p, p), (p, p))
    assert phase_grad.phase_dx_supported(k, 2, pad)

    plain = lambda x_, w_: phase_grad._plain_conv(x_, w_, 2, pad)
    phased = lambda x_, w_: phase_grad.conv2d_phase(x_, w_, 2, pad)

    # forward bit-identical
    np.testing.assert_array_equal(np.asarray(plain(x, wt)), np.asarray(phased(x, wt)))

    dx_ref, dw_ref = _grads(plain, x, wt)
    dx_ph, dw_ph = _grads(phased, x, wt)
    np.testing.assert_allclose(dx_ph, dx_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw_ph, dw_ref, rtol=1e-5, atol=1e-5)


def test_phase_dx_valid_padding():
    # pad 0 exercises a different phase plan (conv_pad_lo > 0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 8)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    pad = ((0, 0), (0, 0))
    assert phase_grad.phase_dx_supported(3, 2, pad)
    plain = lambda x_, w_: phase_grad._plain_conv(x_, w_, 2, pad)
    phased = lambda x_, w_: phase_grad.conv2d_phase(x_, w_, 2, pad)
    dx_ref, dw_ref = _grads(plain, x, wt)
    dx_ph, dw_ph = _grads(phased, x, wt)
    np.testing.assert_allclose(dx_ph, dx_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw_ph, dw_ref, rtol=1e-5, atol=1e-5)


def test_unsupported_falls_back():
    assert not phase_grad.phase_dx_supported(3, 1, ((1, 1), (1, 1)))
    assert not phase_grad.phase_dx_supported(3, 3, ((1, 1), (1, 1)))
    # asymmetric between dims
    assert not phase_grad.phase_dx_supported(3, 2, ((1, 1), (0, 0)))


def test_conv2d_dispatch_under_ctx():
    """layers.conv2d inside phase_grad_ctx must produce identical forwards
    and autodiff-identical grads (the ctx only swaps the vjp)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)

    def f(x_, w_):
        return jnp.sum(jnp.tanh(layers.conv2d(x_, w_, stride=2)))

    ref = jax.grad(f, argnums=(0, 1))(x, wt)
    with layers.phase_grad_ctx(True):
        got = jax.grad(f, argnums=(0, 1))(x, wt)
    for g_ref, g_got in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )
    # ctx restored
    assert not layers._PHASE_GRAD_DX


@pytest.mark.slow
def test_remat_composes_with_phase_grad():
    """jax.checkpoint replays the forward during backward; the replayed
    trace must still carry the phase-dX custom vjp (a user can set both
    remat=True and phase_grad_dx=True)."""
    import numpy as np

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    model, params = yolov5_init("n", num_classes=2, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((2, 64, 64, 3), np.float32)),
        "labels": jnp.asarray(
            [[[0, 32, 32, 10, 10]] + [[0, 0, 0, 0, 0]] * 119] * 2, jnp.float32
        ),
        "label_mask": jnp.asarray([[True] + [False] * 119] * 2),
    }
    losses = {}
    for remat in (False, True):
        cfg = TrainConfig(
            img_size=64, batch_size=2, epochs=1, compute_dtype="float32",
            phase_grad_dx=True, remat=remat,
        )
        state = init_train_state(model, params)
        step = jax.jit(make_train_step(model, cfg, steps_per_epoch=1))
        _, m = step(state, batch)
        losses[remat] = float(m["total"])
    assert abs(losses[False] - losses[True]) < 1e-5, losses


@pytest.mark.slow
def test_sharded_train_step_composes_with_phase_grad():
    """The phase-dX custom vjp must compose with the (data, model) mesh
    sharding the driver's dryrun exercises — a batch-sharded conv over dY
    is still just a conv, but the custom_vjp boundary has to trace under
    shard_map/pjit without requiring replication."""
    import numpy as np

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.parallel.mesh import make_mesh
    from aquaculture_tpu.parallel.sharded import sharded_train_step
    from aquaculture_tpu.train.trainer import init_train_state

    model, params = yolov5_init("n", num_classes=2, seed=0)
    cfg = TrainConfig(
        img_size=64, batch_size=8, epochs=1,
        phase_grad_dx=True, compute_dtype="float32",
    )
    mesh = make_mesh(4, 2)
    state = init_train_state(model, params)
    step, sh_state = sharded_train_step(
        model, cfg, mesh, steps_per_epoch=2, state=state
    )
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((8, 64, 64, 3), np.float32)),
        "labels": jnp.asarray(rng.random((8, 120, 5), np.float32) * 16),
        "label_mask": jnp.asarray(np.arange(120)[None] < 2).repeat(8, 0),
    }
    sh_state, m = step(sh_state, batch)
    assert np.isfinite(float(m["total"]))


@pytest.mark.slow
def test_train_step_grads_match_with_phase_grad():
    """Full train step on the n variant: parameter grads with
    phase_grad_dx on/off agree to f32 tolerance (f32 compute so the only
    difference is summation order inside the rewritten conv)."""
    import dataclasses

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    model, params = yolov5_init("n", num_classes=2, seed=0)
    cfg = TrainConfig(
        img_size=64, batch_size=2, epochs=1, compute_dtype="float32"
    )
    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32),
        "labels": jnp.asarray(
            [[[0, 32, 32, 10, 10]] + [[0, 0, 0, 0, 0]] * 119] * 2, jnp.float32
        ),
        "label_mask": jnp.asarray([[True] + [False] * 119] * 2),
    }

    outs = {}
    for on in (False, True):
        c = dataclasses.replace(cfg, phase_grad_dx=on)
        state = init_train_state(model, params)
        step = make_train_step(model, c, steps_per_epoch=1)
        new_state, metrics = jax.jit(step)(state, batch)
        outs[on] = (
            jax.tree.map(lambda a: np.asarray(a, np.float64), new_state.params),
            float(metrics["total"]),
        )

    assert np.isclose(outs[False][1], outs[True][1], rtol=1e-5)
    flat_ref = jax.tree.leaves(outs[False][0])
    flat_got = jax.tree.leaves(outs[True][0])
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)
