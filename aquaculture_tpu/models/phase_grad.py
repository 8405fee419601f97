"""Phase-decomposed input gradients for strided convolutions.

The training roofline (docs/SCALING.md, round 4) attributes 44% of the
mt@640 training bound to the input-gradient (dX) convolutions at 46% mean
lane efficiency: XLA transposes a stride-2 conv into a conv with
``lhs_dilation=2`` whose implicit GEMM contracts over ``k*k*C_out`` but
writes only ``C_in`` output lanes — the stem-adjacent downsamples
(C_in = 32/64) fill 6-25% of the 128-lane MXU tile and pay 4x dilation
zeros on top.

This module rewrites that gradient exactly. ``dX`` of a stride-``s`` conv
is an interleave of ``s*s`` PHASE convolutions, each a plain stride-1
conv of ``dY`` with a parity-subsampled kernel:

    dX[n, s*a+r, s*b+t, ci] = sum_m,l,co dY[n, a+d_r-m, b+d_t-l, co]
                                        * w[s*m+rho_r, s*l+rho_t, ci, co]

Fusing all phases into ONE conv whose kernel stacks the subsampled taps
along the output-channel axis turns the GEMM into ``(k/s)^2 * C_out ->
s*s*C_in`` — for the worst measured kernel (160^2 x32 -> 64ch k3s2 dX)
that is 4*32 = 128 output lanes, a full MXU tile, with zero dilation
waste. The interleave back to ``dX`` is a pixel shuffle XLA fuses into
the conv epilogue.

The weight gradient (measured at 86.5% lane efficiency — not the
bottleneck) keeps XLA's native transpose via ``jax.linear_transpose``.

Exactness is CI-enforced against autodiff (tests/test_phase_grad.py);
the on-chip A/B (scripts/phase_grad_probe_tpu.py) gates the default the
same way down_s2d/stem_s2d were gated (BENCHMARKS.md). Opt-in via
``TrainConfig.phase_grad_dx`` until measured.

Reference context: the reference trains via torch/cuDNN which picks
specialized backward-data kernels per shape (reference: README.md:52);
this is the TPU-native equivalent of that kernel choice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize_padding(k: int, padding) -> tuple[tuple[int, int], tuple[int, int]]:
    if padding is None:
        p = k // 2
        return ((p, p), (p, p))
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _phase_plan_1d(k: int, s: int, pad_lo: int):
    """Per-phase tap parity/extent/offset for one spatial dim.

    Returns (plans, M, conv_pad_lo) where plans[r] = (rho, M_r, delta_r):
    phase r of dX reads taps u = s*m + rho and dY rows a + delta_r - m.
    """
    plans = []
    for r in range(s):
        rho = (r + pad_lo) % s
        m_r = max(0, (k - rho + s - 1) // s)
        delta = (r + pad_lo - rho) // s
        plans.append((rho, m_r, delta))
    conv_pad_lo = max(0, max(m_r - 1 - delta for (_, m_r, delta) in plans))
    m_ext = max(
        max(m_r for (_, m_r, _) in plans),
        conv_pad_lo + max(delta for (_, _, delta) in plans) + 1,
    )
    return plans, m_ext, conv_pad_lo


def phase_dx_supported(k: int, stride: int, padding) -> bool:
    """The rewrite covers every conv this model family uses (k3s2/k6s2);
    anything else falls back to XLA's native transpose."""
    if stride != 2:
        return False
    (plo, _), (plo_w, _) = _normalize_padding(k, padding)
    if plo != plo_w:
        return False
    plans, _, _ = _phase_plan_1d(k, stride, plo)
    return all(m_r > 0 for (_, m_r, _) in plans)


def _phase_kernel(w: jnp.ndarray, s: int, pad_lo_h: int, pad_lo_w: int):
    """Build the fused phase kernel.

    w: (kh, kw, Ci, Co) HWIO of the forward conv.
    Returns (what, (Mh, cplo_h), (Mw, cplo_w)) with
    what: (Mh, Mw, Co, s*s*Ci) — phase-major output channels, taps placed
    so a single stride-1 conv over dY computes every phase at once.
    """
    kh, kw, ci, co = w.shape
    plans_h, mh, cplo_h = _phase_plan_1d(kh, s, pad_lo_h)
    plans_w, mw, cplo_w = _phase_plan_1d(kw, s, pad_lo_w)
    blocks = []
    for r, (rho_h, mrh, dh) in enumerate(plans_h):
        for t, (rho_w, mrw, dw_) in enumerate(plans_w):
            # taps of this phase: u = s*m + rho; conv tap index
            # j = cplo + delta - m (decreasing in m => flip)
            sub = w[rho_h::s, rho_w::s, :, :][:mrh, :mrw]
            sub = jnp.flip(sub, axis=(0, 1))
            j0_h = cplo_h + dh - (mrh - 1)
            j0_w = cplo_w + dw_ - (mrw - 1)
            sub = jnp.pad(
                sub,
                (
                    (j0_h, mh - mrh - j0_h),
                    (j0_w, mw - mrw - j0_w),
                    (0, 0),
                    (0, 0),
                ),
            )
            # (Mh, Mw, Ci, Co) -> (Mh, Mw, Co, Ci): dY channels contract
            blocks.append(jnp.transpose(sub, (0, 1, 3, 2)))
    what = jnp.stack(blocks, axis=3)  # (Mh, Mw, Co, s*s, Ci)
    return what.reshape(mh, mw, co, s * s * ci), (mh, cplo_h), (mw, cplo_w)


def _phase_dx(dy: jnp.ndarray, w: jnp.ndarray, s: int, padding, x_shape):
    """dX of conv2d(x, w, stride=s, padding) via the fused phase conv."""
    (plo_h, _), (plo_w, _) = padding
    n, hy, wy, co = dy.shape
    _, hx, wx, ci = x_shape
    what, (mh, cplo_h), (mw, cplo_w) = _phase_kernel(w, s, plo_h, plo_w)
    ah, aw = -(-hx // s), -(-wx // s)  # phases produced, sliced to hx/wx
    pad_h = (cplo_h, ah - 1 - hy + mh - cplo_h)
    pad_w = (cplo_w, aw - 1 - wy + mw - cplo_w)
    out = jax.lax.conv_general_dilated(
        dy,
        what.astype(dy.dtype),
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dy.dtype,
    )
    # (n, ah, aw, s, s, ci) -> interleave: dX[s*a+r, s*b+t] = out[a, b, r, t]
    out = out.reshape(n, ah, aw, s, s, ci)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(n, ah * s, aw * s, ci)
    return out[:, :hx, :wx, :]


def _plain_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_phase(x, w, stride, padding):
    """conv2d whose input gradient lowers to the fused phase conv.

    Forward is bit-identical to the plain conv; only the vjp differs.
    ``padding`` must be a tuple of (lo, hi) tuples (hashable nondiff arg).
    """
    return _plain_conv(x, w, stride, padding)


def _conv2d_phase_fwd(x, w, stride, padding):
    return _plain_conv(x, w, stride, padding), (x, w)


def _conv2d_phase_bwd(stride, padding, res, dy):
    x, w = res
    # dW: XLA's native transpose (measured 86.5% lane eff — keep it).
    # linear_transpose stages the transpose without re-running the primal.
    dw = jax.linear_transpose(lambda w_: _plain_conv(x, w_, stride, padding), w)(dy)[0]
    dx = _phase_dx(dy, w, stride, padding, x.shape).astype(x.dtype)
    return dx, dw.astype(w.dtype)


conv2d_phase.defvjp(_conv2d_phase_fwd, _conv2d_phase_bwd)
