"""Functional NHWC building blocks for the detector family.

Pure-function layers over explicit parameter pytrees (dicts of jnp arrays).
Convolutions run in bf16 on the MXU with f32 accumulation
(``preferred_element_type``); BatchNorm folds into the conv for inference
via :func:`fuse_conv_bn`. Layout is NHWC throughout — the layout XLA:TPU
tiles best for convolutions.

The block set mirrors the public YOLOv5 v6 architecture (see PAPERS.md,
"What is YOLOv5", arXiv 2407.20892): Conv(+BN+SiLU), Bottleneck, C3, SPPF.
This is an original JAX implementation — the reference vendored the detector
as an (empty) ultralytics submodule (reference: yolov5/, README.md:52).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QTensor(NamedTuple):
    """int8 activation + its per-tensor scale (value ≈ q * scale).

    The int8 serving pipeline keeps activations in this form BETWEEN conv
    blocks: HBM traffic is 1/2 of bf16 and the MXU runs s8xs8->s32 at 2x
    the bf16 rate (measured 2.7x end-to-end on a v5e conv chain —
    BENCH_INT8_MICRO.jsonl). NamedTuple => automatic pytree."""

    q: jnp.ndarray      # int8, NHWC
    scale: jnp.ndarray  # () float32


def deq(x, dtype=jnp.bfloat16):
    """QTensor -> float activations (identity on plain arrays)."""
    if isinstance(x, QTensor):
        return (x.q.astype(jnp.float32) * x.scale).astype(dtype)
    return x


def requant(act: jnp.ndarray, yscale) -> QTensor:
    """float activations -> int8 at the calibrated output scale."""
    q = jnp.clip(jnp.round(act.astype(jnp.float32) / yscale), -127, 127)
    return QTensor(q.astype(jnp.int8), jnp.asarray(yscale, jnp.float32))


def qcat(parts, axis: int = -1):
    """Concatenate QTensors (rescaled to the max scale) or plain arrays."""
    if all(isinstance(p, QTensor) for p in parts):
        s = parts[0].scale
        for p in parts[1:]:
            s = jnp.maximum(s, p.scale)
        qs = []
        for p in parts:
            # ratio <= 1: values shrink, no clipping needed
            qs.append(jnp.round(p.q.astype(jnp.float32) * (p.scale / s)).astype(jnp.int8))
        return QTensor(jnp.concatenate(qs, axis=axis), s)
    return jnp.concatenate([deq(p) if isinstance(p, QTensor) else p for p in parts], axis=axis)


def qup2(x):
    """2x nearest upsample, QTensor-aware."""
    if isinstance(x, QTensor):
        return QTensor(upsample2x(x.q), x.scale)
    return upsample2x(x)


def _he_init(rng: np.random.Generator, shape, fan_in):
    # Host-side numpy init: a single eager jax op per parameter would cost
    # ~0.1s dispatch+compile each on small hosts; numpy init is instant.
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * np.sqrt(2.0 / fan_in))


# ---------------------------------------------------------------------------
# Conv + BN + SiLU
# ---------------------------------------------------------------------------

def conv_init(rng: np.random.Generator, cin: int, cout: int, k: int) -> dict:
    w = _he_init(rng, (k, k, cin, cout), k * k * cin)
    return {
        "w": w,
        "bn": {
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        },
    }


_PHASE_GRAD_DX = False


class phase_grad_ctx:
    """Trace-time switch: strided convs inside the block record the
    phase-decomposed input-gradient vjp (models/phase_grad.py) instead of
    XLA's dilated transpose. Wrap the loss/forward TRACE (the trainer does
    this from ``TrainConfig.phase_grad_dx``); inference traces are
    unaffected either way (no dX is ever computed)."""

    def __init__(self, enabled: bool):
        self.enabled = bool(enabled)

    def __enter__(self):
        global _PHASE_GRAD_DX
        self._prev = _PHASE_GRAD_DX
        _PHASE_GRAD_DX = self.enabled
        return self

    def __exit__(self, *exc):
        global _PHASE_GRAD_DX
        _PHASE_GRAD_DX = self._prev
        return False


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding=None) -> jnp.ndarray:
    """NHWC conv in the input dtype.

    The output dtype follows the input: the TPU MXU accumulates bf16
    products in f32 internally regardless, and keeping every conv operand
    in one dtype is what lets jax.grad transpose the op (an f32
    preferred_element_type on bf16 operands breaks the conv transpose
    rule with a dtype mismatch)."""
    k = w.shape[0]
    if padding is None:
        p = k // 2
        padding = [(p, p), (p, p)]
    if _PHASE_GRAD_DX and stride > 1:
        from aquaculture_tpu.models import phase_grad

        pad = tuple((int(lo), int(hi)) for lo, hi in padding)
        if phase_grad.phase_dx_supported(k, stride, pad):
            return phase_grad.conv2d_phase(x, w, stride, pad)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def batch_norm(x, bn: dict, training: bool = False, momentum: float = 0.03, eps: float = 1e-3):
    """BatchNorm2d with ultralytics defaults (eps=1e-3, momentum=0.03).

    Returns (y, new_bn). In eval mode new_bn is bn unchanged.
    """
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_bn = {
            "scale": bn["scale"],
            "bias": bn["bias"],
            "mean": (1 - momentum) * bn["mean"] + momentum * mean.astype(jnp.float32),
            "var": (1 - momentum) * bn["var"] + momentum * var.astype(jnp.float32),
        }
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * bn["scale"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bn["bias"].astype(x.dtype)
    return y, new_bn


def silu(x):
    return x * jax.nn.sigmoid(x)


_CALIB_STATS: dict | None = None


def conv_block(x, p: dict, stride: int = 1, padding=None, training: bool = False):
    """Conv2d + BN + SiLU ("Conv" in YOLOv5). Returns (y, new_params).

    Three parameter layouts: training {w, bn}, fused inference {w, b},
    int8-quantized inference {wq, wscale, xscale, b} (built by
    models.quantize): activations quantize per-tensor, weights per-output-
    channel, MXU runs int8 x int8 -> int32, dequant fuses into the bias add.
    """
    if "wq" in p:  # int8 PTQ path
        if isinstance(x, QTensor):
            # pipelined: activations already int8 in HBM
            xq, xscale = x.q, x.scale
            float_dtype = jnp.bfloat16
        else:
            xscale = p["xscale"].astype(jnp.float32)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale), -127, 127).astype(jnp.int8)
            float_dtype = x.dtype
        k = p["wq"].shape[0]
        if padding is None:
            pad = k // 2
            padding = [(pad, pad), (pad, pad)]
        y32 = jax.lax.conv_general_dilated(
            xq,
            p["wq"],
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(jnp.float32) * (xscale * p["wscale"])[None, None, None, :] + p["b"]
        act = silu(y)
        if "yscale" in p:
            # dequant + SiLU + requant fuse into the conv epilogue; the
            # tensor handed to the next block stays int8
            return requant(act, p["yscale"]), p
        return act.astype(float_dtype), p
    if isinstance(x, QTensor):
        # int8 -> float boundary: a float conv downstream of a quantized
        # block (mixed splits that keep head-feeding layers in fp, e.g.
        # eval.accuracy's int8_safe) consumes the dequantized activations
        x = deq(x)
    if _CALIB_STATS is not None:  # eager calibration pass (models.quantize)
        key = id(p["w"])
        m = float(jnp.max(jnp.abs(x)))
        _CALIB_STATS[key] = max(_CALIB_STATS.get(key, 0.0), m)
    y = conv2d(x, p["w"], stride, padding).astype(x.dtype)
    if "b" in p:  # fused inference path
        out = silu(y + p["b"].astype(x.dtype))
        if _CALIB_STATS is not None:
            # post-activation absmax: the output scale of the int8 pipeline
            okey = ("out", id(p["w"]))
            _CALIB_STATS[okey] = max(
                _CALIB_STATS.get(okey, 0.0), float(jnp.max(jnp.abs(out)))
            )
        return out, p
    y, new_bn = batch_norm(y, p["bn"], training)
    return silu(y), {**p, "bn": new_bn}


def fuse_conv_bn(p: dict) -> dict:
    """Fold BN statistics into conv weight + bias for inference."""
    if "bn" not in p:
        return p
    bn = p["bn"]
    inv = bn["scale"] / jnp.sqrt(bn["var"] + 1e-3)
    w = p["w"] * inv[None, None, None, :]
    b = bn["bias"] - bn["mean"] * inv
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Bottleneck / C3 / SPPF
# ---------------------------------------------------------------------------

def bottleneck_init(rng: np.random.Generator, cin: int, cout: int) -> dict:
    return {"cv1": conv_init(rng, cin, cout, 1), "cv2": conv_init(rng, cout, cout, 3)}


def bottleneck(x, p: dict, shortcut: bool, training: bool = False):
    y, p1 = conv_block(x, p["cv1"], training=training)
    y, p2 = conv_block(y, p["cv2"], training=training)
    if shortcut:
        xc = x.q.shape[-1] if isinstance(x, QTensor) else x.shape[-1]
        yc = y.q.shape[-1] if isinstance(y, QTensor) else y.shape[-1]
        if xc == yc:
            if "sum_yscale" in p:
                # int8 pipeline: cv2 emitted float (no yscale); add the
                # dequantized shortcut and requantize at the calibrated
                # scale of the SUM
                y = requant(y.astype(jnp.float32) + deq(x, jnp.float32), p["sum_yscale"])
            elif isinstance(x, QTensor) or isinstance(y, QTensor):
                # partially-quantized fallback (missing sum stats)
                y = deq(x, jnp.float32) + deq(y, jnp.float32)
            else:
                y = x + y
                if _CALIB_STATS is not None:
                    _CALIB_STATS[("sum", id(p["cv2"]["w"]))] = max(
                        _CALIB_STATS.get(("sum", id(p["cv2"]["w"])), 0.0),
                        float(jnp.max(jnp.abs(y))),
                    )
    out = {"cv1": p1, "cv2": p2}
    if "sum_yscale" in p:
        out["sum_yscale"] = p["sum_yscale"]
    return y, out


def c3_init(rng: np.random.Generator, cin: int, cout: int, n: int) -> dict:
    ch = cout // 2
    return {
        "cv1": conv_init(rng, cin, ch, 1),
        "cv2": conv_init(rng, cin, ch, 1),
        "cv3": conv_init(rng, 2 * ch, cout, 1),
        "m": [bottleneck_init(rng, ch, ch) for _ in range(n)],
    }


def c3(x, p: dict, shortcut: bool = True, training: bool = False):
    y1, p1 = conv_block(x, p["cv1"], training=training)
    new_m = []
    for bp in p["m"]:
        y1, nbp = bottleneck(y1, bp, shortcut, training)
        new_m.append(nbp)
    y2, p2 = conv_block(x, p["cv2"], training=training)
    y = qcat([y1, y2], axis=-1)
    y, p3 = conv_block(y, p["cv3"], training=training)
    return y, {"cv1": p1, "cv2": p2, "cv3": p3, "m": new_m}


def sppf_init(rng: np.random.Generator, cin: int, cout: int) -> dict:
    ch = cin // 2
    return {"cv1": conv_init(rng, cin, ch, 1), "cv2": conv_init(rng, ch * 4, cout, 1)}


def max_pool(x, k: int = 5):
    """k×k stride-1 max pool with same padding.

    Float init must be the true identity (-inf, representable in bf16 and
    f32 alike) — JAX only supports reverse-mode autodiff of reduce_window
    when it recognizes the max-pool pattern, and finfo.min breaks that.
    int8 inputs (the quantized SPPF) use the integer identity."""
    p = k // 2
    return jax.lax.reduce_window(
        x,
        (
            jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.integer)
            else -jnp.inf
        ),
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def sppf(x, p: dict, k: int = 5, training: bool = False):
    y, p1 = conv_block(x, p["cv1"], training=training)
    if isinstance(y, QTensor):
        # max pool is order-preserving: runs directly on int8, scale kept
        y1 = QTensor(max_pool(y.q, k), y.scale)
        y2 = QTensor(max_pool(y1.q, k), y.scale)
        y3 = QTensor(max_pool(y2.q, k), y.scale)
    else:
        y1 = max_pool(y, k)
        y2 = max_pool(y1, k)
        y3 = max_pool(y2, k)
    out = qcat([y, y1, y2, y3], axis=-1)
    out, p2 = conv_block(out, p["cv2"], training=training)
    return out, {"cv1": p1, "cv2": p2}


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C): 2x2 spatial blocks to channels.
    Channel order (a, b, c) = (row offset, col offset, channel), matching
    stem_weights_to_s2d."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_weights_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Exact reparametrization of a k6/s2/p2 conv over C channels into a
    k3/s1/p1 conv over 4C space-to-depth channels.

    For output pixel i: 2i + u - 2 = 2(i + du) + a with u = 2 du + a + 2,
    du in {-1,0,1}, a in {0,1} — so every original tap lands on exactly one
    (s2d neighbor, sub-pixel channel) slot. Same sums, different order."""
    k, _, cin, cout = w.shape
    assert k == 6, k
    w = np.asarray(w, np.float32)
    out = np.zeros((3, 3, 4 * cin, cout), np.float32)
    for u in range(6):
        du, a = divmod(u - 2, 2)
        for v in range(6):
            dv, b = divmod(v - 2, 2)
            # s2d channel layout: (a, b, c) from space_to_depth2's reshape
            out[du + 1, dv + 1, (a * 2 + b) * cin : (a * 2 + b + 1) * cin, :] = w[u, v]
    return jnp.asarray(out)


def down_weights_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Exact reparametrization of a k3/s2/p1 conv over C channels into a
    k2/s1 conv with (1, 0) padding over 4C space-to-depth channels.

    For output pixel i: 2i + u - 1 = 2(i + du) + a with (du, a) =
    divmod(u - 1, 2) — every original tap lands on exactly one
    (s2d neighbor, sub-pixel channel) slot, identical sums. Same FLOPs,
    4x the MXU contraction depth: YOLOv5's early downsample convs have
    channel counts far below the 128-lane MXU tile (48 in for m's b1), and
    those large-spatial layers dominate the serving step (BENCHMARKS.md
    ablation) — this is the stem_weights_to_s2d trick applied to them."""
    k, _, cin, cout = w.shape
    assert k == 3, k
    w = np.asarray(w, np.float32)
    out = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for u in range(3):
        du, a = divmod(u - 1, 2)
        for v in range(3):
            dv, b = divmod(v - 1, 2)
            out[du + 1, dv + 1, (a * 2 + b) * cin : (a * 2 + b + 1) * cin, :] = w[u, v]
    return jnp.asarray(out)


def qs2d(x):
    """space_to_depth2, QTensor-aware (pure data movement, scale unchanged)."""
    if isinstance(x, QTensor):
        return QTensor(space_to_depth2(x.q), x.scale)
    return space_to_depth2(x)


def upsample2x(x):
    """Nearest-neighbor 2x upsample (exact repeat; XLA-friendly)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def tree_map_fuse(params) -> dict:
    """Recursively fuse all conv+bn blocks in a param tree."""
    if isinstance(params, dict):
        if "w" in params and "bn" in params:
            return fuse_conv_bn(params)
        return {k: tree_map_fuse(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(tree_map_fuse(v) for v in params)
    return params


def cast_tree(params, dtype):
    return jax.tree_util.tree_map(lambda a: a.astype(dtype) if isinstance(a, jnp.ndarray) else a, params)
