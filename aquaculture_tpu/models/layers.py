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

import jax
import jax.numpy as jnp
import numpy as np


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
        xscale = p["xscale"].astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale), -127, 127).astype(jnp.int8)
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
        return silu(y.astype(x.dtype)), p
    if _CALIB_STATS is not None:  # eager calibration pass (models.quantize)
        key = id(p["w"])
        m = float(jnp.max(jnp.abs(x)))
        _CALIB_STATS[key] = max(_CALIB_STATS.get(key, 0.0), m)
    y = conv2d(x, p["w"], stride, padding).astype(x.dtype)
    if "b" in p:  # fused inference path
        return silu(y + p["b"].astype(x.dtype)), p
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
    if shortcut and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y, {"cv1": p1, "cv2": p2}


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
    y = jnp.concatenate([y1, y2], axis=-1)
    y, p3 = conv_block(y, p["cv3"], training=training)
    return y, {"cv1": p1, "cv2": p2, "cv3": p3, "m": new_m}


def sppf_init(rng: np.random.Generator, cin: int, cout: int) -> dict:
    ch = cin // 2
    return {"cv1": conv_init(rng, cin, ch, 1), "cv2": conv_init(rng, ch * 4, cout, 1)}


def max_pool(x, k: int = 5):
    """k×k stride-1 max pool with same padding.

    Init value must be the true identity (-inf, representable in bf16 and
    f32 alike) — JAX only supports reverse-mode autodiff of reduce_window
    when it recognizes the max-pool pattern, and finfo.min breaks that."""
    p = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def sppf(x, p: dict, k: int = 5, training: bool = False):
    y, p1 = conv_block(x, p["cv1"], training=training)
    y1 = max_pool(y, k)
    y2 = max_pool(y1, k)
    y3 = max_pool(y2, k)
    out = jnp.concatenate([y, y1, y2, y3], axis=-1)
    out, p2 = conv_block(out, p["cv2"], training=training)
    return out, {"cv1": p1, "cv2": p2}


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
