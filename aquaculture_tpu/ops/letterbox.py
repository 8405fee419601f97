"""Letterbox preprocessing: aspect-preserving resize + pad, fused on device.

Equivalent of the ultralytics letterbox used by the reference's
``detect.py --img 640`` invocation (reference: README.md:77): scale the
image to fit the target square, pad the remainder with gray (114), and
normalize to [0, 1]. All shapes static; runs under jit as part of the
input pipeline so HBM sees only the final bf16 tensor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def letterbox(
    img: jnp.ndarray,
    new_size: int = 640,
    pad_value: float = 114.0,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Resize a (H, W, 3) uint8/float image into a (new_size, new_size, 3)
    normalized tensor.

    Returns (tensor in [0,1], scale_gain, (pad_x, pad_y)); the inverse map
    back to source pixels is ``src = (dst - pad) / gain``.

    Padding is symmetric (split evenly), matching ultralytics' centered
    letterbox. H, W are static so all arithmetic is Python-level.
    """
    h, w = int(img.shape[0]), int(img.shape[1])
    gain = min(new_size / h, new_size / w)
    nh, nw = int(round(h * gain)), int(round(w * gain))
    x = img.astype(jnp.float32)
    if (nh, nw) != (h, w):
        x = jax.image.resize(x, (nh, nw, 3), method="bilinear")
    pad_y, pad_x = new_size - nh, new_size - nw
    top, left = pad_y // 2, pad_x // 2
    x = jnp.pad(
        x,
        ((top, pad_y - top), (left, pad_x - left), (0, 0)),
        constant_values=pad_value,
    )
    return (x / 255.0).astype(dtype), gain, (left, top)


def letterbox_batch(imgs: jnp.ndarray, new_size: int = 640, dtype=jnp.bfloat16):
    """Vectorized letterbox over a (B, H, W, 3) batch of same-size images."""
    fn = lambda im: letterbox(im, new_size, dtype=dtype)[0]
    out = jax.vmap(fn)(imgs)
    h, w = int(imgs.shape[1]), int(imgs.shape[2])
    gain = min(new_size / h, new_size / w)
    nh, nw = int(round(h * gain)), int(round(w * gain))
    return out, gain, ((new_size - nw) // 2, (new_size - nh) // 2)


def unletterbox_boxes(boxes: jnp.ndarray, gain: float, pad: Tuple[int, int]) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to source-image pixels."""
    px, py = pad
    shift = jnp.asarray([px, py, px, py], boxes.dtype)
    return (boxes - shift) / gain
