"""Test-time augmentation (the ultralytics ``detect.py --augment`` path).

Multi-scale + horizontal-flip forward passes merged into one candidate
pool before NMS, matching the public yolov5 augmented-inference transform
(models/yolo.py _forward_augment/_descale_pred): scales (1, 0.83, 0.67)
with a left-right flip on the middle scale; every pass's decoded boxes are
de-scaled back to input pixels (xywh / ratio, flipped cx mirrored about
the input width) and concatenated.

TPU notes: each (scale, flip) pass has a STATIC input size (scaled then
padded bottom/right to the model's max stride), so the whole TTA forward
is one jitted program of three fixed-shape branches — no data-dependent
shapes. NMS then runs once over the merged (B, sum N_l, 5+nc) pool.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

TTA_SCALES: Tuple[float, ...] = (1.0, 0.83, 0.67)
TTA_FLIPS: Tuple[Optional[str], ...] = (None, "lr", None)
_PAD_VAL = 0.447  # ultralytics scale_img pad value (ImageNet mean gray)


def _scale_pad(x: jnp.ndarray, ratio: float, gs: int) -> jnp.ndarray:
    """Resize by ratio then pad bottom/right to a multiple of gs
    (ultralytics utils.torch_utils.scale_img semantics)."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    xr = jax.image.resize(x, (b, nh, nw, c), method="bilinear")
    ph = math.ceil(nh / gs) * gs - nh
    pw = math.ceil(nw / gs) * gs - nw
    return jnp.pad(xr, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=_PAD_VAL)


def tta_predict(
    model,
    params,
    x: jnp.ndarray,
    scales: Sequence[float] = TTA_SCALES,
    flips: Sequence[Optional[str]] = TTA_FLIPS,
) -> jnp.ndarray:
    """Augmented forward: (B, H, W, 3) in [0, 1] -> (B, sum N_l, 5+nc)
    decoded predictions in INPUT-pixel coordinates, ready for NMS."""
    if len(scales) != len(flips):
        raise ValueError(
            f"scales ({len(scales)}) and flips ({len(flips)}) must have the "
            "same length — zip would silently drop passes")
    gs = int(max(model.strides))
    w0 = float(x.shape[2])
    outs = []
    for ratio, flip in zip(scales, flips):
        xi = x[:, :, ::-1, :] if flip == "lr" else x
        xi = _scale_pad(xi, ratio, gs)
        p, _ = model.apply(params, xi)
        xy = p[..., 0:2] / ratio
        wh = p[..., 2:4] / ratio
        if flip == "lr":
            xy = jnp.concatenate([w0 - xy[..., 0:1], xy[..., 1:2]], axis=-1)
        outs.append(jnp.concatenate([xy, wh, p[..., 4:]], axis=-1))
    return jnp.concatenate(outs, axis=1)
