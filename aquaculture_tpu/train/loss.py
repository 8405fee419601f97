"""YOLOv5 composite detection loss, fixed-shape for XLA.

Reimplements the public ultralytics v5 training loss from its published
semantics (PAPERS.md, arXiv 2407.20892): anchor-ratio target assignment with
3-cell neighborhood expansion, CIoU box regression, BCE objectness with
IoU-valued targets and per-level balance, BCE classification.

The reference trains its detector through this loss (reference: README.md:52
— the vendored ultralytics train.py); this is a ground-up JAX build.

TPU-first design: labels arrive as a fixed (B, M, 5) tensor + validity mask
(never ragged); the assignment produces a fixed (B, M, na, 5-offsets) match
lattice whose invalid entries are masked out of every reduction. All control
flow is vectorized — no data-dependent Python branching, so the whole loss
jits into one XLA computation and fuses with the backward pass.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

# Per-level objectness balance: 3-level P5 models use ultralytics'
# [4.0, 1.0, 0.4]; 4-level P6 models its nl=4 table [4.0, 1.0, 0.25, 0.06].
OBJ_BALANCE = (4.0, 1.0, 0.4)
OBJ_BALANCE_P6 = (4.0, 1.0, 0.25, 0.06)

# Neighbor-cell offsets: center, left, up, right, down (in grid cells).
_OFFSETS = jnp.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], jnp.float32
)
_OFFSET_GAIN = 0.5


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between (..., 4) cxcywh boxes."""
    b1x, b1y, b1w, b1h = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
    b2x, b2y, b2w, b2h = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    b1x0, b1x1 = b1x - b1w / 2, b1x + b1w / 2
    b1y0, b1y1 = b1y - b1h / 2, b1y + b1h / 2
    b2x0, b2x1 = b2x - b2w / 2, b2x + b2w / 2
    b2y0, b2y1 = b2y - b2h / 2, b2y + b2h / 2

    iw = jnp.maximum(jnp.minimum(b1x1, b2x1) - jnp.maximum(b1x0, b2x0), 0.0)
    ih = jnp.maximum(jnp.minimum(b1y1, b2y1) - jnp.maximum(b1y0, b2y0), 0.0)
    inter = iw * ih
    union = b1w * b1h + b2w * b2h - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x1, b2x1) - jnp.minimum(b1x0, b2x0)  # enclosing box
    ch = jnp.maximum(b1y1, b2y1) - jnp.minimum(b1y0, b2y0)
    c2 = cw * cw + ch * ch + eps
    rho2 = (b2x - b1x) ** 2 + (b2y - b1y) ** 2
    v = (4.0 / jnp.pi**2) * jnp.square(
        jnp.arctan(b2w / jnp.maximum(b2h, eps)) - jnp.arctan(b1w / jnp.maximum(b1h, eps))
    )
    alpha = v / (v - iou + (1.0 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def _bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (stable form)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _level_matches(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors_grid: jnp.ndarray,
    gh: int,
    gw: int,
    anchor_t: float,
):
    """Fixed-shape target assignment for one detection level.

    Args:
        labels: (B, M, 5) rows [cls, cx, cy, w, h] in GRID units of this level
        label_mask: (B, M) validity
        anchors_grid: (na, 2) anchor wh in grid units
    Returns dict of (B, M, na, O)-shaped match tensors:
        valid, gi, gj, anchor index implicit on axis 2, target box + class.
    """
    b, m, _ = labels.shape
    na = anchors_grid.shape[0]
    o = _OFFSETS.shape[0]

    wh = labels[..., 3:5]  # (B, M, 2)
    r = wh[:, :, None, :] / anchors_grid[None, None, :, :]  # (B, M, na, 2)
    ratio_ok = jnp.max(jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)), axis=-1) < anchor_t

    gxy = labels[..., 1:3]  # (B, M, 2) grid coords
    gxi = jnp.asarray([gw, gh], jnp.float32) - gxy  # inverse coords
    fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
    ix, iy = gxi[..., 0] % 1.0, gxi[..., 1] % 1.0
    g = _OFFSET_GAIN
    # offset validity: center always; left/up need frac < g and coord > 1;
    # right/down need inverse-frac < g and inverse-coord > 1 (public v5 rule).
    off_ok = jnp.stack(
        [
            jnp.ones_like(fx, bool),
            (fx < g) & (gxy[..., 0] > 1.0),
            (fy < g) & (gxy[..., 1] > 1.0),
            (ix < g) & (gxi[..., 0] > 1.0),
            (iy < g) & (gxi[..., 1] > 1.0),
        ],
        axis=-1,
    )  # (B, M, O)

    valid = (
        label_mask[:, :, None, None]
        & ratio_ok[:, :, :, None]
        & off_ok[:, :, None, :]
        & (jnp.min(wh, -1) > 0)[:, :, None, None]
    )  # (B, M, na, O)

    cell = jnp.floor(gxy[:, :, None, :] - _OFFSETS[None, None, :, :] * g)  # (B,M,O,2)
    gi = jnp.clip(cell[..., 0], 0, gw - 1).astype(jnp.int32)  # (B, M, O)
    gj = jnp.clip(cell[..., 1], 0, gh - 1).astype(jnp.int32)
    gi = jnp.broadcast_to(gi[:, :, None, :], (b, m, na, o))
    gj = jnp.broadcast_to(gj[:, :, None, :], (b, m, na, o))

    txy = gxy[:, :, None, None, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)  # rel to cell
    twh = jnp.broadcast_to(wh[:, :, None, None, :], (b, m, na, o, 2))
    tcls = jnp.broadcast_to(labels[..., 0][:, :, None, None], (b, m, na, o)).astype(jnp.int32)
    return {"valid": valid, "gi": gi, "gj": gj, "txy": txy, "twh": twh, "tcls": tcls}


def yolo_loss(
    feats: List[jnp.ndarray],
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors: Sequence,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    box_gain: float = 0.05,
    cls_gain: float = 0.5,
    obj_gain: float = 1.0,
    anchor_t: float = 4.0,
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    """Total detection loss over raw head outputs.

    Args:
        feats: per-level raw outputs (B, H_l, W_l, na*no) from
            :meth:`YoloV5.features`
        labels: (B, M, 5) [cls, cx, cy, w, h] in INPUT-IMAGE pixels
        label_mask: (B, M) bool validity (fixed-shape padding)
        anchors: ((na,2),)*3 anchor wh in input-image pixels
    Returns:
        (loss, metrics dict) — loss is summed per ultralytics convention
        (mean-per-component * batch_size).

    Gain scaling: ultralytics rescales the raw hyp gains at train setup
    (its train.py: ``box *= 3/nl``, ``cls *= nc/80 * 3/nl``,
    ``obj *= (imgsz/640)**2 * 3/nl``) so the defaults transfer across
    model depth, class count, and resolution. That scaling is applied
    HERE — callers pass the raw hyp values (box 0.05 / cls 0.5 / obj 1.0)
    and the loss derives nl from ``feats``, the class term from
    ``num_classes`` and the resolution term from the stride-8 grid, so a
    5-class model trains with the recipe's effective cls weight
    (0.5*5/80) instead of 16x too much classification pressure, and P6 at
    1280 gets its 4x objectness boost.
    """
    b = feats[0].shape[0]
    na = len(anchors[0])
    no = num_classes + 5
    cp = 1.0 - 0.5 * label_smoothing
    cn = 0.5 * label_smoothing

    nl = len(feats)
    img_size = float(feats[0].shape[1] * strides[0])
    box_gain = box_gain * 3.0 / nl
    cls_gain = cls_gain * (num_classes / 80.0) * 3.0 / nl
    obj_gain = obj_gain * (img_size / 640.0) ** 2 * 3.0 / nl

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0

    # zip would silently DROP levels on a feats/strides mismatch (e.g. a
    # P6 model called with the 3-level default strides), zero-gradienting
    # the stride-64 head while the loss stays finite — fail loudly instead.
    assert len(feats) == len(strides) == len(anchors), (
        f"level mismatch: {len(feats)} feature maps, {len(strides)} strides, "
        f"{len(anchors)} anchor levels — pass strides=model.strides and "
        "anchors=model.anchor_table"
    )
    balance = OBJ_BALANCE_P6 if len(feats) == 4 else OBJ_BALANCE
    for li, (f, stride, bal) in enumerate(zip(feats, strides, balance)):
        gh, gw = f.shape[1], f.shape[2]
        p = f.reshape(b, gh, gw, na, no).astype(jnp.float32)
        anc = jnp.asarray(anchors[li], jnp.float32) / float(stride)  # grid units

        lab = labels.astype(jnp.float32)
        lab_grid = jnp.concatenate([lab[..., 0:1], lab[..., 1:5] / float(stride)], -1)
        mt = _level_matches(lab_grid, label_mask, anc, gh, gw, anchor_t)
        valid = mt["valid"]  # (B, M, na, O)
        n_match = jnp.maximum(valid.sum(), 1.0)

        # Gather predictions at matched cells: flatten spatial for one gather.
        bidx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
        aidx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 2)
        flat = p.reshape(b, gh * gw, na, no)
        lin = mt["gj"] * gw + mt["gi"]  # (B, M, na, O)
        pm = flat[bidx, lin, aidx]  # (B, M, na, O, no)

        # Decode matched predictions (training transform, grid units).
        pxy = jax.nn.sigmoid(pm[..., 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(pm[..., 2:4]) * 2.0) * anc[None, None, :, None, :]
        pbox = jnp.concatenate([pxy, pwh], -1)
        tbox = jnp.concatenate([mt["txy"], mt["twh"]], -1)
        iou = ciou(pbox, tbox)  # (B, M, na, O)
        lbox = lbox + jnp.sum(jnp.where(valid, 1.0 - iou, 0.0)) / n_match

        # Objectness targets: scatter detached IoU at matched positions.
        iou_t = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
        tobj = jnp.zeros((b, gh * gw, na), jnp.float32)
        scat = jnp.where(valid, iou_t, 0.0)
        tobj = tobj.at[bidx, lin, aidx].max(scat)
        obj_logit = flat[..., 4]
        lobj = lobj + bal * jnp.mean(_bce(obj_logit, tobj))

        # Classification (only when multi-class).
        if num_classes > 1:
            tcls_1h = jax.nn.one_hot(mt["tcls"], num_classes) * cp + cn
            # BCE with mean reduction over (matches, nc) — sum / (n_match * nc)
            cls_bce = _bce(pm[..., 5:], tcls_1h).sum(-1)
            lcls = lcls + jnp.sum(jnp.where(valid, cls_bce, 0.0)) / (n_match * num_classes)

    lbox = lbox * box_gain
    lobj = lobj * obj_gain
    lcls = lcls * cls_gain if num_classes > 1 else jnp.float32(0.0)
    total = (lbox + lobj + lcls) * b
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
