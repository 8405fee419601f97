"""Fixed-shape class-aware non-maximum suppression for XLA/TPU.

The JAX-hard part of detection: NMS output size is data-dependent, but XLA
needs static shapes. Design: top-K candidate selection (lax.top_k), a KxK
IoU matrix on the VPU, and an exact greedy suppression scan — emitting a
fixed (max_det, 6) tensor plus a validity mask that all downstream stages
consume (mask-aware, never ragged).

Matches ultralytics non_max_suppression semantics (conf = obj*cls,
class-offset boxes for class-aware NMS, hard suppression at iou_thresh).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CLASS_OFFSET = 7680.0  # > max image dim; separates classes in box space


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K,4) xyxy -> (K,K) IoU, f32 on the VPU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Exact greedy NMS over score-sorted candidates.

    keep[i] survives unless an earlier kept candidate overlaps > thresh.
    Sequential scan as lax.fori_loop — K iterations of O(K) vector work.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        suppress = (iou[i] > iou_thresh) & (idx > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)


def nms(
    pred: jnp.ndarray,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
    multi_label: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image NMS over decoded predictions.

    Args:
        pred: (N, 5+nc) decoded rows [cx, cy, w, h, obj, cls...]
        multi_label: one candidate per (box, class) above conf_thresh
            (ultralytics val.py semantics) instead of argmax-class.
    Returns:
        (det, valid): det is (max_det, 6) rows [x0, y0, x1, y1, conf, cls]
        sorted by confidence; valid is the (max_det,) bool mask.
    """
    boxes, nms_boxes, top_scores, cls_top, valid = _prepare_candidates(
        pred, conf_thresh, pre_topk, class_agnostic, multi_label
    )
    keep = _greedy_suppress(_iou_matrix(nms_boxes), valid, iou_thresh)
    return _compact(boxes, cls_top, top_scores, keep, max_det)


# Pools at least this many times larger than k use the exact two-stage
# (blocked) top-k: per-block top-k over contiguous blocks, then a final
# top-k over the G*k survivors. Exact because a block holds at most k of
# the global top-k. P6 at 1280px has a 100,800-anchor pool where the
# global top_k dominated NMS prep (BENCHMARKS.md P6 study).
_TWO_STAGE_RATIO = 8
_TWO_STAGE_BLOCK = 8192


def _select_topk(score: jnp.ndarray, k: int, approx: bool):
    """Exact or approximate top-k over the candidate pool.

    approx=True uses the TPU-native binned reduction (lax.approx_max_k,
    aggregate_to_topk so the returned set is score-sorted — greedy NMS
    causality needs descending order). CAUTION: the TPU lowering first
    keeps only per-block maxima over contiguous input blocks, so two
    above-threshold candidates on NEARBY anchors can collide in one block
    and lose one of them even when the pool is far below k — a real
    missed-detection mode for adjacent cages, and invisible on CPU where
    approx_max_k falls back to exact top_k. Measured throughput-NEUTRAL at
    the serving pool size (BENCHMARKS.md round 2c), so this stays an
    opt-in experiment: NOT exposed on any CLI and never the default.

    Large pools (n >= _TWO_STAGE_RATIO * k) take the EXACT two-stage path:
    top-k per contiguous block, then top-k over the survivors. The result
    SET equals lax.top_k's; only the order among exactly-tied scores can
    differ (ties merge by score across blocks instead of by global index).
    """
    if approx:
        return jax.lax.approx_max_k(score, k, recall_target=0.95)
    n = score.shape[0]
    if n >= _TWO_STAGE_RATIO * k and n > _TWO_STAGE_BLOCK:
        return _two_stage_topk(score, k)
    return jax.lax.top_k(score, k)


def _two_stage_topk(score: jnp.ndarray, k: int):
    """Exact blocked top-k: (n,) -> (values (k,), indices (k,))."""
    n = score.shape[0]
    g = -(-n // _TWO_STAGE_BLOCK)  # ceil
    padded = g * _TWO_STAGE_BLOCK
    if padded != n:
        score = jnp.pad(score, (0, padded - n), constant_values=-jnp.inf)
    blocks = score.reshape(g, _TWO_STAGE_BLOCK)
    kb = min(k, _TWO_STAGE_BLOCK)
    vals, idx = jax.lax.top_k(blocks, kb)             # (g, kb) each
    flat_idx = idx + (jnp.arange(g) * _TWO_STAGE_BLOCK)[:, None]
    vals2, sel = jax.lax.top_k(vals.reshape(-1), k)   # over g*kb survivors
    return vals2, flat_idx.reshape(-1)[sel]


def _prepare_candidates(pred, conf_thresh, pre_topk, class_agnostic, multi_label=False,
                        approx_topk=False):
    """Single image candidate selection: returns (boxes xyxy, nms_boxes
    with class offsets, top_scores, cls ids, valid).

    multi_label=True emits one candidate per (box, class) pair above
    conf_thresh — ultralytics non_max_suppression's multi_label branch
    (used by its val.py mAP evaluation); False keeps the argmax-class
    behavior of detect.py (the reference's inference path).
    """
    pred = pred.astype(jnp.float32)
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_scores = pred[:, 5:] * obj[:, None]
    pool = pred.shape[0] * nc if (multi_label and nc > 1) else pred.shape[0]
    k = min(pre_topk, pool)
    # One fused row gather after top_k: gathers are serial-ish HBM traffic
    # on TPU, and prep (top_k + gathers) dominates the NMS-side serving
    # cost (BENCH_ABLATION fwd_prep), so the cxy/wh/cls column gathers are
    # packed into a single (k, 5) take.
    if multi_label and nc > 1:
        score_mat = jnp.where(cls_scores >= conf_thresh, cls_scores, -1.0)  # (N, nc)
        top_scores, flat_idx = _select_topk(score_mat.reshape(-1), k, approx_topk)
        top_idx = flat_idx // nc
        cls_top = flat_idx % nc
        sel = jnp.take(pred[:, 0:4], top_idx, axis=0)               # (k, 4)
        cxy, wh = sel[:, 0:2], sel[:, 2:4]
    else:
        cls_id = jnp.argmax(cls_scores, axis=-1)
        conf = jnp.max(cls_scores, axis=-1) if nc > 1 else cls_scores[:, 0]
        score = jnp.where(conf >= conf_thresh, conf, -1.0)
        top_scores, top_idx = _select_topk(score, k, approx_topk)
        base = jnp.concatenate(
            [pred[:, 0:4], cls_id.astype(jnp.float32)[:, None]], axis=1
        )                                                            # (N, 5)
        # top_k indices are unique and in-bounds by construction; telling
        # XLA so drops the gather's clamp/dedup machinery — isolated
        # +0.008 ms/img at mt/b128, composed-NEUTRAL in the full serving
        # program (BENCH_MT_SLACK prep_hint vs fwd_prep vs full_hint;
        # bench.py 1948.4 vs 1949.8 tiles/s). Kept: never slower, and the
        # honest hints help any future lowering. The index-SORTED variant
        # measured negative (prep_sorted). The multi_label branch keeps
        # jnp.take: its row indices (flat//nc) can repeat.
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        sel = jax.lax.gather(
            base, top_idx[:, None], dn, slice_sizes=(1, base.shape[1]),
            indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )                                                            # (k, 5)
        cxy, wh = sel[:, 0:2], sel[:, 2:4]
        cls_top = sel[:, 4].astype(jnp.int32)
    valid = top_scores > 0
    boxes = jnp.concatenate([cxy - wh / 2.0, cxy + wh / 2.0], axis=-1)
    nms_boxes = boxes
    if not class_agnostic:
        nms_boxes = boxes + (cls_top.astype(jnp.float32) * _CLASS_OFFSET)[:, None]
    return boxes, nms_boxes, top_scores, cls_top, valid


def _compact(boxes, cls_top, top_scores, keep, max_det):
    kept_score = jnp.where(keep, top_scores, -1.0)
    k = kept_score.shape[0]
    k_out = min(max_det, k)
    out_scores, order = jax.lax.top_k(kept_score, k_out)
    det = jnp.concatenate(
        [boxes[order], out_scores[:, None], cls_top[order].astype(jnp.float32)[:, None]],
        axis=-1,
    )
    if k_out < max_det:
        det = jnp.pad(det, ((0, max_det - k_out), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, max_det - k_out), constant_values=-1.0)
    return det, out_scores > 0


def _pallas_supported(k: int, plat: str | None = None) -> bool:
    if plat is None:
        try:
            import jax as _jax

            plat = _jax.devices()[0].platform
        except Exception:
            return False
    return plat in ("tpu", "axon") and k % 128 == 0


def _resolve_backend(k: int, backend: str) -> bool:
    """Kernel-choice policy shared by batched_nms and batched_nms_feats
    (one copy: a divergent fix would silently give the two entry points
    different kernels)."""
    if backend.startswith("auto:"):
        return _pallas_supported(k, backend.split(":", 1)[1])
    return backend == "pallas" or (backend == "auto" and _pallas_supported(k))


def _suppress_and_compact(boxes, nms_boxes, top_scores, cls_top, valid,
                          iou_thresh, max_det, use_pallas):
    """Batched suppression + max_det compaction tail shared by both NMS
    entry points."""
    if use_pallas:
        from aquaculture_tpu.ops.nms_pallas import greedy_suppress_pallas

        keep = greedy_suppress_pallas(nms_boxes, valid, iou_thresh)
    else:
        keep = jax.vmap(lambda nb, v: _greedy_suppress(_iou_matrix(nb), v, iou_thresh))(
            nms_boxes, valid
        )
    return jax.vmap(lambda b_, c_, s_, kp: _compact(b_, c_, s_, kp, max_det))(
        boxes, cls_top, top_scores, keep
    )


def _prepare_candidates_feats(feats, anchor_table, strides, conf_thresh,
                              pre_topk, class_agnostic, approx_topk=False):
    """Batched candidate selection straight from the raw head feature
    maps, candidate axis kept in the 128-lane dimension (round 5).

    MEASURED NEGATIVE for bulk serving, kept as a recorded experiment +
    alternative API: on mt/b128 the composed program ran 1,822 tiles/s vs
    1,949.8 for the rows path (BENCH_MT_SLACK.jsonl full_feats vs full)
    even though it moves ~50 MB/img LESS HBM traffic — the cols
    build+score+top-k portion times IDENTICAL to the rows equivalent
    (feats_topk 0.4856 vs fwd_topk 0.4847 ms/img), and the lane-dim
    survivor gathers cost ~2x the row gathers (+0.039 vs +0.020 ms/img).
    Lane-padded traffic is evidently not the serving bottleneck the
    cost-analysis byte counts suggest; batched_nms stays the default.

    The (B, N, 5+nc) decoded-prediction layout puts a <=10-wide trailing
    dim in the TPU's 128-lane dimension, so every materialization of it
    pads 12.8x: the round-5 slack ladder (BENCH_MT_SLACK.jsonl) measured
    the composed candidate prep at 0.054 ms/img with ~94 MB/img of HBM
    traffic — ~6 lane-padded copies of a 1 MB tensor — while the isolated
    top-k costs microseconds. This path keeps the candidate axis LAST
    (lanes) end to end:

      head maps (B,h,w,na*no) -> columns (B, no, K) with K = na*sum(hw)
      -> sigmoid/score/argmax as (B, *, K) lane-parallel ops
      -> top-k over (B, K)
      -> gather only the k survivors' 4 box logits (lane-dim gathers
         from (B, K) rows)
      -> decode xy/wh on (B, k) — grid position and anchor are recomputed
         arithmetically from the flat index instead of gathered.

    Box math is the same public YOLOv5 transform as YoloV5.decode
    (reference contract; models/yolov5.py:349), applied to identical
    logits — outputs match batched_nms(model.apply(...)) except that the
    flat candidate ordering is (anchor, position) rather than
    (position, anchor), so exactly-tied scores can resolve differently
    (the same tie class the two-stage top-k already documents).

    Returns (boxes, nms_boxes, top_scores, cls_top, valid), all batched.
    """
    b = feats[0].shape[0]
    na = anchor_table[0].shape[0] if hasattr(anchor_table[0], "shape") else len(anchor_table[0])
    C = feats[0].shape[-1]
    no = C // na
    nc = no - 5

    lvl_hw = []
    lvl_w = []
    cols_l = []
    for f in feats:
        _, h, w, _ = f.shape
        lvl_hw.append(h * w)
        lvl_w.append(w)
        t = jnp.transpose(f.reshape(b, h * w, C).astype(jnp.float32), (0, 2, 1))
        cols_l.append(t)                                   # (b, C, hw)
    cols = jnp.concatenate(cols_l, axis=-1)                # (b, C, HW)
    HW = sum(lvl_hw)
    cols = cols.reshape(b, na, no, HW)
    cols = jnp.transpose(cols, (0, 2, 1, 3)).reshape(b, no, na * HW)
    K = na * HW

    obj = jax.nn.sigmoid(cols[:, 4])                       # (b, K)
    if nc > 1:
        clsz = jax.nn.sigmoid(cols[:, 5:]) * obj[:, None, :]   # (b, nc, K)
        conf = clsz.max(axis=1)
        cls_id = jnp.argmax(clsz, axis=1).astype(jnp.int32)
    else:
        conf = jax.nn.sigmoid(cols[:, 5]) * obj
        cls_id = jnp.zeros_like(conf, jnp.int32)
    score = jnp.where(conf >= conf_thresh, conf, -1.0)

    k = min(pre_topk, K)
    top_scores, q = jax.vmap(lambda s: _select_topk(s, k, approx_topk))(score)

    # survivors only: 4 lane-dim gathers of the box logits + the class id
    tx = jnp.take_along_axis(cols[:, 0], q, axis=-1)
    ty = jnp.take_along_axis(cols[:, 1], q, axis=-1)
    tw = jnp.take_along_axis(cols[:, 2], q, axis=-1)
    th = jnp.take_along_axis(cols[:, 3], q, axis=-1)
    cls_top = jnp.take_along_axis(cls_id, q, axis=-1)

    # flat index -> (anchor, level, gy, gx) arithmetically (no gathers)
    a_idx = q // HW
    r = q % HW
    gx = jnp.zeros_like(r)
    gy = jnp.zeros_like(r)
    stride_f = jnp.zeros(q.shape, jnp.float32)
    aw = jnp.zeros(q.shape, jnp.float32)
    ah = jnp.zeros(q.shape, jnp.float32)
    off = 0
    for li, (hw_l, w_l) in enumerate(zip(lvl_hw, lvl_w)):
        in_l = (r >= off) & (r < off + hw_l)
        rl = r - off
        gx = jnp.where(in_l, rl % w_l, gx)
        gy = jnp.where(in_l, rl // w_l, gy)
        stride_f = jnp.where(in_l, float(strides[li]), stride_f)
        anc = np.asarray(anchor_table[li], np.float32)
        for ai in range(na):
            m = in_l & (a_idx == ai)
            aw = jnp.where(m, float(anc[ai, 0]), aw)
            ah = jnp.where(m, float(anc[ai, 1]), ah)
        off += hw_l

    # public YOLOv5 decode on the survivors (b, k)
    sx = jax.nn.sigmoid(tx)
    sy = jax.nn.sigmoid(ty)
    cx = (sx * 2.0 - 0.5 + gx.astype(jnp.float32)) * stride_f
    cy = (sy * 2.0 - 0.5 + gy.astype(jnp.float32)) * stride_f
    bw = jnp.square(jax.nn.sigmoid(tw) * 2.0) * aw
    bh = jnp.square(jax.nn.sigmoid(th) * 2.0) * ah

    boxes = jnp.stack(
        [cx - bw / 2.0, cy - bh / 2.0, cx + bw / 2.0, cy + bh / 2.0], axis=-1
    )                                                      # (b, k, 4)
    valid = top_scores > 0
    nms_boxes = boxes
    if not class_agnostic:
        nms_boxes = boxes + (cls_top.astype(jnp.float32) * _CLASS_OFFSET)[..., None]
    return boxes, nms_boxes, top_scores, cls_top, valid


def batched_nms_feats(
    feats,
    anchor_table,
    strides,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
    backend: str = "auto",
    approx_topk: bool = False,
):
    """Batched NMS straight from raw head feature maps (lane-efficient
    serving fast path; see _prepare_candidates_feats). Same output
    contract as batched_nms: ((B, max_det, 6), (B, max_det)).

    Argmax-class semantics only (the serving default); multi_label
    evaluation keeps the batched_nms path.
    """
    boxes, nms_boxes, top_scores, cls_top, valid = _prepare_candidates_feats(
        feats, anchor_table, strides, conf_thresh, pre_topk, class_agnostic,
        approx_topk,
    )
    k = top_scores.shape[-1]
    return _suppress_and_compact(
        boxes, nms_boxes, top_scores, cls_top, valid, iou_thresh, max_det,
        _resolve_backend(k, backend),
    )


def batched_nms(
    preds: jnp.ndarray,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
    backend: str = "auto",
    multi_label: bool = False,
    approx_topk: bool = False,
):
    """Batched NMS over (B, N, 5+nc) -> ((B, max_det, 6), (B, max_det)).

    backend: 'auto' uses the Pallas suppression kernel on TPU (batch-
    amortized, faster than the XLA scan at K=1024); 'xla' forces the
    vmapped fori-loop path; 'pallas' forces the kernel. 'auto:PLATFORM'
    resolves the auto choice for a TARGET platform instead of probing
    this process's devices — cross-platform lowering (jax.export with
    platforms=) must not bake the build host's kernel choice.
    multi_label: one candidate per (box, class) above conf_thresh
    (ultralytics val.py semantics) instead of argmax-class.
    approx_topk: TPU-native approximate candidate selection (see
    _select_topk) — measured A/B before use; off by default.
    """
    k = min(pre_topk, preds.shape[1] if not multi_label else preds.shape[1] * (preds.shape[2] - 5))
    prep = jax.vmap(
        lambda p: _prepare_candidates(p, conf_thresh, k, class_agnostic, multi_label,
                                      approx_topk)
    )
    boxes, nms_boxes, top_scores, cls_top, valid = prep(preds)
    return _suppress_and_compact(
        boxes, nms_boxes, top_scores, cls_top, valid, iou_thresh, max_det,
        _resolve_backend(k, backend),
    )
