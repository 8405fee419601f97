"""Pallas TPU kernel: fused greedy NMS suppression, batch-amortized.

The suppression scan is the serial heart of NMS: candidate g may only
suppress later candidates if g itself survived, so the K steps are
inherently sequential. The trick is WIDTH, not depth: one kernel owns the
whole batch, IoU tiles (B, BLOCK, K) are staged in VMEM scratch, and each
sequential step suppresses across all B images at once — a (B, K) VPU op —
so the serial chain is K steps of full-width vector work with zero HBM
traffic in between.

Semantics are exactly the reference greedy NMS (score-descending order,
hard suppression at iou > thresh, suppressed candidates suppress nobody);
tests cross-check elementwise against the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 16  # rows of IoU staged per tile; K steps run in K/_BLOCK tiles


def _suppress_kernel(boxes_ref, valid_ref, keep_ref, iou_scratch, *, iou_thresh: float, k: int, b: int):
    """boxes (B, K, 4) score-sorted, valid (B, K, 1) -> keep (B, K, 1);
    iou_scratch is a (B, BLOCK, K) VMEM tile. Dynamic indexing goes through
    refs with pl.ds (value-level dynamic_slice has no TPU lowering)."""
    import jax.experimental.pallas as pl

    boxes = boxes_ref[:, :, :]  # (B, K, 4)
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)  # (B, K)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)       # (B, K)

    keep_ref[:, :, 0] = valid_ref[:, :, 0]

    n_blocks = k // _BLOCK

    def block_body(bi, _):
        s = pl.multiple_of(bi * _BLOCK, _BLOCK)
        blk = boxes_ref[:, pl.ds(s, _BLOCK), :]  # (B, BLOCK, 4)
        bx0, by0, bx1, by1 = blk[..., 0], blk[..., 1], blk[..., 2], blk[..., 3]
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)  # (B, BLOCK)

        # IoU of this row-block vs ALL candidates -> scratch (B, BLOCK, K)
        ix0 = jnp.maximum(bx0[:, :, None], x0[:, None, :])
        iy0 = jnp.maximum(by0[:, :, None], y0[:, None, :])
        ix1 = jnp.minimum(bx1[:, :, None], x1[:, None, :])
        iy1 = jnp.minimum(by1[:, :, None], y1[:, None, :])
        inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
        union = barea[:, :, None] + area[:, None, :] - inter
        iou_scratch[:, :, :] = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

        def row_body(r, _):
            g = s + r
            kr = keep_ref[:, pl.ds(g, 1), 0]          # (B, 1) survivor flags
            row = iou_scratch[:, pl.ds(r, 1), :][:, 0, :]  # (B, K)
            suppress = (row > iou_thresh) & (col_idx > g) & (kr > 0.0)
            keep_ref[:, :, 0] = jnp.where(suppress, 0.0, keep_ref[:, :, 0])
            return 0

        jax.lax.fori_loop(0, _BLOCK, row_body, 0)
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)


def greedy_suppress_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy suppression: boxes (B, K, 4) score-sorted xyxy,
    valid (B, K) bool -> keep (B, K) bool. K must be a multiple of 128."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, _ = boxes.shape
    assert k % 128 == 0, f"K={k} must be a multiple of 128"
    kernel = functools.partial(_suppress_kernel, iou_thresh=float(iou_thresh), k=k, b=b)
    mem = pl.ANY if interpret else pltpu.VMEM
    keep = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
        ],
        out_specs=pl.BlockSpec(memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((b, k, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, _BLOCK, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.float32)[..., None])
    return keep[..., 0] > 0.5
