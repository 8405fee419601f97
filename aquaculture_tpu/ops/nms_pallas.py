"""Pallas TPU kernel: fused greedy NMS suppression, batch-amortized.

The suppression scan is the serial heart of NMS: candidate g may only
suppress later candidates if g itself survived, so the K steps are
inherently sequential. The trick is WIDTH, not depth: one kernel owns the
whole batch, IoU tiles are staged in VMEM scratch, and each sequential step
suppresses across all B images at once — one (K, B) VPU op — with zero HBM
traffic between steps.

TPU layout rules drove the data layout (learned the hard way):
* trailing singleton dims are poison — the tiler pads the last dim to 128
  lanes, so a (B, K, 1) mask occupies 128x its logical size (OOM);
* lane-dimension dynamic slices must be 128-aligned, sublane slices only
  8-aligned — so CANDIDATES live on the sublane axis and BATCH on lanes:
  every operand is a (K, B) plane, and the per-tile slice x0[s:s+8, :] is a
  legal sublane slice.

Semantics are exactly the reference greedy NMS; tests cross-check
elementwise against the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 8    # IoU rows staged per tile (f32 sublane alignment)
_CHUNK = 256  # K-chunk for tile construction (VMEM temporary budget)


def _suppress_kernel(
    x0_ref, y0_ref, x1_ref, y1_ref, valid_ref, keep_ref, mask_scratch,
    *, iou_thresh: float, k: int, b: int,
):
    """All refs (K, B); mask_scratch (BLOCK, K, B) VMEM.

    The serial chain is the K greedy steps; everything foldable is hoisted
    into the (parallel) scratch build so each step is ONE select:
    * the scratch holds the PRE-THRESHOLDED causal mask
      ``(iou > thresh) & (col > g)`` as 0/1 f32 — no per-step threshold
      compare and no per-step (K, B) index compare;
    * the survivor flag of candidate g is read straight from the 8-row
      block slice of keep_ref (rows < g are final by then) — no per-step
      masked (K, B) reduction.
    """
    import jax.experimental.pallas as pl

    x0, y0, x1, y1 = x0_ref[:, :], y0_ref[:, :], x1_ref[:, :], y1_ref[:, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)  # (K, B)

    keep_ref[:, :] = valid_ref[:, :]

    n_blocks = k // _BLOCK

    def block_body(bi, _):
        s = pl.multiple_of(bi * _BLOCK, _BLOCK)
        bx0 = x0_ref[pl.ds(s, _BLOCK), :]  # (BLOCK, B) — sublane slice, legal
        by0 = y0_ref[pl.ds(s, _BLOCK), :]
        bx1 = x1_ref[pl.ds(s, _BLOCK), :]
        by1 = y1_ref[pl.ds(s, _BLOCK), :]
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)

        # Suppression mask of this candidate-block vs ALL candidates ->
        # (BLOCK, K, B), built in static K-chunks so the (BLOCK, CHUNK, B)
        # temporaries stay inside the VMEM budget (lane padding to 128
        # makes full-K temporaries ~4 MB each).
        # Chunk boundaries are static Python; the final chunk may be a
        # K%_CHUNK remainder (always a multiple of 128, so sublane-legal).
        starts = list(range(0, k, min(_CHUNK, k)))
        for c0 in starts:
            chunk = min(_CHUNK, k - c0)
            cx0 = x0[c0 : c0 + chunk, :]
            cy0 = y0[c0 : c0 + chunk, :]
            cx1 = x1[c0 : c0 + chunk, :]
            cy1 = y1[c0 : c0 + chunk, :]
            carea = area[c0 : c0 + chunk, :]
            ix0 = jnp.maximum(bx0[:, None, :], cx0[None, :, :])
            iy0 = jnp.maximum(by0[:, None, :], cy0[None, :, :])
            ix1 = jnp.minimum(bx1[:, None, :], cx1[None, :, :])
            iy1 = jnp.minimum(by1[:, None, :], cy1[None, :, :])
            inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
            union = barea[:, None, :] + carea[None, :, :] - inter
            iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
            # causal: row g may only suppress columns j > g
            g_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, chunk, b), 0) + s
            col_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, chunk, b), 1) + c0
            mask_scratch[:, c0 : c0 + chunk, :] = jnp.where(
                (iou > iou_thresh) & (col_idx > g_idx), 1.0, 0.0
            )

        # Static unroll: scratch row index stays static. Each step is one
        # (K, B) select gated by the (1, B) survivor flag of candidate g.
        for r in range(_BLOCK):
            bkeep = keep_ref[pl.ds(s, _BLOCK), :]      # (BLOCK, B)
            kr = bkeep[r : r + 1, :]                   # (1, B) — g's flag, final
            row = mask_scratch[r, :, :]                # (K, B) 0/1
            keep_ref[:, :] = jnp.where(
                (row > 0.5) & (kr > 0.5), 0.0, keep_ref[:, :]
            )
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)


def greedy_suppress_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float = 0.45,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched greedy suppression: boxes (B, K, 4) score-sorted xyxy,
    valid (B, K) bool -> keep (B, K) bool. K must be a multiple of 128.
    interpret=None auto-selects interpreter mode off-TPU."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            interpret = True

    b, k, _ = boxes.shape
    assert k % 128 == 0, f"K={k} must be a multiple of 128"
    if b > 128:
        # One lane-width of batch per kernel invocation: beyond 128 images
        # the (K, B) planes pad to the next 128-lane multiple and the
        # VMEM budget blows (measured OOM at B=192).
        parts = [
            greedy_suppress_pallas(boxes[i : i + 128], valid[i : i + 128], iou_thresh, interpret)
            for i in range(0, b, 128)
        ]
        return jnp.concatenate(parts, axis=0)
    kernel = functools.partial(_suppress_kernel, iou_thresh=float(iou_thresh), k=k, b=b)
    mem = pl.ANY if interpret else pltpu.VMEM
    planes = jnp.transpose(boxes.astype(jnp.float32), (2, 1, 0))  # (4, K, B)
    keep = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=mem)] * 5,
        out_specs=pl.BlockSpec(memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((k, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BLOCK, k, b), jnp.float32)],
        interpret=interpret,
    )(planes[0], planes[1], planes[2], planes[3], valid.astype(jnp.float32).T)
    return keep.T > 0.5
