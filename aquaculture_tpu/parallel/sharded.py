"""pjit-compiled sharded train / inference steps over a device mesh.

The train step is the single-program SPMD version of
:mod:`aquaculture_tpu.train.trainer`: batch sharded on ``data``, parameters
sharded per :func:`aquaculture_tpu.parallel.mesh.param_shardings` (replicated,
or channel-sharded on ``model``). XLA/GSPMD inserts the gradient all-reduce
over ICI; no hand-written collectives are needed for DP+TP of this model.

The inference step returns fixed-shape per-shard detections; the host (or a
final all_gather) assembles the global detection list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aquaculture_tpu.config import DetectConfig, TrainConfig
from aquaculture_tpu.models.yolov5 import YoloV5
from aquaculture_tpu.ops.nms import batched_nms
from aquaculture_tpu.parallel.mesh import (
    batch_sharding,
    param_shardings,
    put_global,
    replicated,
)
from aquaculture_tpu.train.trainer import TrainState, make_train_step


def sharded_train_step(
    model: YoloV5, cfg: TrainConfig, mesh: Mesh, steps_per_epoch: int, state: TrainState
):
    """Compile the train step with explicit mesh shardings.

    Returns (step_fn, sharded_state): step_fn(state, batch) -> (state, metrics)
    with batch sharded on `data` and state sharded per param_shardings.
    """
    pspec = param_shardings(state.params, mesh)
    state_shard = TrainState(
        params=pspec,
        opt=type(state.opt)(momentum=pspec, step=replicated(mesh)),
        ema=pspec,
        step=replicated(mesh),
    )
    bspec = {k: batch_sharding(mesh) for k in ("images", "labels", "label_mask")}
    step = make_train_step(model, cfg, steps_per_epoch)
    step_fn = jax.jit(
        step,
        in_shardings=(state_shard, bspec),
        out_shardings=(state_shard, None),
        donate_argnums=0,
    )
    # put_global = device_put when single-process; multi-process (pod DP
    # over DCN) builds global jax.Arrays from each host's identical copy.
    sharded_state = put_global(state, state_shard)
    return step_fn, sharded_state


def sharded_infer_fn(model: YoloV5, mesh: Mesh, cfg: DetectConfig = DetectConfig()):
    """Compile batched inference + NMS sharded over the data axis.

    Input: (B, S, S, 3) images in [0,1], B divisible by mesh `data` size.
    Output: ((B, max_det, 6) detections, (B, max_det) validity), sharded on
    batch — XLA keeps everything on-device; gather happens only at the host
    boundary (or downstream jnp stages keep consuming sharded arrays).
    """

    def infer(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32))
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
            class_agnostic=cfg.class_agnostic,
            multi_label=cfg.multi_label,
        )

    return jax.jit(
        infer,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=(batch_sharding(mesh), batch_sharding(mesh)),
    )
