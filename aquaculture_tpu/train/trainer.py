"""Jittable training step + host-side training loop.

The step is a pure function (state, batch) -> (state, metrics) designed to
be jit/pjit'd over a device mesh: batch sharded on the data axis, parameters
replicated (or channel-sharded — see aquaculture_tpu.parallel). BatchNorm
running statistics update inside the step; cross-shard stat agreement comes
from the data-parallel gradient mean (stats themselves stay per-replica
consistent because inputs are identically distributed; for exact sync use
sync_batch_stats once per epoch).

Reference capability: ultralytics train.py's epoch loop — warmup, grouped
SGD, EMA, per-epoch LR (reference: README.md:52 invocation).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from aquaculture_tpu.config import TrainConfig
from aquaculture_tpu.models import layers
from aquaculture_tpu.models.yolov5 import YoloV5
from aquaculture_tpu.train.ema import ema_update
from aquaculture_tpu.train.loss import yolo_loss
from aquaculture_tpu.train.optimizer import SGDState, sgd_init, sgd_update


@dataclasses.dataclass
class TrainState:
    params: Any
    opt: SGDState
    ema: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt, s.ema, s.step), None),
    lambda _, c: TrainState(*c),
)


def init_train_state(model: YoloV5, params) -> TrainState:
    return TrainState(
        params=params,
        opt=sgd_init(params),
        # real copy, not an alias: params and ema must not share buffers or
        # donation of the state would donate the same buffer twice
        ema=jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model: YoloV5,
    cfg: TrainConfig,
    steps_per_epoch: int,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pure train-step function.

    Batch dict: images (B, S, S, 3) in [0,1]; labels (B, M, 5) pixel
    [cls,cx,cy,w,h]; label_mask (B, M) bool.
    """

    forward = lambda p, x: model.features(p, x, True)
    if cfg.remat:
        # Rematerialize backbone activations on the backward pass: the conv
        # pyramid's activations dominate training memory at 640px.
        forward = jax.checkpoint(forward)
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def loss_fn(params, batch):
        # Mixed precision: the input cast drives the whole conv stack's
        # dtype (layers use w.astype(x.dtype)); params stay f32 masters and
        # the cast's transpose returns f32 grads. Head output and loss are
        # f32 (models/yolov5.py features -> astype(float32) in the head).
        # phase_grad_ctx is a TRACE-time switch: under it the strided convs
        # record the phase-decomposed dX vjp (models/phase_grad.py) that
        # the training roofline motivates (docs/SCALING.md round 4).
        with layers.phase_grad_ctx(cfg.phase_grad_dx):
            feats, new_params = forward(params, batch["images"].astype(compute_dtype))
        loss, metrics = yolo_loss(
            feats,
            batch["labels"],
            batch["label_mask"],
            model.anchor_table,
            model.num_classes,
            strides=model.strides,
            box_gain=cfg.box_gain,
            cls_gain=cfg.cls_gain,
            obj_gain=cfg.obj_gain,
            anchor_t=cfg.anchor_t,
            label_smoothing=cfg.label_smoothing,
        )
        return loss, (new_params, metrics)

    def train_step(state: TrainState, batch):
        grads, (new_params, metrics) = jax.grad(loss_fn, has_aux=True)(state.params, batch)
        params, opt = sgd_update(new_params, grads, state.opt, steps_per_epoch, cfg)
        ema = ema_update(state.ema, params, state.step + 1, cfg.ema_decay)
        new_state = TrainState(params=params, opt=opt, ema=ema, step=state.step + 1)
        return new_state, metrics

    return train_step

