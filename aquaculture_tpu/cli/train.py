"""Training CLI: fine-tune the detector on a YOLO-format dataset.

Equivalent of the reference's ``train.py --img 640 --batch 16 --epochs 50
--data model/multilabel_farms.yaml --weights yolov5m.pt``
(reference: README.md:52). Supports warm-starting from a torch ``.pt``
checkpoint or this framework's npz checkpoints; saves EMA params per epoch.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from aquaculture_tpu.config import TrainConfig
from aquaculture_tpu.cli.detect import load_model
from aquaculture_tpu.models.yolov5 import YoloV5, init_detect_biases, yolov5_init
from aquaculture_tpu.train.dataset import DetectionDataset
from aquaculture_tpu.train.trainer import init_train_state, make_train_step
from aquaculture_tpu.utils.checkpoint import load_params, save_params
from aquaculture_tpu.utils.logging import log_info


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True, help="training images directory")
    ap.add_argument("--labels", default=None, help="labels directory (default: sibling labels/)")
    ap.add_argument("--out", required=True, help="checkpoint output directory")
    ap.add_argument("--weights", default=None, help="warm-start .pt or checkpoint dir")
    ap.add_argument("--variant", default="m", choices=list("nsmlx"))
    ap.add_argument("--num-classes", type=int, default=5)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true", help="resume from <out>/state if present")
    args = ap.parse_args(argv)

    cfg = TrainConfig(img_size=args.img, batch_size=args.batch, epochs=args.epochs)
    ds = DetectionDataset(args.images, args.labels, cfg, augment=not args.no_augment, seed=args.seed)
    log_info("%d images, %d steps/epoch", len(ds), ds.steps_per_epoch)

    if args.weights:
        model, params = load_model(args.weights, args.variant, args.num_classes)
        # training needs unfused conv+bn params; .pt checkpoints may be fused
    else:
        model, params = yolov5_init(args.variant, args.num_classes, seed=args.seed)

    state = init_train_state(model, params)
    start_epoch = 0
    state_dir = os.path.join(args.out, "state")
    if args.resume and os.path.exists(os.path.join(state_dir, "treedef.json")):
        from aquaculture_tpu.train.trainer import TrainState
        from aquaculture_tpu.train.optimizer import SGDState
        from aquaculture_tpu.utils.checkpoint import load_metadata

        loaded = load_params(state_dir)
        state = TrainState(
            params=loaded["params"],
            opt=SGDState(momentum=loaded["opt_momentum"], step=loaded["opt_step"]),
            ema=loaded["ema"],
            step=loaded["step"],
        )
        start_epoch = int(load_metadata(state_dir).get("epoch", 0))
        log_info("resumed from %s at epoch %d", state_dir, start_epoch)

    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)

    os.makedirs(args.out, exist_ok=True)
    import jax.numpy as jnp

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        last = {}
        for batch in ds.epoch(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            last = metrics
        dt = time.perf_counter() - t0
        log_info(
            "epoch %d/%d: loss=%.4f (box %.4f obj %.4f cls %.4f) %.1fs (%.1f img/s)",
            epoch + 1,
            cfg.epochs,
            float(last.get("total", np.nan)),
            float(last.get("box", np.nan)),
            float(last.get("obj", np.nan)),
            float(last.get("cls", np.nan)),
            dt,
            ds.steps_per_epoch * cfg.batch_size / dt,
        )
        save_params(
            os.path.join(args.out, "last"),
            state.ema,
            metadata={"epoch": epoch + 1, "variant": args.variant, "num_classes": args.num_classes},
        )
        # full resumable state (params + optimizer momenta + EMA + step)
        save_params(
            state_dir,
            {
                "params": state.params,
                "opt_momentum": state.opt.momentum,
                "opt_step": state.opt.step,
                "ema": state.ema,
                "step": state.step,
            },
            metadata={"epoch": epoch + 1},
        )
    log_info("saved EMA checkpoint -> %s", os.path.join(args.out, "last"))


if __name__ == "__main__":
    main()
