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
from aquaculture_tpu.cli.detect import resolve_model_args
from aquaculture_tpu.models.yolov5 import VARIANTS, YoloV5, yolov5_init
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
    ap.add_argument("--variant", default=None, choices=sorted(VARIANTS),
                    help="(default: the warm-start checkpoint's saved variant, else m)")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="(default: the warm-start checkpoint's saved value, else 5)")
    ap.add_argument("--img", type=int, default=None,
                    help="training size (default: 1280 for P6 *6 variants, "
                         "else 640 — training a P6 head at 640 leaves its "
                         "stride-64 anchors with no matchable targets)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true", help="resume from <out>/state if present")
    ap.add_argument("--mesh", default=None,
                    help="shard the train step over local devices, e.g. '8' (data) or '4x2' (data x model)")
    ap.add_argument("--remat", action="store_true", help="rematerialize backbone activations")
    ap.add_argument("--phase-grad-dx", action="store_true",
                    help="phase-decomposed input gradients for the strided "
                         "convs (models/phase_grad.py; exact, opt-in until "
                         "the on-chip A/B lands — docs/SCALING.md)")
    args = ap.parse_args(argv)

    variant, num_classes = resolve_model_args(
        args.weights, args.variant, args.num_classes
    )
    img = args.img or (1280 if variant.endswith("6") else 640)
    cfg = TrainConfig(img_size=img, batch_size=args.batch, epochs=args.epochs, remat=args.remat,
                      phase_grad_dx=args.phase_grad_dx)
    ds = DetectionDataset(args.images, args.labels, cfg, augment=not args.no_augment, seed=args.seed)
    log_info("%d images, %d steps/epoch", len(ds), ds.steps_per_epoch)

    if args.weights:
        # Load UNFUSED: cli.detect.load_model folds BN for inference, which
        # would silently disable BatchNorm for the whole run (no
        # normalization, frozen running stats) and produce checkpoints
        # cli/export refuses (the s2d-rewritten stem). Training consumes
        # the raw conv+bn tree.
        from aquaculture_tpu.models.weights import load_pretrained

        model = YoloV5(variant=variant, num_classes=num_classes)
        if args.weights.endswith(".pt"):
            params, anchors = load_pretrained(model, args.weights)
            if anchors is not None:
                model = YoloV5(variant=variant, num_classes=num_classes, anchors=anchors)
        else:
            params = load_params(args.weights)

        def _has_bn(tree) -> bool:
            return isinstance(tree, dict) and (
                "bn" in tree or any(_has_bn(v) for v in tree.values())
            )

        if not _has_bn(params):
            raise SystemExit(
                f"{args.weights} holds FUSED inference weights (no BatchNorm "
                "parameters) — warm-start needs an unfused source: a "
                "training checkpoint dir or an ultralytics training .pt"
            )
    else:
        model, params = yolov5_init(variant, num_classes, seed=args.seed)

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

    if args.mesh:
        # Mesh-sharded SPMD training: batch over `data`, optional channel
        # sharding over `model` (parallel.sharded).
        from aquaculture_tpu.parallel.mesh import make_mesh
        from aquaculture_tpu.parallel.sharded import sharded_train_step

        dims = [int(v) for v in args.mesh.split("x")]
        n_data, n_model = (dims + [1])[:2]
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        assert cfg.batch_size % n_data == 0, "batch must divide the data axis"
        mesh_cm = mesh
        step_fn, state = sharded_train_step(model, cfg, mesh, ds.steps_per_epoch, state)
        log_info("training over mesh %s", dict(mesh.shape))
    else:
        mesh_cm = None
        step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)

    os.makedirs(args.out, exist_ok=True)
    import jax.numpy as jnp

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        last = {}
        for batch in ds.epoch(epoch):
            if mesh_cm is not None:
                from aquaculture_tpu.parallel.mesh import shard_batch

                batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh_cm)
            else:
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
            metadata={"epoch": epoch + 1, "variant": variant,
                      "num_classes": num_classes, "img_size": img},
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
