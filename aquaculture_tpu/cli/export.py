"""Export a trained checkpoint as an ultralytics-layout ``.pt`` file.

Closes the weights loop with the reference ecosystem: the reference
trains/serves ``.pt`` weights (reference README.md:52,60,77); models
trained HERE flow back into any ultralytics tooling via this export
(torch-zip format, written without torch — models/export.py).

    python -m aquaculture_tpu.cli.export --ckpt ckpt/last --variant m \
        --num-classes 5 --out farms.pt
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    # deferred: keep --help fast (jax loads with the models package)
    from aquaculture_tpu.models.yolov5 import VARIANTS

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="checkpoint directory (cli.train output)")
    ap.add_argument("--out", required=True, help=".pt output path")
    ap.add_argument("--variant", default=None,
                    choices=sorted(VARIANTS),
                    help="default: the checkpoint's saved metadata, else m")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="default: the checkpoint's saved metadata, else 5")
    ap.add_argument("--full-model", action="store_true",
                    help="write an attempt_load-compatible FULL-MODEL "
                         "pickle ({'model': DetectionModel}) instead of a "
                         "state-dict file — loadable wherever ultralytics' "
                         "yolov5 models package is importable "
                         "(reference README.md:77's serving command)")
    ap.add_argument("--names", default=None,
                    help="comma-separated class names for --full-model")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.models.export import export_ultralytics_pt
    from aquaculture_tpu.models.yolov5 import YoloV5
    from aquaculture_tpu.utils.checkpoint import load_metadata, load_params
    from aquaculture_tpu.utils.logging import log_info

    # cli.train records variant/num_classes in the checkpoint metadata —
    # exporting an n6 checkpoint under the wrong default variant would die
    # on a layer-index mismatch, so the metadata wins over the defaults
    meta = load_metadata(args.ckpt)
    variant = args.variant or meta.get("variant", "m")
    num_classes = args.num_classes or int(meta.get("num_classes", 5))

    model = YoloV5(variant=variant, num_classes=num_classes)
    params = load_params(args.ckpt)
    # .pt stores f32 (half-precision checkpoints upcast losslessly)
    params = jax.tree_util.tree_map(
        lambda a: (
            jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a)
        ),
        params,
    )
    if args.full_model:
        from aquaculture_tpu.models.export import export_full_model_pt

        names = None
        if args.names:
            names = [n.strip() for n in args.names.split(",")]
            if len(names) != num_classes:
                # a short names dict crashes the ultralytics consumer at
                # DETECTION time (names[int(cls)] KeyError mid-inference) —
                # fail at export instead
                raise SystemExit(
                    f"--names has {len(names)} entries but the model has "
                    f"{num_classes} classes"
                )
        export_full_model_pt(model, params, args.out, names=names)
        log_info("exported full-model pickle (yolov5%s, %d classes) -> %s",
                 variant, num_classes, args.out)
    else:
        sd = export_ultralytics_pt(model, params, args.out)
        log_info("exported %d tensors (yolov5%s, %d classes) -> %s",
                 len(sd), variant, num_classes, args.out)


if __name__ == "__main__":
    main()
