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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="checkpoint directory (cli.train output)")
    ap.add_argument("--out", required=True, help=".pt output path")
    ap.add_argument("--variant", default="m", choices=[*"nsmlx", "n6", "s6", "m6", "l6", "x6"])
    ap.add_argument("--num-classes", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.models.export import export_ultralytics_pt
    from aquaculture_tpu.models.yolov5 import YoloV5
    from aquaculture_tpu.utils.checkpoint import load_params
    from aquaculture_tpu.utils.logging import log_info

    model = YoloV5(variant=args.variant, num_classes=args.num_classes)
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
    sd = export_ultralytics_pt(model, params, args.out)
    log_info("exported %d tensors (yolov5%s, %d classes) -> %s",
             len(sd), args.variant, args.num_classes, args.out)


if __name__ == "__main__":
    main()
