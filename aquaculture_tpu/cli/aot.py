"""Build / inspect / warm AOT serving artifacts (models/aot.py).

The serving program (resize + forward + decode + NMS) exports once to a
single StableHLO file; serving hosts load it without the model-building
code and serve any checkpoint of the same variant/precision:

    aq-aot export --weights ckpt/last --variant n --num-classes 2 \
        --batch 128 --out serving.aqx
    aq-aot describe --program serving.aqx
    aq-aot warmup --program serving.aqx --weights ckpt/last   # seed XLA cache
    aq-detect --aot serving.aqx --weights ckpt/last --source 'tiles/*.jpeg' ...

Detection thresholds and shapes are compile-time constants of the
artifact — set them at export time.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    # deferred: keep --help fast (jax loads with the models package)
    from aquaculture_tpu.models.yolov5 import VARIANTS

    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="export the serving program to a file")
    ex.add_argument("--weights", default=None, help=".pt or checkpoint directory (shapes/structure source; random init if omitted)")
    ex.add_argument("--out", required=True, help="output .aqx path")
    ex.add_argument("--variant", default=None, choices=sorted(VARIANTS),
                    help="default: the checkpoint's saved metadata, else m")
    ex.add_argument("--num-classes", type=int, default=None,
                    help="default: the checkpoint's saved metadata, else 5")
    ex.add_argument("--batch", type=int, default=32)
    ex.add_argument("--img", type=int, default=None,
                    help="inference size (default: 640, or 1280 for *6 variants)")
    ex.add_argument("--tile", type=int, default=None, help="input tile size (default config.IM_WIDTH)")
    ex.add_argument("--conf", type=float, default=0.25)
    ex.add_argument("--iou", type=float, default=0.45)
    ex.add_argument("--multi-label", action="store_true")
    ex.add_argument("--augment", action="store_true", help="bake TTA into the program")
    ex.add_argument("--int8", action="store_true",
                    help="export the int8 serving program (requires --calib)")
    ex.add_argument("--calib", default=None,
                    help="glob of calibration images for --int8")
    ex.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. 'tpu' or "
                         "'cpu,tpu' (default: this process's backend)")

    de = sub.add_parser("describe", help="print an artifact's metadata")
    de.add_argument("--program", required=True)

    wu = sub.add_parser("warmup", help="compile the artifact on this backend "
                        "(seeds the persistent compilation cache)")
    wu.add_argument("--program", required=True)
    wu.add_argument("--weights", required=True)
    wu.add_argument("--int8", action="store_true",
                    help="quantize the checkpoint first (int8 artifacts "
                         "expect QTensor-structured params; needs --calib)")
    wu.add_argument("--calib", default=None,
                    help="glob of calibration images for --int8")

    args = ap.parse_args(argv)

    from aquaculture_tpu.models import aot

    if args.cmd == "describe":
        print(json.dumps(aot.read_meta(args.program), indent=2, sort_keys=True))
        return

    from aquaculture_tpu.cli.detect import load_model
    from aquaculture_tpu.utils.logging import log_info

    if args.cmd == "warmup":
        meta = aot.read_meta(args.program)
        model, params = load_model(
            args.weights, meta.get("variant") or "m", meta.get("num_classes") or 5
        )
        if meta.get("quantized") and not args.int8:
            raise SystemExit(
                f"{args.program} is an int8 artifact: pass --int8 --calib "
                f"'imgs/*.jpeg' so the checkpoint is quantized to the "
                f"structure it expects"
            )
        if args.int8:
            import glob as _glob

            from aquaculture_tpu.cli.detect import quantize_for_serving

            if not args.calib:
                raise SystemExit("--int8 warmup needs --calib (calibration image glob)")
            params = quantize_for_serving(
                model, params, sorted(_glob.glob(args.calib)), meta["img_size"]
            )
        secs = aot.warmup(args.program, params, anchors=model.anchor_table)
        log_info("compiled %s on this backend in %.1fs (cache seeded)", args.program, secs)
        return

    # export
    from aquaculture_tpu.config import DetectConfig

    # A checkpoint dir records its variant/num_classes (cli.train metadata);
    # exporting under the wrong default variant dies on a layer/shape
    # mismatch, so the saved metadata wins over the fallback defaults —
    # same resolution order as cli/export.py.
    ckpt_meta: dict = {}
    if args.weights and not args.weights.endswith(".pt"):
        from aquaculture_tpu.utils.checkpoint import load_metadata

        try:
            ckpt_meta = load_metadata(args.weights)
        except (FileNotFoundError, NotADirectoryError):
            ckpt_meta = {}
    variant = args.variant or ckpt_meta.get("variant") or "m"
    # `is None`, not falsy-or: an explicit --num-classes 0 must be rejected
    # by the model builder, not silently replaced with the fallback
    num_classes = (
        int(args.num_classes)
        if args.num_classes is not None
        else int(ckpt_meta.get("num_classes") or 5)
    )
    if num_classes < 1:
        raise SystemExit(f"--num-classes must be >= 1, got {num_classes}")
    if ckpt_meta.get("variant") and args.variant and args.variant != ckpt_meta["variant"]:
        raise SystemExit(
            f"--variant {args.variant} contradicts the checkpoint's saved "
            f"variant {ckpt_meta['variant']!r} ({args.weights})"
        )
    if (
        ckpt_meta.get("num_classes")
        and args.num_classes is not None
        and args.num_classes != int(ckpt_meta["num_classes"])
    ):
        raise SystemExit(
            f"--num-classes {args.num_classes} contradicts the checkpoint's "
            f"saved num_classes {ckpt_meta['num_classes']} ({args.weights})"
        )
    img = args.img or (1280 if variant.endswith("6") else 640)
    model, params = load_model(args.weights, variant, num_classes)
    if args.int8:
        import glob as _glob

        if not args.calib:
            raise SystemExit("--int8 export needs --calib (calibration image glob)")
        from aquaculture_tpu.cli.detect import quantize_for_serving

        paths = sorted(_glob.glob(args.calib))
        params = quantize_for_serving(model, params, paths, img)
    cfg = DetectConfig(
        img_size=img, conf_threshold=args.conf, iou_threshold=args.iou,
        multi_label=args.multi_label, augment=args.augment,
    )
    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms
        else None
    )
    blob, meta = aot.export_serving(
        model, params, cfg, batch_size=args.batch, tile=args.tile,
        platforms=platforms,
    )
    aot.save_aot(args.out, blob, meta)
    log_info(
        "exported yolov5%s serving program (batch %d, img %d, platforms %s): "
        "%d bytes -> %s",
        variant, args.batch, img, meta["platforms"], len(blob), args.out,
    )


if __name__ == "__main__":
    main()
