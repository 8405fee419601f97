"""Detection CLI: images -> YOLO-format label .txt files.

Equivalent of the reference's ``yolov5/detect.py --source ... --save-txt
--save-conf`` invocation (reference: README.md:77). Emits one
``<image-stem>.txt`` per image with detections, rows
``class cx cy w h conf`` normalized to the tile — the exact format the
downstream geocoder parses (reference: geocode_results.py:140-165).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from aquaculture_tpu.config import IM_HEIGHT, IM_WIDTH, DetectConfig
from aquaculture_tpu.data.filenames import encode_tile_name
from aquaculture_tpu.models.yolov5 import VARIANTS, YoloV5, yolov5_init
from aquaculture_tpu.models.weights import load_pretrained
from aquaculture_tpu.pipeline import detect_files


def quantize_for_serving(model, fused_params, sample_paths, img_size: int = 640,
                         skip=None):
    """int8 PTQ calibrated on up to 8 real source images.

    Calibration preprocessing is the SAME letterbox the serving path runs
    (ops/letterbox.py) — a cv2 squash-resize here would calibrate scales on
    a different pixel distribution than serving sees (the calibrate/serve
    analogue of the train/serve resize gap in CLAUDE.md conventions)."""
    import jax.numpy as jnp

    from aquaculture_tpu.data.geotiff import read_image
    from aquaculture_tpu.models.quantize import quantize_model, serving_int8_safe_skip
    from aquaculture_tpu.ops.letterbox import letterbox

    if skip is None:
        # localization-safe split: measured fastest AND mAP@.5:.95-neutral
        # vs bf16 (BENCHMARKS.md round 3); P6 variants skip their 4-level
        # head-feeding C3s
        skip = serving_int8_safe_skip(getattr(model, "variant", "m"))
    imgs = []
    for p in sample_paths[:8]:
        arr = read_image(p)
        if arr is None:
            continue
        x, _, _ = letterbox(jnp.asarray(arr), img_size)
        imgs.append(x)
    if not imgs:
        raise ValueError("no readable calibration images")
    return quantize_model(model, fused_params, jnp.stack(imgs), skip=skip)


def resolve_model_args(
    weights: str | None,
    variant_arg: str | None,
    num_classes_arg: int | None,
    default_variant: str = "m",
    default_num_classes: int = 5,
) -> tuple:
    """Resolve variant/num_classes: explicit flag > checkpoint metadata >
    default — and an explicit flag that CONTRADICTS the checkpoint's saved
    metadata is an error, not a silent mis-build (the stated-constraint-
    wins rule cli/export.py and aq-aot already apply). Serving a
    checkpoint trained with --variant n6 under the bare default would
    otherwise die on an opaque param-tree KeyError deep in features()."""
    meta: dict = {}
    if weights and not weights.endswith(".pt") and os.path.isdir(weights):
        from aquaculture_tpu.utils.checkpoint import load_metadata

        try:
            meta = load_metadata(weights)
        except (FileNotFoundError, NotADirectoryError):
            meta = {}
    variant = variant_arg or meta.get("variant") or default_variant
    if meta.get("variant") and variant_arg and variant_arg != meta["variant"]:
        raise SystemExit(
            f"--variant {variant_arg} contradicts the checkpoint's saved "
            f"variant {meta['variant']!r} ({weights})"
        )
    num_classes = (
        int(num_classes_arg)
        if num_classes_arg is not None
        else int(meta.get("num_classes") or default_num_classes)
    )
    if (
        meta.get("num_classes")
        and num_classes_arg is not None
        and int(num_classes_arg) != int(meta["num_classes"])
    ):
        raise SystemExit(
            f"--num-classes {num_classes_arg} contradicts the checkpoint's "
            f"saved num_classes {meta['num_classes']} ({weights})"
        )
    return variant, num_classes


def load_model(weights: str | None, variant: str = "m", num_classes: int = 5):
    model = YoloV5(variant=variant, num_classes=num_classes)
    if weights and not os.path.exists(weights):
        raise FileNotFoundError(f"weights not found: {weights}")
    if weights:
        if weights.endswith(".pt"):
            params, anchors = load_pretrained(model, weights)
            if anchors is not None:
                model = YoloV5(variant=variant, num_classes=num_classes, anchors=anchors)
        else:
            from aquaculture_tpu.utils.checkpoint import load_params

            params = load_params(weights)
        params = model.fuse(params)
    else:
        _, params = yolov5_init(variant, num_classes)
        params = model.fuse(params)
    return model, params


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="image file, directory, or glob")
    ap.add_argument("--weights", default=None, help=".pt or checkpoint directory")
    ap.add_argument("--out", required=True, help="directory for label .txt files")
    ap.add_argument("--variant", default=None, choices=sorted(VARIANTS),
                    help="(default: the checkpoint's saved variant, else m)")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="(default: the checkpoint's saved value, else 5)")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=None,
                    help="inference size (default: 640, or 1280 for *6 variants)")
    ap.add_argument("--int8", action="store_true", help="int8 PTQ serving path (calibrates on the first source images)")
    ap.add_argument("--augment", action="store_true",
                    help="test-time augmentation (multi-scale + lr-flip, "
                         "ultralytics detect.py --augment)")
    ap.add_argument("--pre-topk", type=int, default=None,
                    help="candidate pool cap before suppression (default "
                         "1024; 512 measured +3.3%% bulk throughput at "
                         "mt/b128 and mAP-identical on the gate world — "
                         "BENCHMARKS 'pre-topk 512'; truncation only "
                         "binds above pre_topk candidates per tile)")
    ap.add_argument("--multi-label", action="store_true",
                    help="one detection per (box, class) above conf "
                         "(ultralytics val.py semantics; default argmax class)")
    ap.add_argument("--decode-scale", action="store_true",
                    help="decode-at-scale: host decodes JPEG tiles straight "
                         "to img px in the DCT domain (~3x cheaper decode, "
                         "2.6x less host->device traffic for 640 from 1024; "
                         "requires 8*img %% tile == 0; mAP delta measured in "
                         "BENCHMARKS.md)")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a TensorBoard/perfetto device trace of "
                         "the serving loop into LOGDIR (utils.profiler)")
    ap.add_argument("--aot", default=None, metavar="PROGRAM.aqx",
                    help="serve from an AOT artifact (aq-aot export); "
                         "variant/img/conf/iou/batch come from the artifact "
                         "and the matching flags are ignored")
    args = ap.parse_args(argv)
    args.variant, args.num_classes = resolve_model_args(
        args.weights, args.variant, args.num_classes
    )

    if os.path.isdir(args.source):
        paths = sorted(
            p
            for ext in ("jpeg", "jpg", "png", "tif", "tiff")
            for p in glob.glob(os.path.join(args.source, f"*.{ext}"))
        )
    else:
        paths = sorted(glob.glob(args.source)) or [args.source]

    infer_fn, exported, meta = None, None, None
    if args.aot:
        # The artifact IS the serving program: its compile-time constants
        # (thresholds, shapes, variant) override the matching flags.
        from aquaculture_tpu.models import aot

        if args.decode_scale:
            # The artifact is a fixed-shape program over raw
            # (batch, tile, tile, 3) inputs with the resize compiled in;
            # decode-at-scale batches arrive at img px and would die
            # mid-stream with an opaque XLA shape error (the jit path
            # retraces, the AOT path cannot).
            raise SystemExit(
                "--decode-scale cannot be combined with --aot: the AOT "
                "artifact expects full-resolution tiles and resizes on "
                "device. Drop one of the flags."
            )
        if args.pre_topk:
            # the artifact bakes its candidate pool at export time — a
            # silently ignored flag would claim the gated +3.3% without
            # delivering it
            raise SystemExit(
                "--pre-topk cannot be combined with --aot: the candidate "
                "pool is compiled into the artifact. Re-export with the "
                "desired pool, or drop --aot."
            )
        exported, meta = aot.load_aot(args.aot)
        args.variant = meta.get("variant") or args.variant
        args.num_classes = meta.get("num_classes") or args.num_classes
        args.batch = meta["batch_size"]
        img_size = meta["img_size"]
        if meta.get("quantized") and not args.int8:
            raise SystemExit(
                f"{args.aot} is an int8 artifact: pass --int8 so the "
                f"checkpoint is quantized to the structure it expects"
            )
    else:
        img_size = args.img if args.img is not None else (
            1280 if args.variant.endswith("6") else 640
        )
        args.img = img_size

    model, params = load_model(args.weights, args.variant, args.num_classes)
    if args.int8:
        params = quantize_for_serving(model, params, paths, img_size)

    if args.aot:
        infer_fn = aot.serving_fn_loaded(
            exported, meta, params, anchors=model.anchor_table, label=args.aot
        )
        cfg = DetectConfig(
            img_size=img_size, conf_threshold=meta["conf_threshold"],
            iou_threshold=meta["iou_threshold"],
            multi_label=meta["multi_label"], augment=meta["augment"],
            # older artifacts predate the recorded pass geometry; their
            # programs were exported with the stock transform
            tta_scales=tuple(meta.get("tta_scales", (1.0, 0.83, 0.67))),
            tta_flips=tuple(
                None if f in (None, "none") else f
                for f in meta.get("tta_flips", (None, "lr", None))
            ),
        )
    else:
        cfg_kw = dict(
            img_size=img_size, conf_threshold=args.conf, iou_threshold=args.iou,
            multi_label=args.multi_label, augment=args.augment,
        )
        if args.pre_topk:
            cfg_kw["pre_nms_topk"] = args.pre_topk
        cfg = DetectConfig(**cfg_kw)
    # .txt rows are normalized to the TILE the boxes live in
    # (reference contract: geocode_results.py:89-99 maps normalized
    # coords through the tile's pixel size)
    tile_w = meta["tile"] if args.aot else IM_WIDTH
    tile_h = meta["tile"] if args.aot else IM_HEIGHT
    from aquaculture_tpu.utils.profiler import maybe_trace

    with maybe_trace(args.profile):
        boxes, conf, cls, specs, stats = detect_files(
            paths, model, params, cfg, args.batch,
            tile=tile_w,
            infer_fn=infer_fn,
            decode_scale=args.decode_scale,
        )

    os.makedirs(args.out, exist_ok=True)
    per_image: dict = {}
    for b, c, k, s in zip(boxes, conf, cls, specs):
        per_image.setdefault(s, []).append((k, b, c))
    for spec, rows in per_image.items():
        lines = []
        for k, b, c in rows:
            cx = (b[0] + b[2]) / 2 / tile_w
            cy = (b[1] + b[3]) / 2 / tile_h
            w = (b[2] - b[0]) / tile_w
            h = (b[3] - b[1]) / tile_h
            lines.append(f"{int(k)} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f} {c:.6f}")
        name = encode_tile_name(spec, extension="txt")
        with open(os.path.join(args.out, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(
        f"[INFO] {stats.tiles} tiles, {stats.detections} detections, "
        f"{stats.tiles_per_second:.1f} tiles/s -> {args.out}"
    )


if __name__ == "__main__":
    main()
