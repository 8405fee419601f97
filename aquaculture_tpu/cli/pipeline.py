"""Fused pipeline CLI: images -> detections.geojson (+ facilities).

The TPU-native single-process path (SURVEY §7 step 4-5): what the reference
runs as four staged scripts with file handoffs
(tile_tifs -> detect -> geocode_results -> calc_net_areas) executes here as
one streaming program.
"""

from __future__ import annotations

import argparse
import glob
import os

from aquaculture_tpu import frame as gf
from aquaculture_tpu.cli.detect import load_model, resolve_model_args
from aquaculture_tpu.cli.geocode import load_download_bboxes
from aquaculture_tpu.config import DetectConfig
from aquaculture_tpu.pipeline import run_pipeline
from aquaculture_tpu.utils.logging import log_info
from aquaculture_tpu.models.yolov5 import VARIANTS


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="image directory or glob")
    ap.add_argument("--download-bboxes", required=True, help="wanted_bboxes.csv path")
    ap.add_argument("--out", required=True, help="detections.geojson output path")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--variant", default=None, choices=sorted(VARIANTS),
                    help="(default: the checkpoint's saved variant, else m)")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="(default: the checkpoint's saved value, else 5)")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--pre-topk", type=int, default=None,
                    help="candidate pool cap (default 1024; 512 measured "
                         "+3.3%% at mt/b128, mAP-gated — BENCHMARKS "
                         "'pre-topk 512')")
    ap.add_argument("--img", type=int, default=None,
                    help="inference size (default: 640, or 1280 for *6 variants)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--land", default=None, help="land polygons GeoJSON")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--int8", action="store_true", help="int8 PTQ serving path")
    ap.add_argument("--overlap", type=int, default=0,
                    help="overlap serving: tile overlap in px on large "
                         "rasters (boundary objects appear whole in a "
                         "neighboring tile; duplicates dedup by meter-space "
                         "IoU). 0 = the reference's hard grid")
    ap.add_argument("--decode-threads", type=int, default=0,
                    help="host decode pool for the Python loader: 0 = auto "
                         "(cores, capped at 8), 1 = sequential (bounds host "
                         "RAM to one raster in flight)")
    ap.add_argument("--decode-scale", action="store_true",
                    help="decode-at-scale: host decodes JPEG tiles straight "
                         "to img px in the DCT domain (see cli.detect)")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a TensorBoard/perfetto device trace of "
                         "the pipeline into LOGDIR (utils.profiler)")
    args = ap.parse_args(argv)

    if os.path.isdir(args.source):
        paths = sorted(
            p
            for ext in ("jpeg", "jpg", "png", "tif", "tiff")
            for p in glob.glob(os.path.join(args.source, f"*.{ext}"))
        )
    else:
        paths = sorted(glob.glob(args.source)) or [args.source]

    args.variant, args.num_classes = resolve_model_args(
        args.weights, args.variant, args.num_classes
    )
    model, params = load_model(args.weights, args.variant, args.num_classes)
    if args.int8:
        from aquaculture_tpu.cli.detect import quantize_for_serving

        params = quantize_for_serving(model, params, paths)
    img = args.img or (1280 if args.variant.endswith("6") else 640)
    cfg_kw = dict(img_size=img, conf_threshold=args.conf)
    if args.pre_topk:
        cfg_kw["pre_nms_topk"] = args.pre_topk
    cfg = DetectConfig(**cfg_kw)
    dl = load_download_bboxes(args.download_bboxes)
    land = gf.read_file(args.land) if args.land else None

    from aquaculture_tpu.utils.profiler import maybe_trace

    with maybe_trace(args.profile):
        det, stats = run_pipeline(
            paths, model, params, dl, cfg, args.batch, land=land,
            dedup=not args.no_dedup, overlap=args.overlap,
            decode_threads=args.decode_threads, decode_scale=args.decode_scale,
        )
    det.to_file(args.out)
    log_info(
        "%d tiles -> %d detections at %.1f tiles/s -> %s",
        stats.tiles,
        len(det),
        stats.tiles_per_second,
        args.out,
    )


if __name__ == "__main__":
    main()
