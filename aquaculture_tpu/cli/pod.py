"""Pod-scale inference CLI: sharded corpus -> one global detections GeoJSON.

The config-5 runner (SURVEY §7 step 7): every host detects over its
contiguous shard of the tile corpus; host 0 writes the gathered output.
Single-host it degenerates to the fused pipeline.

    # per host (same command everywhere):
    python -m aquaculture_tpu.cli.pod --source gs-mirror/jpegs \\
        --download-bboxes wanted_bboxes.csv --out global_detections.geojson \\
        --coordinator host0:1234 --num-processes 4 --process-id $HOST_ID
"""

from __future__ import annotations

import argparse
import glob
import os

from aquaculture_tpu.cli.detect import load_model, resolve_model_args
from aquaculture_tpu.cli.geocode import load_download_bboxes
from aquaculture_tpu.config import DetectConfig
from aquaculture_tpu.parallel.pod import init_distributed, run_pod_pipeline
from aquaculture_tpu.utils.logging import log_info
from aquaculture_tpu.models.yolov5 import VARIANTS


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--source", required=True,
        help="corpus: image directory or glob, 'gs://bucket/prefix' (GCS "
        "object-store streaming, the reference's transport utils.py:192-238), "
        "or 'store:ROOT::PREFIX' (local object-store streaming)",
    )
    ap.add_argument("--download-bboxes", required=True)
    ap.add_argument("--out", required=True)
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--coordinator", default=None, help="host:port of process 0 (multi-host)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="elastic recovery: per-host progress manifests; a restarted run resumes")
    ap.add_argument("--checkpoint-every", type=int, default=1024,
                    help="tiles between progress checkpoints")
    ap.add_argument("--overlap", type=int, default=0,
                    help="overlap serving: tile overlap in px on large "
                         "rasters; duplicates collapse by meter-space IoU "
                         "after the global gather (the bulk-sweep "
                         "recommendation, BENCHMARKS.md P6 study). "
                         "0 = the reference's hard grid")
    args = ap.parse_args(argv)

    host, n_hosts = init_distributed(args.coordinator, args.num_processes, args.process_id)
    log_info("process %d of %d", host, n_hosts)

    store = None
    exts = ("jpeg", "jpg", "png", "tif", "tiff")
    if args.source.startswith("gs://"):
        from aquaculture_tpu.data.store import GcsBlobStore

        bucket, _, prefix = args.source[len("gs://"):].partition("/")
        store = GcsBlobStore(bucket)
        paths = [k for k in store.list(prefix) if k.rsplit(".", 1)[-1].lower() in exts]
    elif args.source.startswith("store:"):
        from aquaculture_tpu.data.store import LocalBlobStore

        root, _, prefix = args.source[len("store:"):].partition("::")
        store = LocalBlobStore(root)
        paths = [k for k in store.list(prefix) if k.rsplit(".", 1)[-1].lower() in exts]
    elif os.path.isdir(args.source):
        paths = sorted(
            p
            for ext in exts
            for p in glob.glob(os.path.join(args.source, f"*.{ext}"))
        )
    else:
        paths = sorted(glob.glob(args.source))

    args.variant, args.num_classes = resolve_model_args(
        args.weights, args.variant, args.num_classes
    )
    model, params = load_model(args.weights, args.variant, args.num_classes)
    dl = load_download_bboxes(args.download_bboxes)
    cfg_kw = dict(
        img_size=args.img or (1280 if args.variant.endswith("6") else 640),
        conf_threshold=args.conf,
    )
    if args.pre_topk:
        cfg_kw["pre_nms_topk"] = args.pre_topk
    det, stats = run_pod_pipeline(
        paths, model, params, dl,
        DetectConfig(**cfg_kw),
        batch_size=args.batch, out_path=args.out,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
        store=store, overlap=args.overlap,
    )
    log_info("done: %d local tiles at %.1f tiles/s", stats.tiles, stats.tiles_per_second)


if __name__ == "__main__":
    main()
