"""End-to-end detection pipeline: image files -> detections GeoJSON.

The TPU-native fusion of the reference's four staged processes
(tile_tifs.py -> detect.py -> geocode_results.py -> calc_net_areas.py):
tiles stream through a prefetched loader, letterbox+forward+NMS run as one
jitted program per fixed-shape batch, and geocoding/areas are vectorized
host passes over the padded detection tensors. One process, no intermediate
.txt/.jpeg staging, device never blocks on host IO.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import numpy as np

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import IM_WIDTH, DetectConfig
from aquaculture_tpu.data.filenames import TileSpec
from aquaculture_tpu.data.loader import tile_batches
from aquaculture_tpu.models.yolov5 import YoloV5
from aquaculture_tpu.ops.nms import batched_nms
from aquaculture_tpu.post.areas import cage_areas
from aquaculture_tpu.post.dedup import deduplicate_download_boxes, deduplicate_gdf_with_bboxes
from aquaculture_tpu.post.geocode import geocode_detections, remove_land_detections


# formats the native C++ decoder (libaquatile) can read
_NATIVE_EXTS = (".jpg", ".jpeg", ".tif", ".tiff")


@dataclasses.dataclass
class PipelineStats:
    tiles: int = 0
    batches: int = 0
    detections: int = 0
    infer_seconds: float = 0.0

    @property
    def tiles_per_second(self) -> float:
        return self.tiles / self.infer_seconds if self.infer_seconds else 0.0


def make_infer_fn(
    model: YoloV5, params, cfg: DetectConfig, tile: int = IM_WIDTH, batch_size: int = 0
):
    """Build the jitted (uint8 tile batch) -> (dets, valid) program.

    Letterbox resize + normalize + forward + decode + NMS fuse into one XLA
    computation; output boxes are mapped back to tile-pixel space on device.
    On a multi-chip host the batch shards over a `data` mesh of the local
    devices (params replicated); GSPMD handles the rest.
    """
    import jax
    import jax.numpy as jnp

    gain = cfg.img_size / tile
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    import math

    n_dev = jax.local_device_count()
    # shard over the largest device count that divides the batch
    n_data = math.gcd(batch_size, n_dev) if batch_size else n_dev
    shardings = {}
    if n_data > 1:
        from aquaculture_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

        mesh = make_mesh(n_data=n_data, n_model=1)
        shardings = dict(
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=(batch_sharding(mesh), batch_sharding(mesh)),
        )

    @functools.partial(jax.jit, **shardings)
    def infer(params, images_u8):
        x = images_u8.astype(dtype) / 255.0
        # decode-at-scale batches arrive already at img_size (the host
        # decoded at img/tile scale); shape is static, so this folds away
        if images_u8.shape[1] != cfg.img_size or images_u8.shape[2] != cfg.img_size:
            x = jax.image.resize(
                x, (images_u8.shape[0], cfg.img_size, cfg.img_size, 3), method="bilinear"
            )
        if cfg.augment:
            from aquaculture_tpu.ops.tta import tta_predict

            preds = tta_predict(
                model, params, x, scales=cfg.tta_scales, flips=cfg.tta_flips
            )
        else:
            preds, _ = model.apply(params, x)
        det, valid = batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
            class_agnostic=cfg.class_agnostic,
            multi_label=cfg.multi_label,
            backend=cfg.nms_backend,
        )
        # letterboxed 640-space -> tile pixel space (square tiles: pure gain)
        boxes = det[:, :, :4] / gain
        det = jnp.concatenate([boxes, det[:, :, 4:]], axis=-1)
        return det, valid

    return infer


def overlap_stride(overlap: int, tile_px: int = IM_WIDTH) -> int:
    """Validated tiling stride for overlap serving; 0 means hard grid.

    Single source of the overlap contract for run_pipeline and the pod
    runner: overlap >= tile would collapse the stride toward 1 px and emit
    ~(W-tile)^2 tiles per raster — an OOM, not a configuration."""
    if overlap and not 0 < overlap < tile_px:
        raise ValueError(f"overlap must be in (0, {tile_px}); got {overlap}")
    return tile_px - overlap if overlap else 0


def detect_files(
    paths: Sequence[str],
    model: YoloV5,
    params,
    cfg: DetectConfig = DetectConfig(),
    batch_size: int = 32,
    tile: int = IM_WIDTH,
    use_native: Optional[bool] = None,
    infer_fn=None,
    store=None,
    stride: int = 0,
    decode_threads: int = 0,
    decode_scale: bool = False,
):
    """Run inference over image files or object-store blobs.

    decode_scale: decode rasters at img_size/tile scale on the host (JPEGs
    in the DCT domain — ~3x cheaper for 640 from 1024) and ship img_size
    tiles to the device, skipping the on-device resize and cutting the
    host->device transfer (8*img_size must divide by tile; measured-mAP
    gated — see BENCHMARKS.md decode-at-scale study). Geocoding is
    unchanged: tile offsets stay in source pixels. Incompatible with
    overlap serving (stride).

    decode_threads (Python file loader only): 0 = auto thread pool (cores
    capped at 8; holds up to 2x threads decoded rasters in flight), 1 =
    sequential decode (bounds host RAM to one raster).

    stride: 0 = the reference's hard grid; 0 < stride < tile overlaps
    tiles of large rasters (overlap serving — boundary objects appear
    whole in a neighboring tile; dedup downstream with
    post.dedup.nms_cross_tile). Forces the Python loader.

    store: a data.store.BlobStore — when given, ``paths`` are blob KEYS and
    tiles stream through a threaded fetch window (the reference's corpus
    lives in GCS end-to-end: utils.py:192-238, geocode_results.py:34-66);
    no local image files are touched. When None, ``paths`` are local files:
    decode/tiling runs on the native C++ loader (threaded, off-GIL) when
    libaquatile.so is built; use_native=False forces the Python loader.
    infer_fn: a prebuilt make_infer_fn result — pass it when calling
    detect_files repeatedly (e.g. the pod runner's checkpoint chunks) so
    every call reuses ONE compiled program instead of re-jitting.
    Returns (boxes_px (N,4) int64, conf (N,), cls (N,), specs, stats).
    """
    import jax

    from aquaculture_tpu.data import native_loader

    out_tile = 0
    if decode_scale:
        if stride:
            raise ValueError("decode_scale is incompatible with overlap serving")
        if cfg.img_size >= tile or (8 * cfg.img_size) % tile != 0:
            raise ValueError(
                f"decode_scale needs img_size a proper N/8 fraction of the "
                f"tile; got {cfg.img_size}/{tile}"
            )
        out_tile = cfg.img_size

    if use_native is None:
        use_native = store is None and native_loader.available()
        if out_tile and use_native and not native_loader.supports_scaled():
            use_native = False  # stale .so: the Python loader scales too
    if use_native and not all(p.lower().endswith(_NATIVE_EXTS) for p in paths):
        # the native decoder speaks JPEG/TIFF only; its decode-failure skip
        # would SILENTLY drop e.g. a PNG corpus — use the Python loader
        use_native = False
    if stride and stride < tile and use_native:
        # overlapped slicing lives in the Python loader — but only rasters
        # LARGER than a tile are ever sliced, so probe image headers (PIL
        # reads dimensions without decoding) and keep the native fast path
        # for an all-pre-tiled corpus
        from PIL import Image

        def _exceeds_tile(p):
            try:
                with Image.open(p) as im:
                    return im.size[0] > tile or im.size[1] > tile
            except Exception:
                return True  # unreadable header: let the fallback decide

        if any(_exceeds_tile(p) for p in paths):
            use_native = False

    infer = infer_fn or make_infer_fn(model, params, cfg, tile, batch_size=batch_size)
    stats = PipelineStats()

    all_boxes: List[np.ndarray] = []
    all_conf: List[np.ndarray] = []
    all_cls: List[np.ndarray] = []
    all_specs: List[TileSpec] = []

    def harvest(det_dev, valid_dev, specs_batch, n_valid):
        det = np.asarray(jax.device_get(det_dev))
        valid = np.asarray(jax.device_get(valid_dev))
        stats.batches += 1
        stats.tiles += n_valid
        for i, spec in enumerate(specs_batch):
            if spec is None:
                continue
            v = valid[i]
            if not v.any():
                continue
            d = det[i][v]
            boxes = np.trunc(d[:, :4]).astype(np.int64)  # reference int() semantics
            all_boxes.append(boxes)
            all_conf.append(d[:, 4].astype(np.float64))
            all_cls.append(d[:, 5].astype(np.int64))
            all_specs.extend([spec] * len(d))

    t0 = time.perf_counter()
    if store is not None:
        from aquaculture_tpu.data.loader import tile_batches_from_store

        batches = tile_batches_from_store(
            store, paths, batch_size=batch_size, tile=tile, stride=stride,
            out_tile=out_tile,
        )
    elif use_native:
        batches = native_loader.native_tile_batches(
            paths, batch_size=batch_size, tile=tile, out_tile=out_tile
        )
    else:
        batches = tile_batches(
            paths, batch_size=batch_size, tile=tile, stride=stride,
            decode_threads=decode_threads, out_tile=out_tile,
        )
    # Double-buffered: dispatch batch N+1 before harvesting batch N so the
    # device-to-host transfer and python postprocess overlap device compute
    # (jax dispatch is async; device_get is the only sync point).
    pending = None
    for batch in batches:
        det_dev, valid_dev = infer(params, batch.images)
        if pending is not None:
            harvest(*pending)
        pending = (det_dev, valid_dev, batch.specs, int(batch.valid.sum()))
    if pending is not None:
        harvest(*pending)
    stats.infer_seconds = time.perf_counter() - t0

    if all_boxes:
        boxes = np.concatenate(all_boxes)
        conf = np.concatenate(all_conf)
        cls = np.concatenate(all_cls)
    else:
        boxes = np.zeros((0, 4), np.int64)
        conf = np.zeros(0)
        cls = np.zeros(0, np.int64)
    stats.detections = len(boxes)
    return boxes, conf, cls, all_specs, stats


def run_pipeline(
    paths: Sequence[str],
    model: YoloV5,
    params,
    download_bboxes: "gf.GeoFrame",
    cfg: DetectConfig = DetectConfig(),
    batch_size: int = 32,
    land: Optional["gf.GeoFrame"] = None,
    dedup: bool = True,
    use_native: Optional[bool] = None,
    store=None,
    overlap: int = 0,
    overlap_iou: float = 0.5,
    decode_threads: int = 0,
    decode_scale: bool = False,
):
    """Full slice: files -> geocoded + area-annotated (ocean) detections.

    Mirrors geocode_results.py __main__ + calc_net_areas.py __main__
    (reference: src/process_yolo/) in one call. With ``store`` set,
    ``paths`` are object-store keys streamed via the BlobStore protocol.
    overlap > 0 enables overlap serving on large rasters: tiles step by
    (tile - overlap) px so boundary objects appear whole in a neighboring
    tile, and the duplicate detections collapse via meter-space IoU NMS
    (post.dedup.nms_cross_tile) right after geocoding. The reference's
    hard grid fragments boundary cages (measured 3.5x mAP cost on
    boundary-heavy worlds, BENCHMARKS.md P6 study).
    Returns (detections GeoFrame in EPSG:4326, PipelineStats).
    """
    from aquaculture_tpu.post.dedup import nms_cross_tile

    stride = overlap_stride(overlap)
    boxes, conf, cls, specs, stats = detect_files(
        paths, model, params, cfg, batch_size, use_native=use_native, store=store,
        stride=stride, decode_threads=decode_threads, decode_scale=decode_scale,
    )
    det = geocode_detections(boxes, conf, cls, specs, download_bboxes)
    if len(det):
        # assign BEFORE cross-tile NMS: specs align with geocode's rows,
        # not with the post-NMS survivors
        det["bbox_ind"] = [s.bbox_ind for s in specs]
    # geocode_detections returns CRS 4326 and every step below preserves it
    # (nms_cross_tile copies det.crs; deduplicate_gdf_with_bboxes round-trips
    # through to_crs(src_crs); drop/cage_areas copy the frame)
    if len(det) and dedup:
        dd = deduplicate_download_boxes(download_bboxes)
        det = deduplicate_gdf_with_bboxes(dd, det)
    # Cross-tile NMS runs AFTER region dedup, not before: adjacent download
    # boxes share borders, so a border cage appears under two bbox_inds. If
    # NMS ran first and kept the higher-confidence copy from box B, region
    # dedup could then drop it (B's surviving region excludes the border
    # strip) while A's copy — the one that would have survived — was already
    # NMS-suppressed, losing the detection entirely. After dedup, intra-
    # raster overlap duplicates (same bbox_ind, clipped identically) and the
    # single surviving cross-box copy both collapse correctly. NMS compares
    # the xmin_m.. meter columns, which the geometry clip leaves untouched.
    if len(det) and overlap:
        det = nms_cross_tile(det, iou_thresh=overlap_iou)
    if len(det) and "bbox_ind" in det.columns:
        det = det.drop(columns=["bbox_ind"])
    if len(det):
        det = cage_areas(det)
    if land is not None and len(det):
        # hybrid = row-for-row the exact sjoin result (boundary-masked
        # three-way split; post/landmask.py), ~10x faster at corpus scale.
        # Small batches skip the mask build: the exact path wins under
        # ~2k rows because the rasterization is a fixed ~1 s cost.
        if len(det) >= 2000:
            from aquaculture_tpu.post.landmask import (
                remove_land_detections_hybrid)

            det = remove_land_detections_hybrid(det, land)
        else:
            det = remove_land_detections(det, land)
    return det, stats
