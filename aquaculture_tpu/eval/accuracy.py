"""Serving-accuracy harness: mAP A/B for every serving option.

The reference's entire operating point is accuracy-selected (reference:
src/get_kfold_cluster_performance.py:538-546 — conf/eps/min-size fixed by
grid-searched precision*recall); any serving shortcut that changes the math
(int8, TTA, multi_label, approx top-k) must therefore be bounded by a
measured accuracy delta, not just throughput. This module evaluates a
trained checkpoint on a rendered demo world under each serving
configuration and reports mAP@.5 / mAP@.5:.95 side by side.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from aquaculture_tpu.config import DetectConfig
from aquaculture_tpu.eval.map import evaluate_map
from aquaculture_tpu.utils.logging import log_info


def load_world_ground_truths(
    lab_dir: str, tile: int = 1024
) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """YOLO-format label dir -> [(stem, boxes_xyxy_px, cls)] sorted by stem."""
    out = []
    for lp in sorted(glob.glob(os.path.join(lab_dir, "*.txt"))):
        stem = os.path.basename(lp)[:-4]
        rows = np.loadtxt(lp, ndmin=2)
        if rows.size == 0:
            out.append((stem, np.zeros((0, 4)), np.zeros(0, int)))
            continue
        g = rows[:, 1:5] * float(tile)
        gb = np.stack(
            [g[:, 0] - g[:, 2] / 2, g[:, 1] - g[:, 3] / 2,
             g[:, 0] + g[:, 2] / 2, g[:, 1] + g[:, 3] / 2],
            axis=1,
        )
        out.append((stem, gb, rows[:, 0].astype(int)))
    return out


def detections_by_image(
    paths: Sequence[str],
    model,
    params,
    cfg: DetectConfig,
    batch_size: int = 8,
    decode_scale: bool = False,
    use_native: bool = False,
) -> Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Run the serving pipeline and group detections by tile stem.

    decode_scale: host decodes at img/tile scale (pipeline.detect_files) —
    lets the harness bound the mAP delta of decode-at-scale serving.
    use_native=True routes through libaquatile (the production DCT-domain
    decode when decode_scale is on; default False keeps CI loader-free)."""
    from aquaculture_tpu.pipeline import detect_files

    boxes, conf, cls, specs, _ = detect_files(
        paths, model, params, cfg, batch_size=batch_size, use_native=use_native,
        decode_scale=decode_scale,
    )
    per: Dict[str, List[int]] = {}
    for i, sp in enumerate(specs):
        stem = f"{sp.name}_{sp.bbox_ind}_{sp.x_offset}_{sp.y_offset}"
        per.setdefault(stem, []).append(i)
    out = {}
    for stem, idx in per.items():
        sel = np.asarray(idx, int)
        out[stem] = (boxes[sel].astype(float), conf[sel], cls[sel])
    return out


def world_map(
    paths: Sequence[str],
    lab_dir: str,
    model,
    params,
    cfg: DetectConfig,
    num_classes: int = 2,
    batch_size: int = 8,
    tile: int = 1024,
    decode_scale: bool = False,
) -> Dict[str, float]:
    """mAP of one serving configuration over a rendered world.

    tile: the world's image size in px — YOLO labels are normalized, so GT
    boxes scale by it; a mismatch silently zeroes every IoU match."""
    gts = load_world_ground_truths(lab_dir, tile=tile)
    dets = detections_by_image(
        paths, model, params, cfg, batch_size, decode_scale=decode_scale
    )
    # A detection stem with no GT entry would silently vanish from the
    # evaluation (its false positives never counted -> inflated precision).
    # That happens when an image has no labels/*.txt, or when a raster
    # larger than `tile` px splits into per-subtile stems — both are harness
    # misconfigurations, so fail loudly instead of scoring garbage.
    gt_stems = {stem for stem, _, _ in gts}
    unmatched = sorted(set(dets) - gt_stems)
    if unmatched:
        raise ValueError(
            f"{len(unmatched)} detection stem(s) have no ground-truth label "
            f"file (first: {unmatched[0]!r}). Every world image needs a "
            f"labels/<stem>.txt (empty for negatives), and `tile` must match "
            f"the world's image size so images aren't split into subtiles."
        )
    d_list, g_list = [], []
    for stem, gb, gk in gts:
        db, dc, dk = dets.get(stem, (np.zeros((0, 4)), np.zeros(0), np.zeros(0, int)))
        d_list.append((db, dc, dk))
        g_list.append((gb, gk))
    return evaluate_map(d_list, g_list, num_classes=num_classes)


@dataclasses.dataclass
class ServingConfigResult:
    name: str
    map50: float
    map: float


def _int8_params(model, fused_params, paths, img_size: int, skip):
    from aquaculture_tpu.cli.detect import quantize_for_serving

    return quantize_for_serving(model, fused_params, list(paths), img_size, skip=skip)


def load_checkpoint_f32(ckpt_dir: str, variant: str, num_classes: int):
    """Load + fuse a checkpoint with float leaves upcast to float32 first.

    The committed accuracy fixture (tests/data/demo_ckpt_n160) stores
    float16 to halve repo size; BN fusion must run in f32, so upcast
    precedes fuse. Returns (model, fused_params)."""
    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.models.yolov5 import YoloV5
    from aquaculture_tpu.utils.checkpoint import load_params

    model = YoloV5(variant=variant, num_classes=num_classes)
    params = load_params(ckpt_dir)
    params = jax.tree_util.tree_map(
        lambda a: (
            jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a)
        ),
        params,
    )
    return model, model.fuse(params)


SERVING_CONFIGS = (
    "f32", "bf16", "int8_mixed", "int8_full", "int8_safe", "tta", "multi_label"
)


def serving_accuracy_table(
    world_images_dir: str,
    lab_dir: str,
    ckpt_dir: str,
    variant: str = "n",
    num_classes: int = 2,
    img_size: int = 160,
    conf_threshold: float = 1e-3,
    configs: Sequence[str] = SERVING_CONFIGS,
    batch_size: int = 8,
    tile: int = 1024,
) -> List[ServingConfigResult]:
    """Evaluate every serving option on one world with one checkpoint.

    Returns one row per config; 'bf16' is the serving default and the
    baseline every other row is compared against in BENCHMARKS.md.
    """
    from aquaculture_tpu.models.quantize import SERVING_INT8_SKIP

    paths = sorted(
        p
        for ext in ("jpeg", "jpg", "png")
        for p in glob.glob(os.path.join(world_images_dir, f"*.{ext}"))
    )
    model, params = load_checkpoint_f32(ckpt_dir, variant, num_classes)

    rows: List[ServingConfigResult] = []
    for name in configs:
        cfg_kw = dict(img_size=img_size, conf_threshold=conf_threshold)
        p = params
        if name == "f32":
            cfg_kw["dtype"] = "float32"
        elif name == "bf16":
            pass
        elif name == "int8_mixed":
            p = _int8_params(model, params, paths, img_size, SERVING_INT8_SKIP)
        elif name == "int8_full":
            p = _int8_params(model, params, paths, img_size, ())
        elif name == "int8_safe":
            # the CANONICAL shipped default (variant-aware) — a local copy
            # of the skip list here would let CI bound a stale split
            from aquaculture_tpu.models.quantize import serving_int8_safe_skip

            p = _int8_params(
                model, params, paths, img_size, serving_int8_safe_skip(variant)
            )
        elif name == "tta":
            cfg_kw["augment"] = True
        elif name == "multi_label":
            cfg_kw["multi_label"] = True
        elif name == "topk512":
            # candidate-pool cap 512 (vs the 1024 default): +3.3% measured
            # serving throughput at mt/b128 (BENCH_MT_SLACK full_topk512);
            # shippable only while this row stays within epsilon of bf16
            cfg_kw["pre_nms_topk"] = 512
        else:
            raise ValueError(f"unknown serving config {name!r}")
        cfg = DetectConfig(**cfg_kw)
        m = world_map(paths, lab_dir, model, p, cfg, num_classes, batch_size, tile=tile)
        rows.append(ServingConfigResult(name=name, map50=m["map50"], map=m["map"]))
        # multi-hour CPU tables (mt@640) need per-config progress
        log_info(
            f"accuracy[{name}]: mAP@.5 {m['map50']:.4f}  mAP@.5:.95 {m['map']:.4f}"
        )
    return rows
