"""Global constants and configuration dataclasses.

Pipeline geometry constants mirror the reference contract
(reference: src/utils.py:17-20): imagery is downloaded as 6144 px GeoTIFFs
covering 1200 m boxes in EPSG:3857 and analyzed as 1024 px tiles whose
pixel offsets are encoded in the file name.
"""

from __future__ import annotations

import dataclasses

# --- Imagery geometry (reference: src/utils.py:17-19) ---
LARGE_TIF_SIZE = 1024 * 6  # px of one downloaded GeoTIFF
IM_WIDTH = 1024            # px of one analysis tile
IM_HEIGHT = 1024
DOWNLOAD_BOX_M = 1200.0    # meters covered by one download box (EPSG:3857)

# --- CRS registry (reference: src/utils.py:20) ---
CRS_MAPPING = 3857  # Web Mercator: storage / mapping CRS
CRS_AREA = 3035     # ETRS89-extended LAEA Europe: area measurement CRS
CRS_LATLON = 4326   # WGS84 lat/lon: output CRS

# --- Detection label space (reference: src/process_yolo/geocode_results.py:24-30) ---
CLASS_NAMES = (
    "circle_farm",
    "square_farm",
    "triangle_farm",
    "other_farm",
    "rectangle_farm",
)
REVERSE_CLASS_MAPPING = {i: n for i, n in enumerate(CLASS_NAMES)}
CLASS_MAPPING = {n: i for i, n in enumerate(CLASS_NAMES)}

# --- Operating point found by the reference's grid search
#     (reference: src/get_kfold_cluster_performance.py:538-540) ---
OPTIMAL_CONF_THRESHOLD = 0.785
OPTIMAL_DISTANCE_THRESHOLD = 50.0   # DBSCAN eps in meters (EPSG:3035)
OPTIMAL_MIN_CLUSTER_SIZE = 5


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    """Inference configuration for the detector.

    Defaults follow the reference invocation ``detect.py --img 640``
    (reference: README.md:77) with ultralytics' default NMS settings.
    """

    img_size: int = 640
    conf_threshold: float = 0.25
    iou_threshold: float = 0.45
    max_detections: int = 300       # post-NMS cap (fixed XLA shape)
    # Pre-NMS candidate cap (fixed XLA shape). 1024 >> any realistic per-tile
    # cage count; the greedy-suppression scan is O(K) sequential steps of
    # O(K) vector work, so 4096 costs 16x the NMS time of 1024.
    pre_nms_topk: int = 1024
    multi_label: bool = False       # one candidate per (box, class) above
                                    # conf (ultralytics val.py semantics);
                                    # False = argmax class, matching the
                                    # reference's detect.py defaults
    augment: bool = False           # test-time augmentation (ultralytics
                                    # detect.py --augment): multi-scale +
                                    # lr-flip passes merged before NMS
    # TTA pass geometry (used only when augment=True). Defaults are the
    # ultralytics transform; ratios >1 add UP-scale passes for corpora
    # whose objects are smaller than the trained range (the symmetric
    # case of the BENCHMARKS TTA scale-shift study — though serving at a
    # larger img_size measured strictly better there).
    tta_scales: tuple = (1.0, 0.83, 0.67)
    tta_flips: tuple = (None, "lr", None)

    def __post_init__(self):
        # zip(scales, flips) would silently DROP passes on a length
        # mismatch — a user adding a 4th scale would measure a 3-pass
        # ensemble without knowing
        if len(self.tta_scales) != len(self.tta_flips):
            raise ValueError(
                f"tta_scales ({len(self.tta_scales)}) and tta_flips "
                f"({len(self.tta_flips)}) must have the same length — one "
                "flip entry (None or 'lr') per scale pass")
    class_agnostic: bool = False
    dtype: str = "bfloat16"
    nms_backend: str = "auto"       # ops/nms.batched_nms backend; 'auto:tpu'
                                    # etc. pin the choice to a TARGET
                                    # platform for cross-platform jax.export


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training configuration mirroring the reference capability
    ``train.py --img 640 --batch 16 --epochs 50`` (reference: README.md:52)
    with ultralytics' default hyperparameters.
    """

    img_size: int = 640
    batch_size: int = 16
    epochs: int = 50
    lr0: float = 0.01
    lrf: float = 0.01               # final OneCycle lr fraction
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    box_gain: float = 0.05
    cls_gain: float = 0.5
    obj_gain: float = 1.0
    anchor_t: float = 4.0           # anchor-match wh ratio threshold
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0
    mosaic: float = 1.0
    translate: float = 0.1
    scale: float = 0.5
    ema_decay: float = 0.9999
    max_boxes_per_image: int = 120  # fixed-shape label padding
    # Host feed parallelism: sample creation (decode/mosaic/affine/HSV is
    # numpy-heavy and mostly GIL-releasing) threads per batch. The measured
    # aug feed is ~17 img/s/core while the m@640 step consumes 364 img/s
    # (BENCHMARKS.md host-feed binder) — a full-rate host MUST thread.
    # 0 = auto (cores capped at 8), 1 = sequential. Batches are identical
    # for ANY thread count (per-sample deterministic seeding).
    feed_threads: int = 0
    # Decoded-image cache budget (GiB), shared by the full-resolution and
    # resized-copy caches. Small demo worlds fit entirely (fast epochs);
    # a realistic corpus (20k 1024px tiles ~ 60 GB decoded) stops caching
    # at the budget instead of OOMing the host. <= 0 disables caching.
    cache_gb: float = 4.0
    remat: bool = False             # jax.checkpoint the backbone forward:
                                    # trades recompute for activation memory
                                    # (bigger per-chip batches)
    # Mixed precision: activations/weight-use in bf16 (MXU native rate),
    # master params, BN stats, head outputs and the loss in f32 (the head
    # casts to f32 before decode, models/yolov5.py). Matches the bf16
    # serving path so train and serve share a numeric domain. "float32"
    # restores full-precision training.
    compute_dtype: str = "bfloat16"
    # Record the phase-decomposed dX vjp for strided convs
    # (models/phase_grad.py): the dX pass carries 44% of the training
    # roofline bound at 46% lane efficiency (docs/SCALING.md round 4);
    # the phase rewrite gives the worst kernels full 128-lane GEMMs.
    # Opt-in until the on-chip A/B lands (same gating discipline as
    # down_s2d — BENCHMARKS.md).
    phase_grad_dx: bool = False
