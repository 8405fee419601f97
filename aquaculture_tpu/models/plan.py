"""Serving-plan recommender: the measured decision rules as an API.

BENCHMARKS.md accumulated a set of *measured* serving decisions across
rounds (batch knee, int8 split per variant, mt-vs-m workload split,
P6-vs-tiled-overlap). This module encodes exactly those rules — nothing
speculative — so deployment code can ask for a plan instead of
re-reading benchmark tables. Every recommendation carries its
provenance (the BENCHMARKS.md section it was measured in).

The reference has no analogue: its serving configuration is a fixed CLI
invocation (reference README.md:77). This exists because the TPU rebuild
measured real trade-offs a deployer must pick between.

    >>> from aquaculture_tpu.models.plan import (
    ...     recommend_serving, recommend_training)
    >>> plan = recommend_serving()                      # throughput serving
    >>> plan.variant, plan.batch, plan.int8
    ('mt', 128, False)
    >>> recommend_serving(pt_interop=True).variant      # need .pt weights
    'm'
    >>> recommend_training().variant, recommend_training().batch
    ('mt', 128)
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

from aquaculture_tpu.config import IM_WIDTH
from aquaculture_tpu.models.yolov5 import VARIANTS

# Measured serving facts (BENCHMARKS.md), keyed by variant. Only variants
# with on-chip measurements are listed; others inherit conservative
# defaults (bf16, batch knee 128).
_INT8_SAFE_WINS = {"m", "m6"}  # localization-safe split: m +4.8%; m6@1280
                               # b128 +5.9% with the mAP bound measured at
                               # the production geometry (round 4d)
_INT8_LOSES = {"n", "mt"}      # measured net losses (BENCHMARKS.md)
_BATCH_KNEE = 128              # b32/64/128/192/256 sweep; 128 is the knee


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """A concrete, measurement-backed serving configuration."""

    variant: str
    batch: int
    int8: bool
    img_size: int
    overlap_px: int          # 0 = hard tile grid
    tta: bool                # multi-scale test-time augmentation (--augment)
    decode_scale: bool       # DCT-domain host decode at img_size (--decode-scale)
    notes: Tuple[str, ...]   # provenance: why each choice, BENCHMARKS.md refs


def recommend_serving(
    img: int | None = None,
    latency_sensitive: bool = False,
    pt_interop: bool = False,
    boundary_accuracy: bool = False,
    scale_shifted: bool = False,
    variant: str | None = None,
) -> ServingPlan:
    """Recommend a serving configuration from the measured trade-offs.

    Args:
      img: inference resolution. None (the default) means the chosen
        variant's native size: 1280 for the P6 family, else 640 (the
        reference workload). An explicit value is honored verbatim —
        the recommender never rewrites a stated constraint; a pick
        whose measurement only exists at a different resolution falls
        back to the path measured at yours instead.
      latency_sensitive: optimize single-tile p50 instead of batched
        throughput (changes the variant pick AND the batch).
      pt_interop: weights must round-trip with ultralytics ``.pt``
        (rules out the framework-own mt channel map).
      boundary_accuracy: detections near tile boundaries matter more
        than raw tiles/s — picks the P6 family (m6@1280, batch 128),
        which the round-4 amortization ladder showed serves at 97% of
        hard-grid m@640's per-ground-area throughput with whole-tile
        boundary accuracy (BENCHMARKS 'P6 batch amortization'). That
        measurement is a batch-128 result at m6's native 1280px, so a
        latency-sensitive (batch-1) plan, an explicit non-1280 img, or
        a pinned variant that can't see the whole tile all fall back to
        overlap serving — the boundary-accuracy path measured for
        sub-tile configs (BENCHMARKS 'P6 efficiency study').
      scale_shifted: the corpus's object scales are uncertain or exceed
        the training distribution (e.g. imagery at a new ground
        resolution) — turns on multi-scale TTA, which is a measured LOSS
        in distribution but recovers large-object recall under scale
        mismatch (BENCHMARKS 'TTA scale-shift study').
      variant: pin a variant explicitly; the plan then only fills in the
        measured batch/int8 choices for it.
    """
    notes: List[str] = []

    # The m6@1280 auto-pick is backed by exactly one measurement point:
    # batch 128 at the native 1280px. Batch 1 is unamortized P6 (m6
    # measured dispatch-bound and -17% even at b32), and any other img
    # was never measured — both fall back to the overlap path below.
    p6_pick_applies = (
        boundary_accuracy
        and not latency_sensitive
        and (img is None or img == 1280)
    )
    if variant is None and p6_pick_applies:
        variant = "m6"
        notes.append(
            "variant=m6 @1280: round-4 amortization ladder — m6@1280 b128 "
            "serves 450.6 tiles/s at 44.5% MFU (1,802 eq-640 tiles/s, 97% "
            "of hard-grid m@640), so the P6 family's throughput penalty "
            "is gone and its whole-tile boundary accuracy (0.718 vs 0.575 "
            "aug+overlap tiling proxy) wins outright; m6 is an "
            "ultralytics-standard variant, so .pt interop holds "
            "(BENCHMARKS 'P6 batch amortization')")
    elif variant is None:
        if boundary_accuracy and latency_sensitive:
            notes.append(
                "P6 not auto-picked: the m6@1280 boundary-accuracy win is "
                "a batch-128 amortization result; at batch 1 the P6 "
                "family is unamortized (m6 measured dispatch-bound at "
                "small batch — BENCHMARKS 'P6 efficiency study') — "
                "overlap serving covers boundary accuracy on the "
                "latency path")
        elif boundary_accuracy:
            notes.append(
                f"P6 not auto-picked: the m6 boundary-accuracy pick was "
                f"measured at its native 1280px only; img={img} was "
                f"stated, so the plan keeps it and serves boundary "
                f"accuracy via overlap tiling (pin variant='m6' to "
                f"serve P6 at a custom resolution anyway)")
        if pt_interop:
            variant = "m"
            notes.append(
                "variant=m: .pt interop pins m (no ultralytics yaml/.pt "
                "exists for the framework-own mt channel map)")
        else:
            variant = "mt"
            if latency_sensitive:
                notes.append(
                    "variant=mt: batch-1 device compute is variant-equal "
                    "(mt 3.98 vs m 3.95 ms/tile, round-4 latency_device "
                    "attribution — the round-3f tunnel split was dispatch "
                    "noise), so the batched winner serves the latency path "
                    "too (BENCHMARKS 'Tile -> geojson latency')")
            else:
                notes.append(
                    "variant=mt: lane-aligned map, +5.8% batched serving and "
                    "+10% training over m at >=m capacity (BENCHMARKS "
                    "'Lane-aligned variant')")
    elif variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; one of {sorted(VARIANTS)}")
    elif variant == "mt" and pt_interop:
        # not a trade-off but an impossibility: no ultralytics yaml/.pt
        # exists for the framework-own channel map
        raise ValueError(
            "variant='mt' cannot satisfy pt_interop: mt is framework-own "
            "(no ultralytics .pt exists for its channel map) — pin 'm' "
            "or drop the pin")
    elif variant == "m" and latency_sensitive:
        notes.append(
            "variant=m pinned on the latency path: device-equal to mt at "
            "batch 1 (3.95 vs 3.98 ms/tile, round-4 latency_device) — fine, "
            "but mt matches it and serves +5.8% faster batched")

    if img is None:
        # the variant's native size: P6 heads were designed for 1280
        img = 1280 if variant.endswith("6") else 640

    batch = 1 if latency_sensitive else _BATCH_KNEE
    if latency_sensitive:
        notes.append("batch=1: single-tile latency path")
    elif variant.endswith("6"):
        notes.append(
            "batch=128: the P6 amortization ladder is monotone "
            "27.7%->44.5% MFU through b128, the largest measured point "
            "(BENCHMARKS 'P6 batch amortization')")
    else:
        notes.append(
            "batch=128: measured knee — 192/256 are flat-to-slower at 2x "
            "the latency (BENCHMARKS 'Inference')")
        notes.append(
            "optional: --pre-topk 512 measured +3.3% bulk throughput at "
            "mt/b128 and mAP-identical on the gate world (CI-gated); the "
            "default stays 1024 — truncation binds only above pre_topk "
            "candidates/tile (BENCHMARKS 'pre-topk 512')")

    # m6's int8 win is a b128-at-1280 measurement pair (throughput +
    # accuracy); any other P6 geometry is unmeasured and stays bf16
    int8 = (
        variant in _INT8_SAFE_WINS
        and not latency_sensitive
        and (variant != "m6" or img == 1280)
    )
    if int8 and variant == "m6":
        notes.append(
            "int8=True: localization-safe split on m6@1280 b128 — +5.9% "
            "(477.1 vs 450.6 tiles/s, 47.2% MFU) with the mAP bound "
            "measured at the production geometry (1024px tiles at 1280): "
            "-0.004 mAP@.5 / -0.015 mAP@.5:.95 vs bf16, CI-pinned "
            "(BENCH_ACCURACY prod_m6_1280_e400; BENCHMARKS 'P6 batch "
            "amortization'). The earlier b32 loss was dispatch-bound "
            "amortization — int8 on P6 pays only at large batch")
    elif int8:
        notes.append(
            "int8=True: localization-safe split, +4.8% at bf16-level mAP "
            "on m (CI-bounded — BENCHMARKS 'int8 serving A/B')")
    elif variant == "m6":
        notes.append(
            "int8=False: the m6 int8 win is measured at 1280/b128 only "
            "(the b32 row is a net loss — dispatch-bound) — bf16 off that "
            "exact geometry (BENCHMARKS 'P6 batch amortization')")
    elif variant in _INT8_LOSES:
        notes.append(
            "int8=False: measured net loss on this variant (n: tiny tiles; "
            "mt: no padding left to hide) — BENCHMARKS")
    else:
        notes.append(
            "int8=False: unmeasured on this variant (or latency path) — "
            "bf16 is the safe default")

    tta = scale_shifted
    if scale_shifted:
        notes.append(
            "tta=True: serving scales exceed the trained range — TTA's "
            "down-scale passes recover large-object recall (+83% rel "
            "mAP@.5 at 2x trained scale; costs 3x the forward FLOPs and "
            "~0.02 mAP in-distribution). For a KNOWN resolution change, "
            "re-serving at the matching --img measured better AND cheaper "
            "than any TTA ensemble; point DetectConfig.tta_scales at the "
            "mismatch direction for small objects (BENCHMARKS 'TTA "
            "scale-shift study')")
    else:
        notes.append(
            "tta=False: measured ~0.02 mAP@.5 LOSS in-distribution at 3x "
            "the forward cost; only pays under scale mismatch (BENCHMARKS "
            "'TTA scale-shift study')")

    overlap_px = 0
    # "whole tile" = a P6 variant whose input covers the full source tile
    # (IM_WIDTH px), so tiles are never sliced and there are no seams; any
    # other config slices, and boundary accuracy needs overlap serving
    whole_tile = variant.endswith("6") and img >= IM_WIDTH
    if boundary_accuracy and not whole_tile:
        overlap_px = 64
        notes.append(
            "overlap=64px: boundary accuracy on a config that slices "
            "tiles (non-P6 variant, or P6 below the 1024px tile size) — "
            "aug-train + overlap-serve tiling closes to 1.25x behind P6 "
            "(BENCHMARKS 'P6 efficiency study'); cross-tile NMS merges "
            "the seams")
    elif boundary_accuracy:
        notes.append(
            f"overlap=0: the P6 family at {img}px sees the whole "
            f"{IM_WIDTH}px tile — no seams to stitch (BENCHMARKS 'P6 "
            "efficiency study')")

    # decode-at-scale: mAP-gated on the production config (round 4) —
    # mt@640 from 1024px tiles, DCT 5/8 decode scored +0.007 mAP@.5 /
    # +0.001 mAP@.5:.95 vs full-decode+device-resize, at 2.56x less
    # host->device traffic and parity-or-better decode throughput.
    # Requires img a proper N/8 fraction of the 1024px tile; the overlap
    # path slices at source resolution so it stays full-decode.
    decode_scale = (
        overlap_px == 0 and img < IM_WIDTH and (8 * img) % IM_WIDTH == 0
    )
    if decode_scale:
        notes.append(
            "decode_scale=True: DCT-domain 640-from-1024 decode measured "
            "mAP-neutral (+0.007 mAP@.5 on the mt@640 gate) with 2.56x "
            "less host->device traffic (BENCHMARKS 'Decode-at-scale'). "
            "CAVEAT: the decode filter differs from training's "
            "jax.image.resize — the gate bounds that operator gap on the "
            "synthetic world; re-run decode_scale_ab on a sample of the "
            "real corpus before flipping a production deployment")
    else:
        notes.append(
            "decode_scale=False: needs img = N/8 of the tile and the hard "
            "grid (overlap slices at source resolution)")

    return ServingPlan(
        variant=variant,
        batch=batch,
        int8=int8,
        img_size=img,
        overlap_px=overlap_px,
        tta=tta,
        decode_scale=decode_scale,
        notes=tuple(notes),
    )


@dataclasses.dataclass(frozen=True)
class TrainingPlan:
    """A concrete, measurement-backed training configuration.

    Field names match TrainConfig so a plan maps 1:1 onto it:
    TrainConfig(batch_size=plan.batch, compute_dtype=plan.compute_dtype,
    remat=plan.remat, scale=plan.scale_jitter, mosaic=plan.mosaic, ...).
    """

    variant: str
    batch: int
    compute_dtype: str
    remat: bool
    augment: bool
    mosaic: float
    scale_jitter: float
    budget_multiplier: float  # step budget vs an equal-budget no-aug run
    feed_cores: int           # host decode/aug cores needed at full step rate
    notes: Tuple[str, ...]


def recommend_training(
    pt_interop: bool = False,
    small_targets: bool = False,
    memory_constrained: bool = False,
    variant: str | None = None,
) -> TrainingPlan:
    """Recommend a training configuration from the measured trade-offs.

    Args:
      pt_interop: the trained weights must round-trip with ultralytics
        ``.pt`` (rules out the framework-own mt channel map).
      small_targets: the dataset's objects are small relative to the
        image (the aug study's regime) — moderates the affine scale
        jitter so mosaic+scale doesn't shrink targets below
        detectability.
      memory_constrained: the per-chip batch doesn't fit HBM — turns on
        remat (a measured MEMORY lever: 18% slower wall-clock, bigger
        batches), instead of silently shrinking the batch.
      variant: pin a variant; the plan fills in the measured knobs.
    """
    notes: List[str] = []

    if variant is None:
        if pt_interop:
            variant = "m"
            notes.append(
                "variant=m: .pt interop requires the public channel map "
                "(no ultralytics yaml/.pt exists for mt)")
        else:
            variant = "mt"
            notes.append(
                "variant=mt: +10.0% img/s over m at >=m capacity (400.7 "
                "img/s, 30.3% MFU — BENCHMARKS 'Training' mt row); the "
                "training-MFU binder is architecture lane padding, and "
                "the channel map is the lever that moves it")
    elif variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; one of {sorted(VARIANTS)}")
    elif variant == "mt" and pt_interop:
        raise ValueError(
            "variant='mt' cannot satisfy pt_interop: mt is framework-own "
            "(no ultralytics .pt exists for its channel map) — pin 'm' "
            "or drop the pin")

    notes.append(
        "batch=128: best measured img/s (the 32/64/128 sweep is "
        "monotonic; 192/256 blocked by the measurement tunnel, not HBM — "
        "BENCHMARKS 'Training')")
    notes.append(
        "compute_dtype=bfloat16: 2.1x fp32 img/s, converges to the same "
        "demo mAP with f32 master params/BN/loss (BENCHMARKS 'Training' "
        "defaults note)")

    remat = bool(memory_constrained)
    notes.append(
        "remat=True: a MEMORY lever — 18% slower wall-clock, buys bigger "
        "per-chip batches (BENCHMARKS 'Training' remat row)"
        if remat else
        "remat=False: measured 18% slower wall-clock for no throughput "
        "gain at batch 128 (BENCHMARKS 'Training' remat row)")

    scale_jitter = 0.3 if small_targets else 0.5
    notes.append(
        "augment=True, mosaic=0.5: the recipe generalizes — 8x held-out "
        "mAP@.5 over no-aug at 4x the step budget (BENCHMARKS "
        "'Augmentation study'); budget_multiplier=4 vs a memorization run")
    if small_targets:
        notes.append(
            "scale=0.3: the ultralytics default 0.5 shrinks small targets "
            "below detectability under mosaic (the aug study's rev-1 "
            "failure) — moderate the jitter for small-object datasets")

    # measured 640px b128 bf16 step rates (BENCHMARKS 'Training'); the
    # aug feed produces 17.1 img/s/core, so the host must provision
    # ceil(step/17.1) decode/aug cores or the step becomes feed-bound
    step_rate = {"m": 364.4, "mt": 400.7}.get(variant, 364.4)
    feed_cores = math.ceil(step_rate / 17.1)
    notes.append(
        f"feed_cores={feed_cores}: the augmented 640px feed produces 17.1 "
        f"img/s/core vs this variant's {step_rate:g} img/s step — thread "
        "the dataset feed (TrainConfig.feed_threads; batches are "
        "thread-count-invariant) — BENCHMARKS 'host feed'. CAVEAT: the "
        "per-core rate was measured on a 1-core sandbox; the multi-core "
        "overlap itself is EXTRAPOLATED, so validate the core count on "
        "the real TPU-VM host (README Known limitations)")

    return TrainingPlan(
        variant=variant,
        batch=128,
        compute_dtype="bfloat16",
        remat=remat,
        augment=True,
        mosaic=0.5,
        scale_jitter=scale_jitter,
        budget_multiplier=4.0,
        feed_cores=feed_cores,
        notes=tuple(notes),
    )
