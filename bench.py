"""Headline benchmark: 640px inference + fused NMS throughput for the
framework's RECOMMENDED bulk-serving configuration.

The default config comes from models/plan.recommend_serving() — the
measured decision rules (currently the lane-aligned `mt` variant, bf16,
batch 128; BENCHMARKS.md "Lane-aligned variant family"). mt is the
TPU-first headline: same-or-more capacity than YOLOv5m (48.8 vs 47.9
useful GF/img) with the channel map searched against the 128-lane MXU
tile roofline. `--variant m` reproduces the .pt-parity baseline rows
from rounds 1-2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference publishes no throughput numbers (BASELINE.json published: {}),
so vs_baseline is measured against a fixed LITERATURE ANCHOR, not a
measured baseline: ultralytics YOLOv5m batched GPU inference is commonly
~140 img/s on a V100-class chip; vs_baseline = value / 140.0.

Extras in the same JSON object:
  mfu_pct      — model FLOPs utilization: XLA-counted FLOPs of the whole
                 compiled program / measured time / 197 TFLOP/s (v5e bf16)
  ms_per_batch — steady-state per-batch latency

Runs on whatever jax.devices() provides (the driver supplies one real TPU
chip). Steady-state timing: compile + 3 warmup batches excluded, then the
median of timed windows. The persistent compilation cache under
.jax_cache/ makes repeat runs start in seconds.

Variants (not used by the driver):
  python bench.py --trained CKPT DIR   # demo-trained weights on real tiles:
                                       # times NMS under realistic detection
                                       # density instead of random noise
  python bench.py --batch 256          # batch override (compile-cache assisted)
  python bench.py --variant m          # the .pt-parity baseline (rounds 1-2
                                       # headline config; BENCHMARKS.md)
  python bench.py --pre-topk 512       # the mAP-gated candidate-pool cap
                                       # (BENCHMARKS 'pre-topk 512')
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# v5e findings (pallas NMS backend): batch sweep 32/64/128 -> 885/1230/1509
# tiles/s at short (2-batch) timing windows; 8-batch windows measure the
# steady state (~1730 round 1; ~1846 round 2b after the fused-gather NMS
# prep — BENCHMARKS.md). The default runs bf16: on the recommended mt
# variant int8 measured a net LOSS (no lane padding left to hide), so
# `--int8` (localization-safe split) pays only with `--variant m`
# (BENCHMARKS 'int8 serving A/B').
BATCH = 128
INT8 = False
IMG = 640
WARMUP = 3
WINDOWS = 3
BATCHES_PER_WINDOW = 8
BASELINE_IMG_PER_S = 140.0  # ultralytics YOLOv5m V100-class batch GPU anchor
PEAK_FLOPS = 197e12         # v5e bf16 peak


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def main() -> None:
    batch = BATCH
    trained_ckpt = trained_dir = None
    args = sys.argv[1:]
    int8 = INT8 or "--int8" in args
    if "--batch" in args:
        batch = int(args[args.index("--batch") + 1])
    pre_topk = None
    if "--pre-topk" in args:
        pre_topk = int(args[args.index("--pre-topk") + 1])
    # Default variant = the framework's measured bulk-serving recommendation
    # (models/plan.py; currently mt). `--variant m` is the .pt-parity
    # baseline measured in rounds 1-2.
    from aquaculture_tpu.models.plan import recommend_serving

    variant = recommend_serving().variant
    if "--variant" in args:
        variant = args[args.index("--variant") + 1]
    if "--trained" in args:
        i = args.index("--trained")
        trained_ckpt, trained_dir = args[i + 1], args[i + 2]
        if not os.path.exists(trained_ckpt):
            raise FileNotFoundError(f"--trained checkpoint not found: {trained_ckpt}")

    os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"), exist_ok=True)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    if trained_ckpt:
        from aquaculture_tpu.cli.detect import load_model
        from aquaculture_tpu.utils.checkpoint import load_metadata

        # .pt weights carry no sidecar metadata; only checkpoint DIRS do
        meta = load_metadata(trained_ckpt) if os.path.isdir(trained_ckpt) else {}
        ckpt_variant = meta.get("variant", "n")
        nc = int(meta.get("num_classes", 2))
        model, params = load_model(trained_ckpt, ckpt_variant, nc)  # load_model fuses
        cfg = DetectConfig(conf_threshold=0.05)
        metric = f"yolov5{ckpt_variant}_640px_trained_infer_nms_tiles_per_sec_per_chip"
    else:
        model, params = yolov5_init(variant, num_classes=5, seed=0)
        params = model.fuse(params)
        cfg = DetectConfig()
        metric = f"yolov5{variant}_640px_infer_nms_tiles_per_sec_per_chip"
    if pre_topk:
        import dataclasses

        cfg = dataclasses.replace(cfg, pre_nms_topk=pre_topk)
        metric += f"_topk{pre_topk}"
    def infer(params, images):
        preds, _ = model.apply(params, images.astype(jnp.bfloat16))
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=cfg.pre_nms_topk,
        )

    rng = np.random.default_rng(0)
    if trained_dir:
        # Real tiles -> realistic detection density through NMS
        from PIL import Image

        files = sorted(
            os.path.join(trained_dir, f)
            for f in os.listdir(trained_dir)
            if f.endswith((".jpeg", ".jpg", ".png"))
        )
        if not files:
            raise FileNotFoundError(f"no .jpeg/.jpg/.png tiles in {trained_dir}")
        imgs = []
        for f in (files * ((batch // len(files)) + 1))[:batch]:
            a = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            if a.shape[0] != IMG:
                import jax.image

                a = np.asarray(
                    jax.image.resize(jnp.asarray(a), (IMG, IMG, 3), "linear")
                )
            imgs.append(a)
        images = jnp.asarray(np.stack(imgs))
    else:
        images = jnp.asarray(rng.random((batch, IMG, IMG, 3), dtype=np.float32))

    if int8:
        from aquaculture_tpu.models.quantize import quantize_model, serving_int8_safe_skip

        # Calibrate activation scales on the SAME distribution the run
        # infers on: real tiles in --trained mode (noise-calibrated scales
        # clip a trained net's activations), noise otherwise. The
        # localization-safe split (early layers + head-feeding neck C3s
        # bf16) is the measured-fastest AND accuracy-neutral int8 config.
        calib = images[:2]
        # variant-aware split: P6 variants feed the head from n26/n29/n32,
        # not n17/n20/n23 — hardcoding the P5 list would silently quantize
        # the head-feeding C3s on a P6 run
        params = quantize_model(
            model, params, calib, skip=serving_int8_safe_skip(model.variant)
        )
        metric = metric.replace("infer_nms", "int8_infer_nms")

    images = jax.device_put(images)
    params = jax.device_put(params)

    jitted = jax.jit(infer)
    compiled = jitted.lower(params, images).compile()
    flops = _flops_of(compiled)

    for _ in range(WARMUP):
        det, valid = compiled(params, images)
    jax.block_until_ready(det)
    kept = int(np.asarray(jax.device_get(valid)).sum())

    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(BATCHES_PER_WINDOW):
            det, valid = compiled(params, images)
        jax.block_until_ready(det)
        dt = time.perf_counter() - t0
        rates.append(batch * BATCHES_PER_WINDOW / dt)

    value = float(np.median(rates))
    out = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(value / BASELINE_IMG_PER_S, 3),
        # The reference publishes no throughput (BASELINE.json published: {});
        # the denominator is a literature anchor, not a measured baseline.
        "baseline_kind": "literature_anchor_v100_140imgs_yolov5m",
        "ms_per_batch": round(1000.0 * batch / value, 2),
        "batch": batch,
    }
    if flops:
        out["mfu_pct"] = round(100.0 * flops * (value / batch) / PEAK_FLOPS, 2)
    if not trained_ckpt and variant != "m":
        # the anchor model is YOLOv5m; flag cross-model ratios explicitly
        out["baseline_note"] = (
            f"anchor is YOLOv5m; measured variant is {variant}"
            + (" (>=m capacity — BENCHMARKS 'Lane-aligned variant family')"
               if variant == "mt" else ""))
    if trained_ckpt:
        out["detections_kept_per_batch"] = kept
    print(json.dumps(out))


if __name__ == "__main__":
    main()
