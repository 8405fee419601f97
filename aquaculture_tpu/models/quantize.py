"""Post-training int8 quantization for the detector's conv stack.

Production-serving path: weights quantize per-output-channel, activations
per-tensor with scales calibrated from sample batches, and every Conv+SiLU
block runs int8 x int8 -> int32 on the MXU (2x the bf16 rate on v5e) with
dequantization fused into the bias add. The detect head stays in floating
point (it feeds the box decode directly).

Usage:
    fused = model.fuse(params)
    stats = calibrate(model, fused, sample_images)   # eager pass
    qparams = quantize(fused, stats)
    preds, _ = model.apply(qparams, images)          # same apply()

Calibration keys activation maxima by the identity of each conv's weight
array — the param tree maps 1:1 onto conv call sites, so no graph hooks are
needed.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from aquaculture_tpu.models import layers as L


def calibrate(model, fused_params, sample_images) -> Dict[int, float]:
    """Run eager forward passes recording per-conv input absmax.

    sample_images: (N, H, W, 3) array in [0, 1] (a handful of batches is
    enough; this runs un-jitted).
    """
    L._CALIB_STATS = {}
    try:
        model.features(fused_params, jnp.asarray(sample_images), training=False)
        stats = dict(L._CALIB_STATS)
    finally:
        L._CALIB_STATS = None
    return stats


# Backbone C3 blocks run their bottlenecks with shortcut adds; the neck C3s
# don't (models/yolov5.py features()). Needed to place sum_yscale correctly.
_SHORTCUT_C3 = ("b2", "b4", "b6", "b8", "b10")  # b10 exists only on P6

# Mixed-precision split: the early large-spatial/small-channel layers
# (P1-P3 backbone) tile poorly in int8 and stay bf16; int8 starts at the
# stride-16 backbone. Measured on v5e at batch 128 (BENCH_INT8_MIXED.jsonl):
# bf16 1,794 / full int8 1,893 / THIS SPLIT 1,935 tiles/s.
SERVING_INT8_SKIP = ("b0", "b1", "b2", "b3", "b4")

# Round-3 serving DEFAULT: the localization-safe split — the mixed split
# PLUS the neck C3 blocks feeding the detect head (P3/P4/P5 outputs,
# public-graph layers 17/20/23). int8 noise on the features the box
# regression reads is where quantization's mAP@.5:.95 cost concentrates;
# keeping them float recovers it entirely (BENCH_ACCURACY: 0.3259 vs bf16
# 0.3264 vs mixed 0.3052) AND measures FASTEST (BENCH_INT8_MIXED: 1,951
# tiles/s vs mixed 1,935) — the float head boundary drops the dequant/
# requant chains at the largest-spatial neck level.
SERVING_INT8_SAFE_SKIP = SERVING_INT8_SKIP + ("n17", "n20", "n23")

# The P6 family's 4-level neck names its head-feeding C3s differently
# (models/yolov5.py features(): o3..o6 = n23/n26/n29/n32).
SERVING_INT8_SAFE_SKIP_P6 = SERVING_INT8_SKIP + ("n23", "n26", "n29", "n32")


def serving_int8_safe_skip(variant: str = "m"):
    """The localization-safe skip list for a detector variant."""
    return SERVING_INT8_SAFE_SKIP_P6 if variant.endswith("6") else SERVING_INT8_SAFE_SKIP


def quantize(fused_params, calib: Dict, default_xscale: float = 1.0, skip=()):
    """Fused {w, b} conv dicts -> int8 dicts for the PIPELINED serving path.

    Each quantized conv carries {wq, wscale, xscale, b, yscale}: weights
    per-output-channel, input scale for float entry points, and the
    calibrated OUTPUT scale so the dequant+SiLU+requant chain fuses into
    the conv epilogue and the tensor handed to the next block stays int8
    in HBM (QTensor). Shortcut-bottleneck cv2 convs emit float instead and
    the bottleneck requantizes the SUM at its own calibrated scale
    (sum_yscale). Convs without calibration stats and the detect head stay
    in floating point.

    skip: top-level layer names (e.g. ("b0", "b1", ..., "b4")) kept in
    floating point — the mixed-precision serving variant: the early
    large-spatial/small-channel layers tile poorly in int8 (BENCHMARKS.md
    int8 A/B), so skipping them keeps bf16 where bf16 wins and int8 where
    the MXU int8 rate pays. A float->int8 boundary re-enters via the
    conv's calibrated xscale; qcat dequantizes mixed concat inputs.
    """

    def qconv(node, with_yscale: bool = True):
        key = id(node["w"])
        if key not in calib:
            return node  # uncalibrated: keep fp
        w = np.asarray(node["w"], np.float32)
        wmax = np.abs(w).max(axis=(0, 1, 2))
        wscale = np.where(wmax > 0, wmax / 127.0, 1.0)
        wq = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
        amax = calib[key]
        out = {
            "wq": jnp.asarray(wq),
            "wscale": jnp.asarray(wscale.astype(np.float32)),
            "xscale": jnp.asarray(np.float32(amax / 127.0 if amax > 0 else default_xscale)),
            "b": node["b"],
        }
        omax = calib.get(("out", key), 0.0)
        if with_yscale and omax > 0:
            out["yscale"] = jnp.asarray(np.float32(omax / 127.0))
        return out

    def walk(node, shortcut_c3: bool = False):
        if isinstance(node, dict):
            if "w" in node and "b" in node and "bn" not in node:
                return qconv(node)
            if shortcut_c3 and set(node) >= {"cv1", "cv2"} and "cv3" not in node:
                # a shortcut bottleneck {cv1, cv2}: cv2 emits float, the
                # sum requantizes at its own scale
                out = {"cv1": walk(node["cv1"]), "cv2": qconv(node["cv2"], with_yscale=False)}
                smax = calib.get(("sum", id(node["cv2"]["w"])), 0.0)
                if smax > 0 and "wq" in out["cv2"]:
                    out["sum_yscale"] = jnp.asarray(np.float32(smax / 127.0))
                return out
            return {k: walk(v, shortcut_c3 or k in _SHORTCUT_C3) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, shortcut_c3) for v in node)
        return node

    if skip and isinstance(fused_params, dict):
        out = {
            k: (v if k in skip else walk(v, k in _SHORTCUT_C3))
            for k, v in fused_params.items()
        }
    else:
        out = walk(fused_params)
    # The detect head feeds the box decode: always keep it floating point.
    if isinstance(out, dict) and "head" in out:
        out["head"] = fused_params["head"]
    return out


def quantize_model(model, fused_params, sample_images, skip=()):
    """calibrate + quantize in one call."""
    return quantize(fused_params, calibrate(model, fused_params, sample_images), skip=skip)
