"""Re-measure the latency north star on the real chip (VERDICT r2 next #8).

Two measurements, each its own invocation (one jit program per run — the
remote-compile tunnel takes minutes per program; the persistent cache makes
re-runs cheap):

  --mode latency   p50/p90 single-tile -> geojson-row latency through the
                   ROUND-3 serving program (pipeline.make_infer_fn: fused
                   resize+forward+decode+NMS with the fused-gather prep),
                   including the host geocode epilogue. Refreshes the
                   round-1 190 ms number (BENCHMARKS.md).
  --mode feed      end-to-end detect_files throughput over real 1024px
                   tiles at batch 128 with the native loader vs the Python
                   loader vs device-only infer: the first MEASURED
                   host-overlap number (single host core in this sandbox).

Appends JSON lines to BENCH_LATENCY.jsonl.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
RESULTS = os.path.join(ROOT, "BENCH_LATENCY.jsonl")


def _cache():
    import jax

    os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _model(variant="m", num_classes=5):
    from aquaculture_tpu.models.yolov5 import yolov5_init

    model, params = yolov5_init(variant, num_classes=num_classes, seed=0)
    return model, model.fuse(params)


def _tiles_dir(n, d):
    """Render n synthetic 1024px JPEG tiles (decode load for the feed test)."""
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(d, f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg")
        if not os.path.exists(p):
            arr = rng.normal(70, 12, (1024, 1024, 3)).clip(0, 255).astype(np.uint8)
            Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def mode_latency(iters: int, variant: str = "m"):
    import jax

    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.data.filenames import TileSpec
    from aquaculture_tpu.geo import polygon as _poly
    from aquaculture_tpu.pipeline import make_infer_fn
    from aquaculture_tpu.post.geocode import geocode_detections

    model, params = _model(variant)
    cfg = DetectConfig(conf_threshold=0.25)
    infer = make_infer_fn(model, params, cfg, tile=1024, batch_size=1)
    dl = gf.GeoFrame(
        {"d": [0]}, geometry=[_poly.box(0, 0, 1200, 1200)], crs=3857
    )
    spec = TileSpec(year=2014, bbox_ind=0, x_offset=0, y_offset=0)

    rng = np.random.default_rng(0)
    tile_u8 = rng.integers(0, 255, (1, 1024, 1024, 3), dtype=np.uint8)

    # compile + warmup
    det, valid = infer(params, tile_u8)
    jax.block_until_ready(det)
    for _ in range(3):
        det, valid = infer(params, tile_u8)
        jax.block_until_ready(det)

    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        det_dev, valid_dev = infer(params, tile_u8)
        det = np.asarray(jax.device_get(det_dev))
        v = np.asarray(jax.device_get(valid_dev))[0]
        d = det[0][v]
        boxes = np.trunc(d[:, :4]).astype(np.int64)
        _ = geocode_detections(
            boxes, d[:, 4].astype(np.float64), d[:, 5].astype(np.int64),
            [spec] * len(d), dl,
        )
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1000.0

    # device-only portion for attribution
    dev = []
    for _ in range(iters):
        t0 = time.perf_counter()
        det_dev, _v = infer(params, tile_u8)
        jax.block_until_ready(det_dev)
        dev.append(time.perf_counter() - t0)
    dev_ms = np.asarray(dev) * 1000.0

    _emit({
        "mode": "latency",
        "variant": variant,
        "metric": "p50_tile_to_geojson_ms",
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
        "device_p50_ms": round(float(np.percentile(dev_ms, 50)), 1),
        "iters": iters,
        "round": 3,
    })


def mode_latency_device(variant: str = "m", k: int = 32):
    """Honest DEVICE-ONLY batch-1 latency (VERDICT r3 next #7).

    Every per-call measurement through the axon tunnel pays the remote
    dispatch + the ~17 MB/s input transfer (a 1024px uint8 tile is 3 MB ->
    ~180 ms of pure tunnel time), so round-3's "device" p50 of 121.5 ms is
    an upper bound, not a compute number. This chains K full serving
    iterations (resize+forward+decode+NMS at batch 1) inside ONE jit
    program with a loop-carried data dependence (the input is XORed with
    the iteration index so XLA cannot hoist the body), making
    per-iteration time = pure on-device compute. The single-call p50 minus
    this is the dispatch+transfer attribution."""
    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.ops.nms import batched_nms
    from aquaculture_tpu.pipeline import make_infer_fn

    model, params = _model(variant)
    cfg = DetectConfig(conf_threshold=0.25)
    dtype = jnp.bfloat16

    def serve_once(p, img_u8):
        x = img_u8.astype(dtype) / 255.0
        x = jax.image.resize(x, (1, cfg.img_size, cfg.img_size, 3), method="bilinear")
        preds, _ = model.apply(p, x)
        det, valid = batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
        )
        scale = 1024.0 / cfg.img_size
        det = det.at[..., :4].multiply(scale)
        return det, valid

    @jax.jit
    def chained(p, img_u8):
        def body(i, acc):
            img_i = img_u8 ^ jnp.asarray(i % 2, jnp.uint8)  # defeat hoisting
            det, valid = serve_once(p, img_i)
            return acc + det.sum().astype(jnp.float32) + valid.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0, jnp.float32))

    @jax.jit
    def single(p, img_u8):
        det, valid = serve_once(p, img_u8)
        return det.sum().astype(jnp.float32) + valid.sum().astype(jnp.float32)

    rng = np.random.default_rng(0)
    tile_u8 = rng.integers(0, 255, (1, 1024, 1024, 3), dtype=np.uint8)
    img_dev = jax.device_put(tile_u8)

    # warm both programs
    jax.block_until_ready(single(params, img_dev))
    jax.block_until_ready(chained(params, img_dev))

    reps = 5
    t_single = []
    for _ in range(reps * 4):
        t0 = time.perf_counter()
        jax.block_until_ready(single(params, img_dev))
        t_single.append(time.perf_counter() - t0)
    t_chain = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(params, img_dev))
        t_chain.append(time.perf_counter() - t0)

    per_iter_ms = float(np.median(t_chain)) * 1e3 / k
    single_ms = float(np.percentile(np.asarray(t_single) * 1e3, 50))
    _emit({
        "mode": "latency_device",
        "variant": variant,
        "backend": __import__("jax").default_backend(),
        "k": k,
        "device_compute_ms_per_tile": round(per_iter_ms, 2),
        "single_call_p50_ms": round(single_ms, 1),
        "dispatch_transfer_ms": round(single_ms - per_iter_ms, 1),
        "round": 4,
    })


def mode_feed(n_tiles: int, batch: int, variant: str = "m"):
    import jax

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.data import native_loader
    from aquaculture_tpu.pipeline import detect_files, make_infer_fn

    model, params = _model(variant)
    cfg = DetectConfig(conf_threshold=0.25)
    paths = _tiles_dir(n_tiles, "/tmp/aq_feed_tiles")
    infer = make_infer_fn(model, params, cfg, tile=1024, batch_size=batch)

    # warm the compile with one batch
    rng = np.random.default_rng(0)
    warm = rng.integers(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8)
    det, _ = infer(params, warm)
    jax.block_until_ready(det)

    # device-only rate (same images every batch, no host feed)
    t0 = time.perf_counter()
    nb = max(1, n_tiles // batch)
    for _ in range(nb):
        det, _ = infer(params, warm)
    jax.block_until_ready(det)
    dev_rate = nb * batch / (time.perf_counter() - t0)

    results = {"device_only_tiles_per_s": round(dev_rate, 1)}
    for name, use_native in (("native", True), ("python", False)):
        if use_native and not native_loader.available():
            results["native_tiles_per_s"] = None
            continue
        t0 = time.perf_counter()
        _b, _c, _k, _s, stats = detect_files(
            paths, model, params, cfg, batch_size=batch,
            use_native=use_native, infer_fn=infer,
        )
        dt = time.perf_counter() - t0
        results[f"{name}_tiles_per_s"] = round(stats.tiles / dt, 1)
    results.update({
        "mode": "feed", "batch": batch, "n_tiles": n_tiles,
        "host_cores": os.cpu_count(), "round": 3,
    })
    _emit(results)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("latency", "latency_device", "feed"),
                    required=True)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tiles", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--variant", default="m")
    args = ap.parse_args()

    _cache()
    if args.mode == "latency":
        mode_latency(args.iters, args.variant)
    elif args.mode == "latency_device":
        mode_latency_device(args.variant, args.k)
    else:
        mode_feed(args.tiles, args.batch, args.variant)


if __name__ == "__main__":
    main()
