"""Host decode-at-scale A/B (VERDICT r3 next #4): tiles/s/core for the
four decode paths a serving host can take on pre-tiled 1024px JPEGs when
the model eats 640px.

  pil_full      PIL decode 1024 -> model resizes on device (round-3 63.0)
  native_full   libaquatile full decode -> device resize (round-3 43.8)
  native_scaled libaquatile DCT-domain 5/8 decode -> 640px straight out
  pil_scaled    Python-loader twin (full decode + host bilinear) — the
                fallback when the .so is stale; expected SLOWER than
                pil_full (it pays the resize on the host) but shape-equal

Rates count SOURCE tiles/s (one 1024px JPEG each), so rows compare
directly with the round-3 host-feed table (BENCHMARKS.md). The scaled
paths additionally cut host->device bytes 2.56x (640^2 vs 1024^2).

Reference contract: serving consumed full-size staged JPEGs
(src/load_data/tile_tifs.py:50-74); decode-at-scale is a TPU-host lever
the reference never had. Appends JSON lines to BENCH_FEED.jsonl.
"""

from __future__ import annotations


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
RESULTS = os.path.join(ROOT, "BENCH_FEED.jsonl")


def _emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _corpus(d, n, px=1024, quality=92, seed=0):
    """Realistic-entropy JPEG tiles: smooth sea + blocky cage texture."""
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        base = rng.integers(0, 255, (px // 32, px // 32, 3), dtype=np.uint8)
        arr = np.asarray(Image.fromarray(base).resize((px, px), Image.BILINEAR))
        noise = rng.integers(0, 24, (px, px, 1), dtype=np.uint8)
        arr = np.clip(arr.astype(np.int16) + noise - 12, 0, 255).astype(np.uint8)
        p = os.path.join(d, f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg")
        Image.fromarray(arr).save(p, quality=quality)
        paths.append(p)
    return paths


def _drain(batches):
    tiles = 0
    checksum = 0
    for b in batches:
        n = sum(1 for s in b.specs if s is not None)
        tiles += n
        checksum += int(b.images[0, 0, 0, 0])
    return tiles, checksum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192, help="corpus size (tiles)")
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--out-tile", type=int, default=640)
    ap.add_argument("--dir", default="/tmp/aq_feed_bench")
    ap.add_argument("--threads", type=int, default=1,
                    help="decode threads (1 = per-core rate on this 1-core box)")
    args = ap.parse_args()

    from aquaculture_tpu.data import native_loader
    from aquaculture_tpu.data.loader import tile_batches

    paths = _corpus(args.dir, args.n, px=args.tile)
    modes = [
        ("pil_full", lambda: tile_batches(
            paths, 32, tile=args.tile, decode_threads=args.threads)),
        ("pil_scaled", lambda: tile_batches(
            paths, 32, tile=args.tile, decode_threads=args.threads,
            out_tile=args.out_tile)),
    ]
    if native_loader.available():
        modes.append(("native_full", lambda: native_loader.native_tile_batches(
            paths, 32, tile=args.tile, n_threads=args.threads)))
    if native_loader.supports_scaled():
        modes.append(("native_scaled", lambda: native_loader.native_tile_batches(
            paths, 32, tile=args.tile, n_threads=args.threads,
            out_tile=args.out_tile)))

    for name, make in modes:
        _drain(make())  # warm page cache + pools
        t0 = time.perf_counter()
        tiles, _ = _drain(make())
        dt = time.perf_counter() - t0
        _emit({
            "bench": "feed_decode", "mode": name, "threads": args.threads,
            "tile": args.tile, "out_tile": args.out_tile if "scaled" in name else args.tile,
            "tiles": tiles, "sec": round(dt, 3),
            "tiles_per_sec_core": round(tiles / dt / max(args.threads, 1), 1),
        })


if __name__ == "__main__":
    main()
