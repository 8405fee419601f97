"""Batched, prefetching tile loader feeding the detector.

Pipeline: image files -> decode (PIL, C fast path) -> tile grid split ->
fixed-size batches -> async device_put (optionally mesh-sharded). Host decode
overlaps device compute via a bounded background prefetch thread — the
TPU-native analogue of the reference's staged GDAL translate + separate
detect.py process (reference: src/load_data/tile_tifs.py, README.md:77).

Batches are fixed-shape: the final partial batch is padded and accompanied
by a validity mask so downstream XLA stages never see a ragged shape.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from aquaculture_tpu.config import IM_WIDTH
from aquaculture_tpu.data.filenames import TileSpec, decode_tile_name
from aquaculture_tpu.data.geotiff import read_image
from aquaculture_tpu.data.tiling import split_image


class TileBatch:
    """One fixed-shape batch: images + per-tile specs + validity mask."""

    __slots__ = ("images", "specs", "valid")

    def __init__(self, images: np.ndarray, specs: List[Optional[TileSpec]], valid: np.ndarray):
        self.images = images
        self.specs = specs
        self.valid = valid


def iter_tiles_from_files(
    paths: Sequence[str], tile: int = IM_WIDTH, decode_threads: int = 0,
    stride: int = 0, out_tile: int = 0,
) -> Iterator[Tuple[np.ndarray, TileSpec]]:
    """Yield (tile_array, spec) over whole pre-tiled images or large rasters.

    A 1024px file is one tile (its offsets come from its name); larger files
    are split into the offset grid with offsets ADDED to the name's base
    offsets (supports re-tiling 6144px downloads).

    decode_threads > 1 decodes ahead in an ordered thread pool — PIL's
    libjpeg decode releases the GIL, so this scales across host cores
    (measured 63 tiles/s/core for 1024px JPEGs on this box; a v5e chip at
    ~1850 tiles/s needs ~29 such cores, which is the per-chip core budget
    of a TPU-VM host). 0 = auto (cpu_count capped at 8), 1 = sequential.
    """
    if decode_threads == 0:
        decode_threads = min(os.cpu_count() or 1, 8)
    if decode_threads > 1 and len(paths) > 1:
        images = _window_map(read_image, paths, decode_threads)
    else:
        images = ((read_image(p), p) for p in paths)
    for arr, path in images:
        yield from _emit_tiles(arr, decode_tile_name(path), tile, stride, out_tile)


def _window_map(fn, items: Sequence, workers: int):
    """Ordered threaded map with a bounded in-flight window (2x workers):
    yields (fn(item), item) in input order, memory stays O(window).

    The in-flight window holds up to 2x workers results (for 6144px uint8
    rasters that is ~113 MB each) — pass workers=1 from a memory-constrained
    caller to get sequential behavior."""
    from concurrent.futures import ThreadPoolExecutor

    items = list(items)
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        window = max(1, 2 * workers)
        futures = {}
        next_submit = 0

        def top_up():
            nonlocal next_submit
            while next_submit < len(items) and len(futures) < window:
                futures[next_submit] = pool.submit(fn, items[next_submit])
                next_submit += 1

        top_up()
        for i, item in enumerate(items):
            res = futures.pop(i).result()
            top_up()
            yield res, item


def _emit_tiles(
    arr: np.ndarray, base: TileSpec, tile: int, stride: int, out_tile: int = 0
) -> Iterator[Tuple[np.ndarray, TileSpec]]:
    """Split one decoded raster into (tile, spec) pairs: a <=tile-px image is
    one tile (offsets from its name); larger rasters split into the offset
    grid with offsets ADDED to the name's base offsets. The single copy of
    this math keeps file- and store-corpus batches pixel-identical.

    out_tile > 0 (decode-at-scale fallback twin of the native loader): the
    raster downscales ONCE to out_tile/tile before slicing in scaled space;
    offsets stay in SOURCE pixels. Scaled dims use libjpeg's
    ceil(d*N/8) rounding so Python- and native-loader batches match shape.
    Incompatible with stride (overlap serving slices in source space)."""
    if out_tile:
        if stride and stride != tile:
            raise ValueError("decode-at-scale does not support overlap serving")
        if out_tile >= tile or (8 * out_tile) % tile != 0:
            # same contract the native loader enforces: anything else
            # silently decodes at the wrong scale and truncates the
            # source-pixel offset math below
            raise ValueError(
                f"out_tile must be a proper N/8 fraction of tile; got "
                f"{out_tile}/{tile}"
            )
        from PIL import Image

        n = 8 * out_tile // tile
        sh = (arr.shape[0] * n + 7) // 8
        sw = (arr.shape[1] * n + 7) // 8
        if (sh, sw) != arr.shape[:2]:
            arr = np.asarray(
                Image.fromarray(arr).resize((sw, sh), Image.BILINEAR)
            )
        if sh <= out_tile and sw <= out_tile:
            yield arr, base
            return
        tiles, offs = split_image(arr, out_tile, stride=0)
        for t, (dx, dy) in zip(tiles, offs):
            yield t, TileSpec(
                year=base.year,
                bbox_ind=base.bbox_ind,
                x_offset=base.x_offset + dx * tile // out_tile,
                y_offset=base.y_offset + dy * tile // out_tile,
                layer=base.layer,
            )
        return
    if arr.shape[0] <= tile and arr.shape[1] <= tile:
        yield arr, base
        return
    tiles, offs = split_image(arr, tile, stride=stride)
    for t, (dx, dy) in zip(tiles, offs):
        yield t, TileSpec(
            year=base.year,
            bbox_ind=base.bbox_ind,
            x_offset=base.x_offset + dx,
            y_offset=base.y_offset + dy,
            layer=base.layer,
        )


def batch_tiles(
    tiles: Iterable[Tuple[np.ndarray, TileSpec]],
    batch_size: int,
    tile: int = IM_WIDTH,
) -> Iterator[TileBatch]:
    """Group tiles into fixed (B, tile, tile, 3) uint8 batches, padding the
    tail batch with zeros + validity mask."""
    buf_imgs: List[np.ndarray] = []
    buf_specs: List[Optional[TileSpec]] = []

    def flush() -> TileBatch:
        n = len(buf_imgs)
        images = np.zeros((batch_size, tile, tile, 3), np.uint8)
        for i, im in enumerate(buf_imgs):
            h, w = im.shape[:2]
            images[i, :h, :w] = im[..., :3]
        valid = np.zeros((batch_size,), bool)
        valid[:n] = True
        specs = buf_specs + [None] * (batch_size - n)
        return TileBatch(images, specs, valid)

    for arr, spec in tiles:
        buf_imgs.append(arr)
        buf_specs.append(spec)
        if len(buf_imgs) == batch_size:
            yield flush()
            buf_imgs, buf_specs = [], []
    if buf_imgs:
        yield flush()


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread with a bounded queue (double
    buffering): host decode overlaps device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


def tile_batches(
    paths: Sequence[str],
    batch_size: int = 32,
    tile: int = IM_WIDTH,
    prefetch_depth: int = 2,
    stride: int = 0,
    decode_threads: int = 0,
    out_tile: int = 0,
) -> Iterator[TileBatch]:
    """paths -> prefetched fixed-shape TileBatches (the full input pipeline).
    stride < tile overlaps tiles of large rasters (overlap serving).
    decode_threads: 0 = auto (cores capped at 8), 1 = sequential decode
    (bounds host RAM to one raster at a time).
    out_tile > 0 = decode-at-scale: batches come out (B, out_tile, ...) with
    offsets in source pixels (see _emit_tiles / native_loader)."""
    it = batch_tiles(
        iter_tiles_from_files(
            paths, tile, decode_threads=decode_threads, stride=stride,
            out_tile=out_tile,
        ),
        batch_size, out_tile or tile,
    )
    return prefetch(it, prefetch_depth)


# ---------------------------------------------------------------------------
# Object-store streaming (the reference's corpus transport: GCS blobs,
# src/utils.py:192-238 listing + geocode_results.py:34-66 download)
# ---------------------------------------------------------------------------

def iter_tiles_from_store(
    store,
    keys: Sequence[str],
    tile: int = IM_WIDTH,
    fetch_threads: int = 4,
    stride: int = 0,
    out_tile: int = 0,
) -> Iterator[Tuple[np.ndarray, TileSpec]]:
    """Yield (tile_array, spec) streaming blob bytes from a BlobStore.

    A small thread pool keeps a bounded window of in-flight ``store.get``
    calls ahead of the decoder, so fetch latency (GCS round trips) overlaps
    decode + device compute. Tiling semantics are identical to
    iter_tiles_from_files — same decoder, same offset math — so a store
    corpus and a file corpus produce pixel-identical batches.
    """
    from aquaculture_tpu.data.geotiff import read_image_bytes

    keys = list(keys)
    if not keys:
        return
    for data, key in _window_map(store.get, keys, fetch_threads):
        arr = read_image_bytes(data)
        yield from _emit_tiles(arr, decode_tile_name(key), tile, stride, out_tile)


def tile_batches_from_store(
    store,
    keys: Sequence[str],
    batch_size: int = 32,
    tile: int = IM_WIDTH,
    prefetch_depth: int = 2,
    fetch_threads: int = 4,
    stride: int = 0,
    out_tile: int = 0,
) -> Iterator[TileBatch]:
    """(store, keys) -> prefetched fixed-shape TileBatches: the streaming
    twin of tile_batches."""
    it = batch_tiles(
        iter_tiles_from_store(
            store, keys, tile, fetch_threads, stride=stride, out_tile=out_tile
        ),
        batch_size, out_tile or tile,
    )
    return prefetch(it, prefetch_depth)
