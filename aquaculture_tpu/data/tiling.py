"""Array-level tile slicing of large downloaded images.

Equivalent of the reference's gdal.Translate srcWin grid
(reference: src/load_data/tile_tifs.py:33-47): a LARGE_TIF_SIZE (6144 px)
image yields a 6x6 grid of 1024 px tiles named by pixel offset. Here the
slice is a single reshape-transpose over the in-memory array — zero copies
per tile beyond the final contiguity, and the whole grid can be shipped to
device as one (36, 1024, 1024, 3) batch.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from aquaculture_tpu.config import IM_WIDTH, LARGE_TIF_SIZE
from aquaculture_tpu.data.filenames import TileSpec


def tile_offsets(large: int = LARGE_TIF_SIZE, tile: int = IM_WIDTH) -> List[Tuple[int, int]]:
    """(x_offset, y_offset) grid in the reference's iteration order
    (x-major then y; tile_tifs.py:33-37 loops i in x, j in y)."""
    steps = large // tile
    return [(i * tile, j * tile) for i in range(steps) for j in range(steps)]


def split_image(
    img: np.ndarray, tile: int = IM_WIDTH, stride: int = 0
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Split a (H, W, C) image into a tile grid.

    stride == 0 (default) is the reference's non-overlapping grid
    (reshape-transpose, zero copies per tile): ragged edges are ignored
    (the reference's grid assumes exact divisibility: 6144 = 6*1024).

    stride < tile produces OVERLAPPING tiles (overlap serving: boundary
    objects fragmented by a hard grid appear whole in a neighboring
    overlapped tile; duplicates dedup downstream in meter space,
    post/dedup.nms_cross_tile). Offsets step by ``stride`` per axis with a
    final offset flush to the image edge, x-major order.

    Returns (tiles (N, tile, tile, C), offsets [(x, y), ...]).
    """
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    if stride and stride < tile:
        def starts(extent):
            if extent <= tile:
                return [0]
            ss = list(range(0, extent - tile, stride))
            ss.append(extent - tile)  # flush to the edge
            return ss

        offsets = [(x, y) for x in starts(w) for y in starts(h)]
        crops = []
        for x, y in offsets:
            crop = img[y : y + tile, x : x + tile]
            if crop.shape[0] < tile or crop.shape[1] < tile:
                # a raster dimension below tile (edge strip): zero-pad like
                # the batcher does, instead of crashing the stack/reshape
                pad = np.zeros((tile, tile) + img.shape[2:], img.dtype)
                pad[: crop.shape[0], : crop.shape[1]] = crop
                crop = pad
            crops.append(crop)
        tiles = np.stack(crops)
        return tiles.reshape(len(offsets), tile, tile, c), offsets
    ny, nx = h // tile, w // tile
    view = img[: ny * tile, : nx * tile].reshape(ny, tile, nx, tile, c)
    # -> (nx, ny, tile, tile, c) to match x-major offset order
    tiles = np.ascontiguousarray(view.transpose(2, 0, 1, 3, 4)).reshape(nx * ny, tile, tile, c)
    offsets = [(i * tile, j * tile) for i in range(nx) for j in range(ny)]
    return tiles, offsets


def tile_specs_for_image(
    year: int, bbox_ind: int, large: int = LARGE_TIF_SIZE, tile: int = IM_WIDTH
) -> List[TileSpec]:
    return [
        TileSpec(year=year, bbox_ind=bbox_ind, x_offset=x, y_offset=y)
        for x, y in tile_offsets(large, tile)
    ]
