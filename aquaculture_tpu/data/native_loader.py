"""ctypes bindings for the native (C++) tile loader.

libaquatile.so (built by ``make -C native``) runs threaded JPEG/TIFF decode
and tile slicing off the GIL — the host-side hot path feeding the TPU. The
Python fallback (aquaculture_tpu.data.loader) has identical semantics; the
pipeline picks the native path automatically when the library is present.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from aquaculture_tpu.config import IM_WIDTH
from aquaculture_tpu.data.filenames import TileSpec, decode_tile_name
from aquaculture_tpu.data.loader import TileBatch

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libaquatile.so"),
    "libaquatile.so",
)
_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
        except OSError:
            continue
        lib.aq_decode_image.restype = ctypes.c_int
        lib.aq_decode_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.aq_loader_create.restype = ctypes.c_void_p
        lib.aq_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.aq_loader_next.restype = ctypes.c_int
        lib.aq_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.aq_loader_destroy.restype = None
        lib.aq_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        break
    return _lib


def available() -> bool:
    return load_library() is not None


def decode_image(path: str, max_side: int = 8192) -> Optional[np.ndarray]:
    """Native JPEG/TIFF decode -> (H, W, 3) uint8, None on failure."""
    lib = load_library()
    if lib is None:
        return None
    cap = max_side * max_side * 3
    buf = np.empty(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.aq_decode_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc == -2:  # retry with the exact size
        cap = w.value * h.value * 3
        buf = np.empty(cap, np.uint8)
        rc = lib.aq_decode_image(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            ctypes.byref(w),
            ctypes.byref(h),
        )
    if rc != 0:
        return None
    return buf[: w.value * h.value * 3].reshape(h.value, w.value, 3).copy()


def native_tile_batches(
    paths: Sequence[str],
    batch_size: int = 32,
    tile: int = IM_WIDTH,
    n_threads: int = 0,
    queue_depth: int = 64,
) -> Iterator[TileBatch]:
    """Threaded native decode -> fixed-shape TileBatches (same contract as
    aquaculture_tpu.data.loader.tile_batches)."""
    lib = load_library()
    assert lib is not None, "libaquatile.so not built (make -C native)"
    paths = list(paths)
    base_specs = [decode_tile_name(p) for p in paths]

    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    handle = lib.aq_loader_create(arr, len(paths), tile, n_threads, queue_depth)
    images = np.zeros((batch_size, tile, tile, 3), np.uint8)
    pidx = np.zeros(batch_size, np.int32)
    xoff = np.zeros(batch_size, np.int32)
    yoff = np.zeros(batch_size, np.int32)
    try:
        while True:
            n = lib.aq_loader_next(
                handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                batch_size,
                pidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                xoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                yoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
            if n <= 0:
                break
            valid = np.zeros(batch_size, bool)
            valid[:n] = True
            specs: List[Optional[TileSpec]] = [None] * batch_size
            for i in range(n):
                b = base_specs[pidx[i]]
                specs[i] = TileSpec(
                    year=b.year,
                    bbox_ind=b.bbox_ind,
                    x_offset=b.x_offset + int(xoff[i]),
                    y_offset=b.y_offset + int(yoff[i]),
                    layer=b.layer,
                )
            out = images.copy()
            out[n:] = 0
            yield TileBatch(out, specs, valid)
    finally:
        lib.aq_loader_destroy(handle)
