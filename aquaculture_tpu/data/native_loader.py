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
        # decode-at-scale entry points (absent in a stale libaquatile.so —
        # callers fall back to full decode)
        if hasattr(lib, "aq_loader_create2"):
            lib.aq_loader_create2.restype = ctypes.c_void_p
            lib.aq_loader_create2.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
        if hasattr(lib, "aq_decode_image_scaled"):
            lib.aq_decode_image_scaled.restype = ctypes.c_int
            lib.aq_decode_image_scaled.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
        _lib = lib
        break
    return _lib


def supports_scaled() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "aq_loader_create2")


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


def decode_image_scaled(path: str, target: int, max_side: int = 8192) -> Optional[np.ndarray]:
    """Native decode with DCT-domain downscale: the JPEG decodes at the
    largest N/8 scale whose max side stays >= target (never upsamples;
    non-JPEG decodes full). None on failure or if the library is stale."""
    lib = load_library()
    if lib is None or not hasattr(lib, "aq_decode_image_scaled"):
        return None
    cap = max_side * max_side * 3
    buf = np.empty(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.aq_decode_image_scaled(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        ctypes.byref(w),
        ctypes.byref(h),
        target,
    )
    if rc == -2:  # output exceeds the cap; retry with the exact size
        cap = w.value * h.value * 3
        buf = np.empty(cap, np.uint8)
        rc = lib.aq_decode_image_scaled(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            ctypes.byref(w),
            ctypes.byref(h),
            target,
        )
    if rc != 0:
        return None
    return buf[: w.value * h.value * 3].reshape(h.value, w.value, 3).copy()


def _is_jpeg_content(path: str) -> bool:
    """True iff the file's magic bytes are JPEG (FF D8) — the routing test
    for scaled mode, since the C++ decoder dispatches on content and only
    the JPEG DCT box decode is a mAP-gated scaled operator."""
    try:
        with open(path, "rb") as f:
            return f.read(2) == b"\xff\xd8"
    except OSError:
        return False


def native_tile_batches(
    paths: Sequence[str],
    batch_size: int = 32,
    tile: int = IM_WIDTH,
    n_threads: int = 0,
    queue_depth: int = 64,
    out_tile: int = 0,
) -> Iterator[TileBatch]:
    """Threaded native decode -> fixed-shape TileBatches (same contract as
    aquaculture_tpu.data.loader.tile_batches).

    out_tile > 0 enables decode-at-scale: JPEG rasters decode at
    out_tile/tile scale in the DCT domain (libjpeg scale_num/denom), the
    grid slices in scaled space, and batches come out
    (B, out_tile, out_tile, 3) while TileSpec offsets stay in SOURCE
    pixels. Requires 8*out_tile % tile == 0 (e.g. 640 from 1024-px tiles
    = 5/8). Non-JPEG files in scaled mode route to the Python loader's
    PIL-resize twin: the only mAP-gated scaled pixel operators are the
    JPEG DCT box decode (`scaled_native`) and the PIL resize
    (`scaled_python`) — BENCHMARKS.md 'Decode-at-scale' — and the C++
    whole-image bilinear is neither, so it must not feed production
    batches (CLAUDE.md: any other resize operator needs its own gate)."""
    lib = load_library()
    assert lib is not None, "libaquatile.so not built (make -C native)"
    paths = list(paths)
    if out_tile:
        if not hasattr(lib, "aq_loader_create2"):
            raise RuntimeError(
                "libaquatile.so predates decode-at-scale; rebuild (make -C native)"
            )
        if out_tile >= tile or (8 * out_tile) % tile != 0:
            raise ValueError(
                f"out_tile must be a proper N/8 fraction of tile; got {out_tile}/{tile}"
            )
        # Route by CONTENT, not extension: the C++ decoder dispatches on
        # magic bytes, so a TIFF bearing a .jpg name would otherwise reach
        # its ungated whole-image bilinear path.
        # One classification pass (the sniff opens each file): a second
        # scan would both double the I/O on large corpora and open a
        # classify-then-reclassify window if a file changes between scans.
        is_jpeg = {p: _is_jpeg_content(p) for p in paths}
        others = [p for p in paths if not is_jpeg[p]]
        if others:
            from aquaculture_tpu.data.loader import tile_batches

            jpegs = [p for p in paths if is_jpeg[p]]
            if jpegs:
                yield from native_tile_batches(
                    jpegs, batch_size=batch_size, tile=tile,
                    n_threads=n_threads, queue_depth=queue_depth,
                    out_tile=out_tile,
                )
            yield from tile_batches(
                others, batch_size=batch_size, tile=tile, out_tile=out_tile
            )
            return
    base_specs = [decode_tile_name(p) for p in paths]

    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if out_tile:
        handle = lib.aq_loader_create2(
            arr, len(paths), tile, out_tile, n_threads, queue_depth
        )
    else:
        handle = lib.aq_loader_create(arr, len(paths), tile, n_threads, queue_depth)
    if not handle:  # nullptr = invalid args (already validated above)
        raise RuntimeError("aq_loader_create rejected its arguments")
    eff = out_tile or tile
    pidx = np.zeros(batch_size, np.int32)
    xoff = np.zeros(batch_size, np.int32)
    yoff = np.zeros(batch_size, np.int32)
    try:
        while True:
            # Fresh buffer per batch, handed to the consumer WITHOUT a copy:
            # re-filling one shared buffer and copying it out measured 2x
            # slower end-to-end (a 100 MB copy.copy() page-faults every
            # batch on small hosts); np.empty recycles the previous batch's
            # freed pages and the C pop memcpys straight into them.
            images = np.empty((batch_size, eff, eff, 3), np.uint8)
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
            images[n:] = 0  # np.empty tail is garbage; keep masked slots zero
            yield TileBatch(images, specs, valid)
    finally:
        lib.aq_loader_destroy(handle)
