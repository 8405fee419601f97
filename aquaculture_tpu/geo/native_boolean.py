"""ctypes bindings for the native (C++) boolean-overlay sweep.

libaquatile.so (``make -C native``) carries a C++ port of the lattice-snapped
Martinez-Rueda sweep in :mod:`aquaculture_tpu.geo.boolean` — the
GEOS-equivalent native component (the reference's overlay/unary_union all run
inside GEOS, a C++ library; reference src/utils.py:241-273,
src/load_data/create_land_filter.py:129-137, src/utils_tonnage.py:617,1165).
The Python sweep stays as the reference implementation and automatic
fallback; both operate on the same integer-lattice inputs, so they produce
identical contours (differential-tested in tests/test_boolean.py).

Set ``AQUAGEO_NO_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libaquatile.so"),
    "libaquatile.so",
)
_lib: Optional[ctypes.CDLL] = None
_lib_checked = False

_c_double_p = ctypes.POINTER(ctypes.c_double)
_c_int32_p = ctypes.POINTER(ctypes.c_int32)


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if os.environ.get("AQUAGEO_NO_NATIVE"):
        return None
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
        except OSError:
            continue
        try:
            lib.aq_bool_op.restype = ctypes.c_void_p
            lib.aq_bool_op.argtypes = [
                _c_double_p, _c_int32_p, ctypes.c_int32,
                _c_double_p, _c_int32_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ]
            lib.aq_bool_ncontours.restype = ctypes.c_int32
            lib.aq_bool_ncontours.argtypes = [ctypes.c_void_p]
            lib.aq_bool_contour.restype = ctypes.c_int32
            lib.aq_bool_contour.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, _c_int32_p, _c_int32_p,
            ]
            lib.aq_bool_points.restype = ctypes.c_int32
            lib.aq_bool_points.argtypes = [ctypes.c_void_p, ctypes.c_int32, _c_double_p]
            lib.aq_bool_free.restype = None
            lib.aq_bool_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue  # stale .so without the boolean entry points
        _lib = lib
        return _lib
    return None


def _pack_rings(rings: Sequence[np.ndarray]):
    sizes = np.array([len(r) for r in rings], np.int32)
    if len(rings):
        xy = np.ascontiguousarray(np.concatenate([np.asarray(r, np.float64) for r in rings]))
    else:
        xy = np.zeros((0, 2), np.float64)
    return xy, sizes


def sweep_native(
    subject_rings: Sequence[np.ndarray],
    clipping_rings: Sequence[np.ndarray],
    operation: int,
    s_maxx: float,
    minmaxx: float,
) -> Optional[List[Tuple[np.ndarray, int]]]:
    """Run the native sweep on lattice-snapped rings.

    Returns a list of (points (N,2) float64, hole_of) per output contour in
    creation order (hole_of = parent contour index, -1 for shells), or None
    when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    sxy, ssz = _pack_rings(subject_rings)
    cxy, csz = _pack_rings(clipping_rings)
    handle = lib.aq_bool_op(
        sxy.ctypes.data_as(_c_double_p), ssz.ctypes.data_as(_c_int32_p), len(ssz),
        cxy.ctypes.data_as(_c_double_p), csz.ctypes.data_as(_c_int32_p), len(csz),
        operation, float(s_maxx), float(minmaxx),
    )
    try:
        out: List[Tuple[np.ndarray, int]] = []
        npts = ctypes.c_int32()
        hole_of = ctypes.c_int32()
        for i in range(lib.aq_bool_ncontours(handle)):
            lib.aq_bool_contour(handle, i, ctypes.byref(npts), ctypes.byref(hole_of))
            pts = np.empty((npts.value, 2), np.float64)
            if npts.value:
                lib.aq_bool_points(handle, i, pts.ctypes.data_as(_c_double_p))
            out.append((pts, int(hole_of.value)))
        return out
    finally:
        lib.aq_bool_free(handle)
