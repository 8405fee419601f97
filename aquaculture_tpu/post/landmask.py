"""Rasterized land mask: O(1) per-detection land lookup.

The exact polygon sjoin (post.geocode.remove_land_detections) is fine for
thousands of detections; corpus-scale filtering wants the SURVEY §2.3
design — rasterize the land polygons ONCE into a boolean grid, then land
classification is a vectorized (optionally on-device) gather per detection
centroid. Coastline detail below the cell size is lost; pick resolution
accordingly (the reference's own land filter is a coarse political
coastline).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from aquaculture_tpu import frame as gf
from aquaculture_tpu.geo.rasterize import rasterize_geometry


@dataclasses.dataclass
class LandMask:
    mask: np.ndarray  # (H, W) bool, row 0 = north
    bounds: tuple     # (minx, miny, maxx, maxy) in `crs`
    crs: int

    def contains(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized point-on-land lookup (points outside bounds: False)."""
        minx, miny, maxx, maxy = self.bounds
        h, w = self.mask.shape
        fx = (np.asarray(x, np.float64) - minx) / (maxx - minx)
        fy = (maxy - np.asarray(y, np.float64)) / (maxy - miny)
        col = np.floor(fx * w).astype(np.int64)
        row = np.floor(fy * h).astype(np.int64)
        inside = (col >= 0) & (col < w) & (row >= 0) & (row < h)
        out = np.zeros(len(np.atleast_1d(col)), bool)
        cc = np.clip(col, 0, w - 1)
        rr = np.clip(row, 0, h - 1)
        out = np.where(inside, self.mask[rr, cc], False)
        return out


def build_land_mask(
    land: "gf.GeoFrame",
    resolution_m: float = 50.0,
    crs: int = 3857,
    bounds: Optional[tuple] = None,
    max_cells: int = 64_000_000,
) -> LandMask:
    """Rasterize land polygons to a boolean grid at ~resolution_m."""
    land_p = land.to_crs(crs)
    land_p.crs = crs
    if bounds is None:
        b = land_p.bounds_array()
        bounds = (
            float(np.nanmin(b[:, 0])),
            float(np.nanmin(b[:, 1])),
            float(np.nanmax(b[:, 2])),
            float(np.nanmax(b[:, 3])),
        )
    minx, miny, maxx, maxy = bounds
    w = max(int(np.ceil((maxx - minx) / resolution_m)), 1)
    h = max(int(np.ceil((maxy - miny) / resolution_m)), 1)
    if w * h > max_cells:
        raise ValueError(f"land mask {w}x{h} exceeds max_cells; raise resolution_m")
    mask = np.zeros((h, w), bool)
    for g in land_p["geometry"]:
        if g is None or g.is_empty:
            continue
        mask |= rasterize_geometry(g, bounds, w, h)
    return LandMask(mask=mask, bounds=bounds, crs=crs)


def remove_land_detections_masked(detections: "gf.GeoFrame", mask: LandMask) -> "gf.GeoFrame":
    """Mask-based equivalent of remove_land_detections: drop detections
    whose centroid falls on a land cell."""
    dets = detections.to_crs(mask.crs)
    cx = np.asarray([g.centroid.x for g in dets["geometry"]])
    cy = np.asarray([g.centroid.y for g in dets["geometry"]])
    on_land = mask.contains(cx, cy) if len(dets) else np.zeros(0, bool)
    out = detections[~on_land].copy()
    out.crs = detections.crs
    return out
