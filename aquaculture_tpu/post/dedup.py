"""Overlapping-imagery deduplication via exact rectilinear region algebra.

The download boxes overlap (adjacent 1200 m boxes share borders across WMS
requests); the reference deduplicates by a greedy pass — each box keeps only
the part not covered by earlier boxes — then clips every detection to its
box's surviving region (reference: src/utils.py:241-322). GEOS overlay is
replaced by :mod:`aquaculture_tpu.geo.region`: boxes and their successive
differences are rectilinear, so the difference is exact and near-linear via
a bounds grid.
"""

from __future__ import annotations

from typing import Dict, Optional

from aquaculture_tpu import frame as gf
from aquaculture_tpu.geo.region import Region, from_geometry as _region_of, to_geometry as _region_to_geom


def deduplicate_download_boxes(bboxes: "gf.GeoFrame") -> "gf.GeoFrame":
    """Greedy coverage dedup: box i keeps (box_i \\ union of boxes < i).

    Matches reference utils.py:241-273 semantics; returns a GeoFrame in
    EPSG:3857 with a ``bbox_ind`` column, dropping fully-covered boxes.
    """
    bboxes = bboxes.to_crs(3857)
    inds = list(bboxes.index)
    geoms = list(bboxes["geometry"])
    kept_inds, kept_geoms = [], []
    coverage: Optional[Region] = None
    for ind, g in zip(inds, geoms):
        r = _region_of(g)
        if coverage is None:
            new = r
            coverage = r
        else:
            new = r.difference(coverage)
            if not new.is_empty:
                coverage = coverage.union(new)
        if ind == inds[0] or not new.is_empty:
            # reference keeps row 0 unconditionally (utils.py:256)
            kept_inds.append(ind)
            kept_geoms.append(_region_to_geom(new if ind != inds[0] else r))
    out = gf.GeoFrame({"bbox_ind": kept_inds}, geometry=kept_geoms, crs=3857)
    out.index = kept_inds
    return out


def deduplicate_gdf_with_bboxes(dedup_boxes: "gf.GeoFrame", gdf: "gf.GeoFrame") -> "gf.GeoFrame":
    """Clip each row's geometry to its download box's deduped region; drop
    rows whose geometry empties (reference utils.py:276-322)."""
    if "bbox_ind" not in gdf.columns:
        raise ValueError("gdf must include a bbox_ind column")
    src_crs = gdf.crs
    dedup_boxes = dedup_boxes.to_crs(3857)
    gdf = gdf.to_crs(3857)

    region_by_ind: Dict[int, Region] = {
        int(bi): _region_of(g)
        for bi, g in zip(dedup_boxes["bbox_ind"], dedup_boxes["geometry"])
    }

    keep_rows = []
    new_geoms = []
    for idx, (bi, g) in enumerate(zip(gdf["bbox_ind"], gdf["geometry"])):
        reg = region_by_ind.get(int(bi))
        if reg is None:
            continue
        clipped = _region_of(g).intersection(reg)
        if clipped.is_empty:
            continue
        keep_rows.append(idx)
        new_geoms.append(_region_to_geom(clipped))

    out = gdf.iloc[keep_rows].copy()
    out["geometry"] = new_geoms
    out.crs = 3857
    return out.to_crs(src_crs)
