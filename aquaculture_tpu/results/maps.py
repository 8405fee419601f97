"""Facility maps: known (Trujillo) vs newly-detected facilities per period.

Port of FacilitiesMaps.py + plot_utils.py (reference:
src/Results/FacilitiesMaps.py, src/plot_utils.py): classify each predicted
facility as known (within 1 km of a Trujillo location) or additional,
count unique locations via spatial dedup, render per-period matplotlib maps
(Basemap/folium replaced: matplotlib scatter + an optional self-contained
HTML map with no external tile dependency).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pandas as pd

from aquaculture_tpu import frame as gf
from aquaculture_tpu.geo import polygon as _poly


def trujillo_1km_boxes(trujillo: "gf.GeoFrame", half_size_m: float = 500.0) -> "gf.GeoFrame":
    """1 km boxes around Trujillo points (EPSG:3857 meters),
    reference FacilitiesMaps.define_Trujillo_locations."""
    t = trujillo.to_crs(3857)
    boxes = [
        _poly.box(p.x - half_size_m, p.y - half_size_m, p.x + half_size_m, p.y + half_size_m)
        for p in t["geometry"]
    ]
    out = t.copy()
    out["geometry"] = boxes
    out.crs = 3857
    return out


def classify_facilities(
    facilities: "gf.GeoFrame", trujillo_boxes: "gf.GeoFrame"
) -> "gf.GeoFrame":
    """Tag each facility 'known' (intersects a Trujillo 1 km box) or
    'additional' (reference classify_our_facilities)."""
    fac = facilities.to_crs(3857)
    fac.crs = 3857
    joined = fac.sjoin(trujillo_boxes.to_crs(3857), how="inner", predicate="intersects")
    known = set(joined.index)
    fac["status"] = ["known" if i in known else "additional" for i in fac.index]
    return fac


def unique_locations(facilities: "gf.GeoFrame", radius_m: float = 0.0) -> int:
    """Count spatially-unique facility locations across periods.

    Reference-exact semantics (count_unique_locations,
    FacilitiesMaps.py:97-114): facilities whose BOUNDS boxes intersect
    collapse, greedily in ascending row order — a facility is unique unless
    an earlier unique facility's box group already claimed it.

    radius_m optionally pads each bounds box (the reference operates on
    cage-extent boxes; pass a radius when the geometries are bare centroid
    points with no extent)."""
    f = facilities.to_crs(3857)
    n = len(f)
    if n == 0:
        return 0
    boxes = []
    for g in f["geometry"]:
        x0, y0, x1, y1 = g.bounds
        boxes.append(_poly.box(x0 - radius_m, y0 - radius_m, x1 + radius_m, y1 + radius_m))
    bf = gf.GeoFrame({"fid": np.arange(n)}, geometry=boxes, crs=3857)
    joined = bf.sjoin(bf, how="inner", predicate="intersects")
    groups = joined.groupby("fid_left")["fid_right"].apply(lambda x: sorted(set(x)))
    unique = 0
    nonunique: set = set()
    for left in groups.index:  # ascending, like the reference's groupby walk
        if left in nonunique:
            continue
        unique += 1
        nonunique.update(groups.loc[left])
    return unique


def plot_facility_map(
    facilities: "gf.GeoFrame",
    trujillo: Optional["gf.GeoFrame"] = None,
    period: Optional[str] = None,
    out_path: Optional[str] = None,
):
    """Per-period facility scatter in lon/lat (Figure-4 style)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fac = facilities
    if period is not None and "pass" in fac.columns:
        fac = fac[fac["pass"] == period]
        fac.crs = facilities.crs
    ll = fac.to_crs(4326)
    xs = [g.centroid.x for g in ll["geometry"]]
    ys = [g.centroid.y for g in ll["geometry"]]
    status = ll["status"] if "status" in ll.columns else pd.Series(["additional"] * len(ll))

    fig, ax = plt.subplots(figsize=(6, 4))
    for s, color, marker in (("known", "steelblue", "o"), ("additional", "darkred", "^")):
        sel = status.to_numpy() == s
        ax.scatter(
            np.asarray(xs)[sel], np.asarray(ys)[sel], c=color, marker=marker,
            s=18, alpha=0.7, label=s.capitalize(), edgecolors="none",
        )
    if trujillo is not None:
        tll = trujillo.to_crs(4326)
        ax.scatter(
            [g.centroid.x for g in tll["geometry"]],
            [g.centroid.y for g in tll["geometry"]],
            facecolors="none", edgecolors="gray", s=40, label="Trujillo et al.",
        )
    ax.set_xlabel("Longitude")
    ax.set_ylabel("Latitude")
    if period:
        ax.set_title(period, fontsize=10)
    ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=300, bbox_inches="tight")
    return fig


def facility_map_html(facilities: "gf.GeoFrame", out_path: str, group_col: str = "pass") -> None:
    """Self-contained interactive HTML map (folium replacement,
    reference plot_utils.plot_facility_map): an inline-SVG scatter with
    per-group toggles, no network tiles."""
    ll = facilities.to_crs(4326)
    pts = [(g.centroid.x, g.centroid.y) for g in ll["geometry"]]
    groups = ll[group_col].astype(str).tolist() if group_col in ll.columns else ["all"] * len(ll)
    data = [{"lon": x, "lat": y, "group": g} for (x, y), g in zip(pts, groups)]
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<style>body{{font-family:sans-serif}} .pt{{opacity:.7}}</style></head><body>
<div id="controls"></div><svg id="map" width="900" height="600" style="border:1px solid #ccc"></svg>
<script>
const data = {json.dumps(data)};
const lons = data.map(d=>d.lon), lats = data.map(d=>d.lat);
const pad = 0.05;
const minLon=Math.min(...lons)-pad, maxLon=Math.max(...lons)+pad;
const minLat=Math.min(...lats)-pad, maxLat=Math.max(...lats)+pad;
const svg=document.getElementById('map');
const W=900,H=600;
const groups=[...new Set(data.map(d=>d.group))].sort();
const colors=['#b22222','#4682b4','#2e8b57','#daa520','#6a5acd','#708090'];
const controls=document.getElementById('controls');
groups.forEach((g,i)=>{{
  const id='g'+i;
  controls.insertAdjacentHTML('beforeend',
    `<label style="margin-right:1em"><input type="checkbox" id="${{id}}" checked> <span style="color:${{colors[i%6]}}">&#9679;</span> ${{g}}</label>`);
  data.filter(d=>d.group===g).forEach(d=>{{
    const x=(d.lon-minLon)/(maxLon-minLon)*W;
    const y=H-(d.lat-minLat)/(maxLat-minLat)*H;
    svg.insertAdjacentHTML('beforeend',
      `<circle class="pt ${{id}}" cx="${{x}}" cy="${{y}}" r="3.5" fill="${{colors[i%6]}}"><title>${{g}} (${{d.lat.toFixed(4)}}, ${{d.lon.toFixed(4)}})</title></circle>`);
  }});
  document.getElementById(id).addEventListener('change',e=>{{
    document.querySelectorAll('.'+id).forEach(c=>c.style.display=e.target.checked?'':'none');
  }});
}});
</script></body></html>"""
    with open(out_path, "w") as f:
        f.write(html)
