"""Host postprocessing budget: detections/s through the geocode epilogue.

BENCHMARKS.md prices the TPU side (~1,850 tiles/s/chip m@640) and the host
decode feed (63 tiles/s/core), but not the OTHER host side: everything
downstream of the device — geocode, cross-tile NMS, download-box dedup,
areas, land filtering (reference: geocode_results.py + calc_net_areas.py).
This measures each stage standalone on a synthetic corpus shaped like the
real one (clustered coastal detections over overlapping 1200 m download
boxes, ~25% on-land) and prints rows/s per stage plus the corpus-level
budget: cores needed to keep up with one chip at a given detection density.

Run on CPU: python scripts/post_bench.py [n_det] [n_boxes]
Appends one JSON line per stage to BENCH_POST.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_POST.jsonl")


def build_world(n_det: int, n_boxes: int, seed: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.data.filenames import TileSpec
    from aquaculture_tpu.geo import polygon as P

    rng = np.random.default_rng(seed)
    # 1200 m download boxes along a synthetic 3857 coast strip, staggered so
    # neighbors overlap ~15% (the reference's real download grid overlaps).
    x0 = 450_000.0 + np.arange(n_boxes) * 1020.0  # 1200 m boxes, 180 m overlap
    y0 = 5_200_000.0 + 3000.0 * np.sin(np.arange(n_boxes) / 40.0)
    boxes = [P.box(x, y, x + 1200.0, y + 1200.0) for x, y in zip(x0, y0)]
    download = gf.GeoFrame({"bbox_ind": np.arange(n_boxes)}, geometry=boxes, crs=3857)
    download.index = list(range(n_boxes))

    # detections clustered in ~n_boxes/4 hot boxes (facilities cluster)
    hot = rng.choice(n_boxes, size=max(1, n_boxes // 4), replace=False)
    det_box = rng.choice(hot, size=n_det)
    offs = rng.integers(0, 6, size=(n_det, 2)) * 1024
    specs = [
        TileSpec(year=2020, bbox_ind=int(b), x_offset=int(ox), y_offset=int(oy))
        for b, (ox, oy) in zip(det_box, offs)
    ]
    wh = rng.integers(14, 70, size=(n_det, 2))
    xy = rng.integers(0, 954, size=(n_det, 2))
    boxes_px = np.concatenate([xy, xy + wh], axis=1).astype(np.int64)
    conf = rng.uniform(0.3, 1.0, size=n_det)
    cls = rng.integers(0, 2, size=n_det)

    # a jagged land polygon covering the lower band of the strip (~25% hits)
    xs = np.linspace(440_000.0, 450_000.0 + n_boxes * 1020.0 + 10_000.0, 400)
    ys = 5_200_000.0 + 3000.0 * np.sin(xs / (40.0 * 1020.0) * 1.0) + rng.uniform(-150, 450, size=xs.size)
    ring = [(float(x), float(y)) for x, y in zip(xs, ys)]
    ring += [(xs[-1], 5_150_000.0), (xs[0], 5_150_000.0)]
    land = gf.GeoFrame({"id": [0]}, geometry=[P.Polygon(ring)], crs=3857)
    return download, specs, boxes_px, conf, cls, land


def main() -> None:
    n_det = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_boxes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    download, specs, boxes_px, conf, cls, land = build_world(n_det, n_boxes)

    from aquaculture_tpu.post.areas import cage_areas
    from aquaculture_tpu.post.dedup import (
        deduplicate_download_boxes,
        deduplicate_gdf_with_bboxes,
        nms_cross_tile,
    )
    from aquaculture_tpu.post.geocode import geocode_detections, remove_land_detections
    from aquaculture_tpu.post.landmask import (
        build_land_mask, remove_land_detections_hybrid,
        remove_land_detections_masked)

    rows = []

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        n = len(out) if hasattr(out, "__len__") else n_det
        rec = {
            "stage": name,
            "seconds": round(dt, 3),
            "rows_in": n_det,
            "rows_out": int(n),
            "det_per_s": round(n_det / dt, 1),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        return out

    det = stage("geocode", lambda: geocode_detections(boxes_px, conf, cls, specs, download))
    det["bbox_ind"] = [s.bbox_ind for s in specs]
    stage("nms_cross_tile", lambda: nms_cross_tile(det, iou_thresh=0.5))
    t0 = time.perf_counter()
    dd = deduplicate_download_boxes(download)
    dd_s = time.perf_counter() - t0
    rows.append({"stage": "dedup_download_boxes", "seconds": round(dd_s, 3),
                 "rows_in": n_boxes, "rows_out": len(dd),
                 "det_per_s": round(n_boxes / dd_s, 1)})
    print(json.dumps(rows[-1]), flush=True)
    det2 = stage("dedup_vs_boxes", lambda: deduplicate_gdf_with_bboxes(dd, det))
    det2 = det2.drop(columns=["bbox_ind"])
    det3 = stage("cage_areas", lambda: cage_areas(det2))
    stage("land_sjoin", lambda: remove_land_detections(det3, land))
    t0 = time.perf_counter()
    # derive resolution from the actual land bounds with a ~50M-cell
    # budget (the old n_boxes formula under-estimated the span for small
    # n_boxes and crashed the mask build)
    lb = land.bounds_array()
    span_x = float(lb[:, 2].max() - lb[:, 0].min())
    span_y = float(lb[:, 3].max() - lb[:, 1].min())
    res_m = max(10.0, (span_x * span_y / 50_000_000.0) ** 0.5)
    mask = build_land_mask(land, resolution_m=res_m)
    mask_s = time.perf_counter() - t0
    rows.append({"stage": "land_mask_build", "seconds": round(mask_s, 3),
                 "rows_in": 1, "rows_out": 1, "det_per_s": None})
    print(json.dumps(rows[-1]), flush=True)
    stage("land_masked", lambda: remove_land_detections_masked(det3, mask))
    t0 = time.perf_counter()
    # The hybrid requires the mask in the DETECTIONS' CRS (4326 after
    # geocoding) — a 3857 mask here would be silently discarded and
    # rebuilt inside the timed classify stage, mismeasuring it.
    land_t = land.to_crs(det3.crs)
    land_t.crs = det3.crs
    lb_t = land_t.bounds_array()
    span_xt = float(lb_t[:, 2].max() - lb_t[:, 0].min())
    span_yt = float(lb_t[:, 3].max() - lb_t[:, 1].min())
    unit_per_m = (1.0 / 111_320.0) if det3.crs == 4326 else 1.0
    res_t = max(10.0 * unit_per_m, (span_xt * span_yt / 50_000_000.0) ** 0.5)
    hmask = build_land_mask(land_t, resolution_m=res_t, crs=det3.crs,
                            with_boundary=True)
    hmask_s = time.perf_counter() - t0
    rows.append({"stage": "land_hybrid_mask_build", "seconds": round(hmask_s, 3),
                 "rows_in": 1, "rows_out": 1, "det_per_s": None})
    print(json.dumps(rows[-1]), flush=True)
    hyb = stage("land_hybrid",
                lambda: remove_land_detections_hybrid(det3, land, mask=hmask))
    exact = remove_land_detections(det3, land)
    assert hyb["det_conf"].tolist() == exact["det_conf"].tolist(), \
        "hybrid land filter diverged from the exact sjoin"

    total = sum(r["seconds"] for r in rows if r["stage"] not in
                ("land_masked", "land_mask_build", "land_hybrid",
                 "land_hybrid_mask_build", "dedup_download_boxes"))
    summary = {
        "stage": "TOTAL_sjoin_path",
        "seconds": round(total, 3),
        "rows_in": n_det,
        "det_per_s": round(n_det / total, 1),
        "n_boxes": n_boxes,
        "note": "geocode+xtile_nms+dedup+areas+land_sjoin; box dedup is a "
                "once-per-corpus cost, excluded",
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)
    with open(RESULTS, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
