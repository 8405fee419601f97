"""Clustering CLI: detections.geojson -> facilities.geojson.

Equivalent of the reference's predictions_cluster entry
(reference: src/cluster_facilities.py:181-208, wired by
src/Results/generate_facilities.py with the tuned operating point
conf=0.785, eps=50 m, min size=5; README.md:113).
"""

from __future__ import annotations

import argparse

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import (
    OPTIMAL_CONF_THRESHOLD,
    OPTIMAL_DISTANCE_THRESHOLD,
    OPTIMAL_MIN_CLUSTER_SIZE,
)
from aquaculture_tpu.geo import io as _geoio
from aquaculture_tpu.post.cluster import predictions_cluster
from aquaculture_tpu.utils.logging import log_info


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detections", required=True)
    ap.add_argument("--out", required=True, help="facilities.geojson output path")
    ap.add_argument("--conf", type=float, default=OPTIMAL_CONF_THRESHOLD)
    ap.add_argument("--distance", type=float, default=OPTIMAL_DISTANCE_THRESHOLD)
    ap.add_argument("--min-size", type=int, default=OPTIMAL_MIN_CLUSTER_SIZE)
    ap.add_argument("--cluster-variable", default="year")
    args = ap.parse_args(argv)

    det = gf.read_file(args.detections)
    if "index" not in det.columns:
        det["index"] = range(len(det))
    has_area = "area" in det.columns
    det = det.to_crs(3035)
    fac = predictions_cluster(
        det,
        cluster_variable=args.cluster_variable,
        conf_thresh=args.conf,
        distance_threshold=args.distance,
        min_cluster_size=args.min_size,
        include_area=has_area,
    )
    # Cast farm-geometry columns to WKT for GeoJSON storage
    # (reference cluster_facilities.py:160-165)
    for col in [c for c in fac.columns if c.endswith("_farm_geoms")]:
        fac[col] = [_geoio.to_wkt(g) for g in fac[col]]
    fac.to_file(args.out)
    log_info("wrote %d facilities -> %s", len(fac), args.out)


if __name__ == "__main__":
    main()
