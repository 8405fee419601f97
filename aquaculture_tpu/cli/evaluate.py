"""Evaluation CLI: stratified k-fold grid search + held-out test metrics.

Equivalent of the reference's get_kfold_cluster_performance.py __main__
(reference: src/get_kfold_cluster_performance.py:482-546) over local
GeoJSON/CSV artifacts.
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import (
    OPTIMAL_CONF_THRESHOLD,
    OPTIMAL_DISTANCE_THRESHOLD,
    OPTIMAL_MIN_CLUSTER_SIZE,
)
from aquaculture_tpu.eval.kfold import (
    GridConfig,
    kfold_cluster_performance,
    test_set_performance,
)
from aquaculture_tpu.utils.logging import log_info


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detections", required=True, help="detections GeoJSON")
    ap.add_argument("--labels", required=True, help="human labels GeoJSON")
    ap.add_argument("--images", required=True, help="image metadata CSV (image, bucket columns)")
    ap.add_argument("--out", required=True, help="CSV output path for fold results")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--test-conf", type=float, default=OPTIMAL_CONF_THRESHOLD)
    ap.add_argument("--test-distance", type=float, default=OPTIMAL_DISTANCE_THRESHOLD)
    ap.add_argument("--test-min-size", type=int, default=OPTIMAL_MIN_CLUSTER_SIZE)
    args = ap.parse_args(argv)

    dets = gf.read_file(args.detections)
    labels = gf.read_file(args.labels)
    images = pd.read_csv(args.images)
    strata = images["bucket"] if "bucket" in images.columns else np.zeros(len(images))

    grid = GridConfig(folds=args.folds, seed=args.seed)
    res = kfold_cluster_performance(images, dets, labels, strata, grid)
    res.to_csv(args.out, index=False)
    log_info("wrote %d fold results -> %s", len(res), args.out)

    test = test_set_performance(
        images, dets, labels, args.test_conf, args.test_distance, args.test_min_size
    )
    log_info("held-out performance at tuned operating point:\n%s", test.to_string())


if __name__ == "__main__":
    main()
