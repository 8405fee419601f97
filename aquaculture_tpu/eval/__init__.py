"""Evaluation: TP matching, stratification buckets, k-fold grid search.

Port of the reference's statistical validation harness
(reference: src/get_kfold_cluster_performance.py): stratified 5-fold CV
with a (confidence x DBSCAN-eps x min-cluster-size) grid per fold, plus the
held-out test evaluation at the tuned operating point.
"""

from aquaculture_tpu.eval.metrics import get_stats_total, get_tp  # noqa: F401
from aquaculture_tpu.eval.kfold import (  # noqa: F401
    GridConfig,
    get_fold_performance,
    kfold_cluster_performance,
    test_set_performance,
)
