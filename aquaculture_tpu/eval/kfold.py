"""Stratified k-fold hyperparameter search over (conf, eps, min-size).

Port of the reference's CV harness (reference:
src/get_kfold_cluster_performance.py:284-546 and the flag-file grid
src/get_kfold_cluster_performance_cfg.py: 82 conf x 8 distance x 10 size,
5 folds, seed 1). Re-engineered for throughput: per year-group pairwise
distances are computed ONCE and every grid combination reuses them with a
confidence mask — the reference re-runs sklearn DBSCAN from scratch for all
6,560 combinations per fold. The process pool disappears; the whole grid is
a dense vectorized sweep.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import CRS_AREA, CRS_MAPPING
from aquaculture_tpu.eval.metrics import get_stats_total
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.post.cluster import dbscan, dbscan_from_adjacency, predictions_cluster


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """The reference's grid (get_kfold_cluster_performance_cfg.py:4-31)."""

    confidence_thresholds: Tuple[float, ...] = tuple(np.arange(0.6, 1.01, 0.005).round(3))
    distance_thresholds: Tuple[float, ...] = tuple(np.arange(10.0, 160.0, 20.0))
    minimum_cluster_sizes: Tuple[int, ...] = tuple(range(1, 11))
    folds: int = 5
    seed: int = 1


def _masked_cluster_members(
    d2_by_year: Dict, conf_by_year: Dict, eps: float, min_size: int, conf_thresh: float
) -> Dict:
    """For each year group: bool member mask of points that survive the
    confidence filter AND belong to a DBSCAN cluster (not noise)."""
    out = {}
    for year, d2 in d2_by_year.items():
        conf = conf_by_year[year]
        keep = conf >= conf_thresh
        idx = np.nonzero(keep)[0]
        members = np.zeros(len(conf), bool)
        if len(idx):
            sub = d2[np.ix_(idx, idx)]
            adj = sub <= eps * eps
            core = adj.sum(axis=1) >= min_size
            labels = dbscan_from_adjacency(adj, core)
            members[idx[labels >= 0]] = True
        out[year] = members
    return out


def clustered_detections(
    preds: "gf.GeoFrame",
    conf_thresh: float,
    distance_threshold: float,
    min_cluster_size: int,
) -> "gf.GeoFrame":
    """Detections belonging to any facility at the given operating point
    (the reference's predictions_cluster(return_detections=True))."""
    preds3035 = preds.to_crs(CRS_AREA)
    centers = np.asarray([[g.centroid.x, g.centroid.y] for g in preds3035["geometry"]]).reshape(-1, 2)
    years = preds["year"].to_numpy()
    conf = preds["det_conf"].to_numpy(np.float64)
    member = np.zeros(len(preds), bool)
    for y in pd.unique(years):
        rows = np.nonzero(years == y)[0]
        keep = conf[rows] >= conf_thresh
        sel = rows[keep]
        if len(sel) == 0:
            continue
        labels = dbscan(centers[sel], distance_threshold, min_cluster_size)
        member[sel[labels >= 0]] = True
    out = preds[member].copy()
    out.crs = preds.crs
    return out


def _match_matrix(labels: "gf.GeoFrame", preds: "gf.GeoFrame") -> np.ndarray:
    """(n_labels, n_preds) bool: label i and pred j intersect with the same
    year and type — the TP relation, computed ONCE for the whole grid."""
    m = np.zeros((len(labels), len(preds)), bool)
    if len(labels) == 0 or len(preds) == 0:
        return m
    lab = labels.copy()
    lab.crs = labels.crs
    lab["__lab_pos"] = range(len(labels))
    pr = preds.copy()
    pr.crs = preds.crs
    pr["__pred_pos"] = range(len(preds))
    joined = lab.sjoin(pr, how="inner", predicate="intersects", lsuffix="query", rsuffix="key")
    ok = (joined["year_query"] == joined["year_key"]) & (
        joined["type_query"] == joined["type_key"]
    )
    li = joined.loc[ok, "__lab_pos"].to_numpy(np.int64)
    pi = joined.loc[ok, "__pred_pos"].to_numpy(np.int64)
    m[li, pi] = True
    return m


def grid_search(
    preds: "gf.GeoFrame",
    labels: "gf.GeoFrame",
    grid: GridConfig = GridConfig(),
) -> pd.DataFrame:
    """Sweep the full grid; returns a frame with precision/recall/product/f
    per combination.

    Two shared precomputations make the 6,560-combo sweep cheap where the
    reference re-ran sklearn DBSCAN + a geopandas sjoin per combo:
    * pairwise distances once per year group (clustering reuses them)
    * the label<->pred TP match matrix once (precision = mean of the
      per-pred TP flags over the member set; recall = mean over labels of
      'any matching pred in the member set') — per combo it's pure masking.
    """
    preds3035 = preds.to_crs(CRS_AREA)
    centers = np.asarray([[g.centroid.x, g.centroid.y] for g in preds3035["geometry"]]).reshape(-1, 2)
    years = preds["year"].to_numpy()
    conf = preds["det_conf"].to_numpy(np.float64)

    d2_by_year, conf_by_year, rows_by_year = {}, {}, {}
    for y in pd.unique(years):
        rows = np.nonzero(years == y)[0]
        c = centers[rows]
        d2_by_year[y] = np.sum((c[:, None] - c[None, :]) ** 2, axis=-1)
        conf_by_year[y] = conf[rows]
        rows_by_year[y] = rows

    match = _match_matrix(labels.to_crs(preds.crs), preds)  # (L, P)
    tp_pred = match.any(axis=0)                             # (P,) pred is TP
    n_labels = len(labels)

    records = []
    for eps in grid.distance_thresholds:
        for ms in grid.minimum_cluster_sizes:
            for ct in grid.confidence_thresholds:
                member = np.zeros(len(preds), bool)
                mm = _masked_cluster_members(d2_by_year, conf_by_year, eps, ms, ct)
                for y, m in mm.items():
                    member[rows_by_year[y][m]] = True
                n = int(member.sum())
                precision = float(tp_pred[member].mean()) if n else np.nan
                recall = (
                    float((match[:, member].any(axis=1)).mean()) if n_labels else np.nan
                )
                records.append(
                    {
                        "precision": precision,
                        "recall": recall,
                        "conf_thresh": ct,
                        "distance_threshold": eps,
                        "min_cluster_size": ms,
                    }
                )
    df = pd.DataFrame.from_records(records)
    df["product"] = df["precision"] * df["recall"]
    df["f_score"] = 2 * df["product"] / (df["precision"] + df["recall"])
    return df


def stratified_kfold_indices(
    strata: Sequence, n_folds: int, seed: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic stratified k-fold (train_idx, test_idx) pairs: within
    each stratum, shuffled samples deal round-robin into folds."""
    rng = np.random.default_rng(seed)
    strata = np.asarray(strata)
    fold_of = np.zeros(len(strata), np.int64)
    for s in pd.unique(strata):
        rows = np.nonzero(strata == s)[0]
        rows = rng.permutation(rows)
        fold_of[rows] = np.arange(len(rows)) % n_folds
    out = []
    for f in range(n_folds):
        test = np.nonzero(fold_of == f)[0]
        train = np.nonzero(fold_of != f)[0]
        out.append((train, test))
    return out


def get_fold_performance(
    fold_index: Tuple[np.ndarray, np.ndarray],
    images: pd.DataFrame,
    predictions: "gf.GeoFrame",
    labels: "gf.GeoFrame",
    grid: GridConfig = GridConfig(),
) -> List[dict]:
    """Train-split grid search + test-split evaluation of the best combo
    under both decision metrics (reference :284-413)."""
    train_images = images.iloc[fold_index[0]]
    test_images = images.iloc[fold_index[1]]

    def subset(frame, ims):
        out = frame[frame["image"].isin(ims["image"])].copy()
        out.crs = frame.crs
        return out

    train_preds, test_preds = subset(predictions, train_images), subset(predictions, test_images)
    train_labels, test_labels = subset(labels, train_images), subset(labels, test_images)

    results = grid_search(train_preds, train_labels, grid)

    out = []
    for metric in ("product", "f_score"):
        if results[metric].notna().any():
            best = results.loc[results[metric].idxmax()]
        else:  # train split has no detections/labels: any combo is as good
            best = results.iloc[0]
        chosen = clustered_detections(
            test_preds,
            conf_thresh=float(best["conf_thresh"]),
            distance_threshold=float(best["distance_threshold"]),
            min_cluster_size=int(best["min_cluster_size"]),
        )
        stats = get_stats_total(labels=test_labels, preds=chosen)
        rec = {f"test_{k}": v for k, v in stats.items()}
        rec.update(
            {
                "train_best_conf_thresh": float(best["conf_thresh"]),
                "train_best_distance_threshold": float(best["distance_threshold"]),
                "train_best_min_cluster_size": int(best["min_cluster_size"]),
                "metric": metric,
            }
        )
        out.append(rec)
    return out


def kfold_cluster_performance(
    images: pd.DataFrame,
    predictions: "gf.GeoFrame",
    labels: "gf.GeoFrame",
    strata: Sequence,
    grid: GridConfig = GridConfig(),
) -> pd.DataFrame:
    """Full CV: stratified folds over images, grid per fold
    (reference __main__ :482-536; the process pool is unnecessary — the
    shared-distance sweep makes a fold cheap)."""
    folds = stratified_kfold_indices(strata, grid.folds, grid.seed)
    records = []
    for i, fold in enumerate(folds):
        for rec in get_fold_performance(fold, images, predictions, labels, grid):
            rec["fold"] = i
            records.append(rec)
    return pd.DataFrame.from_records(records)


def test_set_performance(
    images: pd.DataFrame,
    predictions: "gf.GeoFrame",
    labels: "gf.GeoFrame",
    confidence_threshold: float,
    distance_threshold: float,
    minimum_cluster_size: int,
) -> pd.DataFrame:
    """Held-out cage- and facility-level P/R at a fixed operating point
    (reference :416-479)."""
    def subset(frame, ims):
        out = frame[frame["image"].isin(ims["image"])].copy()
        out.crs = frame.crs
        return out

    test_preds = subset(predictions, images)
    test_labels = subset(labels, images)

    chosen = clustered_detections(
        test_preds, confidence_threshold, distance_threshold, minimum_cluster_size
    )
    cage_result = get_stats_total(labels=test_labels, preds=chosen)

    # Facility-level: cluster labels too, compare facility bounding boxes
    def facility_bounds_frame(frame, conf):
        f = frame.copy()
        f.crs = frame.crs
        if "det_conf" not in f.columns:
            f["det_conf"] = 1.0
        f = f.reset_index(drop=True)
        f["index"] = f.index
        f3035 = f.to_crs(CRS_AREA)
        f3035.crs = CRS_AREA
        fac = predictions_cluster(
            f3035,
            cluster_variable="year",
            conf_thresh=conf,
            distance_threshold=distance_threshold,
            min_cluster_size=minimum_cluster_size,
            include_area=False,
        )
        geoms = []
        for _, row in fac.iterrows():
            cages = _poly.unary_union(
                [g for g in (row["square_farm_geoms"], row["circle_farm_geoms"]) if g is not None]
            )
            geoms.append(_poly.box(*cages.bounds) if not cages.is_empty else _poly.Empty())
        out = gf.GeoFrame(
            {"year": fac["year"].to_numpy(), "type": ["facility"] * len(fac)},
            geometry=geoms,
            crs=CRS_MAPPING,
        )
        return out

    fac_preds = facility_bounds_frame(test_preds, confidence_threshold)
    fac_labels = facility_bounds_frame(test_labels, 0.0)
    facility_result = get_stats_total(labels=fac_labels, preds=fac_preds)

    return pd.DataFrame(
        [cage_result, facility_result], index=["cage-level", "facility-level"]
    )
