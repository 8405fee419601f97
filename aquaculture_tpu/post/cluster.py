"""Facility clustering: self-contained DBSCAN + facility aggregation.

Replaces sklearn.cluster.DBSCAN (reference: src/cluster_facilities.py:13)
with an exact DBSCAN whose scan order matches sklearn's (BFS from core
points in index order; border points join the first cluster to reach them),
so labels agree elementwise with the oracle. Per-year point counts are
small (<= thousands), so the neighbor search is a dense vectorized pass.

Facility aggregation mirrors DBSCAN_cluster / predictions_cluster
(reference: src/cluster_facilities.py:17-208): per time-group clusters with
per-type counts and MultiPolygon cage geometries, summed areas/variances,
centroid Point geometry, and a global facility_index.
"""

from __future__ import annotations

from collections import deque
import numpy as np
import pandas as pd

from aquaculture_tpu import frame as gf
from aquaculture_tpu.config import CRS_AREA, CRS_MAPPING
from aquaculture_tpu.geo import polygon as _poly


def dbscan_from_adjacency(adj: np.ndarray, core: np.ndarray) -> np.ndarray:
    """DBSCAN label assignment from a boolean adjacency (self-inclusive)
    and core-point mask; -1 = noise. The BFS order matches sklearn's
    labeling (clusters numbered by first core point encountered), which is
    what the label-exactness tests pin. Shared by dbscan() and the k-fold
    grid sweep (eval/kfold._masked_cluster_members), so a clustering fix
    lands in both."""
    n = len(core)
    labels = np.full(n, -1, np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS flood from this core point
        labels[i] = cluster
        q = deque([i])
        while q:
            j = q.popleft()
            if not core[j]:
                continue
            for k in np.nonzero(adj[j])[0]:
                if labels[k] == -1:
                    labels[k] = cluster
                    q.append(k)
        cluster += 1
    return labels


def dbscan(points: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Exact DBSCAN labels over (N, 2) points; -1 = noise."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n == 0:
        return np.zeros(0, np.int64)
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    adj = d2 <= eps * eps  # includes self
    core = adj.sum(axis=1) >= min_samples
    return dbscan_from_adjacency(adj, core)


_FTYPES = ("circle", "square", "rectangle")


def cluster_facilities(
    cages: "gf.GeoFrame",
    cluster_variable: str = "year",
    distance_threshold: float = 10.0,
    min_cluster_size: int = 5,
    include_area: bool = True,
) -> "gf.GeoFrame":
    """Group cage detections into facilities (reference DBSCAN_cluster).

    Args:
        cages: detections in EPSG:3035 with a unique ``index`` column
        cluster_variable: group column ('year' or 'pass')
        distance_threshold: DBSCAN eps in meters
        min_cluster_size: DBSCAN min_samples
    Returns:
        facility GeoFrame in EPSG:3857 (point centroids), with the
        reference's schema (cluster_facilities.py:57-158).
    """
    assert "index" in cages.columns and cages["index"].nunique() == len(cages), "check cage ID"
    assert cages.crs == CRS_AREA, f"cages must be EPSG:{CRS_AREA}"
    if cluster_variable not in cages.columns:
        raise ValueError(f"missing cluster variable {cluster_variable!r}")

    rows = []
    geoms = []
    for y in pd.unique(cages[cluster_variable]):
        sub = cages[cages[cluster_variable] == y]
        sub.crs = cages.crs  # subsetting does not always propagate metadata
        centers = np.asarray([[g.centroid.x, g.centroid.y] for g in sub["geometry"]])
        labels = dbscan(centers, distance_threshold, min_cluster_size)
        n_noise = int((labels == -1).sum())
        sub_3857 = sub.to_crs(CRS_MAPPING)
        types = sub["type"].to_numpy()
        for l in np.unique(labels):
            if l == -1:
                continue
            m = labels == l
            members = sub_3857.iloc[np.nonzero(m)[0]]
            rec = {
                "num_circle_farms": int((types[m] == "circle_farm").sum()),
                "num_square_farms": int((types[m] == "square_farm").sum()),
                "num_rectangle_farms": int((types[m] == "rectangle_farm").sum()),
                cluster_variable: y,
                "noise_points": n_noise,
                "cage_ids": members["index"].tolist(),
            }
            for ft in _FTYPES:
                sel = [
                    g
                    for g, t in zip(members["geometry"], types[m])
                    if t == f"{ft}_farm" and isinstance(g, _poly.Polygon)
                ]
                rec[f"{ft}_farm_geoms"] = _poly.MultiPolygon(sel)
            if include_area:
                rec["area"] = float(members["area"].sum())
                rec["area_var"] = float(np.sum(members["area_var"].to_numpy()))
                rec["min_area"] = float(members["min_area"].sum())
                rec["max_area"] = float(members["max_area"].sum())
            rows.append(rec)
            c = centers[m].mean(axis=0)
            geoms.append(_poly.Point(float(c[0]), float(c[1])))

    out = gf.GeoFrame(pd.DataFrame(rows), geometry=geoms, crs=CRS_AREA)
    out.reset_index(inplace=True, drop=True)
    out["facility_index"] = out.index
    out.crs = CRS_AREA
    return out.to_crs(CRS_MAPPING)


def predictions_cluster(
    predictions: "gf.GeoFrame",
    cluster_variable: str = "year",
    conf_thresh: float = 0.5,
    distance_threshold: float = 10.0,
    min_cluster_size: int = 5,
    include_area: bool = True,
) -> "gf.GeoFrame":
    """Confidence-filter then cluster (reference predictions_cluster,
    cluster_facilities.py:181-208)."""
    preds = predictions[predictions["det_conf"] >= conf_thresh].copy()
    preds.crs = predictions.crs
    return cluster_facilities(
        preds,
        cluster_variable=cluster_variable,
        distance_threshold=distance_threshold,
        min_cluster_size=min_cluster_size,
        include_area=include_area,
    )
