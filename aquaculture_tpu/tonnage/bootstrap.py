"""Facility tonnage bootstrap: K=10,000 Monte-Carlo as one XLA program.

Port of the reference's per-iteration pandas loop (reference:
src/utils_tonnage.py:28-127 and sample_model_errors :330-458) to a fully
vectorized jax computation over a (K, n_cages) / (K, n_facilities) lattice:

* model-error "resample until area > 0" loop -> exact truncated normal with
  lower bound -area_orig (rejection sampling from N conditioned on
  area > 0 IS that truncated normal)
* per-cage min/max-area rebounds (circle 4A/(2+pi)..2piA/(2+pi), square
  2A/3..4A/3; utils_tonnage.py:405-436)
* membership-masked segment sums aggregate cages -> facilities under the
  min / max / random image selections (the cage_ids_min/max columns)
* facility area ~ U(min, max); depth ~ Bernoulli mixture of two truncated
  normals on [min_thresh, d] and [d, 2d]; stocking ~ TN(s, [5, 20]);
  harvest ~ N(h); tonnage = area*depth*stock*harvest/1000
* period totals via one more segment sum; mean/var over the K axis

The whole bootstrap is a single jit: one device launch instead of 10,000
pandas passes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import pandas as pd

STOCKING_BOUNDS = (5.0, 20.0)


@dataclasses.dataclass
class BootstrapInputs:
    """Flat arrays describing the facility/cage lattice (host-prepared)."""

    # cage level (n pairs of facility x cage under any selection)
    cage_fac: np.ndarray        # (n,) facility row index
    area_orig: np.ndarray       # (n,)
    var_zero_circle: np.ndarray # (n,) bool: circle with zero variance
    is_circle: np.ndarray       # (n,) bool
    err_mean: np.ndarray        # (n,)
    err_sd: np.ndarray          # (n,)
    in_min: np.ndarray          # (n,) bool
    in_max: np.ndarray          # (n,) bool
    in_random: np.ndarray       # (n,) bool
    # facility level
    fac_period: np.ndarray      # (m,) period index
    cage_depth: np.ndarray      # (m,)
    s_mean: np.ndarray
    s_sd: np.ndarray
    h_mean: np.ndarray
    h_sd: np.ndarray
    periods: List                # period labels, index = period id


def prepare_bootstrap_inputs(
    facility_df: pd.DataFrame,
    preds_df: pd.DataFrame,
    model_error_distributions: pd.DataFrame,
    period_factor_table: pd.DataFrame,
    period_var: str,
) -> BootstrapInputs:
    """Flatten the facility frame (with cage_ids / cage_ids_min /
    cage_ids_max lists) into the bootstrap lattice."""
    est = facility_df.merge(period_factor_table, how="left", on=[period_var])
    est = est.reset_index(drop=True)

    periods = sorted(pd.unique(est["pass"]))
    period_id = {p: i for i, p in enumerate(periods)}

    cages = preds_df.set_index("index")
    err = model_error_distributions.set_index(["pass", "farm_type"])

    rows: Dict[tuple, dict] = {}
    for fi, row in est.iterrows():
        for sel, col in (("min", "cage_ids_min"), ("max", "cage_ids_max"), ("random", "cage_ids")):
            ids = row.get(col)
            if ids is None or (isinstance(ids, float) and np.isnan(ids)):
                continue
            for cid in ids:
                keyrow = rows.setdefault(
                    (fi, int(cid)), {"in_min": False, "in_max": False, "in_random": False}
                )
                keyrow[f"in_{sel}"] = True

    n = len(rows)
    out = BootstrapInputs(
        cage_fac=np.zeros(n, np.int32),
        area_orig=np.zeros(n),
        var_zero_circle=np.zeros(n, bool),
        is_circle=np.zeros(n, bool),
        err_mean=np.zeros(n),
        err_sd=np.zeros(n),
        in_min=np.zeros(n, bool),
        in_max=np.zeros(n, bool),
        in_random=np.zeros(n, bool),
        fac_period=np.asarray([period_id[p] for p in est["pass"]], np.int32),
        cage_depth=est["cage_depth"].to_numpy(np.float64),
        s_mean=est["s_mean"].to_numpy(np.float64),
        s_sd=est["s_sd"].to_numpy(np.float64),
        h_mean=est["h_mean"].to_numpy(np.float64),
        h_sd=est["h_sd"].to_numpy(np.float64),
        periods=periods,
    )
    for k, ((fi, cid), flags) in enumerate(sorted(rows.items())):
        cage = cages.loc[cid]
        ftype = cage["farm_type"]
        p = est.loc[fi, "pass"]
        mu, sd = (0.0, 0.0)
        if (p, ftype) in err.index:
            e = err.loc[(p, ftype)]
            mu, sd = float(e["model_error_mean"]), float(e["model_error_sd"])
        out.cage_fac[k] = fi
        out.area_orig[k] = float(cage["area"])
        out.var_zero_circle[k] = (ftype == "circle_farm") and float(cage["area_var"]) == 0.0
        out.is_circle[k] = ftype == "circle_farm"
        out.err_mean[k] = mu
        out.err_sd[k] = sd
        out.in_min[k] = flags["in_min"]
        out.in_max[k] = flags["in_max"]
        out.in_random[k] = flags["in_random"]
    return out


def _truncnorm(key, lower, upper, loc, scale, shape):
    """Truncated normal on [lower, upper] in standardized units of (loc,
    scale); degenerate scale collapses to loc."""
    import jax.numpy as jnp
    import jax.random as jr

    safe_scale = jnp.where(scale > 0, scale, 1.0)
    z = jr.truncated_normal(key, lower, upper, shape)
    return jnp.where(scale > 0, loc + z * safe_scale, loc)


def run_bootstrap(
    inputs: BootstrapInputs,
    seed: int,
    K: int,
    min_cage_threshold: float,
    depth_dist_mixture_param: float,
) -> pd.DataFrame:
    """Run the vectorized bootstrap; returns per-period tonnage mean/var/sd
    indexed by 'pass' (the reference's period_estimates frame)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    n = len(inputs.cage_fac)
    m = len(inputs.cage_depth)
    n_periods = len(inputs.periods)
    if n == 0 or m == 0:
        return pd.DataFrame(
            {"tonnage": [0.0] * n_periods, "tonnage_var": [0.0] * n_periods,
             "tonnage_sd": [0.0] * n_periods},
            index=pd.Index(inputs.periods, name="pass"),
        )

    cage_fac = jnp.asarray(inputs.cage_fac)
    area_orig = jnp.asarray(inputs.area_orig)
    err_mean = jnp.asarray(inputs.err_mean)
    err_sd = jnp.asarray(inputs.err_sd)
    vzc = jnp.asarray(inputs.var_zero_circle)
    is_circle = jnp.asarray(inputs.is_circle)
    # in_random is deliberately NOT consumed: the simulated facility area
    # is U(min-selection sum, max-selection sum), so the random selection
    # never enters the bootstrap — the reference says the same
    # (utils_tonnage.py:437-439 "is not used in the bootstrap").
    in_min = jnp.asarray(inputs.in_min)
    in_max = jnp.asarray(inputs.in_max)
    fac_period = jnp.asarray(inputs.fac_period)
    depth = jnp.asarray(inputs.cage_depth)
    s_mean, s_sd = jnp.asarray(inputs.s_mean), jnp.asarray(inputs.s_sd)
    h_mean, h_sd = jnp.asarray(inputs.h_mean), jnp.asarray(inputs.h_sd)

    @jax.jit
    def simulate(key):
        ks = jr.split(key, 7)

        # 1. cage-level model error, truncated so area stays positive
        #    (exact form of the reference's resample-until-positive loop)
        lo = jnp.where(err_sd > 0, (-area_orig - err_mean) / jnp.where(err_sd > 0, err_sd, 1.0), -jnp.inf)
        err = _truncnorm(ks[0], lo, jnp.inf, err_mean[None, :], err_sd[None, :], (K, n))
        area = area_orig[None, :] + err

        # 2. per-cage area bounds by type (utils_tonnage.py:405-436)
        min_a = jnp.where(
            vzc, area,
            jnp.where(is_circle, 4.0 * area / (2.0 + jnp.pi), 2.0 * area / 3.0),
        )
        max_a = jnp.where(
            vzc, area,
            jnp.where(is_circle, 2.0 * jnp.pi * area / (2.0 + jnp.pi), 4.0 * area / 3.0),
        )

        # 3. facility aggregation per selection (masked segment sums)
        def seg(vals, mask):
            return jax.vmap(
                lambda v: jax.ops.segment_sum(jnp.where(mask, v, 0.0), cage_fac, num_segments=m)
            )(vals)

        fac_min = seg(min_a, in_min)
        fac_max = seg(max_a, in_max)

        # 4. facility area ~ U(min, max)
        u = jr.uniform(ks[1], (K, m))
        sim_area = fac_min + u * (fac_max - fac_min)

        # 5. depth: mixture of truncated normals around cage_depth
        c = depth[None, :]
        sA = (depth - min_cage_threshold) / 1.96
        dA = _truncnorm(
            ks[2],
            jnp.where(sA > 0, (min_cage_threshold - depth) / jnp.where(sA > 0, sA, 1.0), 0.0)[None, :],
            0.0,
            c,
            sA[None, :],
            (K, m),
        )
        sB = depth / 1.96
        dB = _truncnorm(ks[3], 0.0, 1.96, c, sB[None, :], (K, m))
        bern = jr.bernoulli(ks[6], depth_dist_mixture_param, (K, m))
        sim_depth = jnp.where(bern, dA, dB)

        # 6. stocking density ~ TN(s_mean, s_sd, [5, 20]); harvest ~ N
        lo_s = (STOCKING_BOUNDS[0] - s_mean) / jnp.where(s_sd > 0, s_sd, 1.0)
        hi_s = (STOCKING_BOUNDS[1] - s_mean) / jnp.where(s_sd > 0, s_sd, 1.0)
        sim_stock = _truncnorm(ks[4], lo_s[None, :], hi_s[None, :], s_mean[None, :], s_sd[None, :], (K, m))
        sim_harv = h_mean[None, :] + h_sd[None, :] * jr.normal(ks[5], (K, m))

        # 7. tonnage and period totals
        tonnage = sim_area * sim_depth * sim_stock * sim_harv / 1000.0
        per_period = jax.vmap(
            lambda t: jax.ops.segment_sum(t, fac_period, num_segments=n_periods)
        )(tonnage)  # (K, n_periods)
        return per_period.mean(axis=0), per_period.var(axis=0)

    mean, var = simulate(jr.PRNGKey(seed))
    mean, var = np.asarray(mean), np.asarray(var)
    out = pd.DataFrame(
        {"tonnage": mean, "tonnage_var": var, "tonnage_sd": np.sqrt(var)},
        index=pd.Index(inputs.periods, name="pass"),
    )
    return out.sort_index()


def compute_facility_tonnage_estimates(
    facility_df: pd.DataFrame,
    period_factor_table: pd.DataFrame,
    period_var: str,
    min_cage_threshold: float,
    preds_df: pd.DataFrame,
    model_error_distributions: pd.DataFrame,
    depth_dist_mixture_param: float,
    K: int = 10_000,
    seed: int = 0,
) -> pd.DataFrame:
    """Reference-compatible wrapper (utils_tonnage.py:28-127 signature):
    facility frame + factor table -> per-period tonnage mean/var/sd."""
    from aquaculture_tpu.tonnage.factors import factor_columns_for_bootstrap

    pft = factor_columns_for_bootstrap(period_factor_table)
    fac = facility_df.copy()
    if "cage_ids_min" not in fac.columns:
        fac["cage_ids_min"] = fac["cage_ids"]
    if "cage_ids_max" not in fac.columns:
        fac["cage_ids_max"] = fac["cage_ids"]
    if "farm_type" not in preds_df.columns:
        preds_df = preds_df.copy()
        preds_df["farm_type"] = preds_df["type"]
    inputs = prepare_bootstrap_inputs(fac, preds_df, model_error_distributions, pft, period_var)
    return run_bootstrap(inputs, seed, K, min_cage_threshold, depth_dist_mixture_param)
