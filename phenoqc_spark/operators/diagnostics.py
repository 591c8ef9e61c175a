"""Imputation diagnostics: tuning, bias report, stability CV, MI uncertainty
(reference: src/phenoqc/missing_data.py:298-452, quality_metrics.py:307-616).

The reference computes these on pandas frames on one machine; the engine
keeps that *statistical scope* (they are sample-level diagnostics, run on a
bounded `df.sample(...).toPandas()` — reference caps at `max_cells`) while
the heavy per-cell work stays NumPy.  scipy is unavailable here, so the
statistics are implemented from their definitions: two-sample KS (max ECDF
gap), Wasserstein-1 (quantile-difference integral), PSI, Cramér's V
(chi-square / n·min(r-1,c-1)), SMD (pooled-SD standardized mean diff),
variance ratio.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# statistics (scipy-free)
# ---------------------------------------------------------------------------

def ks_statistic(a: np.ndarray, b: np.ndarray) -> float:
    a = np.sort(a[~np.isnan(a)])
    b = np.sort(b[~np.isnan(b)])
    if a.size == 0 or b.size == 0:
        return float("nan")
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / a.size
    cb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.max(np.abs(ca - cb)))


def wasserstein1(a: np.ndarray, b: np.ndarray) -> float:
    a = np.sort(a[~np.isnan(a)])
    b = np.sort(b[~np.isnan(b)])
    if a.size == 0 or b.size == 0:
        return float("nan")
    q = np.linspace(0, 1, max(a.size, b.size), endpoint=False) + 0.5 / max(a.size, b.size)
    qa = np.quantile(a, q)
    qb = np.quantile(b, q)
    return float(np.mean(np.abs(qa - qb)))


def psi(expected: np.ndarray, actual: np.ndarray, bins: int = 10) -> float:
    expected = expected[~np.isnan(expected)]
    actual = actual[~np.isnan(actual)]
    if expected.size == 0 or actual.size == 0:
        return float("nan")
    edges = np.quantile(expected, np.linspace(0, 1, bins + 1))
    edges[0], edges[-1] = -np.inf, np.inf
    e_frac = np.histogram(expected, edges)[0] / expected.size
    a_frac = np.histogram(actual, edges)[0] / actual.size
    e_frac = np.clip(e_frac, 1e-6, None)
    a_frac = np.clip(a_frac, 1e-6, None)
    return float(np.sum((a_frac - e_frac) * np.log(a_frac / e_frac)))


def cramers_v(a: pd.Series, b: pd.Series) -> float:
    tab = pd.crosstab(a, b)
    if tab.size == 0 or min(tab.shape) < 2:
        return 0.0
    obs = tab.to_numpy(dtype=float)
    n = obs.sum()
    row = obs.sum(1, keepdims=True)
    col = obs.sum(0, keepdims=True)
    exp = row @ col / n
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = np.nansum(np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0))
    k = min(tab.shape) - 1
    return float(np.sqrt(chi2 / (n * k))) if n > 0 and k > 0 else 0.0


def smd(a: np.ndarray, b: np.ndarray) -> float:
    a = a[~np.isnan(a)]
    b = b[~np.isnan(b)]
    if a.size < 2 or b.size < 2:
        return float("nan")
    pooled = np.sqrt((a.var(ddof=1) + b.var(ddof=1)) / 2.0)
    if pooled == 0:
        return 0.0
    return float(abs(a.mean() - b.mean()) / pooled)


def variance_ratio(a: np.ndarray, b: np.ndarray) -> float:
    a = a[~np.isnan(a)]
    b = b[~np.isnan(b)]
    if a.size < 2 or b.size < 2:
        return float("nan")
    va, vb = a.var(ddof=1), b.var(ddof=1)
    if min(va, vb) == 0:
        return float("inf") if max(va, vb) > 0 else 1.0
    return float(max(va, vb) / min(va, vb))


# ---------------------------------------------------------------------------
# bias report (I8): observed vs imputed distribution per column
# ---------------------------------------------------------------------------

def imputation_bias_report(
    before: pd.DataFrame,
    after: pd.DataFrame,
    numeric_cols: Optional[List[str]] = None,
    smd_warn: float = 0.1,
    var_ratio_warn: float = 2.0,
    ks_warn: float = 0.1,
    psi_warn: float = 0.1,
) -> pd.DataFrame:
    """Per-column bias metrics between observed values and imputed values
    (reference: quality_metrics.py:307-444 semantics: compare the observed
    distribution against the post-imputation values at originally-missing
    positions)."""
    rows = []
    cols = numeric_cols or [c for c in before.columns if pd.api.types.is_numeric_dtype(before[c])]
    for c in cols:
        obs_mask = before[c].notna()
        mis_mask = before[c].isna()
        obs = before.loc[obs_mask, c].to_numpy(dtype=float)
        imp = after.loc[mis_mask, c].to_numpy(dtype=float)
        imp = imp[~np.isnan(imp)]
        if obs.size == 0 or imp.size == 0:
            continue
        row = {
            "column": c,
            "n_obs": int(obs.size),
            "n_imp": int(imp.size),
            "smd": smd(obs, imp),
            "var_ratio": variance_ratio(obs, imp),
            "ks": ks_statistic(obs, imp),
            "wasserstein": wasserstein1(obs, imp),
            "psi": psi(obs, imp),
        }
        row["warn"] = bool(
            (row["smd"] == row["smd"] and row["smd"] > smd_warn)
            or (row["var_ratio"] == row["var_ratio"] and row["var_ratio"] > var_ratio_warn)
            or (row["ks"] == row["ks"] and row["ks"] > ks_warn)
            or (row["psi"] == row["psi"] and row["psi"] > psi_warn)
        )
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# tuning (I6): mask-and-score grid search on a bounded sample
# ---------------------------------------------------------------------------

DEFAULT_GRIDS = {
    "knn": {"n_neighbors": [3, 5, 7]},
    "mice": {"max_iter": [5, 10, 15]},
    "svd": {"rank": [2, 3, 5]},
}


def _apply_np(strategy: str, X: np.ndarray, params: dict) -> np.ndarray:
    from ..impute_numpy import iterative_impute, iterative_svd_impute, knn_impute

    if strategy == "knn":
        return knn_impute(X, n_neighbors=int(params.get("n_neighbors", 5)))
    if strategy == "mice":
        return iterative_impute(X, max_iter=int(params.get("max_iter", 10)))
    if strategy == "svd":
        return iterative_svd_impute(X, rank=params.get("rank"))
    if strategy in ("mean", "median"):
        out = X.copy()
        with np.errstate(all="ignore"):
            fill = np.nanmean(out, axis=0) if strategy == "mean" else np.nanmedian(out, axis=0)
        idx = np.where(np.isnan(out))
        out[idx] = np.take(fill, idx[1])
        return out
    if strategy == "mode":
        out = X.copy()
        for j in range(out.shape[1]):
            col = out[:, j]
            vals = col[~np.isnan(col)]
            if vals.size:
                uniq, counts = np.unique(vals, return_counts=True)
                col[np.isnan(col)] = uniq[np.argmax(counts)]  # ties → smallest, as in impute
        return out
    raise ValueError(strategy)


def tune_imputation(
    sample: pd.DataFrame,
    strategy: str,
    grid: Optional[dict] = None,
    mask_fraction: float = 0.1,
    scoring: str = "MAE",
    max_cells: int = 50000,
    random_state: int = 42,
) -> dict:
    """Mask observed cells, impute, score (MAE/RMSE), return best params
    (reference: missing_data.py:298-405; same defaults incl. seed 42)."""
    rng = np.random.RandomState(random_state)
    grid = grid or DEFAULT_GRIDS.get(strategy) or {}
    if not grid:
        return {"params": None, "score": float("inf"), "metric": scoring.upper()}
    X = sample.to_numpy(dtype=float)
    observed = ~np.isnan(X)
    coords = np.argwhere(observed)
    if coords.size == 0:
        return {"params": None, "score": float("inf"), "metric": scoring.upper()}
    size = min(max_cells, coords.shape[0], int(max(1, mask_fraction * coords.shape[0])))
    picked = coords[rng.choice(coords.shape[0], size=size, replace=False)]
    mask = np.zeros_like(X, dtype=bool)
    mask[picked[:, 0], picked[:, 1]] = True
    best = {"params": None, "score": float("inf"), "metric": scoring.upper()}
    keys = list(grid.keys())
    for vals in itertools.product(*[grid[k] for k in keys]):
        params = dict(zip(keys, vals))
        masked = X.copy()
        masked[mask] = np.nan
        try:
            imputed = _apply_np(strategy, masked, params)
        except Exception:
            continue
        diff = (X - imputed)[mask]
        diff = diff[~np.isnan(diff)]
        if diff.size == 0:
            continue
        score = (
            float(np.sqrt(np.mean(diff**2)))
            if scoring.upper() == "RMSE"
            else float(np.mean(np.abs(diff)))
        )
        if score < best["score"]:
            best = {"params": params, "score": score, "metric": scoring.upper()}
    return best


# ---------------------------------------------------------------------------
# stability CV (I9) and MI uncertainty (I10)
# ---------------------------------------------------------------------------

def imputation_stability(
    sample: pd.DataFrame,
    strategy: str,
    params: Optional[dict] = None,
    repeats: int = 5,
    mask_fraction: float = 0.1,
    random_state: int = 42,
) -> pd.DataFrame:
    """Repeated mask-impute error per column: mean/sd/cv (reference:
    quality_metrics.py:447-550)."""
    rng = np.random.RandomState(random_state)
    X = sample.to_numpy(dtype=float)
    observed = ~np.isnan(X)
    coords = np.argwhere(observed)
    errors: Dict[int, List[float]] = {j: [] for j in range(X.shape[1])}
    for _ in range(repeats):
        size = int(max(1, mask_fraction * coords.shape[0]))
        picked = coords[rng.choice(coords.shape[0], size=size, replace=False)]
        mask = np.zeros_like(X, dtype=bool)
        mask[picked[:, 0], picked[:, 1]] = True
        masked = X.copy()
        masked[mask] = np.nan
        try:
            imputed = _apply_np(strategy, masked, params or {})
        except Exception:
            continue
        for j in range(X.shape[1]):
            m = mask[:, j]
            if m.any():
                d = np.abs(X[m, j] - imputed[m, j])
                d = d[~np.isnan(d)]
                if d.size:
                    errors[j].append(float(d.mean()))
    rows = []
    for j, errs in errors.items():
        if not errs:
            continue
        mean_e = float(np.mean(errs))
        sd_e = float(np.std(errs, ddof=1)) if len(errs) > 1 else 0.0
        rows.append(
            {
                "column": sample.columns[j],
                "mean_error": mean_e,
                "sd_error": sd_e,
                "cv_error": (sd_e / mean_e) if mean_e else 0.0,
                "n_repeats": len(errs),
            }
        )
    return pd.DataFrame(rows)


def mi_uncertainty(
    sample: pd.DataFrame,
    repeats: int = 5,
    random_state: int = 0,
) -> pd.DataFrame:
    """Multiple-imputation variance at originally-missing cells using
    repeated stochastic chained-equation runs (reference:
    quality_metrics.py:553-616).  Randomness enters through bootstrap
    resampling of the regression rows per repeat."""
    from ..impute_numpy import iterative_impute

    rng = np.random.RandomState(random_state)
    X = sample.to_numpy(dtype=float)
    missing = np.isnan(X)
    if not missing.any():
        return pd.DataFrame(columns=["column", "n_missing", "mean_variance"])
    draws = []
    n = X.shape[0]
    for _ in range(repeats):
        idx = rng.randint(0, n, size=n)
        Xb = X[idx]
        imputed_b = iterative_impute(Xb)
        # refit on bootstrap, apply to original missing pattern via a
        # fresh chained pass seeded by the bootstrap's column means
        out = X.copy()
        col_means = np.nanmean(Xb, axis=0)
        for j in range(X.shape[1]):
            out[missing[:, j], j] = col_means[j] if np.isfinite(col_means[j]) else 0.0
        draws.append(iterative_impute(np.where(missing, np.nan, out))[missing])
    stack = np.vstack(draws)
    var_per_cell = stack.var(axis=0, ddof=1)
    cells = np.argwhere(missing)
    rows = []
    for j in range(X.shape[1]):
        sel = cells[:, 1] == j
        if sel.any():
            rows.append(
                {
                    "column": sample.columns[j],
                    "n_missing": int(sel.sum()),
                    "mean_variance": float(var_per_cell[sel].mean()),
                }
            )
    return pd.DataFrame(rows)


def psi_distributed(
    df,
    value_col: str,
    group_col: str,
    expected_label: str,
    actual_label: str,
    edges: "list[float]",
    eps: float = 1e-6,
):
    """Distributed Population Stability Index between two labeled
    populations of one frame, with EXPLICIT bucket edges — the
    scale-out twin of :func:`psi` (whose quantile-derived edges need a
    driver-side sample; at 100 TB pass edges from a prior
    ``approx_quantile`` probe or domain knowledge and the whole
    computation stays one groupBy).

    Bucket index = number of edges ≤ value (so len(edges)+1 buckets,
    open-ended at both extremes, matching numpy's histogram on
    ±inf-padded edges); per-group fractions clip at ``eps`` exactly as
    the numpy twin does, and a bucket absent from one population
    contributes via the clipped zero.  Returns one row:
    (psi, n_expected, n_actual).  Null values are excluded (the numpy
    twin drops NaN)."""
    from pyspark.sql import functions as F

    v = F.col(value_col)
    bucket = sum(
        (v >= F.lit(float(e))).cast("int") for e in edges
    ).alias("_bucket")
    counts = (
        df.filter(F.col(group_col).isin([expected_label, actual_label]))
        .filter(v.isNotNull())
        .select(F.col(group_col).alias("_g"), bucket)
        .groupBy("_g", "_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    totals = counts.groupBy("_g").agg(F.sum("_n").alias("_tot"))
    fracs = counts.join(totals, "_g").select(
        "_g", "_bucket", (F.col("_n") / F.col("_tot")).alias("_f"), "_tot"
    )
    e = fracs.filter(F.col("_g") == expected_label).select(
        "_bucket", F.col("_f").alias("_fe"), F.col("_tot").alias("_te")
    )
    a = fracs.filter(F.col("_g") == actual_label).select(
        "_bucket", F.col("_f").alias("_fa"), F.col("_tot").alias("_ta")
    )
    j = e.join(a, "_bucket", "full").select(
        F.greatest(F.coalesce("_fe", F.lit(0.0)), F.lit(eps)).alias("fe"),
        F.greatest(F.coalesce("_fa", F.lit(0.0)), F.lit(eps)).alias("fa"),
        "_te",
        "_ta",
    )
    return j.agg(
        F.round(F.sum((F.col("fa") - F.col("fe")) * F.log(F.col("fa") / F.col("fe"))), 6).alias("psi"),
        F.max("_te").alias("n_expected"),
        F.max("_ta").alias("n_actual"),
    )


def drift_panel_distributed(
    df,
    value_col: str,
    group_col: str,
    expected_label: str,
    actual_label: str,
):
    """One-row drift panel between two labeled populations: exact
    two-sample KS statistic, standardized mean difference, and variance
    ratio — the distributed twins of :func:`ks_statistic` /
    :func:`standardized_mean_diff` / :func:`variance_ratio`.

    KS shape: counts aggregate per DISTINCT value (the only shuffle on
    data), then cumulative fractions via a window over the ordered
    distinct values — that window is single-partition, but its input is
    value-cardinality-sized, not row-sized; for continuous ultra-high-
    cardinality columns at the 100 TB tier quantize first (the PSI
    operator's explicit-edge bucketing) or accept the distinct-sized
    sort.  SMD/variance ratio are plain aggregates.  Unlike the numpy
    twins, SMD is SIGNED (expected − actual) and the variance ratio is
    DIRECTIONAL (s²_expected / s²_actual) — the symmetric forms are
    ``abs(smd)`` / ``greatest(var_ratio, 1/var_ratio)``.  Nulls excluded,
    6-dp rounding (~1e8× above float summation-order divergence)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g, v = F.col(group_col), F.col(value_col)
    base = df.filter(g.isin([expected_label, actual_label]) & v.isNotNull())
    per_val = base.groupBy(v.alias("_v")).agg(
        F.sum((g == expected_label).cast("long")).alias("_n1"),
        F.sum((g == actual_label).cast("long")).alias("_n2"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = base.agg(
        F.sum((g == expected_label).cast("long")).alias("t1"),
        F.sum((g == actual_label).cast("long")).alias("t2"),
        F.avg(F.when(g == expected_label, v)).alias("m1"),
        F.avg(F.when(g == actual_label, v)).alias("m2"),
        F.stddev_samp(F.when(g == expected_label, v)).alias("s1"),
        F.stddev_samp(F.when(g == actual_label, v)).alias("s2"),
    )
    cum = per_val.select(
        (F.sum("_n1").over(w)).alias("c1"), (F.sum("_n2").over(w)).alias("c2")
    )
    ks = cum.crossJoin(F.broadcast(tot)).agg(
        F.round(F.max(F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2"))), 6).alias("ks")
    )
    return ks.crossJoin(F.broadcast(tot)).select(
        "ks",
        F.round(
            (F.col("m1") - F.col("m2"))
            / F.sqrt((F.col("s1") * F.col("s1") + F.col("s2") * F.col("s2")) / 2.0),
            6,
        ).alias("smd"),
        F.round((F.col("s1") * F.col("s1")) / (F.col("s2") * F.col("s2")), 6).alias(
            "var_ratio"
        ),
        F.col("t1").alias("n_expected"),
        F.col("t2").alias("n_actual"),
    )
