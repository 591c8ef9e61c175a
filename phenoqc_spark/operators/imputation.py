"""Imputation operators (reference: src/phenoqc/missing_data.py).

- mean / median / mode: native Spark — one aggregate pass computes all fill
  statistics, then a codegen ``coalesce`` projection fills.  Global scope
  matches the reference *library* semantics (``impute_missing_data`` over a
  whole frame); the reference *pipeline* fits per chunk
  (batch_processing.py:575-578), which maps to ``scope='partition'``.
- knn / mice / svd: NumPy implementations inside ``mapInPandas`` —
  partition-local statistics by construction (faithful to the reference's
  chunk-local fitting, SURVEY.md §2.10 I2), Arrow-batched, no row-at-a-time
  Python.

Mode tie-break parity: pandas ``mode()[0]`` is the smallest value —
implemented as ``ORDER BY count DESC, value ASC LIMIT 1`` per column in a
single grouped pass.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..impute_numpy import iterative_impute, iterative_svd_impute, knn_impute

_NUMERIC_TYPES = ("double", "float", "integer", "long", "short", "decimal")

SIMPLE = ("mean", "median", "mode")
ADVANCED = ("knn", "mice", "svd")


def numeric_columns(df: DataFrame) -> List[str]:
    return [f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC_TYPES]


def _mode_values(df: DataFrame, cols: List[str]):
    """Smallest-most-frequent value per column, one grouped pass per column
    (column count is schema-sized, each pass is a partial+final agg)."""
    out = {}
    for c in cols:
        row = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), F.asc(c))
            .limit(1)
            .collect()
        )
        out[c] = row[0][0] if row else None
    return out


def impute(
    df: DataFrame,
    strategy: str = "mean",
    field_strategies: Optional[Dict[str, str]] = None,
    params: Optional[dict] = None,
    exclude_columns: Optional[List[str]] = None,
    track_mask: bool = False,
) -> DataFrame:
    """Config-driven imputation (reference: missing_data.py:43-175).

    ``track_mask=True`` adds ``{col}_imputed`` booleans (reference I7,
    missing_data.py:498-508).
    """
    if strategy == "none" and not field_strategies:
        return df
    params = params or {}
    exclude = set(exclude_columns or [])
    num_cols = set(numeric_columns(df))

    # Reference semantics (missing_data.py:81-84): columns with zero missing
    # are skipped entirely — also prevents fill-literal type promotion and
    # saves the per-column mode jobs.  One aggregate pass for all counts.
    candidates = [c for c in df.columns if c not in exclude]
    if not candidates:
        return df
    null_counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in candidates]
    ).collect()[0]

    by_strategy: Dict[str, List[str]] = {}
    for c in candidates:
        if not null_counts[c]:
            continue
        strat = (field_strategies or {}).get(c, strategy)
        if strat in SIMPLE or strat in ADVANCED:
            by_strategy.setdefault(strat, []).append(c)
        elif strat != "none":
            # reference parity (missing_data.py:470-476): unknown strategy
            # warns and leaves the column unchanged
            import warnings

            warnings.warn(
                f"unknown imputation strategy {strat!r} for column {c!r}; skipping",
                stacklevel=2,
            )
    if not by_strategy:
        return df

    out = df
    mask_cols = []
    # -- simple strategies: single stats pass + coalesce projection --------
    mean_cols = [c for c in by_strategy.get("mean", []) if c in num_cols]
    median_cols = [c for c in by_strategy.get("median", []) if c in num_cols]
    aggs = [F.avg(c).alias(f"_mean_{c}") for c in mean_cols] + [
        F.expr(f"percentile(`{c}`, 0.5)").alias(f"_med_{c}") for c in median_cols
    ]
    stats = {}
    if aggs:
        row = df.agg(*aggs).collect()[0]
        stats = row.asDict()
    fills: Dict[str, object] = {}
    for c in mean_cols:
        fills[c] = stats.get(f"_mean_{c}")
    for c in median_cols:
        fills[c] = stats.get(f"_med_{c}")
    mode_cols = by_strategy.get("mode", [])
    if mode_cols:
        fills.update(_mode_values(df, mode_cols))
    for c, v in fills.items():
        if v is None:
            continue
        if track_mask:
            out = out.withColumn(f"{c}_imputed", F.col(c).isNull())
            mask_cols.append(f"{c}_imputed")
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))

    # -- advanced strategies: partition-local NumPy via mapInPandas --------
    for strat in ADVANCED:
        cols = [c for c in by_strategy.get(strat, []) if c in num_cols]
        if not cols:
            continue
        if track_mask:
            for c in cols:
                out = out.withColumn(f"{c}_imputed", F.col(c).isNull())
                mask_cols.append(f"{c}_imputed")
        out = _impute_partition(out, cols, strat, params)
    return out


def _impute_partition(df: DataFrame, cols: List[str], strat: str, params: dict) -> DataFrame:
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # one partition == one statistical chunk: concatenate its Arrow
        # batches so the imputer sees the reference's chunk-local matrix
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        X = pdf[cols].to_numpy(dtype=float)
        if np.isnan(X).any():
            if strat == "knn":
                X = knn_impute(X, n_neighbors=int(params.get("n_neighbors", 5)))
            elif strat == "mice":
                X = iterative_impute(
                    X,
                    max_iter=int(params.get("max_iter", 10)),
                    random_state=int(params.get("random_state", 0)),
                )
            elif strat == "svd":
                rank = params.get("rank")
                X = iterative_svd_impute(X, rank=int(rank) if rank else None)
            pdf[cols] = X
        yield pdf

    return df.mapInPandas(gen, schema)
