"""Broadcast linear-model scoring over embedding columns.

The model-based quality-filter stage of a training-data pipeline (a
fasttext/logistic-regression-style classifier score deciding keep vs
drop per document) re-expressed Spark-first: the weight vector is a
bounded model artifact, so it is baked into the plan as a LITERAL
array — the scoring pass is pure whole-stage-codegen arithmetic
(``zip_with`` product → ``aggregate`` sum → sigmoid), with NO join, NO
shuffle and NO Python in the hot path.  At 100 TB the scan+score+filter
pipelines inside one map stage with the parquet scan, and dropped rows
are never materialized.

Reference analogue: PhenoQC scores records against quality rules and
flags/drops them (src/phenoqc/quality_metrics.py); here the "rule" is a
learned linear model over document embeddings.  Training is out of
scope by design (a bounded-sample sklearn/driver-side fit slots in) —
the 100 TB problem is SCORING, which this operator keeps map-only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_score(
    df: DataFrame,
    weights: Sequence[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "score",
    link: str = "sigmoid",
) -> DataFrame:
    """Append ``out_col`` = link(w·v + b) computed entirely JVM-side.

    The vector column is cast to ``array<double>`` up front so every
    per-term product and the running sum are double-precision with a
    deterministic left-to-right order (``F.aggregate`` folds
    sequentially) — reproducible across partitionings and matchable by
    a SQL oracle.  A row whose vector length differs from
    ``len(weights)`` (or is null) gets a NULL score rather than a
    silently-truncated dot product: ``zip_with`` pads the short side
    with nulls and the fold propagates them.

    ``link``: ``'sigmoid'`` (default) or ``'identity'`` (raw margin).
    """
    if link not in ("sigmoid", "identity"):
        raise ValueError(f"unknown link {link!r}; use 'sigmoid' or 'identity'")
    w = F.array(*[F.lit(float(x)) for x in weights])
    v = F.col(vec_col).cast("array<double>")
    z = (
        F.aggregate(
            F.zip_with(v, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(float(bias))
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) if link == "sigmoid" else z
    return df.withColumn(out_col, score)


def classifier_filter(
    df: DataFrame,
    weights: Sequence[float],
    bias: float = 0.0,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    score_col: str = "score",
    link: str = "sigmoid",
) -> DataFrame:
    """Keep rows with link(w·v + b) ≥ ``threshold`` — the curation
    keep/drop gate.  Null scores (missing or wrong-dimension vectors)
    are DROPPED: an unscorable document must not silently pass a
    quality gate.  The whole thing stays one codegen'd map stage — the
    filter composes with the scoring expression, so Catalyst pushes the
    surviving-row projection straight onto the scan pipeline."""
    scored = linear_score(df, weights, bias, vec_col, score_col, link)
    return scored.filter(F.col(score_col) >= F.lit(float(threshold)))


def reliability_curve(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, mean_score, frac_pos) — the calibration / reliability
    diagram of probability scores against binary labels: bin b covers
    [b/n_bins, (b+1)/n_bins) (scores of exactly 1.0 land in the last
    bin), and a calibrated model has mean_score ≈ frac_pos per bin.
    Expected calibration error is Σ n_b/N·|mean_score−frac_pos| over
    the returned rows — left to the caller so the table stays the
    single source.

    One hash aggregate over (score, label) pairs; null scores/labels
    are excluded.  The standard model-quality readout for
    :func:`linear_score`-style quality filters before trusting their
    keep/drop threshold at corpus scale.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    bin_ = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), 6).alias("mean_score"),
            F.round(F.avg(y), 6).alias("frac_pos"),
        )
    )
