"""Quality-metric operators (reference: src/phenoqc/quality_metrics.py)
as native Spark aggregations.

Everything here is a partial+final hash aggregate or a window — no Python
in the hot path.  Pairwise column diagnostics (redundancy) aggregate to a
driver-side ncols² loop on scalar results, as in the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def check_accuracy(df: DataFrame, schema_cfg: dict, row_id_cols: Optional[List[str]] = None) -> DataFrame:
    """Schema min/max audit rows (reference: quality_metrics.py:22-69)."""
    from .validation import range_violations

    return range_violations(df, schema_cfg.get("properties", {}), row_id_cols)


def _null_or_nan_free(df: DataFrame, c: str):
    """Predicate: column ``c`` holds a usable numeric (not null, and not NaN
    for floating types) — pandas rank/corr treats NaN as missing, so the
    Spearman parity path must too."""
    e = F.col(c).isNotNull()
    t = {f.name: f.dataType.typeName() for f in df.schema.fields}.get(c)
    if t in ("double", "float"):
        e = e & ~F.isnan(F.col(c))
    return e


def _distributed_avg_ranks(df: DataFrame, cols: List[str], num_buckets: int = 32) -> DataFrame:
    """Replace each column in ``cols`` with its average rank (ties → mean
    rank, nulls AND NaNs stay null — pandas missing-value rank semantics) —
    EXACT ranks with no single-partition window.

    NOTE this runs driver-side actions (approxQuantile + two bounded
    collects) PER COLUMN at construction time, i.e. it is EAGER, not lazy —
    acceptable for the diagnostic-tier column counts redundancy detection
    runs over (ncols ≲ dozens), not a building block for wide-table hot
    paths.

    Per column: distinct-value counts (one groupBy), approx-quantile bucket
    boundaries (a bounded driver-side list — the IVF-codebook pattern), a
    window partitioned BY BUCKET over distinct values only for the
    in-bucket cumulative count, and per-bucket offsets (≤ num_buckets
    scalars collected).  Boundary placement only balances the buckets; the
    ranks are exact regardless, because offsets are exact sums.  The ranked
    values rejoin on the value key (distinct-value table, typically orders
    of magnitude smaller than the data)."""
    out = df
    for c in cols:
        nn = out.where(_null_or_nan_free(out, c)).select(F.col(c).alias("_v"))
        probs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(set(nn.stat.approxQuantile("_v", probs, 0.01)))
        cnts = nn.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"))
        if bounds:
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            bkt = F.size(F.filter(arr, lambda b: b < F.col("_v")))
        else:
            bkt = F.lit(0)
        bcnts = cnts.withColumn("_bkt", bkt)
        totals = {
            r["_bkt"]: r["_t"]
            for r in bcnts.groupBy("_bkt").agg(F.sum("_cnt").alias("_t")).collect()
        }
        offsets = {}
        acc = 0
        for b in sorted(totals):
            offsets[b] = acc
            acc += totals[b]
        off = F.lit(0)
        for b, o in offsets.items():
            off = F.when(F.col("_bkt") == b, F.lit(o)).otherwise(off)
        w = Window.partitionBy("_bkt").orderBy("_v")
        ranks = (
            bcnts.withColumn("_cum", F.sum("_cnt").over(w))
            .select(
                "_v",
                (
                    off + F.col("_cum") - F.col("_cnt") + 1 + (F.col("_cnt") - 1) / 2.0
                ).alias("_avg_rank"),
            )
        )
        out = (
            out.withColumn("_jv", F.col(c))
            .join(ranks.withColumnRenamed("_v", "_jv"), "_jv", "left")
            .withColumn(c, F.when(F.col("_jv").isNull(), None).otherwise(F.col("_avg_rank")))
            .drop("_jv", "_avg_rank")
        )
    return out


def detect_redundancy(
    df: DataFrame,
    threshold: float = 0.98,
    numeric_cols: Optional[List[str]] = None,
    method: str = "pearson",
) -> DataFrame:
    """Highly-correlated or identical column pairs (reference:
    quality_metrics.py:72-144) → (column_1, column_2, metric, value).

    - Correlations: one pass of ``corr`` aggregates (ncols² scalar
      results — tiny), computed distributed, compared on the driver.
      ``method='spearman'`` rank-transforms each numeric column first
      (average ranks for ties, as pandas does) and runs the same Pearson
      aggregate on the ranks.  Ranks are EXACT and fully distributed
      (``_distributed_avg_ranks``: bucketed cumulative counts, no
      single-partition window).

      Pairwise-complete parity with pandas ``df.corr('spearman')``
      (quality_metrics.py:100): one aggregate detects, per pair, whether
      the two columns' null/NaN masks misalign.  Aligned pairs (the common
      all-non-null case) share a single global ranking; misaligned pairs
      are each re-ranked over their pairwise-complete subset (rows where
      both are present) — exactly pandas' semantics, driver-looped over
      the (few) misaligned pairs only.  NaN counts as missing, as in
      pandas.
    - Identical columns: one SHA-256 per column over the ordered value
      stream via ``sha2(concat_ws(...))`` of per-row hashes aggregated in
      order; identical supersedes correlation (reference behavior).
    """
    spark = df.sparkSession
    if numeric_cols is None:
        numeric_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float", "integer", "long", "short", "decimal")
        ]
    records = []
    seen = set()
    if len(numeric_cols) >= 2:
        pairs = []
        for i, c1 in enumerate(numeric_cols):
            for c2 in numeric_cols[i + 1 :]:
                pairs.append((c1, c2))
        pair_vals: Dict[tuple, Optional[float]] = {}
        if method == "spearman":
            nn = {c: _null_or_nan_free(df, c) for c in numeric_cols}
            mis_row = df.agg(
                *[
                    F.sum((nn[c1] != nn[c2]).cast("long")).alias(f"_mis_{i}")
                    for i, (c1, c2) in enumerate(pairs)
                ]
            ).collect()[0]
            misaligned = {
                pairs[i] for i in range(len(pairs)) if (mis_row[f"_mis_{i}"] or 0) > 0
            }
            aligned = [p for p in pairs if p not in misaligned]
            if aligned:
                cols_needed = [c for c in numeric_cols if any(c in p for p in aligned)]
                ranked = _distributed_avg_ranks(df, cols_needed)
                arow = ranked.agg(
                    *[
                        F.corr(c1, c2).alias(f"_corr_{i}")
                        for i, (c1, c2) in enumerate(aligned)
                    ]
                ).collect()[0]
                for i, p in enumerate(aligned):
                    pair_vals[p] = arow[f"_corr_{i}"]
            for c1, c2 in sorted(misaligned, key=pairs.index):
                sub = df.where(nn[c1] & nn[c2]).select(c1, c2)
                rsub = _distributed_avg_ranks(sub, [c1, c2])
                pair_vals[(c1, c2)] = rsub.agg(F.corr(c1, c2)).collect()[0][0]
        else:
            row = df.agg(
                *[F.corr(c1, c2).alias(f"_corr_{i}") for i, (c1, c2) in enumerate(pairs)]
            ).collect()[0]
            for i, p in enumerate(pairs):
                pair_vals[p] = row[f"_corr_{i}"]
        for c1, c2 in pairs:
            val = pair_vals.get((c1, c2))
            if val is not None and val == val and abs(val) >= threshold:
                seen.add((c1, c2))
                records.append((c1, c2, "correlation", float(abs(val))))

    # identical columns: positional content hash per column, distributed —
    # hash each (row_id, value) pair and SUM (commutative ⇒ order-free
    # accumulation that still detects positional equality).  One pass, no
    # single-task collect (the reference hashes the whole column stream on
    # one machine, quality_metrics.py:119-123; this is the scale-out twin).
    indexed = df.withColumn("_rid", F.monotonically_increasing_id())
    # decimal accumulator: ANSI-safe (no long overflow), still exact
    hash_aggs = [
        F.sum(
            F.xxhash64(
                F.col("_rid"), F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            ).cast("decimal(38,0)")
        ).alias(c)
        for c in df.columns
    ]
    hrow = indexed.agg(*hash_aggs).collect()[0]
    by_hash: Dict[str, List[str]] = {}
    for c in df.columns:
        by_hash.setdefault(str(hrow[c]), []).append(c)
    for cols in by_hash.values():
        if len(cols) > 1:
            first = cols[0]
            for other in cols[1:]:
                key = (first, other) if first < other else (other, first)
                if key in seen:
                    records = [
                        (c1, c2, "identical", 1.0)
                        if {c1, c2} == set(key)
                        else (c1, c2, m, v)
                        for (c1, c2, m, v) in records
                    ]
                    continue
                records.append((first, other, "identical", 1.0))
    return spark.createDataFrame(
        records, "column_1 string, column_2 string, metric string, value double"
    )


def check_traceability(
    df: DataFrame, id_cols: List[str], source_col: Optional[str] = None
) -> DataFrame:
    """(row ids…, issue) rows (reference: quality_metrics.py:147-193):
    duplicate_identifier, missing_identifier, missing_source."""
    if not id_cols:
        raise ValueError("id_cols must contain at least one column")
    w = Window.partitionBy(*id_cols)
    dup = (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") > 1)
        .select(*id_cols)
        .withColumn("issue", F.lit("duplicate_identifier"))
    )
    missing_cond = None
    for c in id_cols:
        p = F.col(c).isNull()
        missing_cond = p if missing_cond is None else (missing_cond | p)
    miss = df.filter(missing_cond).select(*id_cols).withColumn(
        "issue", F.lit("missing_identifier")
    )
    out = dup.unionByName(miss)
    if source_col and source_col in df.columns:
        src = df.filter(F.col(source_col).isNull()).select(*id_cols).withColumn(
            "issue", F.lit("missing_source")
        )
        out = out.unionByName(src)
    return out


def check_timeliness(
    df: DataFrame, date_col: str, max_lag_days: int, now: Optional[str] = None
) -> DataFrame:
    """Stale or invalid-date rows with an ``issue`` column (reference:
    quality_metrics.py:196-231).  ``now`` is injectable for determinism;
    defaults to current_timestamp().
    """
    if date_col not in df.columns:
        return df.limit(0).withColumn("issue", F.lit(""))
    ts = F.try_to_timestamp(F.col(date_col).cast("string"))
    now_expr = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    stale = df.filter(
        ts.isNotNull()
        & (now_expr.cast("long") - ts.cast("long") > max_lag_days * 86400)
    ).withColumn("issue", F.lit("lag_exceeded"))
    invalid = df.filter(ts.isNull()).withColumn("issue", F.lit("missing_or_invalid_date"))
    return stale.unionByName(invalid)


def class_distribution(
    df: DataFrame, label_column: str, warn_threshold: float = 0.10
) -> DataFrame:
    """(label, count, proportion, is_minority, warning) — reference:
    quality_metrics.py:248-271.  Total via a window over the grouped result
    (group count ≤ distinct labels — tiny), not a second scan.
    """
    counts = (
        df.filter(F.col(label_column).isNotNull())
        .groupBy(F.col(label_column).cast("string").alias("label"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy()
    ranked = counts.withColumn("proportion", F.col("count") / F.sum("count").over(w))
    min_prop = F.min("proportion").over(w)
    return ranked.select(
        "label",
        "count",
        "proportion",
        (F.col("proportion") == min_prop).alias("is_minority"),
        ((F.col("proportion") == min_prop) & (F.col("proportion") < warn_threshold)).alias(
            "warning"
        ),
    )


def numeric_profile(
    df: DataFrame,
    cols: List[str],
    percentiles: "List[float] | None" = None,
    exact: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """One row per column: (column, n, n_null, min, max, mean, stddev,
    p25, p50, p75, ...) — the full numeric-profiling extension of the
    reference's per-column summary stats (statistics.py mean/median/mode
    tier), shaped like a data-profiler output table.

    ONE scan, one partial+final hash aggregate: every column's metrics
    compute in the same agg (no per-column jobs), then the single wide
    row is unpivoted with ``stack`` — still a one-row driver transfer
    regardless of corpus size.

    ``exact=False`` (the 100 TB default) uses ``percentile_approx``
    (bounded-memory GK sketch, err ≤ 1/``approx_accuracy`` in rank
    space).  ``exact=True`` uses exact interpolated ``percentile`` —
    it buffers each column's values in the aggregation state, so
    reserve it for profile-sized slices / oracle checks, not full-corpus
    runs (the same memory caveat the reference's pandas describe()
    carries implicitly).
    """
    ps = percentiles if percentiles is not None else [0.25, 0.5, 0.75, 0.95]
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        if exact:
            pcts = F.percentile(col, F.array(*[F.lit(p) for p in ps]))
        else:
            pcts = F.percentile_approx(
                col, F.array(*[F.lit(p) for p in ps]), F.lit(approx_accuracy)
            )
        aggs.append(
            F.struct(
                F.count(col).alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.min(col).alias("min"),
                F.max(col).alias("max"),
                F.avg(col).alias("mean"),
                F.stddev_samp(col).alias("stddev"),
                pcts.alias("pcts"),
            ).alias(f"_prof_{c}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{c}', _prof_{c}.n, _prof_{c}.n_null, _prof_{c}.min, _prof_{c}.max, "
        "_prof_{c}.mean, _prof_{c}.stddev, {pcts}".format(
            c=c,
            pcts=", ".join(f"_prof_{c}.pcts[{i}]" for i in range(len(ps))),
        )
        for c in cols
    )
    names = "column, n, n_null, min, max, mean, stddev, " + ", ".join(
        f"p{int(p * 100)}" for p in ps
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS ({names})"
    )


def reservoir_sample(df: DataFrame, n: int = 10000, seed: int = 42) -> DataFrame:
    """Bounded deterministic sample for report/visualization inputs
    (reference: batch_processing.py:313-317,629-639 — ≤10k rows, seed 42).

    ``rand(seed)``-ranked top-n: one shuffle of (rand, row) pairs capped by
    TakeOrderedAndProject — never a full sort at scale.
    """
    return (
        df.withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(n)
        .drop("_r")
    )


def quality_scores_df(
    df: DataFrame,
    violation_expr,
    mapping_rates: List[float],
    columns: Optional[List[str]] = None,
) -> DataFrame:
    """Distributed A8 quality scores (reference: batch_processing.py:792-825)
    as ONE partial+final aggregate over the data — no collect.

    ``violation_expr`` is the row-level schema-violation predicate (NULL →
    not a violation, matching V1's flag semantics); missing cells are
    counted over ``columns`` (default: all).  Mapping rates are the
    per-ontology success percentages (already aggregated — dictionary-sized,
    so a literal).  Returns one row: (schema_score, missing_score,
    mapping_score, overall_score), each rounded to 2 as in the reference.
    """
    cols = columns or df.columns
    miss_row = None
    for c in cols:
        t = F.col(c).isNull().cast("long")
        miss_row = t if miss_row is None else miss_row + t
    agg = df.agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.when(violation_expr, 1).otherwise(0)).alias("_viol"),
        F.sum(miss_row).alias("_miss"),
    )
    mapping = (
        sum(mapping_rates) / len(mapping_rates) if mapping_rates else 100.0
    )
    schema_s = F.lit(100.0) * (F.col("_total") - F.col("_viol")) / F.col("_total")
    missing_s = F.lit(100.0) * (
        F.lit(1.0) - F.col("_miss") / (F.col("_total") * F.lit(len(cols)))
    )
    return agg.select(
        F.round(schema_s, 2).alias("schema_score"),
        F.round(missing_s, 2).alias("missing_score"),
        F.round(F.lit(float(mapping)), 2).alias("mapping_score"),
        F.round((schema_s + missing_s + F.lit(float(mapping))) / 3.0, 2).alias(
            "overall_score"
        ),
    )


def quality_scores(
    total_rows: int,
    schema_violations: int,
    missing_cells: int,
    n_columns: int,
    mapping_rates: List[float],
) -> Dict[str, float]:
    """Scalar quality scores (reference: batch_processing.py:792-825):
    schema = valid/total; missing = 1 − missing_cells/(rows·ncols);
    mapping = mean per-ontology rate; overall = mean of the three.
    (The reference's column-count quirk at :797 is fixed to the true count —
    documented delta.)
    """
    schema_score = 100.0 * (total_rows - schema_violations) / total_rows if total_rows else 100.0
    denom = total_rows * n_columns
    missing_score = 100.0 * (1.0 - (missing_cells / denom)) if denom else 100.0
    mapping_score = (sum(mapping_rates) / len(mapping_rates)) if mapping_rates else 100.0
    overall = (schema_score + missing_score + mapping_score) / 3.0
    return {
        "schema_validation_score": round(schema_score, 2),
        "missing_data_score": round(missing_score, 2),
        "mapping_success_score": round(mapping_score, 2),
        "overall_quality_score": round(overall, 2),
    }
