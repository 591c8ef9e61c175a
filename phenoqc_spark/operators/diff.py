"""Snapshot diff: what changed between two corpus snapshots.

Crawl-to-crawl change detection (which urls appeared, vanished, or
changed content between two ingest epochs) — the table-level companion
to the row-level incremental dedup state.  One full-outer join on the
key with md5 content fingerprints computed map-side on each snapshot:
changed-ness compares 16-byte hashes, never the wide payload columns, so
the shuffle carries (key, hash) projections only — the same
never-shuffle-text posture as ``dedup_exact``.

Reference analogue: none (ingest-lifecycle extra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    content_cols: "list[str] | None" = None,
) -> DataFrame:
    """(key, change): ``added`` (key only in new), ``removed`` (only in
    old), ``changed`` (both, content fingerprint differs).  Unchanged
    rows are omitted — at 100 TB the diff is the small output, the
    identity mass is not materialized.

    ``content_cols`` defaults to every non-key column the frames share;
    the fingerprint is md5 over the null-sentineled concatenation in
    that column order (deterministic and engine-portable).

    Contract: ``key_col`` must be unique within each snapshot — a
    duplicated key fans out through the full-outer join and yields one
    classification row per pairing.  Run ``dedup_exact`` (or an
    explicit aggregation) first if the snapshots may carry dup keys."""
    if content_cols is None:
        content_cols = sorted(
            (set(old.columns) & set(new.columns)) - {key_col}
        )
    if not content_cols:
        raise ValueError("snapshot_diff: no shared content columns to fingerprint")

    def fp(df: DataFrame) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in content_cols
        ]
        return df.select(
            F.col(key_col).alias("_k"),
            F.md5(F.concat_ws("\x1f", *parts)).alias("_h"),
        )

    o = fp(old).withColumnRenamed("_h", "_ho")
    n = fp(new).withColumnRenamed("_h", "_hn")
    joined = o.join(n, "_k", "full")
    return (
        joined.select(
            F.col("_k").alias(key_col),
            F.when(F.col("_ho").isNull(), F.lit("added"))
            .when(F.col("_hn").isNull(), F.lit("removed"))
            .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
