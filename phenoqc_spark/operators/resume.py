"""Audit table + checkpoint-resume for the triple factory.

The reference's restartability is process-level (re-run a file).  The
engine records per-partition-group lineage + QC metrics in an audit table
and makes triple writes idempotent:

- Work is keyed by ``part_key`` (a stable hash bucket of ``url``), the
  resume granularity.  ``run_id`` distinguishes attempts.
- ``audit`` rows: (run_id, part_key, status, n_pages, n_records,
  n_triples, missing_cells, schema_violations, started/finished ts).
- On restart, completed part_keys are anti-joined away and triples for the
  retried buckets are overwritten by partition directory — parquet's
  dynamic partition overwrite gives MERGE-like idempotence (an Iceberg
  catalog would use ``MERGE INTO`` on (part_key); same contract,
  documented swap — the sandbox has no Iceberg runtime jar).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

AUDIT_SCHEMA = (
    "run_id string, part_key int, status string, n_pages long, n_triples long, "
    "missing_cells long, schema_violations long, finished_at double"
)


def with_part_key(df: DataFrame, n_buckets: int = 64, key_col: str = "url") -> DataFrame:
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def completed_part_keys(spark: SparkSession, audit_path: str) -> Optional[DataFrame]:
    if not os.path.exists(audit_path):
        return None
    audit = spark.read.parquet(audit_path)
    return audit.filter(F.col("status") == "done").select("part_key").distinct()


def filter_resumable(pages_keyed: DataFrame, done_keys: Optional[DataFrame]) -> DataFrame:
    """Drop partition groups already marked done (broadcast anti-join)."""
    if done_keys is None:
        return pages_keyed
    return pages_keyed.join(F.broadcast(done_keys), "part_key", "left_anti")


def write_triples_idempotent(triples_keyed: DataFrame, path: str) -> None:
    """Partition-dir overwrite keyed by part_key — replays are idempotent."""
    spark = triples_keyed.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        triples_keyed.write.mode("overwrite")
        .partitionBy("part_key")
        .parquet(path)
    )


def append_audit(
    spark: SparkSession,
    audit_path: str,
    run_id: str,
    metrics_df: DataFrame,
) -> None:
    """metrics_df: (part_key, n_pages, n_triples, missing_cells,
    schema_violations) — appended with status='done'."""
    out = (
        metrics_df.withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("done"))
        .withColumn("finished_at", F.lit(time.time()))
        .select(
            "run_id",
            "part_key",
            "status",
            F.col("n_pages").cast("long"),
            F.col("n_triples").cast("long"),
            F.col("missing_cells").cast("long"),
            F.col("schema_violations").cast("long"),
            "finished_at",
        )
    )
    out.write.mode("append").parquet(audit_path)


def partition_metrics(records: DataFrame, triples_keyed: DataFrame) -> DataFrame:
    """Per-part_key QC metrics (missing-rate inputs, triple counts) — the
    engine analogue of the reference's per-file qc_payload
    (batch_processing.py:973-999)."""
    value_cols = [
        c for c in records.columns if c not in ("url", "warc_ts", "extracted_text", "part_key")
    ]
    missing_expr = None
    for c in value_cols:
        e = F.col(c).isNull().cast("long")
        missing_expr = e if missing_expr is None else (missing_expr + e)
    rec_m = records.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(missing_expr).alias("missing_cells"),
        F.sum(F.col("SchemaViolationFlag").cast("long")).alias("schema_violations")
        if "SchemaViolationFlag" in records.columns
        else F.lit(0).alias("schema_violations"),
    )
    tri_m = triples_keyed.groupBy("part_key").agg(F.count(F.lit(1)).alias("n_triples"))
    return rec_m.join(tri_m, "part_key", "left").fillna(0, ["n_triples"])
