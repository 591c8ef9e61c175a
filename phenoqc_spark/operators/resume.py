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
    # probe through the Hadoop FileSystem for the path's own scheme —
    # os.path.exists only sees the driver's local disk, so on hdfs://
    # or s3a:// it would always report "no audit" and disable resume
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(audit_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath(audit_path)):
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


# --- triple-state MERGE (upsert) ---------------------------------------------

TRIPLE_STATE_SCHEMA = (
    "subject string, predicate string, object string, confidence double, "
    "first_seen int, last_seen int, n_obs long"
)


def triples_to_state(
    triples: DataFrame,
    batch_id: int,
    keys: "tuple[str, ...]" = ("subject", "predicate", "object"),
    conf_col: str = "confidence",
) -> DataFrame:
    """Collapse one extraction batch into triple-state rows: one row per
    (subj, pred, obj) with confidence = max over the batch's duplicate
    emissions, first_seen = last_seen = ``batch_id``, n_obs = emission
    count.  One hash aggregate (map-side combinable)."""
    return triples.groupBy(*[F.col(k) for k in keys]).agg(
        F.max(F.col(conf_col)).cast("double").alias("confidence"),
        F.lit(batch_id).cast("int").alias("first_seen"),
        F.lit(batch_id).cast("int").alias("last_seen"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def merge_triple_state(
    state: DataFrame,
    delta: DataFrame,
    keys: "tuple[str, ...]" = ("subject", "predicate", "object"),
) -> DataFrame:
    """MERGE INTO semantics for the accumulated triple store: upsert
    ``delta`` (a :func:`triples_to_state` frame) into ``state`` — matched
    keys combine (max confidence, min first_seen, max last_seen, summed
    n_obs), unmatched keys insert.  This is the engine's analogue of the
    Iceberg ``MERGE INTO triples t USING delta d ON t.s=d.s AND t.p=d.p
    AND t.o=d.o WHEN MATCHED THEN UPDATE SET confidence =
    greatest(t.confidence, d.confidence), ... WHEN NOT MATCHED THEN
    INSERT *`` the north-star resume contract names; parquet has no
    row-level MERGE, so the stand-in is union + one hash re-aggregate.

    The combine is associative AND commutative (max/min/max/sum), which
    buys two scale properties the equivalence test pins down:

    - merge(merge(s, b1), b2) == state-of(b1 ∪ b2): batches can land in
      any grouping/order.  (Exactly-once per batch is the AUDIT table's
      job — :func:`filter_resumable` anti-joins completed part_keys —
      because the combine itself sums n_obs, so a double-delivered delta
      would double-count observations.)
    - It is a valid partial aggregate, so the union+groupBy form
      map-side-combines: the shuffle carries one row per (key, map
      partition), never the raw emission multiplicity.

    At 100 TB keep the state table bucketed by hash(subject) (Iceberg
    ``bucket(N, subject)``): MERGE then co-locates on the state side and
    only the (much smaller) delta shuffles — same storage-partitioned
    escape hatch as ``dedup_exact``.  The union+groupBy stand-in here
    re-shuffles state; acceptable at test scale, and the bucketed form is
    DEMONSTRATED, not just documented —
    tests/test_plan_shapes.py::test_bucketed_state_merge_join_skips_state_exchange
    plan-asserts that a subject-bucketed state table joins a delta with
    exactly one Exchange (the delta's).
    """
    u = state.unionByName(delta)
    return u.groupBy(*[F.col(k) for k in keys]).agg(
        F.max("confidence").alias("confidence"),
        F.min("first_seen").alias("first_seen"),
        F.max("last_seen").alias("last_seen"),
        F.sum("n_obs").alias("n_obs"),
    )


def merge_state_into(
    spark: SparkSession,
    state_path: str,
    triples: DataFrame,
    batch_id: "int | None" = None,
) -> dict:
    """Fold one run's (subject, predicate, object, confidence) triples into
    the accumulated state table at ``state_path`` — the job-level wrapper
    over :func:`triples_to_state` + :func:`merge_triple_state`.

    The batch id is MAX(last_seen)+1 from the existing state (1 on first
    run); existence is probed through the Hadoop FileSystem for the
    path's OWN scheme (an ``os.path.exists`` would silently say "no
    state" on hdfs:// or s3a:// and reset the ledger).  The rewrite is
    write-to-sibling + two atomic renames (the
    ``compact_dedup_state`` swap; Iceberg swaps this for one
    transactional ``MERGE INTO``).  Returns {"batch_id", "rows"}.

    ``batch_id`` (explicit) turns the merge EXACTLY-ONCE for replayed
    deliveries: if the state's MAX(last_seen) already reached it, the
    merge is skipped (``{"skipped": True}``).  Because the swap is
    atomic, a crashed merge leaves the old state intact, so a monotone
    caller-supplied id (e.g. a foreachBatch epoch) replays safely — the
    guard the summing ``n_obs`` combine needs (see
    :func:`merge_triple_state`); :func:`~phenoqc_spark.streaming.pipeline.
    stream_merge_triples` is the streaming caller.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    base = state_path.rstrip("/")
    fs = hpath(base).getFileSystem(hconf)
    old_p = hpath(base + "__old")
    if not fs.exists(hpath(base)) and fs.exists(old_p):
        # a previous swap crashed between its two renames: the state was
        # staged aside but the replacement never landed.  Without this
        # recovery the ledger would silently restart at batch 1.
        if not fs.rename(old_p, hpath(base)):
            raise IOError(f"merge_state_into: could not recover {base}__old")
    existed = fs.exists(hpath(base))
    if existed:
        state = spark.read.parquet(base)
        seen = int(state.agg(F.max("last_seen")).collect()[0][0] or 0)
        if batch_id is not None and seen >= batch_id:
            return {"batch_id": batch_id, "rows": state.count(), "skipped": True}
        batch = batch_id if batch_id is not None else seen + 1
        merged = merge_triple_state(state, triples_to_state(triples, batch))
    else:
        batch = batch_id if batch_id is not None else 1
        merged = triples_to_state(triples, batch)
    tmp, old = base + "__merging", base + "__old"
    merged.write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    if not existed:
        if not fs.rename(hpath(tmp), hpath(base)):
            raise IOError(f"merge_state_into: could not create {base}")
    else:
        fs.delete(hpath(old), True)
        if not fs.rename(hpath(base), hpath(old)):
            raise IOError(f"merge_state_into: could not stage {base} aside")
        if not fs.rename(hpath(tmp), hpath(base)):
            fs.rename(hpath(old), hpath(base))  # roll back
            raise IOError(f"merge_state_into: could not swap in {tmp}")
        fs.delete(hpath(old), True)
    return {"batch_id": batch, "rows": rows}
