"""Data-layout operators: multi-dimensional (z-order) clustering for
scan pruning.

A 100 TB table is pruned at two levels — partition directories and
parquet row-group min/max stats.  Sorting by ONE column makes its stats
tight but leaves every other column's min/max spanning the whole domain;
interleaving the bits of several columns into one Morton (z-curve) value
and range-partitioning + sorting by it keeps EACH dimension's per-file /
per-row-group ranges narrow, so selective filters on any of the z
columns skip most of the data (the same layout Iceberg/Delta expose as
``zorder by``).  Measured at 1M rows (BENCH/LAYOUT.md): an x-sort cuts
an x filter to 9.4% of row groups touched but cannot skip a single row
group for a y filter; z-order cuts BOTH to 28-34% and ties the
dedicated sort on a 2-D box — the trade is per-dimension tightness for
all-dimension coverage.

Everything here is pure JVM bit arithmetic (shift/and/or codegen) — no
Python, no shuffle beyond the single range repartition the layout
requires by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zvalue_expr", "zorder_layout"]


def zvalue_expr(cols: "list[str | Column]", bits: int = 16) -> Column:
    """Morton z-value of N non-negative integer columns: interleaves the
    low ``bits`` bits of each column (column 0 owns the least significant
    interleaved bit).  Inputs must already be quantized to
    ``[0, 2**bits)`` — rank/affine quantization is the caller's choice;
    values beyond the range are masked to their low bits.  Total output
    bits = ``bits * len(cols)`` (≤ 63 — a long).

    Pure codegen: ``bits × N`` shift/and/or terms, constant-folded per
    row — no UDF, no shuffle."""
    ncols = len(cols)
    if ncols == 0:
        raise ValueError("zvalue_expr needs at least one column")
    if bits * ncols > 63:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds a long (63)")
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        col = (c if isinstance(c, Column) else F.col(c)).cast("long")
        for b in range(bits):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + ci))
    return z


def zorder_layout(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Rewrite ``df`` into z-order: range-repartition + sort within
    partitions by the Morton value of ``cols`` (which must be quantized
    ints — see :func:`zvalue_expr`).  Write the result with plain
    ``.parquet()``; the row-group min/max stats of every z column come
    out narrow, which is the entire point (BENCH/LAYOUT.md measures the
    row groups a box filter can skip vs a single-column sort).

    One range shuffle — the cost any clustering rewrite pays; at the
    lakehouse tier this is ``ALTER TABLE ... WRITE ORDERED BY`` /
    ``OPTIMIZE ZORDER BY``, and the rewrite runs per partition, not over
    the whole table at once."""
    z = zvalue_expr(cols, bits)
    out = df.withColumn("_z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "_z")
    else:
        out = out.repartitionByRange("_z")
    return out.sortWithinPartitions("_z").drop("_z")


def compact_small_files(
    spark,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: "list[str] | None" = None,
    partition_by: "list[str] | None" = None,
) -> dict:
    """Table-maintenance rewrite: coalesce a parquet directory's many
    small files into ≈``target_file_bytes`` files — the OPTIMIZE /
    rewrite_data_files analogue for the plain-parquet state tables the
    incremental operators append to (audit buckets, dedup signatures,
    sketch states, triple stores).  Small-file pressure is a first-order
    100 TB failure mode: a state touched by 10 000 micro-batches holds
    10 000+ tiny files, and every read pays open/footer/seek per file.

    Sizing comes from the Hadoop FileSystem content summary (actual
    bytes, not estimates): n_out = ceil(total/target).  Without
    ``sort_by`` the rewrite uses ``coalesce`` (narrow — no shuffle, no
    row movement beyond file concatenation); with ``sort_by`` it
    range-repartitions and sorts within partitions, restoring cluster
    order (compose with :func:`zvalue_expr` upstream for z-order).
    ``partition_by`` preserves a partition column layout (e.g. the
    streaming states' ``batch_id`` replay contract).

    The swap is the same write-sibling + two-rename discipline as
    ``compact_dedup_state`` (atomic on HDFS/local, NOT object stores;
    table must be quiescent; a crash between renames is recovered on the
    next call).  Row count is re-verified after the rewrite and the swap
    is aborted on any mismatch — compaction must be bit-boring.

    Returns {"rows", "files_before", "files_after", "bytes"}.
    """
    import math

    base = table_path.rstrip("/")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base).getFileSystem(hconf)
    if not fs.exists(hpath(base)) and fs.exists(hpath(base + "__old")):
        if not fs.rename(hpath(base + "__old"), hpath(base)):
            raise IOError(f"compact_small_files: could not recover {base}__old")
    summary = fs.getContentSummary(hpath(base))
    total_bytes = summary.getLength()
    files_before = summary.getFileCount()
    df = spark.read.parquet(base)
    before = df.count()
    n_out = max(1, math.ceil(total_bytes / float(target_file_bytes)))
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(n_out)
    tmp, old = base + "__compacting", base + "__old"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    after = spark.read.parquet(tmp).count()
    if after != before:
        fs.delete(hpath(tmp), True)
        raise RuntimeError(
            f"compact_small_files: row count changed {before} -> {after}; aborted"
        )
    fs.delete(hpath(old), True)
    if not fs.rename(hpath(base), hpath(old)):
        raise IOError(f"compact_small_files: could not stage {base} aside")
    if not fs.rename(hpath(tmp), hpath(base)):
        fs.rename(hpath(old), hpath(base))  # roll back
        raise IOError(f"compact_small_files: could not swap in {tmp}")
    fs.delete(hpath(old), True)
    files_after = fs.getContentSummary(hpath(base)).getFileCount()
    return {
        "rows": before,
        "files_before": int(files_before),
        "files_after": int(files_after),
        "bytes": int(total_bytes),
    }
