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
