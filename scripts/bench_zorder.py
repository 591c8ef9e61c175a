"""Z-order layout evidence: parquet row-group min/max pruning under a
2-D box filter, measured DIRECTLY from file metadata (pyarrow), for
three layouts of the same 1M-row table:

- unsorted (hash-random arrival order),
- x-sorted (single-column clustering — the usual default),
- z-ordered (zorder_layout on (x, y)).

A row group can be skipped when its [min, max] range on ANY filtered
column misses the predicate box.  Single-column sort makes x tight but
leaves y spanning the whole domain; z-order keeps BOTH narrow.  The
metric is the fraction of row groups a reader must touch — engine- and
cache-independent, unlike wall-clock at this scale.

Usage: ZO_ROWS=1000000 python scripts/bench_zorder.py
Appends to BENCH/LAYOUT.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("ZO_ROWS", "1000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# ~6% selectivity per constrained dimension; the y-only predicate is the
# case single-column sort cannot prune AT ALL
BOXES = {
    "x_only": {"x": (10_000, 14_000)},
    "y_only": {"y": (40_000, 44_000)},
    "xy_box": {"x": (10_000, 14_000), "y": (40_000, 44_000)},
}


def touched_row_groups(path: str, box) -> tuple[int, int]:
    import pyarrow.parquet as pq

    total = touched = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            overlap = True
            for c, (lo, hi) in box.items():
                st = md.row_group(rg).column(cols[c]).statistics
                if st is None or st.min is None:
                    continue  # no stats -> cannot skip
                if st.max < lo or st.min > hi:
                    overlap = False
                    break
            touched += int(overlap)
    return touched, total


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.layout import zorder_layout
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-zorder",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(ROWS).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(65536)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(65536)).alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    layouts = {
        "unsorted": df,
        "x_sorted": df.repartitionByRange(int(CPUS), "x").sortWithinPartitions("x"),
        "z_ordered": zorder_layout(df, ["x", "y"], num_partitions=int(CPUS)),
    }
    out = {}
    for name, frame in layouts.items():
        path = f"/tmp/bench_zorder_{ROWS}_{name}"
        frame.write.mode("overwrite").parquet(path)
        row = {}
        for bname, box in BOXES.items():
            touched, total = touched_row_groups(path, box)
            pred = None
            for c, (lo, hi) in box.items():
                term = F.col(c).between(lo, hi)
                pred = term if pred is None else (pred & term)
            n = spark.read.parquet(path).filter(pred).count()
            row[bname] = {"touched": touched, "total": total,
                          "frac": round(touched / total, 3), "rows_matched": n}
        out[name] = row
    for bname in BOXES:
        assert len({v[bname]["rows_matched"] for v in out.values()}) == 1, out
    print(json.dumps({"rows": ROWS, "boxes": BOXES, **out}))

    doc = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "LAYOUT.md",
    )
    header = not os.path.exists(doc)
    with open(doc, "a") as fh:
        if header:
            fh.write(
                "# Data layout: z-order row-group pruning "
                "(`scripts/bench_zorder.py`)\n\n"
                "Fraction of parquet row groups a reader must TOUCH under "
                "min/max stats\n(~6% selectivity per constrained dimension), "
                "measured directly from file\nmetadata — engine-independent, "
                "no wall-clock noise.  Same 1M rows.\n\n"
                "| layout | x-only filter | y-only filter | 2-D box |\n"
                "|---|---|---|---|\n"
            )
        for name, v in out.items():
            fh.write(
                f"| {name} | {v['x_only']['touched']}/{v['x_only']['total']}"
                f" ({v['x_only']['frac']}) | {v['y_only']['touched']}/"
                f"{v['y_only']['total']} ({v['y_only']['frac']}) | "
                f"{v['xy_box']['touched']}/{v['xy_box']['total']}"
                f" ({v['xy_box']['frac']}) |\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
