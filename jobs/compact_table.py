"""spark-submit entry point for generic small-file table compaction.

    spark-submit --master local[32] --py-files phenoqc_spark.zip \
        jobs/compact_table.py --table /data/audit \
        [--target-mb 128] [--sort-by col1 col2] [--partition-by batch_id]

Operational companion to every append-heavy plain-parquet state this
engine maintains (audit buckets, sketch states, triple stores, kept-doc
outputs): rewrites the directory to ≈target-sized files via
:func:`phenoqc_spark.operators.layout.compact_small_files` — the
OPTIMIZE / rewrite_data_files analogue, with the same quiescence and
atomic-swap caveats as dedup-state compaction (at the lakehouse tier,
use Iceberg's rewrite action instead).  Row count is re-verified before
the swap; prints one JSON line with rows / files before / files after.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="parquet directory to compact")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--sort-by", nargs="+", default=None,
                    help="restore cluster order on these columns (shuffle)")
    ap.add_argument("--partition-by", nargs="+", default=None,
                    help="preserve this partition-column layout")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cpus", default=None, help="shorthand for --master local[N]")
    args = ap.parse_args()

    from phenoqc_spark.operators.layout import compact_small_files
    from phenoqc_spark.session import get_spark

    master = args.master or (f"local[{args.cpus}]" if args.cpus else None)
    spark = get_spark(
        "compact-table", master=master, extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = compact_small_files(
        spark,
        args.table,
        target_file_bytes=args.target_mb * 1024 * 1024,
        sort_by=args.sort_by,
        partition_by=args.partition_by,
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
