"""spark-submit entry point for dedup-state compaction.

    spark-submit --master local[32] --py-files phenoqc_spark.zip \
        jobs/compact_dedup_state.py --state /data/dedup_state \
        [--min-n-sh 1] [--coalesce 64]

Operational companion to the incremental / streaming near-dedup ingest
(operators/dedup.py::minhash_near_dedup_incremental,
streaming/pipeline.py::stream_near_dedup_docs): their contract appends
every batch's signature rows to the state table, so content re-seen in k
batches holds k identical rows.  Run this periodically (ingest quiescent)
to rewrite the state to one row per distinct content — lossless for
anchoring decisions — and optionally age out rows via a retention
predicate.  Prints one JSON line with before/after row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="parquet path of the signature state")
    ap.add_argument(
        "--min-n-sh",
        type=int,
        default=None,
        help="LOSSY retention: drop state rows with fewer than this many "
        "shingles (tiny docs rarely anchor anything)",
    )
    ap.add_argument(
        "--coalesce",
        type=int,
        default=None,
        help="target file count for the rewritten state",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from phenoqc_spark.operators.dedup import compact_dedup_state
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "compact-dedup-state",
        master=args.master,
        extra_conf={"spark.ui.enabled": "false"},
    )
    retention = F.col("n_sh") >= args.min_n_sh if args.min_n_sh else None
    stats = compact_dedup_state(
        spark, args.state, retention_filter=retention, shuffle_partitions=args.coalesce
    )
    print(json.dumps({"state": args.state, **stats}))


if __name__ == "__main__":
    main()
