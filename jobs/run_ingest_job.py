"""spark-submit entry point for the incremental corpus-ingest loop.

    spark-submit --master local[32] --py-files phenoqc_spark.zip \
        jobs/run_ingest_job.py --in /data/docs_landing \
        --out /data/docs_kept --state /data/dedup_state \
        --ckpt /data/ingest_ckpt [--threshold 0.8] [--num-hashes 64]
        [--bands 16] [--compact-after] [--cardinality-state DIR]

Each run processes exactly the parquet files that have appeared under
``--in`` since the last run (Structured Streaming file-source offsets in
the checkpoint), near-deduplicates them against the accumulated
seen-content signature state
(:func:`phenoqc_spark.streaming.pipeline.stream_near_dedup_docs` with
``availableNow``), appends survivors to ``--out`` and the batch's
signatures to ``--state`` — both as batch_id partitions with dynamic
partition overwrite, so a run killed mid-write replays idempotently
(exactly-once output; see the operator docstring and
test_stream_near_dedup_docs_replay_idempotent).  Re-running with no new
files is a no-op.  ``--compact-after`` rewrites the state to one row per
distinct content afterwards (lossless; jobs/compact_dedup_state.py is
the standalone twin for quiescent-window scheduling).

Prints one JSON line: docs kept / state rows (before and after
compaction when requested).  Reference analogue: the batch-ingest half
of PhenoQC's chunked pipeline (batch_processing.py) — re-expressed as a
checkpointed Spark streaming job rather than a driver loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True, help="landing dir (parquet, appended by the crawler)")
    ap.add_argument("--out", required=True, help="kept-docs output dir")
    ap.add_argument("--state", required=True, help="seen-content signature state dir")
    ap.add_argument("--ckpt", required=True, help="streaming checkpoint dir")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--ngram", type=int, default=2)
    ap.add_argument("--compact-after", action="store_true")
    ap.add_argument("--cardinality-state", default=None,
                    help="also maintain a per-source distinct-content HLL "
                         "sketch state at this path (own checkpoint under "
                         "<ckpt>_card) and report per-source n_distinct — "
                         "a merge-at-read state, replay-idempotent")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cpus", default=None, help="shorthand for --master local[N]")
    args = ap.parse_args()

    from phenoqc_spark.session import get_spark
    from phenoqc_spark.streaming.pipeline import stream_near_dedup_docs

    master = args.master or (f"local[{args.cpus}]" if args.cpus else None)
    spark = get_spark(
        "ingest",
        master=master,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    schema = spark.read.parquet(args.in_dir).schema
    stream = spark.readStream.schema(schema).parquet(args.in_dir)
    q = stream_near_dedup_docs(
        spark,
        stream,
        args.out,
        args.state,
        args.ckpt,
        threshold=args.threshold,
        num_hashes=args.num_hashes,
        bands=args.bands,
        n=args.ngram,
        trigger_once=True,
    )
    q.awaitTermination()

    stats = {
        "kept_total": spark.read.parquet(args.out).count(),
        "state_rows": spark.read.parquet(args.state).count(),
    }
    if args.cardinality_state:
        from pyspark.sql import functions as F

        from phenoqc_spark.streaming.pipeline import (
            read_cardinality_estimates,
            stream_cardinality_state,
        )

        key = "source" if "source" in [f.name for f in schema.fields] else None
        card_stream = spark.readStream.schema(schema).parquet(args.in_dir)
        if key is None:
            card_stream = card_stream.withColumn("source", F.lit("all"))
        card_stream = card_stream.select("source", F.md5("text").alias("h"))
        cq = stream_cardinality_state(
            spark,
            card_stream,
            args.cardinality_state,
            args.ckpt + "_card",
            ["source"],
            "h",
        )
        cq.awaitTermination()
        stats["distinct_content_per_source"] = {
            r.source: r.n_distinct
            for r in read_cardinality_estimates(
                spark, args.cardinality_state
            ).collect()
        }
    if args.compact_after:
        from phenoqc_spark.operators.dedup import compact_dedup_state

        stats["compaction"] = compact_dedup_state(spark, args.state)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
