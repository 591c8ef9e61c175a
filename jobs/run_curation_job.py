"""spark-submit entry point for one-call corpus curation.

    spark-submit --master local[32] --py-files phenoqc_spark.zip \
        jobs/run_curation_job.py --input /data/docs --out /data/curated \
        [--url-col url] [--near-dedup] [--min-quality 0.6] [--lang en] \
        [--benchmark /data/bench] [--redact-pii] \
        [--chunk-tokens 2048 --chunk-overlap 64] [--lazy]

Wraps :func:`phenoqc_spark.curation.curate_corpus`; prints one JSON line
with the per-stage report (row counts, or nulls with ``--lazy``) and the
output row count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of the documents table")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--latest-by", default=None,
                    help="timestamp column: with --url-col, URL dedup keeps "
                         "the NEWEST capture per canonical URL (CDX semantics)")
    ap.add_argument("--max-per-host", type=int, default=None,
                    help="with --url-col: cap documents per canonical host "
                         "(deterministic domain balancing)")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--near-threshold", type=float, default=0.8)
    ap.add_argument(
        "--near-keep-by",
        default=None,
        help="numeric column whose max picks the near-dup survivor "
        "(default: min doc id)",
    )
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--lang", action="append", default=None,
                    help="repeatable: keep only these predicted languages")
    ap.add_argument("--benchmark", default=None,
                    help="parquet path of benchmark texts to decontaminate against")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--chunk-tokens", type=int, default=None)
    ap.add_argument("--chunk-overlap", type=int, default=0)
    ap.add_argument("--lazy", action="store_true",
                    help="skip per-stage counts: one lazy plan, counts from the write")
    ap.add_argument("--report", action="store_true",
                    help="write a Markdown curation report (stage funnel + "
                         "per-source stats when --source-col is set) to <out>.report.md")
    ap.add_argument("--source-col", default=None,
                    help="with --report: input column naming the crawl source "
                         "for the per-source roll-up")
    ap.add_argument("--master", default=None)
    ap.add_argument("--log-file", default=None)
    args = ap.parse_args()

    from phenoqc_spark.curation import curate_corpus
    from phenoqc_spark.logging_utils import log_activity, setup_logging
    from phenoqc_spark.session import get_spark

    setup_logging(args.log_file)
    log_activity(f"curation job started: {vars(args)}")

    spark = get_spark("curate-corpus", master=args.master,
                      extra_conf={"spark.ui.enabled": "false"})
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    t0 = time.time()
    out, report = curate_corpus(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        url_col=args.url_col,
        latest_by=args.latest_by,
        max_per_host=args.max_per_host,
        exact_dedup=not args.no_exact_dedup,
        near_dedup=(
            {"threshold": args.near_threshold}
            | ({"keep_by": args.near_keep_by} if args.near_keep_by else {})
            if args.near_dedup
            else False
        ),
        min_quality=args.min_quality,
        languages=args.lang,
        decontaminate_against=bench,
        redact_pii=args.redact_pii,
        chunk_tokens=args.chunk_tokens,
        chunk_overlap=args.chunk_overlap,
        count_stages=not args.lazy,
    )
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    report_path = None
    if args.report:
        from phenoqc_spark.operators.textstats import corpus_source_stats
        from phenoqc_spark.report import generate_curation_report

        stages = dict(report)
        stages["written"] = n
        src_stats = None
        if args.source_col and args.source_col in docs.columns:
            src_stats = corpus_source_stats(
                docs, source_col=args.source_col, text_col=args.text_col
            )
        # sibling path — a stray .md inside the parquet dir would break
        # later spark.read.parquet(out) scans
        report_path = args.out.rstrip("/") + ".report.md"
        generate_curation_report(stages, report_path, source_stats=src_stats)
        log_activity(f"curation report -> {report_path}")
    line = json.dumps(
        {"out": args.out, "rows_out": n, "sec": round(time.time() - t0, 2),
         "stages": report, "report": report_path}
    )
    log_activity(line)
    print(line)


if __name__ == "__main__":
    main()
