"""Crawl-layer scale bench: the three web-input operators added in
round 5 — html_text (text extraction), extract_links (link-graph
extraction), resolve_redirects (terminal-URL resolution) — at 1M pages
/ 1M redirect sources on local[$SPARK_GRAFT_CPUS].

html_text and extract_links are map-only JVM regexp chains
(plan-asserted in tests/test_plan_shapes.py), so their numbers measure
pure whole-stage-codegen throughput over realistic page bodies;
resolve_redirects is the iterative pointer-doubling op, so its number
measures the per-round self-join + localCheckpoint shape on chains up
to length 24 with 1% of sources on cycles.

Protocol: per the repo bench doctrine — full untimed warmup of each
plan shape, then best-of-N timed reps (all reps recorded).

Usage: WEB_PAGES=1000000 python scripts/bench_web.py
Appends a section to BENCH/WEB.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(os.environ.get("WEB_PAGES", "1000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("WEB_REPS", "3"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.canonicalize import resolve_redirects
    from phenoqc_spark.operators.textstats import extract_links, html_text
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-web",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "64g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1M synthetic HTML pages: generator text wrapped in markup with
    # scripts/styles/comments/entities and 6 outlinks each (absolute,
    # root-relative, document-relative, scheme-relative, dropped-schemes)
    html_dir = f"/tmp/bench_html_{PAGES}"
    if not os.path.exists(html_dir):
        p = PG.generate_pages(spark, PAGES, partitions=int(CPUS) * 2)
        h = F.abs(F.xxhash64("url"))
        link = lambda i: F.concat(
            F.lit('<a href="'),
            F.elt(
                (F.pmod(h + i, F.lit(5)) + 1).cast("int"),
                F.format_string("https://h%d.example.org/a/p%d.html", F.pmod(h + i, F.lit(97)), h % 100000),
                F.format_string("/dir%d/page.html", F.pmod(h + i, F.lit(50))),
                F.format_string("rel%d.html", F.pmod(h + i, F.lit(30))),
                F.format_string("//h%d.example.org/s.html", F.pmod(h + i, F.lit(97))),
                F.lit("javascript:void(0)"),
            ),
            F.lit('">anchor '),
            F.pmod(h + i, F.lit(11)).cast("string"),
            F.lit("</a>"),
        )
        body = F.concat(
            F.lit("<html><head><script>var x='<p>n</p>';</script><style>.a{}</style></head><body><h1>T "),
            F.pmod(h, F.lit(7)).cast("string"),
            F.lit("</h1><!-- c --><p>"),
            F.col("text"),
            F.lit(" &amp; tail &lt;x&gt;</p>"),
            link(0), link(1), link(2), link(3), link(4), link(5),
            F.lit("</body></html>"),
        )
        p.select(
            "url", F.encode(body, "utf-8").alias("html")
        ).write.mode("overwrite").parquet(html_dir)
    pages = spark.read.parquet(html_dir)

    # 1M-source redirect map: chains up to 24 hops, 1% cycles
    redir_dir = f"/tmp/bench_redirects_{PAGES}"
    if not os.path.exists(redir_dir):
        ids = spark.range(PAGES)
        chain = F.col("id") % 25  # position within a 25-node chain
        u = lambda c: F.format_string("https://r.org/u%d", c)
        base = ids.filter(chain != 0).select(
            u(F.col("id")).alias("src"), u(F.col("id") - 1).alias("dst")
        )
        # every 100th chain head points back at its own tail -> cycle
        cyc = ids.filter((chain == 0) & (F.col("id") % 2500 == 0)).select(
            u(F.col("id")).alias("src"), u(F.col("id") + 24).alias("dst")
        )
        base.unionByName(cyc).write.mode("overwrite").parquet(redir_dir)
    redirects = spark.read.parquet(redir_dir)

    results = []

    def bench(name, make, unit_rows):
        make().count()  # warmup: full plan shape
        times = []
        n = 0
        for _ in range(REPS):
            t0 = time.time()
            n = make().count()
            times.append(round(time.time() - t0, 2))
        best = min(times)
        results.append(
            {
                "op": name,
                "sec": best,
                "all_secs": times,
                "rows_out": n,
                "rows_per_hour": round(unit_rows / best * 3600.0, 1),
            }
        )
        print(json.dumps(results[-1]))

    bench("html_text", lambda: html_text(pages), PAGES)
    bench("extract_links", lambda: extract_links(pages), PAGES)
    bench(
        "resolve_redirects",
        lambda: resolve_redirects(redirects, max_hops=32),
        redirects.count(),
    )

    with open(os.path.join(REPO, "BENCH", "WEB.md"), "a") as fh:
        if os.path.getsize(os.path.join(REPO, "BENCH", "WEB.md")) == 0:
            fh.write("# BENCH/WEB — crawl-layer operator throughput\n")
        fh.write(
            f"\n## {PAGES:,} pages / redirect sources, local[{CPUS}], best-of-{REPS} after warmup\n\n"
            "| op | best (s) | all reps (s) | rows out | input rows/hour |\n|---|---|---|---|---|\n"
        )
        for r in results:
            fh.write(
                f"| {r['op']} | {r['sec']} | {r['all_secs']} | {r['rows_out']:,} | {r['rows_per_hour']:,} |\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
