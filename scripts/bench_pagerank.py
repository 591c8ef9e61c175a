"""PageRank at bench scale: the power-method operator over the triple
graph produced by the full KG pipeline at 1M pages (the same corpus the
headline bench measures), validating that the CC-shaped iterative round
(join + groupBy + localCheckpoint) holds up on the real hub-skewed
output graph — ~20 ontology-term objects absorb millions of in-edges.

Usage: PR_PAGES=1000000 PR_ITERS=10 python scripts/bench_pagerank.py
Appends a row to BENCH/DEDUP.md's graph section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(os.environ.get("PR_PAGES", "1000000"))
ITERS = int(os.environ.get("PR_ITERS", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.canonicalize import pagerank
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-pagerank",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = f"/tmp/bench_pages_{PAGES}"
    if not os.path.exists(pages_dir):
        PG.generate_pages(spark, PAGES, partitions=int(CPUS) * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    # materialize the triple graph once, untimed (the pipeline itself is
    # the headline bench's subject; here it is only the edge source) and
    # warm the join/agg machinery on a small run
    trip_dir = f"/tmp/bench_triples_{PAGES}"
    if not os.path.exists(trip_dir):
        run_pipeline(spark, spark.read.parquet(pages_dir), E._resolver())[
            "triples"
        ].write.mode("overwrite").parquet(trip_dir)
    edges = (
        spark.read.parquet(trip_dir)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .persist()
    )
    n_edges = edges.count()
    pagerank(edges.limit(50_000), iters=2).count()  # warm, untimed

    t0 = time.time()
    pr = pagerank(edges, iters=ITERS)
    row = pr.agg(
        F.count(F.lit(1)).alias("nodes"), F.sum("rank").alias("mass")
    ).collect()[0]
    sec = round(time.time() - t0, 2)

    top = pr.orderBy(F.desc("rank"), F.asc("node")).limit(3).collect()
    line = {
        "pages": PAGES,
        "edges": n_edges,
        "nodes": int(row.nodes),
        "iters": ITERS,
        "cpus": int(CPUS),
        "sec": sec,
        "rank_mass": round(float(row.mass), 9),
        "top3": [(r.node, round(r.rank, 6)) for r in top],
    }
    print(json.dumps(line))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "DEDUP.md",
        ),
        "a",
    ) as fh:
        fh.write(
            f"\nPageRank over the {PAGES:,}-page pipeline triple graph "
            f"({n_edges:,} edges, {row.nodes:,} nodes, {CPUS} cores): "
            f"{ITERS} power iterations in {sec}s "
            f"(rank mass {line['rank_mass']}, conserved by the dangling+teleport terms; "
            f"hub objects hold the top ranks: {line['top3'][0][0]} at {line['top3'][0][1]}).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
