"""Label propagation at bench scale: the synchronous LPA operator over
the triple graph produced by the full KG pipeline at 1M pages (the same
corpus the headline bench and scripts/bench_pagerank.py measure),
validating that the vote-round shape (edge join + (node, label) vote
groupBy + min_by argmax + localCheckpoint) holds on the real hub-skewed
output graph — the map-side (node, label) collapse is exactly the claim
the operator docstring makes for million-degree hubs.

Usage: LPA_PAGES=1000000 LPA_ITERS=5 python scripts/bench_lpa.py
Appends a row to BENCH/DEDUP.md's graph section.  Reuses the cached
pages/triples parquet the PageRank bench writes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(os.environ.get("LPA_PAGES", "1000000"))
ITERS = int(os.environ.get("LPA_ITERS", "5"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.canonicalize import label_propagation
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-lpa",
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
    label_propagation(edges.limit(50_000), iters=2).count()  # warm, untimed

    t0 = time.time()
    labels = label_propagation(edges, iters=ITERS)
    n_nodes = labels.count()
    sec = round(time.time() - t0, 2)

    comm = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    n_comm = comm.count()
    top = comm.orderBy(F.desc("size"), F.asc("label")).limit(3).collect()
    line = {
        "pages": PAGES,
        "edges": n_edges,
        "nodes": n_nodes,
        "iters": ITERS,
        "cpus": int(CPUS),
        "sec": sec,
        "communities": n_comm,
        "top_sizes": [int(r.size) for r in top],
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
            f"\nLabel propagation over the {PAGES:,}-page pipeline triple graph "
            f"({n_edges:,} edges, {n_nodes:,} nodes, {CPUS} cores): "
            f"{ITERS} synchronous rounds in {sec}s, {n_comm:,} communities "
            f"(largest {line['top_sizes']}; hub votes collapse map-side per "
            f"(node, label) so the vote shuffle is label-cardinality-sized, not edge-sized).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
