"""Random-walk corpus generation at bench scale: first-order
deterministic walks over the triple graph produced by the full KG
pipeline at 1M pages (the bench_pagerank/bench_lpa corpus), validating
the O(1)-per-step claim — each step is one degree join + one (node, idx)
equi-join per walker, with NO candidate fan-out (the reason the
first-order operator, not node2vec, is the hub-skew scale path).

Usage: WK_PAGES=1000000 WK_LEN=3 python scripts/bench_walks.py
Appends a row to BENCH/DEDUP.md's graph section.  Reuses the cached
pages/triples parquet the PageRank bench writes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(os.environ.get("WK_PAGES", "1000000"))
LEN = int(os.environ.get("WK_LEN", "3"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.canonicalize import random_walks
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-walks",
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
    random_walks(edges.limit(50_000), walk_length=2).count()  # warm, untimed

    t0 = time.time()
    walks = random_walks(edges, walks_per_node=1, walk_length=LEN, seed=42)
    n_rows = walks.count()
    sec = round(time.time() - t0, 2)
    walkers = n_rows // (LEN + 1)

    line = {
        "pages": PAGES,
        "edges": n_edges,
        "walkers": walkers,
        "walk_length": LEN,
        "cpus": int(CPUS),
        "sec": sec,
        "positions_per_hour": round(n_rows / sec * 3600.0, 1),
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
            f"\nRandom walks over the {PAGES:,}-page pipeline triple graph "
            f"({n_edges:,} edges, {walkers:,} walkers, {CPUS} cores): "
            f"{LEN}-step first-order corpus in {sec}s "
            f"({line['positions_per_hour']:.3g} positions/hour; each step is "
            f"one (node, idx) equi-join per walker — no fan-out, so the "
            f"63%-hub skew of this graph costs nothing extra; node2vec's "
            f"walkers×degree fan-out is the documented non-starter here).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
