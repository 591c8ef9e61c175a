"""HyperANF at bench scale: the neighborhood-function curve over the
1M-page triple graph (the same graph the PageRank/walks benches use —
build_triples over generated pages, subj→obj edges).

Protocol (BENCH protocol: untimed warmup of the plan shape, then
best-of-REPS, reps listed): the triple graph is materialized once to
parquet, hops timed end-to-end including the per-hop totals.

Usage: HANF_PAGES_ROWS=1000000 HANF_HOPS=4 python scripts/bench_hyperanf.py
Prints a JSON line; paste into BENCH/GRAPH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("HANF_PAGES_ROWS", "1000000"))
HOPS = int(os.environ.get("HANF_HOPS", "4"))
REPS = int(os.environ.get("HANF_REPS", "2"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.sketches import effective_diameter, hyperanf
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-hyperanf",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = f"/tmp/bench_pages_{ROWS}"
    if not os.path.exists(pages_dir):
        PG.generate_pages(spark, ROWS, partitions=int(CPUS) * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    tri_path = f"/tmp/bench_triples_{ROWS}"
    if not os.path.exists(tri_path):
        run_pipeline(spark, spark.read.parquet(pages_dir), E._resolver())[
            "triples"
        ].write.mode("overwrite").parquet(tri_path)
    edges = spark.read.parquet(tri_path).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    n_edges = edges.count()

    # untimed warmup of the full plan shape (cold-JVM C2 JIT is 3-7x)
    hyperanf(edges, max_hops=1).collect()

    reps = []
    curve = None
    for _ in range(REPS):
        t0 = time.time()
        curve = [(r.hops, r.n_pairs) for r in hyperanf(edges, max_hops=HOPS).collect()]
        reps.append(round(time.time() - t0, 2))
    best = min(reps)
    print(
        json.dumps(
            {
                "bench": "hyperanf",
                "pages_rows": ROWS,
                "n_edges": n_edges,
                "hops": HOPS,
                "reps_sec": reps,
                "best_sec": best,
                "curve": curve,
                "eff_diameter_90": round(effective_diameter(curve), 3),
                "pairs_per_hour": round(curve[-1][1] * 3600.0 / best, 0),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
