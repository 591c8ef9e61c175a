"""Graph-ops stress: triangle counting on a hub-skewed synthetic graph.

Measures `graph_triangles` (degree-ordered orientation) against a naive
id-ordered orientation on the same edges, validating the docstring's
skew claim: with hubs, the naive form enumerates wedges at the hub
(O(d²) pairs) while degree ordering pushes them to low-degree corners.

Usage: GRAPH_EDGES=1000000 python scripts/bench_graph.py
Appends a row to BENCH/DEDUP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES = int(os.environ.get("GRAPH_EDGES", "1000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def naive_triangles(edges, F, Window):
    """id-ordered orientation: same join structure, no degree ordering."""
    e = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    oriented = und.filter(F.col("a") < F.col("b")).persist()
    w1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    tris = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_semi"
    )
    n = tris.count()
    oriented.unpersist()
    return n


def main() -> None:
    from pyspark.sql import Window, functions as F

    from phenoqc_spark.operators.canonicalize import graph_triangles
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-graph",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # hub-skewed: 100 hub nodes absorb half the edge endpoints
    edges = spark.range(EDGES).select(
        (F.col("id") % 200_000).alias("src"),
        F.when(F.col("id") % 2 == 0, F.xxhash64("id") % 100)
        .otherwise(F.xxhash64("id", F.lit(1)) % 150_000)
        .cast("long")
        .alias("dst"),
    ).filter(F.col("dst") >= 0)
    edges = edges.persist()
    n_edges = edges.count()

    t0 = time.time()
    out = graph_triangles(edges)
    total = out.agg(F.sum("n_triangles")).collect()[0][0] // 3
    ordered_sec = round(time.time() - t0, 2)

    t0 = time.time()
    naive_total = naive_triangles(edges, F, Window)
    naive_sec = round(time.time() - t0, 2)

    line = {
        "edges": n_edges,
        "cpus": int(CPUS),
        "triangles": int(total),
        "degree_ordered_sec": ordered_sec,
        "naive_ordered_sec": naive_sec,
        "naive_triangles": int(naive_total),
        "speedup": round(naive_sec / ordered_sec, 2),
    }
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "DEDUP.md"), "a") as fh:
        fh.write(
            f"\nGraph stress ({n_edges:,} hub-skewed edges, {CPUS} cores): "
            f"`graph_triangles` degree-ordered {ordered_sec}s vs naive id-ordered "
            f"{naive_sec}s ({line['speedup']}×); both count {total:,} triangles.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
