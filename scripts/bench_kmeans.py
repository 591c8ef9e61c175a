"""Distributed Lloyd k-means at bench scale: 1M synthetic 64-d vectors
(deterministic hash-derived, 16 planted centers), k=16, 3 rounds.

What the numbers mean at 100 TB: the assignment pass is Arrow-batched
map-only (corpus never shuffles), and the centroid-update shuffle is
bounded at k·d rows per partition by the map-side partial aggregate —
so per-round cost is one corpus scan + one tiny exchange, and rounds
scale linearly in corpus size.

Usage: KM_ROWS=1000000 KM_K=16 KM_ITERS=3 python scripts/bench_kmeans.py
Prints one JSON line; paste into BENCH/DEDUP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("KM_ROWS", "1000000"))
K = int(os.environ.get("KM_K", "16"))
ITERS = int(os.environ.get("KM_ITERS", "3"))
DIM = int(os.environ.get("KM_DIM", "64"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.clustering import kmeans
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-kmeans",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/bench_vecs_{ROWS}_{DIM}"
    if not os.path.exists(path):
        # planted centers: center c sits at 10*c on every axis; each
        # vector = its center + hash-derived jitter in [-1, 1)
        base = spark.range(ROWS).select(
            F.col("id").alias("vec_id"), (F.col("id") % K).alias("c")
        )
        jitter = [
            (
                F.col("c") * 10.0
                + (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(d)), F.lit(2000)) - 1000)
                / 1000.0
            ).cast("float")
            for d in range(DIM)
        ]
        base.select(
            "vec_id", F.array(*jitter).alias("embedding")
        ).write.mode("overwrite").parquet(path)
    vecs = spark.read.parquet(path)

    kmeans(vecs.limit(20_000), k=K, iters=1).count()  # untimed warmup

    reps = []
    sizes = None
    for _ in range(2):
        t0 = time.time()
        out = kmeans(vecs, k=K, iters=ITERS)
        sizes = sorted(
            r["count"] for r in out.groupBy("cluster").count().collect()
        )
        reps.append(round(time.time() - t0, 2))
    best = min(reps)
    print(
        json.dumps(
            {
                "bench": "kmeans",
                "rows": ROWS,
                "dim": DIM,
                "k": K,
                "iters": ITERS,
                "reps_sec": reps,
                "best_sec": best,
                "cluster_sizes_minmax": [sizes[0], sizes[-1]],
                "vectors_per_hour": round(ROWS * 3600.0 / best, 0),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
