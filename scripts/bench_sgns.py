"""SGNS training at bench scale: one full-batch epoch over the 1M-page
triple graph's (subj, obj) pairs with one pre-materialized negative per
pair (the `neg_pairs` web-scale path — no vocabulary ever reaches the
driver).

Negatives here are md5-derived corrupt targets (synthetic fresh nodes):
their *quality* is irrelevant to the measurement — the bench times the
join + zip_with scoring + posexplode gradient aggregation machinery at
corpus scale.

Usage: SGNS_PAGES_ROWS=1000000 SGNS_EPOCHS=1 python scripts/bench_sgns.py
Prints one JSON line; paste into BENCH/DEDUP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SGNS_PAGES_ROWS", "1000000"))
EPOCHS = int(os.environ.get("SGNS_EPOCHS", "1"))
D = int(os.environ.get("SGNS_D", "8"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.embeddings import sgns_train
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-sgns",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
        },
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
    tri = spark.read.parquet(tri_path)
    pos = tri.select(F.col("subj").alias("center"), F.col("obj").alias("context"))
    neg = tri.select(
        F.col("subj").alias("center"),
        F.concat(F.lit("NEG:"), F.substring(F.md5(F.concat("subj", "obj")), 1, 8)).alias(
            "context"
        ),
    )
    n_pairs = pos.count()

    # warmup: tiny run compiles the whole plan family, untimed
    sgns_train(pos.limit(5000), d=D, epochs=1, neg_pairs=neg.limit(5000))

    t0 = time.time()
    _, losses = sgns_train(pos, d=D, epochs=EPOCHS, neg_pairs=neg)
    sec = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "bench": "sgns",
                "pages_rows": ROWS,
                "pos_pairs": n_pairs,
                "d": D,
                "epochs": EPOCHS,
                "sec": sec,
                "losses": [round(l, 2) for l in losses],
                "pair_updates_per_hour": round(n_pairs * 2 * EPOCHS * 3600.0 / sec, 0),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
