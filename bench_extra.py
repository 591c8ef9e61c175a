"""Extra benchmarks (guide §1.4 noop-sink isolation) — NOT the driver's
bench; see bench.py for the frozen headline methodology.

Usage: python bench_extra.py <query> [reps] [sf_dir]
Times one registry query with the noop sink, fresh plan per rep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERY = sys.argv[1] if len(sys.argv) > 1 else "dd_minhash_lsh"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "phenoqc-bench-extra",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = {**E.queries(), **E.extra_queries()}
    # warm the join/sort machinery like bench.py does
    wa = spark.range(200_000).selectExpr("id", "id % 1000 as k")
    wb = spark.range(200_000).selectExpr("id % 1000 as k", "id as v")
    (
        wa.hint("merge").join(wb, "k").groupBy("k").count().orderBy("k")
        .write.format("noop").mode("overwrite").save()
    )
    times = []
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"{QUERY} rep{i}")
        t0 = time.time()
        df = qs[QUERY](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times.append(round(dt, 3))
        print(f"rep{i}: {dt:.3f}s", flush=True)
    print(f"{QUERY} @ {SF_DIR}: {times} best={min(times)}")
    spark.stop()


if __name__ == "__main__":
    main()
