"""Event-time operators at scale: sessionize / asof_join / range_join on
a 1M-event synthetic stream with a deliberately hot key.

Corpus: EVENTS rows over ~35 days, 10,000 users, but user 0 owns ~30% of
all events — the hot-key stress for operators that window per user (one
key = one task).  Protocol per BENCH doctrine: full untimed warmup of
each plan shape, then best-of-REPS with all reps shown.

Usage: EVENTS=1000000 python scripts/bench_events.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("EVENTS", "1000000"))
REPS = int(os.environ.get("EVENTS_REPS", "3"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.sessions import asof_join, range_join, sessionize
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-events",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/bench_events_{EVENTS}"
    if not os.path.exists(path):
        spark.range(EVENTS).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(3_000_000))
            ).alias("ts"),
            # 30% of events land on user 0 — the hot key
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)))
            .alias("user_id"),
            F.when(F.col("id") % 7 == 0, F.lit("error"))
            .otherwise(F.lit("click"))
            .alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
        ).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error")
    windows = errors.select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )

    runs = {
        "sessionize": lambda: sessionize(ev).count(),
        "asof_join": lambda: asof_join(clicks, errors).count(),
        "range_join": lambda: range_join(clicks, windows).count(),
    }
    for fn in runs.values():  # untimed warmup of every plan shape
        fn()
    out = {}
    for name, fn in runs.items():
        reps = []
        n = None
        for _ in range(REPS):
            t = time.time()
            n = fn()
            reps.append(round(time.time() - t, 2))
        out[name] = (min(reps), reps, n)
    hot = ev.filter(F.col("user_id") == 0).count()
    print(f"events={EVENTS} hot_user_rows={hot} ({100.0*hot/EVENTS:.0f}%) cpus={CPUS}")
    for name, (best, reps, n) in out.items():
        print(f"{name:<11} best {best}s  reps {reps}  rows {n}")
    spark.stop()


if __name__ == "__main__":
    main()
