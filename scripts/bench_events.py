"""Event-time operators at scale: sessionize / asof_join / range_join /
latest_snapshot on a 1M-event synthetic stream with a deliberately hot key.

latest_snapshot is measured against its window-form twin (row_number over
(key ORDER BY ts DESC) = 1) — the docstring's claim that the
partial-combining max_by aggregate beats the full-sort window,
especially under the hot key (30% of rows in ONE window partition).

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
    from pyspark.sql import Window, functions as F

    from phenoqc_spark.operators.sessions import (
        asof_join,
        latest_snapshot,
        range_join,
        sessionize,
    )
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

    def _window_latest(frame):
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .count()
        )

    def window_latest():
        return _window_latest(ev)

    # the payload must come FROM STORAGE: a payload derived in-plan from
    # event_id gets projected to after the window by Catalyst (it is
    # recomputable post-shuffle), hiding exactly the cost being measured
    wpath = f"/tmp/bench_events_wide_{EVENTS}"
    if not os.path.exists(wpath):
        ev.withColumn(
            "payload",
            F.concat(*[F.md5(F.concat(F.col("event_id").cast("string"), F.lit(i)))
                       for i in range(12)]),
        ).write.mode("overwrite").parquet(wpath)
    wide = spark.read.parquet(wpath)

    def window_latest_wide():
        return _window_latest(wide)

    runs = {
        "sessionize": lambda: sessionize(ev).count(),
        "asof_join": lambda: asof_join(clicks, errors).count(),
        "range_join": lambda: range_join(clicks, windows).count(),
        "latest_agg": lambda: latest_snapshot(
            ev, key_col="user_id", ts_col="ts", tiebreak_col="event_id"
        ).count(),
        "latest_window": window_latest,
        # payload-bulk variant: 384B pseudo-random payload per row — the
        # shuffle-volume regime (narrow rows sit under the shuffle floor
        # and the two forms tie; with payload the window form must move
        # and sort every capture of the hot key while the aggregate
        # form collapses it to one candidate per map partition)
        "latest_agg_wide": lambda: latest_snapshot(
            wide, key_col="user_id", ts_col="ts", tiebreak_col="event_id"
        ).count(),
        "latest_window_wide": window_latest_wide,
    }
    import glob

    def shuffle_bytes() -> int:
        """Cumulative bytes under the session's shuffle block dirs —
        per-plan delta = that plan's shuffle volume (local mode)."""
        total = 0
        for d in glob.glob("/tmp/blockmgr-*"):
            for root, _, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    for fn in runs.values():  # untimed warmup of every plan shape
        fn()
    out = {}
    for name, fn in runs.items():
        reps = []
        n = None
        sh = None
        for i in range(REPS):
            s0 = shuffle_bytes()
            t = time.time()
            n = fn()
            reps.append(round(time.time() - t, 2))
            if i == 0:  # shuffle volume is per-plan-constant
                sh = max(0, shuffle_bytes() - s0)
        out[name] = (min(reps), reps, n, sh)
    hot = ev.filter(F.col("user_id") == 0).count()
    print(f"events={EVENTS} hot_user_rows={hot} ({100.0*hot/EVENTS:.0f}%) cpus={CPUS}")
    for name, (best, reps, n, sh) in out.items():
        print(f"{name:<18} best {best}s  reps {reps}  rows {n}  shuffle {sh / 2**20:.1f} MB")
    spark.stop()


if __name__ == "__main__":
    main()
