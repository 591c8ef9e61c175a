"""Machine parallel-CPU ceiling diagnostic for the scaling protocol.

Measures how a *null* Spark workload — `range -> xxhash64 -> sum`, pure
whole-stage-codegen register work with no Python, no shuffle, and no
memory traffic — scales between two pinned core counts.  Any strong-
scaling shortfall here is a property of the machine (vCPU oversubscription,
all-core turbo-frequency drop), not of a query plan: it is the ceiling any
workload on this box can reach.

BENCH/BASELINE.md reports pipeline scaling both raw and normalized to this
ceiling: normalized = speedup(pipeline) / speedup(null).  On a real
multi-executor cluster the ceiling is ~1.0 (executors on separate machines
keep constant per-core frequency), so the normalized number is the one
that transfers.

Usage: python scripts/cpu_ceiling_diag.py 8 32    # prints sec per level
"""

from __future__ import annotations

import subprocess
import sys

ROWS = 40_000_000_000

CHILD = r'''
import sys, time
sys.path.insert(0, %(repo)r)
from phenoqc_spark.session import get_spark
from pyspark.sql import functions as F
cpus = sys.argv[1]
spark = get_spark("diag", master=f"local[{cpus}]", extra_conf={
    "spark.ui.enabled": "false", "spark.driver.memory": "8g"})
spark.sparkContext.setLogLevel("ERROR")
N = int(sys.argv[2])
df = spark.range(0, N, 1, int(cpus) * 4)
df.select(F.sum(F.xxhash64("id").cast("double"))).collect()  # JIT warmup
best = None
for _ in range(3):
    t0 = time.time()
    df.select(F.sum(F.xxhash64("id").bitwiseXOR(F.xxhash64("id", F.lit(1))).cast("double"))).collect()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(f"DIAG cpus={cpus} best_sec={best:.2f}")
spark.stop()
'''


def main() -> None:
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD % {"repo": repo}
    for cpus in sys.argv[1:]:
        cmd = [sys.executable, "-c", code, cpus, str(ROWS)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{int(cpus) - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        lines = [l for l in out.stdout.splitlines() if l.startswith("DIAG")]
        print(lines[-1] if lines else out.stderr[-500:])


if __name__ == "__main__":
    main()
