"""Two-parallelism scaling protocol (BASELINE.md): run the identical KG
pipeline on the identical input at local[8] and local[32] (4× cores) and
report throughput at both + scaling efficiency.

Each level runs in a fresh subprocess (fresh JVM) so nothing is cached
across levels.  Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SCALING_PAGES_ROWS", "300000"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cpus = sys.argv[1]
rows = int(sys.argv[2])
from phenoqc_spark.session import get_spark
spark = get_spark("scaling", master=f"local[{cpus}]", extra_conf={
    "spark.sql.shuffle.partitions": str(int(cpus) * 2),
    "spark.ui.enabled": "false",
})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from phenoqc_spark import pages as PG
from phenoqc_spark.pipeline import run_pipeline
# warm the JVM codegen + Python worker pool at the big run's partition
# count, twice, so the timed run measures steady state (excluded timing)
for _ in range(2):
    run_pipeline(spark, PG.generate_pages(spark, 5000, partitions=int(cpus) * 4), E._resolver())["triples"].count()
t0 = time.time()
pages = PG.generate_pages(spark, rows, partitions=int(cpus) * 4)
out = run_pipeline(spark, pages, E._resolver())
n = out["triples"].count()
dt = time.time() - t0
# per-stage skew evidence: max/median task time of the largest stage
print(json.dumps({"cpus": int(cpus), "rows": rows, "sec": round(dt, 2),
                  "n_triples": n, "triples_per_hour": round(n / dt * 3600, 1)}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    code = CHILD % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(ROWS)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r32["triples_per_hour"] / r8["triples_per_hour"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol (BASELINE.md): identical KG pipeline (pages → extract → parse →
link → triples) on identical deterministic input ({ROWS:,} pages, seed 42),
run at local[8] then local[32] (4× cores) in fresh JVMs; JVM/Arrow warmup
excluded from timing.

| level | wall-clock (s) | triples | triples/hour |
|---|---|---|---|
| local[8]  | {r8['sec']} | {r8['n_triples']:,} | {r8['triples_per_hour']:,} |
| local[32] | {r32['sec']} | {r32['n_triples']:,} | {r32['triples_per_hour']:,} |

**Scaling efficiency (8 → 32 cores, 4×):**
`(X32 / X8) / 4 = {eff:.3f}` — target ≥ 0.8: {"**PASS**" if eff >= 0.8 else "**FAIL**"}.

Config: spark.sql.shuffle.partitions = 2×cores; AQE on (coalesce +
skew-join); Arrow batch 10k; broadcast dictionary join for linking (fact
side never shuffled); vocabulary distinct collapses hub terms map-side.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps({"eff": round(eff, 3), "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
