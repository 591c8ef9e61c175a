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
import json, os, shutil, sys, time
sys.path.insert(0, %(repo)r)
cpus = sys.argv[1]
rows = int(sys.argv[2])
from phenoqc_spark.session import get_spark
spark = get_spark("scaling", master=f"local[{cpus}]", extra_conf={
    "spark.sql.shuffle.partitions": str(int(cpus) * 2),
    "spark.ui.enabled": "false",
    # Memory scales with the level, as it does on a real cluster: N -> 4N
    # executors brings 4x memory, so per-core execution memory is constant
    # (2 GiB/core here).  A fixed heap would starve only the wide level
    # (same pool split across 4x concurrent tasks -> spill skews the ratio).
    "spark.driver.memory": f"{2 * int(cpus)}g",
})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from phenoqc_spark import pages as PG
from phenoqc_spark.pipeline import run_pipeline
# Production shape: the pipeline reads the pages table from parquet (the
# Iceberg-scan stand-in).  Materialize the deterministic input once per
# level (untimed), warm JVM codegen/JIT + the Python worker pool, then time
# repetitions and report the best (single-shot numbers are dominated by C2
# JIT of the generated whole-stage code and by neighbor noise on this host).
data_dir = os.environ.get("SCALING_DATA_DIR", f"/tmp/scaling_pages_{rows}")
if not os.path.exists(data_dir):
    PG.generate_pages(spark, rows, partitions=int(cpus) * 4).write.mode("overwrite").parquet(data_dir)
r = E._resolver()
pages = spark.read.parquet(data_dir)
run_pipeline(spark, pages.limit(50000), r)["triples"].count()  # warmup
times = []
n = 0
for _ in range(int(os.environ.get("SCALING_REPS", "4"))):
    t0 = time.time()
    out = run_pipeline(spark, spark.read.parquet(data_dir), r)
    n = out["triples"].count()
    times.append(time.time() - t0)
dt = min(times)
print(json.dumps({"cpus": int(cpus), "rows": rows, "sec": round(dt, 2),
                  "all_secs": [round(x, 2) for x in times],
                  "n_triples": n, "triples_per_hour": round(n / dt * 3600, 1)}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    """Run one level pinned to exactly ``cpus`` physical cores.

    ``local[N]`` only caps JVM task slots — Python UDF workers would still
    spread over every physical core, which silently un-caps the small level
    and inverts the comparison.  ``taskset`` pins the whole process tree
    (JVM + python workers) to a fixed CPU set, making N vs 4N physical.
    """
    code = CHILD % {"repo": REPO}
    cmd = [sys.executable, "-c", code, str(cpus), str(ROWS)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] != "compose":
        # single-level mode: write JSON result to BENCH/level_<n>.json
        cpus = int(_sys.argv[1])
        res = run_level(cpus)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", f"level_{cpus}.json"), "w") as fh:
            json.dump(res, fh)
        print(json.dumps(res))
        return
    if len(_sys.argv) > 1 and _sys.argv[1] == "compose":
        with open(os.path.join(REPO, "BENCH", "level_8.json")) as fh:
            r8 = json.load(fh)
        with open(os.path.join(REPO, "BENCH", "level_32.json")) as fh:
            r32 = json.load(fh)
        _write_report(r8, r32)
        return
    r8 = run_level(8)
    r32 = run_level(32)
    _write_report(r8, r32)


def _write_report(r8: dict, r32: dict) -> None:
    eff = (r32["triples_per_hour"] / r8["triples_per_hour"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol (BASELINE.md): identical KG pipeline (pages → extract → parse →
link → triples) on identical deterministic input ({ROWS:,} pages, seed 42),
run at local[8] then local[32] (4× cores) in fresh JVMs, each level
**taskset-pinned to exactly that many physical cores** (local[N] alone only
caps JVM task slots — Python UDF workers would otherwise use every core and
invert the comparison). JVM codegen + Python-worker-pool warmup excluded
from timing.

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
