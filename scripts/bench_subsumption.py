"""Subsumption-ops scale bench: ancestor closure over an HPO×10-sized
hierarchy, annotation rollup over a fact table, and pair similarity over
a fact-scale pair list.

Shapes measured (all deterministic, no external data):

- hierarchy: TERMS terms, branching B (parent of n = (n-1) // B), depth
  ~log_B(TERMS) — the dimension side.  Closure output = terms x avg
  ancestor depth.
- facts: FACTS rows annotated with leaf-biased terms (the HPO
  annotation pattern) + a coarse record key, rolled up with
  COUNT(DISTINCT rec).
- pairs: PAIRS deterministic term pairs scored with ancestor-set
  Jaccard (the linking-disagreement grading path).

Usage: SUBS_TERMS=200000 SUBS_FACTS=10000000 SUBS_PAIRS=1000000 \
       python scripts/bench_subsumption.py
Appends a row to BENCH/SUBSUMPTION.md.  Protocol: full untimed warmup
of every plan shape first (C2 JIT), then best-of-REPS timed runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = int(os.environ.get("SUBS_TERMS", "200000"))
BRANCH = int(os.environ.get("SUBS_BRANCH", "8"))
FACTS = int(os.environ.get("SUBS_FACTS", "10000000"))
PAIRS = int(os.environ.get("SUBS_PAIRS", "1000000"))
REPS = int(os.environ.get("SUBS_REPS", "2"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.canonicalize import (
        ancestor_closure,
        resnik_lin_similarity,
        rollup_counts,
        term_ic,
        term_pair_similarity,
    )
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-subsumption",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # hierarchy: term n's parent is (n-1) // BRANCH  (n >= 1; 0 is root)
    edges = spark.range(1, TERMS).select(
        F.format_string("T%07d", F.col("id")).alias("child"),
        F.format_string("T%07d", ((F.col("id") - 1) / BRANCH).cast("long")).alias(
            "parent"
        ),
    )

    def run_closure():
        c = ancestor_closure(edges)
        n = c.count()
        return c, n

    # leaf-biased facts: terms drawn from the deepest half of the id space
    facts = spark.range(FACTS).select(
        F.format_string(
            "T%07d",
            F.pmod(F.xxhash64(F.col("id")), F.lit(TERMS // 2)) + (TERMS // 2),
        ).alias("term"),
        (F.col("id") % (FACTS // 4)).alias("rec"),
    )

    pairs = spark.range(PAIRS).select(
        F.format_string(
            "T%07d", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(TERMS))
        ).alias("term_a"),
        F.format_string(
            "T%07d", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(TERMS))
        ).alias("term_b"),
    )

    # ---- full warmup of every plan shape (untimed) --------------------
    closure, n_closure = run_closure()
    closure = closure.persist()
    closure.count()
    rollup_counts(facts, closure, term_col="term", distinct_col="rec").count()
    term_pair_similarity(pairs, closure, "term_a", "term_b").agg(
        F.sum("n_common")
    ).collect()
    ic = term_ic(facts, closure, term_col="term").persist()
    ic.count()
    resnik_lin_similarity(pairs, ic, closure, "term_a", "term_b").agg(
        F.sum("resnik")
    ).collect()

    # ---- timed: closure (fresh, unpersisted plan each rep) ------------
    t_closure = []
    for _ in range(REPS):
        t0 = time.time()
        _, n = run_closure()
        t_closure.append(time.time() - t0)

    # ---- timed: rollup against the persisted closure ------------------
    t_rollup = []
    n_rollup = 0
    for _ in range(REPS):
        t0 = time.time()
        n_rollup = rollup_counts(
            facts, closure, term_col="term", distinct_col="rec"
        ).count()
        t_rollup.append(time.time() - t0)

    # ---- timed: pair similarity ----------------------------------------
    t_sim = []
    for _ in range(REPS):
        t0 = time.time()
        term_pair_similarity(pairs, closure, "term_a", "term_b").agg(
            F.sum("n_common")
        ).collect()
        t_sim.append(time.time() - t0)

    # ---- timed: resnik/lin over the same pairs (IC-struct set path) ---
    t_resnik = []
    for _ in range(REPS):
        t0 = time.time()
        resnik_lin_similarity(pairs, ic, closure, "term_a", "term_b").agg(
            F.sum("resnik")
        ).collect()
        t_resnik.append(time.time() - t0)

    row = {
        "terms": TERMS,
        "branch": BRANCH,
        "closure_rows": n_closure,
        "closure_sec": round(min(t_closure), 2),
        "closure_reps": [round(t, 2) for t in t_closure],
        "facts": FACTS,
        "rollup_rows": n_rollup,
        "rollup_sec": round(min(t_rollup), 2),
        "rollup_reps": [round(t, 2) for t in t_rollup],
        "rollup_facts_per_hour": round(FACTS / min(t_rollup) * 3600 / 1e6, 1),
        "pairs": PAIRS,
        "sim_sec": round(min(t_sim), 2),
        "sim_reps": [round(t, 2) for t in t_sim],
        "pairs_per_hour": round(PAIRS / min(t_sim) * 3600 / 1e6, 1),
        "resnik_sec": round(min(t_resnik), 2),
        "resnik_reps": [round(t, 2) for t in t_resnik],
        "resnik_pairs_per_hour": round(PAIRS / min(t_resnik) * 3600 / 1e6, 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(row))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "SUBSUMPTION.md",
    )
    header = not os.path.exists(out)
    with open(out, "a") as fh:
        if header:
            fh.write(
                "# BENCH/SUBSUMPTION — ancestor closure / rollup / pair "
                "similarity at scale\n\n"
                "Protocol: full untimed warmup of each plan shape, then "
                "best-of-N (all reps shown).  Rollup and similarity run "
                "against a persisted closure — the production shape "
                "(closure computed once per ontology release, reused by "
                "every downstream pass).\n\n"
            )
        fh.write(f"- `{json.dumps(row)}`\n")
    spark.stop()


if __name__ == "__main__":
    main()
