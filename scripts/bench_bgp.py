"""BGP query scale bench: pattern chains, property paths, and OPTIONAL
enrichment over a synthetic triple table (no external data).

Shapes: FACTS annotation triples (doc has_term term, hub-skewed term
draw), a TERMS-term is_a hierarchy (branching B), label triples for
half the terms.  Queries:

- chain:    ?d has_term ?t . ?t is_a ?p . ?p is_a <root-child>
- path:     ?d has_term ?t . ?t is_a+ <hub ancestor>  (closure mount)
- optional: ?d has_term ?t OPTIONAL ?t label ?name

Usage: BGP_FACTS=10000000 BGP_TERMS=100000 python scripts/bench_bgp.py
Appends a row to BENCH/BGP.md.  Protocol: full untimed warmup of each
plan shape, then best-of-REPS (all reps shown).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = int(os.environ.get("BGP_FACTS", "10000000"))
TERMS = int(os.environ.get("BGP_TERMS", "100000"))
BRANCH = int(os.environ.get("BGP_BRANCH", "8"))
REPS = int(os.environ.get("BGP_REPS", "2"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.canonicalize import ancestor_closure
    from phenoqc_spark.operators.triples import match_bgp
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "bench-bgp",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def term(c):
        return F.format_string("T%07d", c)

    # hub-skewed term draw: square a uniform hash so low term ids (the
    # upper hierarchy) absorb disproportionate annotation mass
    u = F.pmod(F.xxhash64("id"), F.lit(TERMS * TERMS)).cast("double")
    ann = spark.range(FACTS).select(
        F.format_string("d%09d", F.col("id")).alias("subj"),
        F.lit("has_term").alias("pred"),
        term(F.sqrt(u).cast("long")).alias("obj"),
    )
    isa = spark.range(1, TERMS).select(
        term(F.col("id")).alias("subj"),
        F.lit("is_a").alias("pred"),
        term(((F.col("id") - 1) / BRANCH).cast("long")).alias("obj"),
    )
    lab = spark.range(0, TERMS, 2).select(
        term(F.col("id")).alias("subj"),
        F.lit("label").alias("pred"),
        F.format_string("label of term %d", F.col("id")).alias("obj"),
    )
    triples = ann.unionByName(isa).unionByName(lab)
    closure = ancestor_closure(
        isa.select(F.col("subj").alias("child"), F.col("obj").alias("parent"))
    ).persist()
    closure.count()

    root_child = "T0000001"
    hub_anc = "T0000003"

    def q_chain():
        return match_bgp(
            triples,
            [("?d", "has_term", "?t"), ("?t", "is_a", "?p"), ("?p", "is_a", root_child)],
        )

    def q_path():
        return match_bgp(
            triples,
            [("?d", "has_term", "?t"), ("?t", "is_a+", hub_anc)],
            closures={"is_a+": closure},
        )

    def q_opt():
        return match_bgp(
            triples,
            [("?d", "has_term", "?t")],
            optional=[("?t", "label", "?name")],
        )

    counts, times = {}, {}
    for name, fn in (("chain", q_chain), ("path", q_path), ("optional", q_opt)):
        counts[name] = fn().count()  # untimed warmup (C2 JIT + plan)
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            fn().count()
            reps.append(time.time() - t0)
        times[name] = reps

    row = {
        "facts": FACTS,
        "terms": TERMS,
        "branch": BRANCH,
        "cpus": int(CPUS),
        **{
            f"{n}_rows": counts[n] for n in counts
        },
        **{
            f"{n}_sec": round(min(times[n]), 2) for n in times
        },
        **{
            f"{n}_reps": [round(t, 2) for t in times[n]] for n in times
        },
        "chain_facts_per_hour_m": round(FACTS / min(times["chain"]) * 3600 / 1e6, 1),
    }
    print(json.dumps(row))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "BGP.md",
    )
    header = not os.path.exists(out)
    with open(out, "a") as fh:
        if header:
            fh.write(
                "# BENCH/BGP — triple-pattern queries at scale\n\n"
                "Protocol: full untimed warmup per plan shape, then "
                "best-of-N (all reps shown).  `*_per_hour_m` is MILLIONS "
                "of fact triples scanned per hour.  The path query runs "
                "against a persisted closure (computed once per ontology "
                "release).  Hub-skewed annotation draw (sqrt-of-uniform) "
                "— upper-hierarchy terms absorb most annotations, the "
                "adversarial case for the join keys.\n\n"
            )
        fh.write(f"- `{json.dumps(row)}`\n")
    spark.stop()


if __name__ == "__main__":
    main()
