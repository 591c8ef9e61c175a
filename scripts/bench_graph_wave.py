"""Graph-wave scale bench: SCC, k-truss, HyperANF, and label-propagation
communities over the SAME 1M-page pipeline triple graph the PageRank
bench uses (≈6.8M edges, hub-skewed: a few ontology-term objects absorb
millions of in-edges) — the graph a real KG-construction run hands to
its diagnostics pass.  PageRank's number (25.6 s / 10 iters) lives here
too once BENCH/GRAPH.md exists.

Each operator follows the repo bench protocol: small untimed warmup of
the same plan shape, then timed run (best-of-N where cheap; the
iterative ops are single-timed since each is minutes-scale and the
per-round localCheckpoint already amortizes lineage).

Usage: GW_PAGES=1000000 python scripts/bench_graph_wave.py [scc|ktruss|hyperanf|lpa|all]
Appends rows to BENCH/GRAPH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(os.environ.get("GW_PAGES", "1000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.operators.canonicalize import (
        ktruss,
        label_propagation,
        strongly_connected_components,
    )
    from phenoqc_spark.operators.sketches import hyperanf
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(
        "bench-graph-wave",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(CPUS) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "64g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = f"/tmp/bench_pages_{PAGES}"
    if not os.path.exists(pages_dir):
        PG.generate_pages(spark, PAGES, partitions=int(CPUS) * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    trip_dir = f"/tmp/bench_triples_{PAGES}"
    if not os.path.exists(trip_dir):
        run_pipeline(spark, spark.read.parquet(pages_dir), E._resolver())[
            "triples"
        ].write.mode("overwrite").parquet(trip_dir)
    edges = (
        spark.read.parquet(trip_dir)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .persist()
    )
    n_edges = edges.count()
    rows = []

    def bench(name, warm, run):
        warm()
        t0 = time.time()
        summary = run()
        sec = round(time.time() - t0, 2)
        rows.append({"op": name, "sec": sec, **summary})
        print(json.dumps(rows[-1]))

    small = edges.limit(50_000)

    if which in ("scc", "all"):
        bench(
            "scc",
            lambda: strongly_connected_components(small).count(),
            lambda: (lambda df: {
                "nodes": df.count(),
                "n_scc": df.select("scc_id").distinct().count(),
            })(strongly_connected_components(edges)),
        )
    if which in ("lpa", "all"):
        bench(
            "lpa_communities",
            lambda: label_propagation(small, iters=2).count(),
            lambda: (lambda df: {
                "nodes": df.count(),
                "n_communities": df.select("label").distinct().count(),
                "iters": 5,
            })(label_propagation(edges, iters=5)),
        )
    if which in ("hyperanf", "all"):
        bench(
            "hyperanf",
            lambda: hyperanf(small, max_hops=2).count(),
            lambda: {
                "curve": [
                    (int(r.hops), int(r.n_pairs))
                    for r in hyperanf(edges, max_hops=6).orderBy("hops").collect()
                ],
                "max_hops": 6,
            },
        )
    if which in ("ktruss", "all"):
        bench(
            "ktruss_k4",
            lambda: ktruss(small, k=4).count(),
            lambda: {"k": 4, "truss_edges": ktruss(edges, k=4).count()},
        )

    with open(os.path.join(REPO, "BENCH", "GRAPH.md"), "a") as fh:
        fh.write(
            f"\n## Graph wave at the {PAGES:,}-page pipeline triple graph "
            f"({n_edges:,} edges, local[{CPUS}])\n\n"
        )
        fh.write("| op | wall (s) | result |\n|---|---|---|\n")
        for r in rows:
            extras = {k: v for k, v in r.items() if k not in ("op", "sec")}
            fh.write(f"| {r['op']} | {r['sec']} | `{json.dumps(extras)}` |\n")
    spark.stop()


if __name__ == "__main__":
    main()
