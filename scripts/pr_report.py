"""Triple precision/recall acceptance report (north rule: P/R ≥ 0.95 vs
the reference's emitted triples).

The ground truth is the differential oracle: the same deterministic pick
indices that generate each page's record are joined against a pool
dimension whose (surface → ontology id) entries come from the TermResolver,
which is itself pinned term-by-term to the reference's golden unit tests
(reference: tests/test_mapping.py — exact/synonym/fuzzy/threshold/alt_id/
xref/prefix cases; generalizing scripts/check_ontology_accuracy.py:45-60
from per-column exact-match to (subj, pred, obj) set P/R).

Writes BENCH/PR.md.  Usage: PR_ROWS=1000000 python scripts/pr_report.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("PR_ROWS", "1000000"))


def main() -> None:
    import __spark_entry__ as E
    from phenoqc_spark import pages as PG
    from phenoqc_spark.pipeline import run_pipeline
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        "pr-report",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    r = E._resolver()

    t0 = time.time()
    pages = PG.generate_pages(spark, ROWS, partitions=128)
    produced = run_pipeline(spark, pages, r)["triples"].select("subj", "pred", "obj")
    expected = PG.ground_truth_triples(spark, ROWS, r, partitions=128)

    # distributed set comparison — no driver collect of the triple sets
    p_cnt = produced.count()
    e_cnt = expected.count()
    tp = produced.join(expected, ["subj", "pred", "obj"], "inner").count()
    precision = tp / p_cnt if p_cnt else 0.0
    recall = tp / e_cnt if e_cnt else 0.0
    dt = time.time() - t0

    md = (
        "# BENCH/PR — triple precision/recall vs the differential reference oracle\n\n"
        f"- input: {ROWS:,} generated pages (deterministic, seed-free hash picks)\n"
        f"- produced triples: {p_cnt:,}\n"
        f"- expected triples (ground truth): {e_cnt:,}\n"
        f"- true positives: {tp:,}\n"
        f"- **precision: {precision:.6f}**\n"
        f"- **recall: {recall:.6f}**\n"
        f"- target: ≥ 0.95 each (BASELINE.json)\n"
        f"- wall: {dt:.1f}s on local[32] (includes both pipeline and oracle passes)\n\n"
        "Ground truth = the same deterministic pick indices joined against a\n"
        "pool dimension resolved by the TermResolver.  The comparison is a\n"
        "distributed set join (no driver materialization), so the same harness\n"
        "runs unchanged at any scale factor.\n\n"
        "**What this does and does not prove.**  The expected-triple oracle uses\n"
        "the same TermResolver instance as the pipeline under test, so\n"
        "P/R = 1.0 is partly circular: it validates the distributed plumbing\n"
        "(extract → explode → normalize → link → dedup preserves every mapping,\n"
        "drops none, invents none) but cannot catch a resolver-level divergence\n"
        "from the reference's mapping behavior.  The resolver itself is anchored\n"
        "separately:\n\n"
        "- tests/test_mapper.py ports the reference's golden mapping unit tests\n"
        "  (exact / synonym / fuzzy / threshold / alt_id / xref / prefix\n"
        "  cascade), including the observed dead-code semantics of the direct-ID\n"
        "  tier;\n"
        "- the fuzzy tier uses rapidfuzz's WRatio when the library is installed\n"
        "  (the reference's exact scorer); the pure-Python fallback reimplements\n"
        "  the published algorithm and is property-tested against the same\n"
        "  score cutoffs (tests — fuzzy parity cases);\n"
        "- `kg_triples_full` in the driver gate pins the resolver's output over\n"
        "  every fuzzy/prefix/junk pool surface as a hash-checked VALUES oracle\n"
        "  (__spark_entry__._KG_FULL_EXPECTED).\n\n"
        "A golden file produced by *running* the reference mapper would be a\n"
        "stronger anchor; its dependencies (pronto, rapidfuzz, requests) are not\n"
        "installable in this sandbox, so the hand-ported goldens above are the\n"
        "closest available evidence.\n"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PR.md")
    with open(out, "w") as fh:
        fh.write(md)
    print(f"P={precision:.6f} R={recall:.6f} (tp={tp:,}/{p_cnt:,} produced/{e_cnt:,} expected) -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
