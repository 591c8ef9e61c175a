"""Dump `.explain("formatted")` for every query touched in optimization
round 6 into plans/r06/<query>_{before,after}.txt.

"after" runs against the current tree.  "before" runs against a pristine
checkout of the round-start commit (pass its worktree path via
R6_BEFORE_TREE); the same script is used for both sides so the capture is
symmetric:

    git worktree add /tmp/r6_before <round-start-sha>
    R6_SIDE=before R6_BEFORE_TREE=/tmp/r6_before python scripts/dump_plans_r06.py
    R6_SIDE=after  python scripts/dump_plans_r06.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

SIDE = os.environ.get("R6_SIDE", "after")
TREE = (
    os.environ.get("R6_BEFORE_TREE", "/tmp/r6_before")
    if SIDE == "before"
    else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)
SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "dd_minhash_lsh",
    "dd_near_dedup",
    "dd_ngram_jaccard",
    "dd_containment",
    "dd_span_winnow",
    "txt_dup_spans",
    "txt_quality",
    "txt_repetition",
    "sim_knn_bruteforce",
    "kg_canonicalize_cc",
    "q1_pricing",
]


def captured_explain(df, max_line: int = 400) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = []
    for line in buf.getvalue().splitlines():
        if len(line) > max_line:
            line = line[:max_line] + f" …[{len(line) - max_line} chars elided]"
        out.append(line)
    return "\n".join(out) + "\n"


def main() -> None:
    sys.path.insert(0, TREE)
    from phenoqc_spark.session import get_spark

    spark = get_spark(
        f"plans-r06-{SIDE}",
        master="local[8]",
        extra_conf={"spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = {**E.queries(), **E.extra_queries()}
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in QUERIES:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{SIDE}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {SIDE} (tree: {TREE}, sf: {SF_DIR})\n")
            fh.write(captured_explain(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
