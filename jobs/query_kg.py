"""Query a materialized triple table with a SPARQL-style basic graph
pattern — the spark-submit read surface for the triple factory's output.

    spark-submit --py-files phenoqc_spark.zip jobs/query_kg.py \
        --triples /data/kg/triples \
        --bgp '[["?d", "has_term", "?t"], ["?t", "is_a+", "HP:0000118"]]' \
        --closure /data/kg/isa_closure --closure-pred is_a+ \
        --limit 100 --out /data/kg/answers     # parquet; omit to print

The BGP is a JSON list of [s, p, o] patterns; ``?name`` terms are
variables, anything else is a constant pushed into the parquet scan.
``--closure`` mounts a materialized (node, ancestor) closure as a
virtual transitive predicate (``--closure-pred``, default ``is_a+``) —
SPARQL property paths at equi-join cost.

Scale posture: this is a thin driver around
:func:`phenoqc_spark.operators.triples.match_bgp` — constants reach the
scan as PushedFilters, joins are Catalyst/AQE-planned equi-joins, and
``--out`` writes distributed parquet (printing collects only
``--limit`` rows to the driver).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True, help="parquet path of (subj, pred, obj)")
    ap.add_argument("--bgp", required=True,
                    help="JSON list of [s, p, o] patterns; '?x' terms are variables")
    ap.add_argument("--closure", default=None,
                    help="parquet path of a (node, ancestor) closure for --closure-pred")
    ap.add_argument("--closure-pred", default="is_a+",
                    help="virtual transitive predicate name (default is_a+)")
    ap.add_argument("--where", default=None,
                    help="SPARQL FILTER analogue: a Spark SQL boolean "
                         "expression over the bound variables, e.g. "
                         "\"t LIKE 'HP:%' AND d <> 'd1'\"")
    ap.add_argument("--distinct", action="store_true",
                    help="set semantics (SPARQL DISTINCT) instead of the default bag")
    ap.add_argument("--limit", type=int, default=50,
                    help="rows printed when --out is omitted")
    ap.add_argument("--out", default=None, help="write full results to parquet here")
    ap.add_argument("--construct", default=None,
                    help="SPARQL CONSTRUCT analogue: JSON [s, p, o] template "
                         "of '?var' bindings / constants — emits one triple "
                         "per result row instead of bindings")
    ap.add_argument("--construct-out", default=None,
                    help="with --construct: write the constructed triples "
                         "as N-Triples ('.nt' suffix), Turtle ('.ttl', "
                         "prefixes from --prefixes) or parquet (otherwise)")
    ap.add_argument("--prefixes", default=None,
                    help="JSON {prefix: namespace} for Turtle output")
    ap.add_argument("--group-by", nargs="+", default=None,
                    help="SPARQL GROUP BY analogue: bound variable names "
                         "to group the solutions by (use with --agg)")
    ap.add_argument("--agg", nargs="+", default=["count:*"],
                    help="with --group-by: aggregates as fn:var items — "
                         "count:*, count_distinct:v, min:v, max:v, sum:v, "
                         "avg:v (SPARQL COUNT/MIN/MAX/SUM/AVG); result "
                         "columns are named fn_var")
    args = ap.parse_args()

    from phenoqc_spark.operators.triples import match_bgp
    from phenoqc_spark.session import get_spark

    patterns = [tuple(p) for p in json.loads(args.bgp)]
    spark = get_spark("kg-query")
    closures = None
    if args.closure:
        closures = {args.closure_pred: spark.read.parquet(args.closure)}
    out = match_bgp(spark.read.parquet(args.triples), patterns, closures=closures)
    if args.where:
        out = out.filter(args.where)
    if args.distinct:
        out = out.distinct()
    if args.group_by:
        from pyspark.sql import functions as F

        aggs = []
        for item in args.agg:
            fn, _, var = item.partition(":")
            name = f"{fn}_{var}".replace("*", "all")
            if fn == "count" and var == "*":
                aggs.append(F.count(F.lit(1)).alias(name))
            elif fn == "count":
                aggs.append(F.count(F.col(var)).alias(name))
            elif fn == "count_distinct":
                aggs.append(F.countDistinct(F.col(var)).alias(name))
            elif fn in ("min", "max", "sum", "avg"):
                aggs.append(getattr(F, fn)(F.col(var)).alias(name))
            else:
                raise SystemExit(f"--agg: unknown aggregate {item!r}")
        out = out.groupBy(*args.group_by).agg(*aggs)
    if args.construct:
        from pyspark.sql import functions as F

        from phenoqc_spark.operators.triples import write_ntriples, write_turtle

        tmpl = json.loads(args.construct)
        cols = [
            (F.col(t[1:]) if isinstance(t, str) and t.startswith("?") else F.lit(t)).alias(a)
            for t, a in zip(tmpl, ("subj", "pred", "obj"))
        ]
        constructed = out.select(*cols).distinct()  # CONSTRUCT is set-valued
        dest = args.construct_out or (args.out or "constructed")
        if dest.endswith(".nt"):
            write_ntriples(constructed, dest)
        elif dest.endswith(".ttl"):
            write_turtle(constructed, dest, json.loads(args.prefixes or "{}"))
        else:
            constructed.write.mode("overwrite").parquet(dest)
        n = spark.read.text(dest).count() if dest.endswith((".nt", ".ttl")) else             spark.read.parquet(dest).count()
        print(json.dumps({"constructed": n, "out": dest}))
        spark.stop()
        return
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"rows": n, "out": args.out, "columns": out.columns}))
    else:
        rows = out.limit(args.limit).collect()
        print(json.dumps({"rows_shown": len(rows), "columns": out.columns}))
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
