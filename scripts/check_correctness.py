"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and compare against oracle_sql() via DuckDB
(row count + schema-agnostic, order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()


def _norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        return round(v, 9)
    return v


def main(only=None):
    import duckdb

    import __spark_entry__ as E
    from phenoqc_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false",
    })
    con = duckdb.connect()
    from phenoqc_spark.sources.tables import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = E.queries()
    os_ = E.oracle_sql()
    # out-of-band extras: oracle-checked locally only (the driver's
    # 50-entry record window is full — see E.extra_queries docstring)
    qs = {**qs, **getattr(E, "extra_queries", dict)()}
    os_ = {**os_, **getattr(E, "extra_oracle_sql", dict)()}
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            results[name] = f"SPARK-ERR {type(ex).__name__}: {str(ex)[:200]}"
            continue
        if name not in os_:
            results[name] = f"rows-only n={len(srows)}"
            continue
        try:
            ores = con.sql(os_[name])
            orows = ores.fetchall()
            ocols = [d[0] for d in ores.description]
        except Exception as ex:
            results[name] = f"ORACLE-ERR {type(ex).__name__}: {str(ex)[:200]}"
            continue
        ok_n = len(srows) == len(orows)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok_cols = sorted(scols) == sorted(ocols)
        status = "OK" if (ok_n and sh == oh and ok_cols) else "MISMATCH"
        results[name] = (
            f"{status} rows {len(srows)}/{len(orows)} cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" hash={'=' if sh == oh else 'DIFF'} ({time.time()-t0:.1f}s)"
        )
        if status == "MISMATCH" and sh != oh and ok_n:
            sc = sorted(tuple(_norm(x) for x in tuple(r)) for r in srows)
            oc = sorted(tuple(_norm(x) for x in r) for r in orows)
            bad = [(a, b) for a, b in zip(sc, oc) if repr(a) != repr(b)][:3]
            results[name] += f"\n  first-repr-diffs: {bad}"
    spark.stop()
    width = max(len(k) for k in results)
    fails = 0
    for k in sorted(results):
        line = results[k]
        flag = "OK" in line or "rows-only" in line
        if not flag:
            fails += 1
        print(f"{k:<{width}}  {line}")
    print(f"\n{len(results)} queries, {fails} failing")
    return fails


if __name__ == "__main__":
    only = set(sys.argv[1:]) or None
    sys.exit(1 if main(only) else 0)
