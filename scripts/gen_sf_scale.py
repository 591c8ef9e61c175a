"""Synthesize a larger scale factor from /root/testdata/sf0.1 for LOCAL
performance measurement only (the driver generates its own large-SF data;
this replica exists so optimization work can be measured at the driver's
recorded bench scale, sf1.0 in BENCH_r05.json).

Design: K id-shifted copies of every sf0.1 table, written as ONE parquet
file per table via DuckDB (the driver's layout — single files, so scan
parallelism matches what the driver's bench sees).  Foreign keys shift
with their parents (custkey/orderkey/partkey/suppkey move together), so
join cardinalities scale linearly like the real generator's.  Document
text in copies k>0 gets every 3rd token suffixed with the copy id:
organic near-duplicate groups replicate at the SAME group size instead of
merging across copies (cross-copy shingle Jaccard ~0.2, far below the 0.8
threshold) — how a real generator's duplicate structure scales.  The
dd_* queries' injected duplicate buckets key on doc_id ranges and scale
exactly like the driver's own data.  NOT used by any query/oracle:
measurement only.

Usage: python scripts/gen_sf_scale.py [K] [outdir]
"""

from __future__ import annotations

import glob
import os
import sys

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_sf1.0"

# key column -> stride (key-space size at sf0.1, keys are 0-based);
# FK columns share the parent's stride
STRIDES = {
    "c_custkey": 15000,
    "o_custkey": 15000,
    "o_orderkey": 150000,
    "l_orderkey": 150000,
    "p_partkey": 20000,
    "l_partkey": 20000,
    "s_suppkey": 1000,
    "l_suppkey": 1000,
    "doc_id": 5000,
    "vec_id": 2000,
    "event_id": 100000,
    "user_id": 1500,
}

DIMENSIONS = {"region", "nation"}  # fixed-size dims: one copy only


def main() -> None:
    import duckdb

    con = duckdb.connect()
    os.makedirs(OUT, exist_ok=True)
    for path in sorted(glob.glob(f"{SRC}/*.parquet")):
        name = os.path.basename(path).replace(".parquet", "")
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]
        if name in DIMENSIONS:
            con.sql(f"COPY (SELECT * FROM read_parquet('{path}')) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
            print(f"{name}: dimension, copied 1x", flush=True)
            continue
        selects = []
        for k in range(K):
            exprs = []
            for c in cols:
                if c in STRIDES and k > 0:
                    exprs.append(f"{c} + {k * STRIDES[c]} AS {c}")
                elif name == "documents" and c == "text" and k > 0:
                    exprs.append(
                        rf"regexp_replace(text, '(\S+\s+\S+\s+)(\S+)', '\1\2_{k}', 'g') AS text"
                    )
                elif name == "documents" and c == "n_chars" and k > 0:
                    exprs.append(
                        rf"length(regexp_replace(text, '(\S+\s+\S+\s+)(\S+)', '\1\2_{k}', 'g')) AS n_chars"
                    )
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM read_parquet('{path}')")
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows ({K}x)", flush=True)


if __name__ == "__main__":
    main()
