"""Regenerate _KG_UNICODE_EXPECTED for __spark_entry__.kg_triples_unicode.

Runs every surface of _KG_UNI_POOLS through the full resolver cascade
(exactly as the Spark query does) and prints the pinned
(column, idx, ontology, term_id) tuples to paste into __spark_entry__.py.
The pools carry unicode noise — full-width forms, zero-width chars, NBSP,
combining accents, mixed case — so the NFKC normalization byte-parity
claim is oracle-checked by the driver, not just property-tested.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from phenoqc_spark.operators import triples as T
from phenoqc_spark.session import get_spark

POOLS = E._KG_UNI_POOLS

s = get_spark(
    "gen-unicode",
    master="local[4]",
    extra_conf={"spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"},
)
rows = []
for off, (col, pool) in enumerate(POOLS.items()):
    for idx, surface in enumerate(pool):
        r = {"url": f"u{off}_{idx}", "SampleID": f"{off}_{idx}"}
        for c2 in POOLS:
            r[c2] = surface if c2 == col else ""
        rows.append(r)
recs = s.createDataFrame(rows)
bc = s.sparkContext.broadcast(E._resolver())
terms = T.terms_long(recs, list(POOLS), [])
links = T.resolve_vocab(terms, bc)
tr = T.triples(T.link_terms(terms, links)).select("subj", "pred", "obj").collect()
out = []
for r in tr:
    sid = r.subj.split("#")[1]
    off, idx = map(int, sid.split("_"))
    col, onto = r.pred.split("->")
    cols = list(POOLS)
    if col != cols[off]:
        print("UNEXPECTED cross-column triple", r)
        continue
    out.append((col, idx, onto, r.obj))
out.sort(key=lambda t: (list(POOLS).index(t[0]), t[1], t[2], t[3]))
print("N =", len(out))
for t in out:
    print(f"    {t!r},")
