import sys
sys.path.insert(0, '/root/repo')
from phenoqc_spark.session import get_spark
from pyspark.sql import functions as F
import __spark_entry__ as E
from phenoqc_spark.operators import triples as T
from phenoqc_spark.pages import PHENO_POOLS

s = get_spark('gen', master='local[4]', extra_conf={'spark.ui.enabled':'false','spark.sql.shuffle.partitions':'4'})
rows = []
for off, (col, pool) in enumerate(PHENO_POOLS.items()):
    for idx, surface in enumerate(pool):
        r = {'url': f'u{off}_{idx}', 'SampleID': f'{off}_{idx}'}
        for c2 in PHENO_POOLS:
            r[c2] = surface if c2 == col else ''
        rows.append(r)
import json
recs = s.createDataFrame(rows)
bc = s.sparkContext.broadcast(E._resolver())
terms = T.terms_long(recs, list(PHENO_POOLS), [])
links = T.resolve_vocab(terms, bc)
tr = T.triples(T.link_terms(terms, links)).select('subj','pred','obj').collect()
out = []
for r in tr:
    sid = r.subj.split('#')[1]
    off, idx = map(int, sid.split('_'))
    col, onto = r.pred.split('->')
    # only keep triples from the column we set (others were '')
    cols = list(PHENO_POOLS)
    if col != cols[off]:
        print('UNEXPECTED cross-column triple', r); continue
    out.append((col, idx, onto, r.obj))
out.sort(key=lambda t: (list(PHENO_POOLS).index(t[0]), t[1], t[2], t[3]))
print('N =', len(out))
for t in out:
    print(f'    {t!r},')
