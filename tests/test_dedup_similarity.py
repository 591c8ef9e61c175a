"""Dedup, similarity, text-analytics, multimodal, and streaming tests."""

import pytest
from pyspark.sql import functions as F

from phenoqc_spark.operators import dedup as D
from phenoqc_spark.operators import multimodal as M
from phenoqc_spark.operators import similarity as S
from phenoqc_spark.operators import textstats as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "el rapido zorro marron salta sobre el perro"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(docs):
    kept = D.dedup_exact(docs)
    assert kept.count() == 4
    groups = D.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 0


def test_ngram_jaccard(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_dups(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in D.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16).collect()}
    assert pairs.get((0, 1)) == 1.0
    # LSH candidates verified by exact jaccard → no false positives ≥ t
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash_near_dups(docs):
    sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert sh[0] == sh[1]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_dups(docs, max_hamming=16).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs


def test_simhash_lsh_recall_is_exact(spark):
    """Block LSH must find EVERY pair within max_hamming (recall 1.0):
    compare against brute-force hamming over all simhash pairs on a
    200-doc corpus of mutated template sentences."""
    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    ]
    rows = []
    for i in range(200):
        toks = [words[(i * 7 + j * 3) % len(words)] for j in range(12)]
        # mutate a couple of positions so near-pairs at varied hamming exist
        toks[i % 12] = words[(i * 5 + 1) % len(words)]
        if i % 3 == 0:
            toks[(i + 5) % 12] = words[(i * 11 + 2) % len(words)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for max_h in (3, 8):
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in D.simhash_near_dups(docs, max_hamming=max_h).collect()
        }
        sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
        want = {}
        ids = sorted(sh)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                h = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
                if h <= max_h:
                    want[(a, b)] = h
        assert got == want, (
            f"max_hamming={max_h}: LSH {len(got)} pairs vs brute-force "
            f"{len(want)} — missing {set(want) - set(got)}"
        )
        assert len(want) > 0  # the corpus must actually exercise the path


def test_cosine_topk(spark):
    rows = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame([(0, [1.0, 0.1])], "query_id long, query_vec array<float>")
    top = S.cosine_topk_bruteforce(emb, qdf, k=5).collect()
    assert [r.vec_id for r in top] == [0, 2, 4, 6, 8]
    assert top[0].rank == 1


def test_ann_lsh_self_retrieval(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = [(i, rng.normal(size=8).astype(float).tolist()) for i in range(50)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.cosine_topk_lsh(emb, qdf, dim=8, k=3, n_planes=6).collect()
    # every query's own vector is in the same bucket → rank 1, cosine 1.0
    top1 = {r.query_id: r for r in out if r.rank == 1}
    for qid in (0, 1, 2):
        assert top1[qid].vec_id == qid and abs(top1[qid].cosine - 1.0) < 1e-6


def test_ann_ivf_self_retrieval_and_recall(spark):
    import numpy as np

    # 4 well-separated clusters so the coarse quantizer has real structure
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(4, 8)) * 5.0
    vecs = [
        (i, (centers[i % 4] + rng.normal(size=8) * 0.2).astype(float).tolist())
        for i in range(80)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.cosine_topk_ivf(emb, qdf, k=5, n_centroids=4, n_probe=1).collect()
    top1 = {r.query_id: r for r in out if r.rank == 1}
    for qid in range(4):
        # own cluster probed -> self at rank 1
        assert top1[qid].vec_id == qid and abs(top1[qid].cosine - 1.0) < 1e-6
    # recall@5 vs brute force with 1 probe on clustered data
    exact = S.cosine_topk_bruteforce(emb, qdf, k=5).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in out}
    assert len(ex & ap) / len(ex) >= 0.8


def test_pq_encode_and_adc_recall(spark):
    import numpy as np

    # clustered 16-dim corpus: PQ codes must preserve neighborhood enough
    # for high ADC recall vs exact cosine
    rng = np.random.RandomState(11)
    centers = rng.normal(size=(6, 16)) * 3.0
    vecs = [
        (i, (centers[i % 6] + rng.normal(size=16) * 0.15).astype(float).tolist())
        for i in range(120)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    books = S.pq_train(emb, m=4, ksub=8, sample_n=120, seed=3)
    assert len(books) == 4 and all(len(b[0]) == 4 for b in books)
    codes = S.pq_encode(emb, books)
    first = codes.orderBy("vec_id").collect()
    assert all(len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes) for r in first)
    # deterministic: re-encoding yields identical codes
    again = codes.orderBy("vec_id").collect()
    assert [r.codes for r in first] == [r.codes for r in again]
    # NOTE: no same-cluster code-agreement assertion — k-means freely
    # splits one cluster across two sub-centroids (observed ~50/50 on this
    # fixture), which ADC handles fine; the neighborhood contract is the
    # recall assertion below, not code equality.

    qdf = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    adc = S.cosine_topk_pq(codes, qdf, books, k=10).collect()
    exact = S.cosine_topk_bruteforce(emb, qdf, k=10).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in adc}
    # ADC alone ranks at code granularity: coarse (cluster-level) recall
    # only — every hit in the right cluster, modest set overlap
    assert len(ex & ap) / len(ex) >= 0.4, len(ex & ap) / len(ex)
    for r in adc:
        assert r.vec_id % 6 == r.query_id % 6
    # production second stage: exact re-rank of the ADC shortlist
    rer = S.cosine_topk_pq(codes, qdf, books, k=10, rerank=emb, rerank_factor=3).collect()
    rr = {(r.query_id, r.vec_id) for r in rer}
    assert len(ex & rr) / len(ex) >= 0.9, len(ex & rr) / len(ex)
    top1 = {r.query_id: (r.vec_id, r.cosine) for r in rer if r.rank == 1}
    for qid, (vid, cos) in top1.items():
        assert vid == qid and abs(cos - 1.0) < 1e-6  # self-retrieval


def test_ivf_pq_composed_retrieval(spark):
    """IVF cell pruning → PQ ADC → exact re-rank: on clustered data with
    every relevant cell probed, results match brute force at high recall
    and self-retrieval holds."""
    import numpy as np

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(4, 16)) * 4.0
    vecs = [
        (i, (centers[i % 4] + rng.normal(size=16) * 0.1).astype(float).tolist())
        for i in range(100)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    C = S.ivf_centroids(emb, n_centroids=4, seed=9)
    books = S.pq_train(emb, m=4, ksub=8, sample_n=100, seed=9)
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.cosine_topk_ivf_pq(emb, qdf, C, books, k=5, n_probe=1, rerank_factor=4).collect()
    top1 = {r.query_id: r for r in out if r.rank == 1}
    for qid in range(4):
        assert top1[qid].vec_id == qid and abs(top1[qid].cosine - 1.0) < 1e-6
    exact = S.cosine_topk_bruteforce(emb, qdf, k=5).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    got = {(r.query_id, r.vec_id) for r in out}
    assert len(ex & got) / len(ex) >= 0.8, len(ex & got) / len(ex)


def test_regime_probe_and_auto_routing(spark):
    import warnings as W

    import numpy as np

    # clustered corpus → LSH-suitable; isotropic → not
    rng = np.random.RandomState(11)
    centers = rng.normal(size=(6, 16)) * 3.0
    clustered = spark.createDataFrame(
        [
            (i, (centers[i % 6] + rng.normal(size=16) * 0.15).astype(float).tolist())
            for i in range(120)
        ],
        "vec_id long, embedding array<float>",
    )
    iso = spark.createDataFrame(
        [(i, rng.normal(size=16).astype(float).tolist()) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    pc = S.probe_cosine_regime(clustered, sample_n=120)
    pi = S.probe_cosine_regime(iso, sample_n=120)
    assert pc["lsh_suitable"] and pc["regime"] == "clustered"
    assert not pi["lsh_suitable"] and pi["regime"] == "isotropic"

    # cosine_topk_lsh warns on the isotropic corpus, silent on clustered
    q = clustered.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qi = iso.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        S.cosine_topk_lsh(iso, qi, dim=16, k=5).collect()
    assert any("recall will be poor" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        S.cosine_topk_lsh(clustered, q, dim=16, k=5).collect()
    assert not any("recall will be poor" in str(w.message) for w in rec)

    # auto routes clustered→LSH-quality results, isotropic→IVF; both must
    # agree closely with brute force on their own corpus
    for corpus, qq in ((clustered, q), (iso, qi)):
        got = {
            (r.query_id, r.vec_id)
            for r in S.cosine_topk_auto(corpus, qq, dim=16, k=5).collect()
        }
        exact = {
            (r.query_id, r.vec_id)
            for r in S.cosine_topk_bruteforce(corpus, qq, k=5).collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= 0.8, (recall, corpus is iso)


def test_pq_string_query_ids_and_zero_norm_encode(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vecs = [(i, rng.normal(size=8).astype(float).tolist()) for i in range(1, 40)]
    vecs.append((0, [0.0] * 8))  # all-zero corpus vector
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    books = S.pq_train(emb, m=2, ksub=4, sample_n=40, seed=1)
    codes = S.pq_encode(emb, books).collect()
    # zero-norm vector encodes to valid (non-null) codes
    zero = [r for r in codes if r.vec_id == 0][0]
    assert zero.codes is not None and all(c is not None for c in zero.codes)
    # string query ids flow through the ADC join (query_id type is derived
    # from the input frame, not hardcoded long)
    qdf = spark.createDataFrame(
        [("qa", vecs[0][1]), ("qb", vecs[1][1])],
        "query_id string, query_vec array<float>",
    )
    out = S.cosine_topk_pq(
        S.pq_encode(emb, books), qdf, books, k=5
    ).collect()
    assert {r.query_id for r in out} == {"qa", "qb"}


def test_pq_plan_is_map_only(spark):
    from tests.test_plan_shapes import plan_text

    vecs = [(i, [float(i), 1.0, 0.5, 2.0]) for i in range(20)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    books = S.pq_train(emb, m=2, ksub=4, sample_n=20)
    txt = plan_text(S.pq_encode(emb, books))
    assert "Exchange" not in txt and "Join" not in txt, txt


def test_embedding_near_dups(spark):
    base = [(0, [1.0, 2.0, 3.0, 4.0]), (1, [-4.0, 3.0, -2.0, 1.0])]
    dups = [(10, [2.0, 4.0, 6.0, 8.0])]  # same direction as 0
    emb = spark.createDataFrame(base + dups, "vec_id long, embedding array<float>")
    pairs = S.embedding_near_dups(emb, dim=4, threshold=0.99, n_planes=6).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 10)}


def test_textstats(docs):
    t = {r.doc_id: r for r in X.token_count(docs).collect()}
    assert t[0].n_tokens == 9
    q = {r.doc_id: r for r in X.quality_score(docs).collect()}
    assert q[0].quality_score >= 0.8  # clean english sentence
    l = {r.doc_id: r.lang_pred for r in X.language_id(docs).collect()}
    assert l[0] == "en" and l[4] == "es"
    f = {r.doc_id: r.fp for r in X.fingerprint(docs).collect()}
    assert f[0] == f[1] and f[0] != f[2]


def test_multimodal_features(spark):
    media = M.synthesize_media(spark, 30)
    feats = M.extract_features(media, dim=8).collect()
    assert len(feats) == 30
    v = feats[0].feature
    assert len(v) == 8 and abs(sum(x * x for x in v) - 1.0) < 1e-9
    with pytest.raises(NotImplementedError):
        M.extract_features(media, decode="real")


def test_frame_sample_plan(spark):
    media = M.synthesize_media(spark, 20)
    plan = M.frame_sample_plan(media, every_ms=100000)
    row = plan.groupBy("media_id").count().first()
    assert row["count"] >= 1


def test_streaming_triples(spark, resolver, tmp_path):
    from phenoqc_spark import pages as PG
    from phenoqc_spark.streaming import stream_triples

    src = str(tmp_path / "pages_in")
    PG.generate_pages(spark, 150, partitions=2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")
    query = stream_triples(spark, stream, resolver, out, ckpt)
    query.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) >= {"subj", "pred", "obj"}


def test_corpus_source_stats(spark):
    rows = [
        (0, "the quick brown fox", "en", "srcA"),
        (1, "the quick brown fox", "en", "srcA"),   # exact dup within srcA
        (2, "short", "en", "srcA"),
        (3, "ein ganz anderer text hier", "de", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r.source: r for r in X.corpus_source_stats(df).collect()}
    a = got["srcA"]
    assert a.n_docs == 3 and a.total_tokens == 4 + 4 + 1
    assert abs(a.dup_rate - (1 - 2 / 3)) < 1e-6
    assert a.n_langs == 1 and abs(a.short_doc_share - 1.0) < 1e-6
    b = got["srcB"]
    assert b.n_docs == 1 and b.dup_rate == 0.0 and b.n_langs == 1


def test_corpus_source_stats_without_lang_column(spark):
    """A corpus with no 'lang' column must not raise: the n_langs aggregate
    is skipped, the rest is unchanged."""
    rows = [(0, "one two three", "srcA"), (1, "one two three", "srcA")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = X.corpus_source_stats(df).collect()
    assert len(got) == 1 and "n_langs" not in got[0].asDict()
    assert got[0].n_docs == 2 and abs(got[0].dup_rate - 0.5) < 1e-6


def test_stream_source_counters_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState counters accumulate across micro-batches and
    across query restarts from the same checkpoint (state-store resume)."""
    from phenoqc_spark.streaming import stream_source_counters

    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(0, "one two three", "en", "srcA"), (1, "uno dos", "es", "srcB")]
    spark.createDataFrame(b1, "doc_id long, text string, lang string, source string").write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    out_dir = str(tmp_path / "counters_out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                out_dir
            )

        q = (
            stream_source_counters(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        latest = {}
        for r in rows:
            if r.source not in latest or r.batch_id > latest[r.source][0]:
                latest[r.source] = (r.batch_id, r.n_docs, r.n_tokens)
        return {s: (v[1], v[2]) for s, v in latest.items()}

    got1 = run_once()
    assert got1["srcA"] == (1, 3) and got1["srcB"] == (1, 2)

    b2 = [(2, "four five six seven", "en", "srcA")]
    spark.createDataFrame(b2, "doc_id long, text string, lang string, source string").write.mode(
        "append"
    ).parquet(src)
    got2 = run_once()
    # srcA counter resumed from state: 1+1 docs, 3+4 tokens
    assert got2["srcA"] == (2, 7)


def test_ngram_max_doc_freq_and_release(spark):
    """The df-cut drops hub-shingle-only pairs from candidate generation but
    never changes a reported jaccard; release_intermediates frees caches."""
    rows = [
        # 0/1 share distinctive shingles; 2..5 share ONLY the hub bigram
        (0, "unique alpha beta hub tok"),
        (1, "unique alpha beta hub tok"),
        (2, "hub tok aaa bbb"),
        (3, "hub tok ccc ddd"),
        (4, "hub tok eee fff"),
        (5, "hub tok ggg hhh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(df, n=2, threshold=0.2).collect()
    }
    # hub-only pairs exist in the exact output (jaccard 1/7 < 0.2 filtered;
    # use low threshold so they'd appear)
    capped_df = D.ngram_jaccard_pairs(df, n=2, threshold=0.2, max_doc_freq=2)
    capped = {(r.doc_a, r.doc_b): r.jaccard for r in capped_df.collect()}
    # the 0-1 identical pair survives the cut with an UNCHANGED jaccard
    assert capped[(0, 1)] == exact[(0, 1)] == 1.0
    # every capped pair's jaccard matches the exact run (values never change)
    for k, v in capped.items():
        assert exact[k] == v
    # pairs connected ONLY via the hub shingle ('hub tok' appears in 5 sets
    # > cap 2) are dropped from candidates
    assert (2, 3) in exact and (2, 3) not in capped
    # lifecycle: unpersist attached intermediates without error
    sc = spark.sparkContext._jsc.sc()
    D.release_intermediates(capped_df)
    assert getattr(capped_df, "_phenoqc_persisted") == []
    D.release_intermediates(capped_df)  # idempotent, no-op


def test_minhash_near_dedup_keeplist(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near dup of 0
        (3, "completely different text about spark engines"),
        (4, "tiny"),                                          # <n words: always kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept_df = D.minhash_near_dedup(df, threshold=0.5, num_hashes=32, bands=16)
    kept = sorted(r.doc_id for r in kept_df.collect())
    D.release_intermediates(kept_df)
    # 0/1/2 cluster together -> keep 0; 3 and 4 survive
    assert kept == [0, 3, 4]


def _py_winnow(text, k, w):
    """Driver-side winnowing twin (md5 60-bit hash path)."""
    import hashlib
    import re

    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(toks) < k:
        return set()
    grams = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[1:16], 16)
        for i in range(len(toks) - k + 1)
    ]
    if len(grams) < w:
        return set()
    return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}


def test_winnow_fingerprints_match_python_twin(spark):
    """Winnowing fingerprint sets must equal the sequential twin exactly
    (md5 hash path), including the short-doc empty cases, and the plan
    must stay map-only."""
    import random

    from tests.test_plan_shapes import plan_text

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
            for i in range(25)]
    rows += [(100, ""), (101, "one two three")]  # empty + shorter than k
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 4, 3
    got = {}
    fps = D.winnow_fingerprints(df, k=k, window=w, hash_fn="md5")
    for r in fps.collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _py_winnow(text, k, w), doc_id
    txt = plan_text(fps)
    assert "Exchange" not in txt and "Join" not in txt, txt


def test_shared_span_pairs_detects_copied_run(spark):
    """Docs sharing a verbatim run of >= k+window-1 tokens must pair
    (pigeonhole guarantee); unrelated docs must not; max_df drops
    boilerplate fingerprints held by too many docs."""
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, f"intro words here {span} and then something else entirely"),
        (1, f"totally different start {span} closing remarks done now"),
        (2, "no overlap at all just independent content words everywhere"),
    ]
    # 10 docs all sharing a boilerplate footer span
    boiler = "subscribe to our newsletter for updates and offers today friends"
    rows += [(10 + i, f"unique lead {i} text piece {boiler}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in
             D.shared_span_pairs(df, k=5, window=3, min_shared=1).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    # footer clique present without max_df...
    assert (10, 11) in pairs
    # ...and cut by max_df=5 (the span sits in 10 docs), while the real
    # 2-doc copy survives
    cut = {(r.doc_a, r.doc_b) for r in
           D.shared_span_pairs(df, k=5, window=3, min_shared=1, max_df=5).collect()}
    assert (0, 1) in cut and (10, 11) not in cut


def test_minhash_near_dedup_keep_by_quality(spark):
    """keep_by policy: the cluster survivor is the argmax of the score
    column (min-id tiebreak), and null scores never win over non-null."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", 1.0),
        (1, "the quick brown fox jumps over the lazy dog", 5.0),   # best
        (2, "the quick brown fox jumps over the lazy cat", 3.0),
        (3, "completely different text about spark engines", None),
        (4, "entirely unrelated words concerning database tuning", 2.0),
        (5, "the quick brown fox jumps over the lazy rat", 5.0),   # ties 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, quality double")
    kept_df = D.minhash_near_dedup(
        df, threshold=0.5, num_hashes=32, bands=16, keep_by="quality"
    )
    kept = sorted(r.doc_id for r in kept_df.collect())
    D.release_intermediates(kept_df)
    # cluster {0,1,2,5}: max quality 5.0 held by 1 and 5 -> min-id tiebreak
    # keeps 1; singleton 3 survives despite null score; 4 survives
    assert kept == [1, 3, 4]


def test_stream_dedup_docs_across_batches(spark, tmp_path):
    """Streaming exact dedup suppresses duplicates across micro-batches via
    the state store (second run from the same checkpoint sees batch-1
    fingerprints)."""
    from phenoqc_spark.streaming import stream_dedup_docs

    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    b1 = [(0, "hello world"), (1, "something else")]
    spark.createDataFrame(b1, "doc_id long, text string").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream_dedup_docs(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())

    assert run_once() == [0, 1]
    # batch 2: one dup of doc 0 (different id), one new text
    b2 = [(2, "hello   WORLD"), (3, "fresh content")]
    spark.createDataFrame(b2, "doc_id long, text string").write.mode("append").parquet(src)
    assert run_once() == [0, 1, 3]  # doc 2 suppressed by cross-batch state


def test_fs_path_exists_resolves_uri_scheme(spark, tmp_path):
    """The streaming state probe must go through the Hadoop FileSystem of
    the path's own scheme (file://, hdfs://, s3a:// …), not the driver's
    local os.path — exercised here with explicit file:// URIs."""
    from phenoqc_spark.streaming.pipeline import _fs_path_exists

    p = tmp_path / "state"
    assert not _fs_path_exists(spark, f"file://{p}")
    p.mkdir()
    assert _fs_path_exists(spark, f"file://{p}")
    assert _fs_path_exists(spark, str(p))  # scheme-less also resolves


def test_stream_near_dedup_docs_across_batches(spark, tmp_path):
    """Streaming NEAR-dedup: micro-batches dedupe against the accumulated
    parquet signature state — a near-duplicate (not byte-equal) of a
    batch-1 doc arriving in batch 2 is suppressed."""
    from phenoqc_spark.streaming.pipeline import stream_near_dedup_docs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    src = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "kept")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(0, f"{base} one"), (1, "totally different text with its own words here")]
    spark.createDataFrame(b1, "doc_id long, text string").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_near_dedup_docs(
            spark, stream, out_dir, state, ckpt, threshold=0.7, num_hashes=32, bands=8
        )
        q.awaitTermination(120)
        return sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())

    assert run_once() == [0, 1]
    # batch 2: near-dup of doc 0 (one word changed), plus a fresh doc
    b2 = [(2, f"{base} two"), (3, "yet another unrelated document body entirely")]
    spark.createDataFrame(b2, "doc_id long, text string").write.mode("append").parquet(src)
    assert run_once() == [0, 1, 3]  # doc 2 near-matches state → suppressed


def test_stream_near_dedup_docs_replay_idempotent(spark, tmp_path):
    """Kill-and-resume: replaying a micro-batch whose checkpoint commit was
    lost (crash after the output/state writes, before the commit) must not
    duplicate output rows, must not grow the state, and — critically — must
    not anchor the batch against its OWN partially-appended signatures
    (which would suppress every document in the replayed batch)."""
    import os
    import shutil

    from phenoqc_spark.streaming.pipeline import stream_near_dedup_docs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    src = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "kept")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(0, f"{base} one"), (1, "totally different text with its own words here")]
    spark.createDataFrame(b1, "doc_id long, text string").write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_near_dedup_docs(
            spark, stream, out_dir, state, ckpt, threshold=0.7, num_hashes=32, bands=8
        )
        q.awaitTermination(120)
        return sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())

    assert run_once() == [0, 1]
    # batch 2: near-dup of doc 0 plus a fresh doc
    b2 = [(2, f"{base} two"), (3, "yet another unrelated document body entirely")]
    spark.createDataFrame(b2, "doc_id long, text string").write.mode("append").parquet(src)
    assert run_once() == [0, 1, 3]
    state_rows = spark.read.parquet(state).count()

    # Simulate the crash window: batch 1's output and state partitions are
    # on disk but its checkpoint commit is gone → restart replays batch 1
    # with the SAME batch_id over the SAME logged offsets.
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local ChecksumFileSystem sidecar
        os.remove(crc)
    assert run_once() == [0, 1, 3]  # no dup rows, doc 3 not self-suppressed
    assert spark.read.parquet(state).count() == state_rows  # state unchanged
    shutil.rmtree(out_dir)


def test_run_ingest_job_end_to_end(spark, tmp_path):
    """The spark-submit ingest loop: each run processes only new landing
    files (checkpoint offsets), anchors against the accumulated state,
    is a no-op without new data, and keeps anchoring correctly after a
    --compact-after state rewrite (batch_id preserved as first sighting)."""
    import json
    import subprocess
    import sys

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    land = str(tmp_path / "landing")
    out, state, ckpt = (str(tmp_path / d) for d in ("kept", "state", "ckpt"))

    def run(*extra):
        proc = subprocess.run(
            [sys.executable, "jobs/run_ingest_job.py", "--in", land,
             "--out", out, "--state", state, "--ckpt", ckpt,
             "--threshold", "0.7", "--num-hashes", "32", "--bands", "8",
             "--cpus", "2", *extra],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def land_docs(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(land)

    land_docs([(0, f"{base} one"), (1, "totally different text with its own words here")])
    assert run()["kept_total"] == 2
    assert run()["kept_total"] == 2  # no new files → no-op resume
    land_docs([(2, f"{base} two"), (3, "yet another unrelated document body entirely")])
    s = run("--compact-after")
    assert s["kept_total"] == 3  # doc 2 anchored to batch-1 content
    assert s["compaction"]["rows_after"] <= s["compaction"]["rows_before"]
    # post-compaction: anchoring must still work (batch_id survived)
    land_docs([(4, f"{base} three"), (5, "a completely fresh fifth document text")])
    assert run()["kept_total"] == 4  # doc 4 anchored, doc 5 kept
    kept_ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept_ids == [0, 1, 3, 5]


def test_redact_pii(spark):
    rows = [
        (0, "contact me at jo.doe+x@example.org or 192.168.0.1 thanks"),
        (1, "call +1 555-123-4567 now"),
        (2, "clean text only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.redact_pii(df).collect()}
    assert got[0].n_emails == 1 and got[0].n_ips == 1 and got[0].n_phones == 0
    assert "<EMAIL>" in got[0].text_redacted and "<IP>" in got[0].text_redacted
    assert "example.org" not in got[0].text_redacted
    assert "<PHONE>" in got[1].text_redacted
    assert got[1].n_phones == 1 and got[1].n_emails == 0 and got[1].n_ips == 0
    assert got[2].text_redacted == "clean text only" and got[2].n_phones == 0


def test_minhash_near_dedup_incremental_matches_full(spark):
    """Incremental batch dedup against the seen-content state table must
    equal re-running the batch operator over old ∪ new and keeping the new
    rows (new ids sort after old ids)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def doc(i, kind):
        if kind == "group":  # near-dup family g
            g = i % 3
            return f"{base} family {g} shared run of words {g}"
        if kind == "variant":  # near-dup of family g with one token changed
            g = i % 3
            return f"{base} family {g} shared run of words changed{i}"
        return f"totally unique content {i} with distinct tokens t{i} u{i} v{i} w{i} x{i}"

    b1 = [(i, doc(i, "group" if i % 4 == 0 else ("variant" if i % 4 == 1 else "uniq")))
          for i in range(40)]
    b2 = [(100 + i, doc(i, "group" if i % 5 == 0 else ("variant" if i % 5 == 1 else "uniq")))
          for i in range(40)]
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    df2 = spark.createDataFrame(b2, "doc_id long, text string")

    full = D.minhash_near_dedup(
        df1.unionByName(df2), threshold=0.7, num_hashes=32, bands=8
    )
    want_new = {r.doc_id for r in full.collect() if r.doc_id >= 100}

    state = D.minhash_doc_sets(df1, num_hashes=32)  # ALL seen batch-1 contents
    inc = D.minhash_near_dedup_incremental(
        df2, state, threshold=0.7, num_hashes=32, bands=8
    )
    got_new = {r.doc_id for r in inc.collect()}
    assert got_new == want_new, (sorted(got_new ^ want_new))
    # sanity: some batch-2 docs dropped (anchored to batch 1), some kept
    assert got_new and len(got_new) < df2.count()


def test_compact_dedup_state_lossless(spark, tmp_path):
    """Compacting the append-only signature state (duplicate set_hash rows
    from re-seen content across batches) must not change incremental
    anchoring decisions, and must actually shrink the state."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = [(i, f"{base} family {i % 3} shared run of words {i % 3}") for i in range(12)]
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    state_path = str(tmp_path / "state")
    cols = ["set_hash", "sig", "n_sh", "sh_set"]
    sets1 = D.minhash_doc_sets(df1, num_hashes=32).select(cols)
    # simulate three batches re-seeing the same contents: 3x appends
    for _ in range(3):
        sets1.write.mode("append").parquet(state_path)
    before = spark.read.parquet(state_path).count()

    b2 = [(100 + i, f"{base} family {i % 3} shared run of words changed{i}")
          for i in range(9)] + [(200, "fresh unique content q r s t u v w x y z")]
    df2 = spark.createDataFrame(b2, "doc_id long, text string")

    def run_inc():
        st = spark.read.parquet(state_path)
        return {
            r.doc_id
            for r in D.minhash_near_dedup_incremental(
                df2, st, threshold=0.7, num_hashes=32, bands=8
            ).collect()
        }

    kept_before = run_inc()
    stats = D.compact_dedup_state(spark, state_path)
    assert stats["rows_before"] == before
    assert stats["rows_after"] == sets1.select("set_hash").distinct().count()
    assert stats["rows_after"] < stats["rows_before"]
    assert run_inc() == kept_before
    # the swap leaves no staging dirs behind
    import os

    assert not os.path.exists(state_path + "__compacting")
    assert not os.path.exists(state_path + "__old")


def test_repetition_stats(spark):
    rows = [
        # 4 lines, "same line" repeats twice more (2 repeats of 9 chars);
        # 9 words, 5 distinct → dup_word_frac = 1 - 5/9
        (0, "same line\nsame line\nsame line\nunique words here"),
        (1, "all fresh words never repeating once"),
        (2, ""),
        # "a b a b a b": bigrams = [a b, b a, a b, b a, a b]; top 'a b'
        # occurs 3× (len 3) → mass 9 over 11 chars
        (3, "a b a b a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.repetition_stats(df).collect()}
    assert got[0].dup_line_frac == 0.5  # 2 of 4 lines are repeats
    assert got[0].dup_line_char_frac == round(18 / len(rows[0][1]), 6)
    assert got[0].dup_word_frac == round(1 - 5 / 9, 6)
    assert got[1].dup_line_frac == 0.0 and got[1].dup_word_frac == 0.0
    assert got[2].dup_line_frac == 0.0 and got[2].top_bigram_char_frac == 0.0
    assert got[3].top_bigram_char_frac == round(9 / 11, 6)
    assert got[3].dup_word_frac == round(1 - 2 / 6, 6)


def test_linear_classifier_matches_numpy_and_is_map_only(spark):
    """Broadcast linear-model scoring must match the numpy sigmoid dot
    to double precision, drop null/wrong-dimension vectors at the filter
    (never silently pass an unscorable row), and stay one map-only
    codegen stage (no Exchange/Join/Python in the plan)."""
    import numpy as np

    from phenoqc_spark.operators.classify import classifier_filter, linear_score
    from tests.test_plan_shapes import plan_text

    rng = np.random.RandomState(3)
    X_ = rng.normal(0, 1, (50, 8))
    w = rng.normal(0, 0.5, 8)
    rows = [(i, [float(x) for x in X_[i]]) for i in range(50)]
    rows += [(50, None), (51, [1.0, 2.0])]  # null + wrong-dim vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(5)

    scored = {r.vec_id: r.score for r in linear_score(df, w, bias=0.2).collect()}
    want = 1.0 / (1.0 + np.exp(-(X_.astype(np.float32).astype(np.float64) @ w + 0.2)))
    for i in range(50):
        assert abs(scored[i] - want[i]) < 1e-12
    assert scored[50] is None and scored[51] is None

    kept = classifier_filter(df, w, bias=0.2, threshold=0.5)
    kept_ids = {r.vec_id for r in kept.collect()}
    assert kept_ids == {i for i in range(50) if want[i] >= 0.5}

    # plan shape on the raw (un-repartitioned) input: the operator itself
    # must add no Exchange/Join/Python — one codegen'd map stage
    plain = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    txt = plan_text(classifier_filter(plain, w, bias=0.2, threshold=0.5))
    assert "Exchange" not in txt and "Join" not in txt, txt
    # pure JVM codegen, no Arrow/Python eval nodes (the scan's RDD name
    # mentions Python because the fixture comes from createDataFrame)
    assert "ArrowEvalPython" not in txt and "BatchEvalPython" not in txt, txt

    raw = {r.vec_id: r.score for r in
           linear_score(df, w, bias=0.2, link="identity").collect()}
    assert abs(raw[0] - (np.log(want[0]) - np.log1p(-want[0]))) < 1e-9


def test_repetition_stats_is_map_only(spark):
    from tests.test_plan_shapes import plan_text

    df = spark.createDataFrame([(0, "x\ny")], "doc_id long, text string")
    txt = plan_text(X.repetition_stats(df))
    assert "Exchange" not in txt and "Generate" not in txt, txt


def test_dedup_exact_id_contract_and_auto_fallback(spark):
    import pytest as _pytest

    rows = [(0, "same"), (1, "same"), (1, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with _pytest.raises(ValueError, match="not unique"):
        D.dedup_exact(df, assert_unique_ids=True)
    # auto mode falls back to the shuffled anti-join when the drop list
    # exceeds the broadcast limit; results identical either way
    ok = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(12)], "doc_id long, text string"
    )
    kept_auto = {
        r.doc_id for r in D.dedup_exact(ok, broadcast_drop_limit=2).collect()
    }
    kept_bcast = {r.doc_id for r in D.dedup_exact(ok, broadcast_drop=True).collect()}
    assert kept_auto == kept_bcast == {0, 1, 2}


def test_paragraph_dedup_removes_cross_doc_boilerplate(spark):
    header = "SITE NAV | home | about"
    footer = "copyright example corp"
    rows = [
        (i, f"{header}\n\nunique body {i} with words\n\n{footer}") for i in range(8)
    ] + [(100, "standalone doc\n\nno boilerplate at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = {r.para_hash: r.df_count for r in D.boilerplate_paragraphs(df, min_df=5).collect()}
    assert len(flagged) == 2 and set(flagged.values()) == {8}
    out = {r.doc_id: r.text_clean for r in D.paragraph_dedup(df, min_df=5).collect()}
    assert out[3] == "unique body 3 with words"
    assert out[100] == "standalone doc\n\nno boilerplate at all"
    # guard: an over-budget boilerplate set raises instead of ballooning
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.paragraph_dedup(df, min_df=0, max_boilerplate=1)


def test_strip_paragraphs_join_matches_literal_path(spark):
    # the broadcast anti-join rewrite (oversized boilerplate sets) must
    # produce the same cleaned text as the literal probe, and
    # paragraph_dedup must auto-switch to it when id_col is given
    header = "SITE NAV | home | about"
    footer = "copyright example corp"
    rows = [
        (i, f"{header}\n\nunique body {i} with words\n\n{footer}") for i in range(8)
    ] + [(100, "standalone doc\n\nno boilerplate at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = D.boilerplate_paragraphs(df, min_df=5)
    bad = sorted(r.para_hash for r in flagged.collect())
    lit = {r.doc_id: r.text_clean for r in D.strip_paragraphs(df, bad).collect()}
    jn = {
        r.doc_id: r.text_clean
        for r in D.strip_paragraphs_join(df, flagged, "doc_id").collect()
    }
    assert jn == lit
    # auto-switch: guard of 1 + id_col → join path instead of raising
    auto = {
        r.doc_id: r.text_clean
        for r in D.paragraph_dedup(
            df, min_df=5, max_boilerplate=1, id_col="doc_id"
        ).collect()
    }
    assert auto == lit


def test_strip_paragraphs_is_map_only(spark):
    from tests.test_plan_shapes import plan_text

    df = spark.createDataFrame([(0, "a\n\nb")], "doc_id long, text string")
    txt = plan_text(D.strip_paragraphs(df, ["00000000000000000000000000000000"]))
    assert "Exchange" not in txt and "Join" not in txt, txt


def test_url_filter_literal_and_blocklist_paths_agree(spark):
    rows = [
        (1, "https://www.spam.example.com/a"),   # host (www-stripped)
        (2, "https://sub.tracker.net/x"),        # suffix via subdomain
        (3, "https://tracker.net/y"),            # suffix exact
        (4, "https://en.wikipedia.org/wiki/S"),  # kept
        (5, "https://ok.org/ads/banner"),        # path regex
        (6, "https://spam.example.com/ads/z"),   # host wins over path
        (7, "notaurl"),                          # unparseable → kept
        (8, None),                               # null → kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kw = dict(
        block_hosts=["spam.example.com"],
        block_suffixes=["tracker.net"],
        block_path_res=[r"^/ads/"],
    )
    want = {1: "host", 2: "suffix", 3: "suffix", 5: "path", 6: "host"}
    flagged = {
        r.doc_id: r.block_reason
        for r in X.url_filter(df, flag_only=True, **kw).collect()
        if r.blocked
    }
    assert flagged == want
    # drop mode keeps the complement
    kept = {r.doc_id for r in X.url_filter(df, **kw).select("doc_id").collect()}
    assert kept == {4, 7, 8}
    # big-list DataFrame path: identical decisions via explode + hash join
    bl = spark.createDataFrame(
        [("host", "spam.example.com"), ("suffix", "tracker.net"), ("path_re", r"^/ads/")],
        "kind string, value string",
    )
    out = X.url_filter(df, blocklist=bl, flag_only=True)
    flagged2 = {r.doc_id: r.block_reason for r in out.collect() if r.blocked}
    assert flagged2 == want
    D.release_intermediates(out)
    # literal path is map-only pure codegen
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.url_filter(df, flag_only=True, **kw))
    assert "Exchange" not in txt and "Join" not in txt, txt
    assert "EvalPython" not in txt, txt
    # blocklist path must hash-join, never nested-loop
    txt2 = plan_text(out)
    assert "BroadcastNestedLoopJoin" not in txt2, txt2
    # unknown kinds refused
    badbl = spark.createDataFrame([("tld", "xxx")], "kind string, value string")
    try:
        X.url_filter(df, blocklist=badbl)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_robots_rules_and_allowed_rfc_semantics(spark):
    robots = "\n".join([
        "# top comment",
        "User-agent: *",
        "Disallow: /private   # inline comment",
        "Allow: /private/ok",
        "Crawl-delay: 5",        # unknown directive ignored
        "",
        "User-agent: GPTBot",    # header case-insensitive
        "User-agent: ccbot",     # multi-agent header: rules apply to both
        "Disallow: /",
        "Allow: /feed$",         # end anchor
        "Disallow: /*.pdf$",     # mid-pattern wildcard
        "",
        "User-agent: emptybot",
        "Disallow:",             # empty pattern: group exists, allows all
    ])
    rb = spark.createDataFrame(
        [("H1.example.org", robots)], "host string, robots_txt string"
    )
    rules = X.robots_rules(rb)
    got = {(r.agent, r.pattern): (r.allow, r.plen) for r in rules.collect()}
    assert got[("*", "/private")] == (False, 8)
    assert got[("gptbot", "/feed$")] == (True, 6)
    assert got[("ccbot", "/")] == (False, 1)       # multi-agent fan-out
    assert got[("emptybot", "")] == (True, 0)      # empty-pattern sentinel
    assert ("*", "crawl-delay") not in got
    urls = spark.createDataFrame(
        [
            (1, "https://h1.example.org/private/x"),   # * blocks
            (2, "https://h1.example.org/private/okay"),# longest-match allow
            (3, "https://h1.example.org/pub"),          # no rule -> allow
            (4, "https://unknown.org/anything"),        # no robots -> allow
            (5, "https://h1.example.org/feed"),         # $ carve-out
            (6, "https://h1.example.org/feeds"),        # $ anchor excludes
            (7, "https://h1.example.org/docs/a.pdf"),   # wildcard match
        ],
        "id long, url string",
    )
    def verdicts(agent):
        return {
            r.id: r.crawl_allowed
            for r in X.robots_allowed(urls, rules, agent=agent).collect()
        }
    assert verdicts("*") == {1: False, 2: True, 3: True, 4: True, 5: True,
                             6: True, 7: True}
    # own group wins over *; Disallow:/ blocks except the /feed$ carve-out
    assert verdicts("GPTBot") == {1: False, 2: False, 3: False, 4: True,
                                  5: True, 6: False, 7: False}
    # group with only an empty Disallow: governs and allows everything
    assert verdicts("emptybot") == {i: True for i in range(1, 8)}
    # the URL side never shuffles: broadcast join + HOF evaluation only
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.robots_allowed(urls, rules, agent="*"))
    assert "BroadcastHashJoin" in txt, txt
    assert "BroadcastNestedLoopJoin" not in txt, txt


def test_surt_key_reversal_and_domain_range(spark):
    cases = [
        (0, "https://www.Sub.Example.org/A/b?z=1&a=2", "org,example,sub)/A/b?a=2&z=1"),
        (1, "http://example.com/", "com,example)/"),
        (2, "https://example.com/p", "com,example)/p"),
        (3, "https://a.b.example.com/q/r", "com,example,b,a)/q/r"),
        (4, "notaurl", None),
        (5, None, None),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "doc_id long, url string")
    got = {r.doc_id: r.surt for r in X.surt_key(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    # the point of SURT: a domain and its subdomains form one contiguous
    # lexicographic range
    keys = sorted(v for v in got.values() if v)
    dom = [k for k in keys if k.startswith("com,example")]
    lo, hi = keys.index(dom[0]), keys.index(dom[-1])
    assert dom == keys[lo : hi + 1]
    # map-only, pure JVM
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.surt_key(df))
    assert "Exchange" not in txt and "Join" not in txt, txt
    assert "EvalPython" not in txt, txt


def test_sitemap_entries_urlset_index_and_edge_cases(spark):
    urlset = (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        " <url><loc>https://e.org/a</loc><lastmod>2024-01-05</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>\n"
        " <url><loc><![CDATA[ https://e.org/b ]]></loc>"
        "<priority>notanumber</priority></url>\n"
        " <url><priority>0.1</priority></url>\n"  # loc-less: dropped
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://e.org/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://e.org/sitemap.xml", urlset), ("https://e.org/index.xml", idx)],
        "sitemap_url string, sitemap_xml string",
    )
    rows = {r.loc: r for r in X.sitemap_entries(df).collect()}
    assert set(rows) == {
        "https://e.org/a", "https://e.org/b",
        "https://e.org/s1.xml", "https://e.org/s2.xml",
    }
    a = rows["https://e.org/a"]
    assert (a.lastmod, a.changefreq, a.priority, a.is_index) == (
        "2024-01-05", "daily", 0.8, False,
    )
    b = rows["https://e.org/b"]  # CDATA stripped, malformed priority -> NULL
    assert (b.lastmod, b.priority, b.is_index) == (None, None, False)
    assert rows["https://e.org/s1.xml"].is_index is True
    assert rows["https://e.org/s2.xml"].lastmod is None
    # map-only, pure JVM: one explode, no shuffle, no Python
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.sitemap_entries(df))
    assert "Exchange" not in txt and "EvalPython" not in txt, txt


def test_canonicalize_urls(spark):
    cases = [
        (0, "HTTP://WWW.Example.COM:80/Path/To/Page/?utm_source=x&b=2&a=1#frag",
         "http://example.com/Path/To/Page?a=1&b=2"),
        (1, "https://example.com:443/", "https://example.com/"),
        (2, "https://example.com:8443/x?gclid=abc", "https://example.com:8443/x"),
        (3, "http://sub.example.com/y/?fbclid=1&Z=9", "http://sub.example.com/y?Z=9"),
        (4, "https://example.com", "https://example.com"),
        (5, "http://example.com/p?a=1&a=0", "http://example.com/p?a=0&a=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {r.doc_id: r.url_canonical for r in X.canonicalize_urls(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    # map-only: pure projection, no shuffle/join/Python
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.canonicalize_urls(df))
    assert "Exchange" not in txt and "Join" not in txt, txt
    assert "EvalPython" not in txt, txt


def test_url_ops_survive_malformed_urls(spark):
    """Web crawls guarantee malformed URLs; parse_url under ANSI throws on
    them, which would kill a whole job on one bad row.  Both URL
    operators must use try_parse_url: canonical form degrades to NULL and
    host stats bucket bad rows under the NULL host instead of crashing."""
    df = spark.createDataFrame(
        [(0, None), (1, "not a url at all"), (2, "https://ok.example.com/x")],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.url_canonical for r in X.canonicalize_urls(df).collect()}
    assert got[0] is None and got[1] is None
    assert got[2] == "https://ok.example.com/x"
    hosts = X.url_host_stats(df.withColumn("text", F.lit("t")), "url").collect()
    assert {r.host for r in hosts} == {None, "ok.example.com"}


def test_chunk_documents_reconstruction_property(spark):
    """Over a seeded random corpus: dropping each later chunk's first
    ``overlap`` tokens and concatenating reproduces the tokenized doc
    exactly — chunking loses nothing and duplicates only the overlap."""
    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 7, 3
    out = {}
    for r in X.chunk_documents(df, chunk, overlap).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, text in rows:
        toks = text.split()
        chunks = [t for _, t in sorted(out.get(i, []))]
        if not toks:
            assert chunks == []
            continue
        rebuilt = chunks[0].split()
        for c in chunks[1:]:
            rebuilt += c.split()[overlap:]
        assert rebuilt == toks, (i, toks, chunks)


def test_canonicalize_urls_idempotent(spark):
    """canon(canon(u)) == canon(u) for every URL whose canonical form is
    itself parseable — canonicalization is a projection, not a walk."""
    rows = [
        (0, "HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#f"),
        (1, "https://example.com:443/"),
        (2, "https://example.com:8443/x?gclid=abc&keep=1"),
        (3, "http://sub.example.com/y/?fbclid=1&Z=9"),
        (4, "https://example.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    once = X.canonicalize_urls(df)
    twice = X.canonicalize_urls(
        once.select("doc_id", F.col("url_canonical").alias("url")), out_col="url_c2"
    )
    for r in twice.collect():
        assert r.url_c2 == r.url, (r.doc_id, r.url, r.url_c2)


def test_chunk_documents(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x y"), (2, ""), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    got = [
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in X.chunk_documents(df, 3, overlap=1).orderBy("doc_id", "chunk_id").collect()
    ]
    assert got == [
        (0, 0, 3, "a b c"),
        (0, 1, 3, "c d e"),
        (0, 2, 3, "e f g"),  # no pure-overlap tail 'g'
        (1, 0, 2, "x y"),
        (4, 0, 1, "solo"),
    ]
    with pytest.raises(ValueError):
        X.chunk_documents(df, 3, overlap=3)
    # map-only: one Generate (posexplode), no Exchange/Join/Python
    from tests.test_plan_shapes import plan_text

    txt = plan_text(X.chunk_documents(df, 3, overlap=1))
    assert "Exchange" not in txt and "Join" not in txt, txt
    assert "EvalPython" not in txt, txt


def test_round4_ops_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert X.pack_token_shards(empty, 100).count() == 0
    docs = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    # empty target corpus → weight undefined (null), not a crash
    row = X.importance_weights(docs, empty).collect()[0]
    assert row.log_weight is None


def test_late_r4_ops_empty_inputs(spark):
    """The late-round-4 operators must handle empty inputs without
    crashing: empty graphs, empty event frames, empty batches/states."""
    from phenoqc_spark.operators import bloom as B
    from phenoqc_spark.operators.canonicalize import bfs_distances, coreness
    from phenoqc_spark.operators.sessions import asof_join, range_join, sessionize

    eg = spark.createDataFrame([], "src long, dst long")
    assert coreness(eg).count() == 0
    seeds = spark.createDataFrame([(1,)], "node long")
    assert {r.node: r.distance for r in bfs_distances(eg, seeds).collect()} == {1: 0}

    ee = spark.createDataFrame([], "event_id long, ts timestamp, user_id long")
    assert sessionize(ee).count() == 0
    ev = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, value double")
    assert asof_join(ee, ev).count() == 0
    one = spark.createDataFrame(
        [(0, __import__("datetime").datetime(2024, 1, 1), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    got = asof_join(one, ev).collect()  # empty right → null carry
    assert len(got) == 1 and got[0].asof_ts is None
    iv = spark.createDataFrame([], "iv_id long, w_start timestamp, w_end timestamp, user_id long")
    assert range_join(one, iv).count() == 0

    docs = spark.createDataFrame([(0, "some text")], "doc_id long, text string")
    empty_state = spark.createDataFrame([], "content_hash string")
    # empty state → bloom never matches, batch passes through intact
    assert B.dedup_exact_incremental_bloom(docs, empty_state).count() == 1
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    state = docs.select(F.md5("text").alias("content_hash"))
    assert B.dedup_exact_incremental_bloom(empty_docs, state).count() == 0


def test_snapshot_diff(spark):
    """Full-outer fingerprint diff: added/removed/changed classified
    correctly, unchanged rows omitted, nulls distinguished from the
    string 'None' and from empty (sentinel separator)."""
    from phenoqc_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "doc_id long, text string, meta string",
    )
    new = spark.createDataFrame(
        [(2, "b", "None"), (3, "c", "z"), (4, "D", "w"), (5, "e", "v")],
        "doc_id long, text string, meta string",
    )
    got = {r.doc_id: r.change for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "changed", 4: "changed", 5: "added"}

    import pytest as _p

    with _p.raises(ValueError, match="no shared content"):
        snapshot_diff(old.select("doc_id"), new.select("doc_id"))


def test_pack_token_shards_partition_invariant(spark):
    """Shard assignment = global ordered exclusive prefix sum: identical
    across partition counts and equal to a sequential twin."""
    rows = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23 + 1))) for i in range(200)]
    rows[50] = (50, None)  # null text → 0 tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 40

    def run(nparts):
        return {
            r.doc_id: (r.n_tokens, r.shard_id)
            for r in X.pack_token_shards(df, budget, num_partitions=nparts).collect()
        }

    a, b, c = run(1), run(4), run(16)
    assert a == b == c
    # sequential twin
    acc, want = 0, {}
    for i in range(200):
        n = 0 if rows[i][1] is None else len(rows[i][1].split())
        want[i] = (n, acc // budget)
        acc += n
    assert a == want
    # shards (except possibly the last) are filled to >= budget boundary:
    # every shard k>0 starts exactly where the prefix crossed k*budget
    shard_of = {i: a[i][1] for i in a}
    assert max(shard_of.values()) > 1  # actually packed multiple shards


def test_importance_weights_and_sample(spark):
    """DSIR-style selection: docs resembling the target corpus must get
    higher log-weights and dominate the Gumbel-top-k sample; the sample is
    a pure function of (id, seed) — rerun-invariant."""
    sci = "quantum results experiment method data analysis model theory"
    spam = "click here buy now free offer winner prize deal cash"
    rows = [(i, sci if i % 2 == 0 else spam) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(900, f"{sci} study science")], "doc_id long, text string"
    )
    w = {r.doc_id: r.log_weight for r in X.importance_weights(df, target).collect()}
    sci_w = [w[i] for i in range(40) if i % 2 == 0]
    spam_w = [w[i] for i in range(40) if i % 2 == 1]
    assert min(sci_w) > max(spam_w)
    picked = sorted(
        r.doc_id for r in X.importance_sample(df, target, n=10, seed=7).collect()
    )
    assert len(picked) == 10
    assert sum(1 for d in picked if d % 2 == 0) >= 8  # target-like dominate
    again = sorted(
        r.doc_id for r in X.importance_sample(df, target, n=10, seed=7).collect()
    )
    assert picked == again  # deterministic


def test_unigram_logprob_score(spark):
    import math

    rows = [
        (0, "common common common"),
        (1, "common rare"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.unigram_logprob_score(df).collect()}
    # model: common cnt=4, rare cnt=1, total=5, vocab=2 → denom 7
    p_common = (4 + 1.0) / 7
    p_rare = (1 + 1.0) / 7
    assert got[0].n_tokens == 3
    assert abs(got[0].mean_nll - round(-math.log(p_common), 6)) < 1e-6
    want1 = round((-math.log(p_common) - math.log(p_rare)) / 2, 6)
    assert abs(got[1].mean_nll - want1) < 1e-6
    # the rarer doc scores as more surprising
    assert got[1].mean_nll > got[0].mean_nll
    # external reference: unseen tokens take the add-one floor
    ref = spark.createDataFrame([(9, "common common")], "doc_id long, text string")
    ext = {r.doc_id: r for r in X.unigram_logprob_score(df, reference=ref).collect()}
    # ref model: common cnt=2, total=2, vocab=1 → p(common)=3/3=1, unseen=1/3
    assert abs(ext[0].mean_nll - 0.0) < 1e-9
    assert abs(ext[1].mean_nll - round((0.0 - math.log(1 / 3)) / 2, 6)) < 1e-6


def test_deterministic_stratified_sample(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = X.deterministic_stratified_sample(df, "source", {"a": 0.3}, seed=7)
    ids1 = sorted(r.doc_id for r in got.collect())
    # reruns AND different partitioning select the identical row set
    ids2 = sorted(
        r.doc_id
        for r in X.deterministic_stratified_sample(
            df.repartition(7), "source", {"a": 0.3}, seed=7
        ).collect()
    )
    assert ids1 == ids2 and len(ids1) > 0
    # only the configured stratum is sampled; absent strata drop to zero
    assert all(i % 2 == 0 for i in ids1)
    # Bernoulli rate lands near the target (1000 candidates, p=0.3)
    assert 0.2 <= len(ids1) / 1000 <= 0.4
    # a different seed selects a different set
    ids3 = sorted(
        r.doc_id
        for r in X.deterministic_stratified_sample(df, "source", {"a": 0.3}, seed=8).collect()
    )
    assert ids3 != ids1


def test_tfidf_topk(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.rank): r for r in X.tfidf_topk(df, k=2).collect()}
    import math

    # doc 0: apple tf=2 df=1 → 2*(ln(4/2)+1); banana tf=1 df=2 → ln(4/3)+1
    assert got[(0, 1)].token == "apple"
    assert abs(got[(0, 1)].tfidf - round(2 * (math.log(4 / 2) + 1), 6)) < 1e-9
    assert got[(0, 2)].token == "banana"
    # doc 2: cherry tf=2 beats durian tf=1 despite durian's rarer df
    assert got[(2, 1)].token == "cherry" and got[(2, 2)].token == "durian"
    assert all(r.rank <= 2 for r in got.values())


def test_url_host_stats(spark):
    rows = [
        (0, "https://a.example.org/x", "same"),
        (1, "https://a.example.org/y", "same"),
        (2, "https://a.example.org/y?q=1", "other"),
        (3, "https://b.example.org/z", "unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r.host: r for r in X.url_host_stats(df).collect()}
    a = got["a.example.org"]
    assert a.n_docs == 3 and a.n_paths == 2  # /x, /y (query string not path)
    assert abs(a.dup_rate - (1 - 2 / 3)) < 1e-6
    assert abs(a.corpus_share - 0.75) < 1e-6
    b = got["b.example.org"]
    assert b.n_docs == 1 and b.dup_rate == 0.0


def test_contamination_flags(spark):
    bench = spark.createDataFrame(
        [("which is the benchmark question about gravity on the moon",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (0, "prefix text which is the benchmark question about gravity on the moon suffix"),
            (1, "totally unrelated web document content here with many words indeed"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_hits for r in X.contamination_flags(docs, bench, n=8).collect()}
    assert 0 in hits and hits[0] >= 1
    assert 1 not in hits


def test_dedup_exact_incremental(spark):
    """New-batch exact dedup vs a fingerprint state: rows whose content
    was already ingested drop; fresh content dedups within the batch."""
    state_docs = spark.createDataFrame(
        [(0, "seen before"), (1, "also seen")], "doc_id long, text string"
    )
    state = state_docs.select(F.md5("text").alias("content_hash"))
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # drop: in state
            (11, "brand new"),     # keep
            (12, "brand new"),     # drop: intra-batch dup of 11
            (13, "also seen"),     # drop: in state
            (14, "another fresh"), # keep
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in D.dedup_exact_incremental(batch, state).collect()}
    assert kept == {11, 14}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="content_hash"):
        D.dedup_exact_incremental(batch, state.withColumnRenamed("content_hash", "x"))


def test_hits_matches_numpy(spark):
    """HITS must match an independent numpy power iteration (same
    update order: auth from hub, normalize, hub from auth, normalize)
    to float tolerance on a random directed graph."""
    import random

    import numpy as np

    from phenoqc_spark.operators.canonicalize import hits

    rng = random.Random(3)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in edges:
        A[idx[a], idx[b]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(10):
        a_vec = A.T @ h
        a_vec = a_vec / np.linalg.norm(a_vec)
        h = A @ a_vec
        h = h / np.linalg.norm(h)

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(df, iters=10).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v][0] - h[idx[v]]) < 1e-9, v
        assert abs(got[v][1] - a_vec[idx[v]]) < 1e-9, v


def test_bfs_distances_matches_bruteforce(spark):
    """Level-synchronous BFS must equal sequential BFS from the same seed
    set, with unreachable nodes absent from the result."""
    import random
    from collections import deque

    from phenoqc_spark.operators.canonicalize import bfs_distances

    rng = random.Random(7)
    edges = {(a, b) for a in range(30) for b in range(a + 1, 30) if rng.random() < 0.08}
    edges |= {(40, 41)}  # island, unreachable from the seeds
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = [0, 5]
    want, dq = {s: 0 for s in seeds}, deque(seeds)
    while dq:
        n = dq.popleft()
        for m in adj.get(n, ()):  # noqa: B905
            if m not in want:
                want[m] = want[n] + 1
                dq.append(m)

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r.node: r.distance for r in bfs_distances(df, sdf).collect()}
    assert got == want
    assert 40 not in got and max(got.values()) >= 2


def test_coreness_matches_bruteforce(spark):
    """Distributed peeling must equal sequential peeling on a random
    28-node graph (plus a pendant chain and an isolated-by-peeling star
    to exercise the degree-0 assignment path)."""
    import random

    from phenoqc_spark.operators.canonicalize import coreness

    rng = random.Random(11)
    edges = {(a, b) for a in range(28) for b in range(a + 1, 28) if rng.random() < 0.18}
    edges |= {(28, 29), (29, 30)}              # pendant chain → coreness 1
    edges |= {(31, x) for x in (32, 33, 34)}   # star → all coreness 1

    # sequential peeling twin
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, k = {}, 0
    while adj:
        low = [n for n, nb in adj.items() if len(nb) <= k]
        if not low:
            k += 1
            continue
        for n in low:
            want[n] = k
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.node: r.coreness for r in coreness(df).collect()}
    assert got == want
    assert got[29] == 1 and got[31] == 1 and max(got.values()) >= 2


def test_dedup_exact_incremental_bloom_equivalence(spark):
    """The bloom-prefiltered incremental exact dedup must return exactly
    the plain anti-join result (no false negatives; positives verified),
    on a corpus large enough that both bloom branches are exercised."""
    from phenoqc_spark.operators import bloom as B

    state_docs = [(i, f"seen document number {i % 40}") for i in range(120)]
    state = (
        spark.createDataFrame(state_docs, "doc_id long, text string")
        .select(F.md5("text").alias("content_hash"))
        .distinct()
    )
    batch = spark.createDataFrame(
        [
            (1000 + i, f"seen document number {i}" if i % 3 == 0 else f"fresh {i} body")
            for i in range(90)
        ]
        + [(2000, "fresh 7 body")]  # intra-batch dup of 1007
        + [(3000, None)],  # failed-extraction row: md5(null) is null
        "doc_id long, text string",
    )
    want = {r.doc_id for r in D.dedup_exact_incremental(batch, state).collect()}
    got = {r.doc_id for r in B.dedup_exact_incremental_bloom(batch, state).collect()}
    assert got == want and 1007 in got and 2000 not in got
    # seen i<40 drop via state; i%3==0 with i>=40 are fresh "seen document
    # number i" texts that must survive the bloom's positive sliver
    assert {1000 + i for i in range(40, 90, 3) if i % 3 == 0} <= got


def test_bloom_no_false_negatives_and_fpp(spark):
    """Every state member probes True (bloom guarantee); unseen values
    probe True at roughly the configured fpp (loose bound)."""
    from phenoqc_spark.operators import bloom as B

    members = spark.range(500).select(F.md5(F.concat(F.lit("m"), "id")).alias("h"))
    bloom_df, params = B.bloom_from_state(members, "h", fpp=0.01, n_buckets=8)
    flagged = B.bloom_might_contain(members, bloom_df, params, "h")
    assert flagged.filter(~F.col("might_seen")).count() == 0
    outsiders = spark.range(2000).select(F.md5(F.concat(F.lit("x"), "id")).alias("h"))
    fp = B.bloom_might_contain(outsiders, bloom_df, params, "h")
    assert fp.filter(F.col("might_seen")).count() <= 2000 * 0.05

    with pytest.raises(ValueError, match="shard the"):
        B.bloom_from_state(members, "h", fpp=0.01, expected_items=10**12)


def test_graph_triangles_matches_bruteforce(spark):
    """Degree-ordered triangle counting must equal the O(n^3) brute force
    on a random 25-node graph (every triangle found once, credited to all
    three corners)."""
    import itertools
    import random

    from phenoqc_spark.operators import canonicalize as C

    rng = random.Random(3)
    nodes = list(range(25))
    edges = set()
    for _ in range(70):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.node: r.n_triangles for r in C.graph_triangles(df).collect()}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                assert got[n] > 0
    want = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    assert all(got.get(n, 0) == want[n] for n in nodes if n in got or want[n])
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_clustering_coefficients(spark):
    """Triangle K3 plus a pendant node: triangle corners have coeff 1.0
    (all neighbor pairs connected... except where the pendant dilutes),
    pendant has coeff 0."""
    from phenoqc_spark.operators import canonicalize as C

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    got = {r.node: (r.degree, r.n_triangles, r.clustering_coeff)
           for r in C.clustering_coefficients(edges).collect()}
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(2 * 1 / (3 * 2), 6))
    assert got[3] == (1, 0, 0.0)


def test_hash_embedding_semantics_and_ann_composition(spark):
    """Feature-hashing embedding: identical texts → cosine 1.0, disjoint
    vocab → 0.0, unit norms; composes into the ANN stack (text → embed →
    brute-force top-k finds the exact duplicate first)."""
    import numpy as np

    rows = [
        (0, "apple banana cherry"),
        (1, "apple banana cherry"),
        (2, "totally different words here"),
        (3, "apple banana cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = S.hash_embedding(df, dim=32)
    E = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    assert abs(float(E[0] @ E[1]) - 1.0) < 1e-9
    assert abs(float(E[0] @ E[2])) < 1e-9
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for v in E.values())
    # deterministic across recomputation
    E2 = {r.vec_id: np.array(r.embedding) for r in S.hash_embedding(df, dim=32).collect()}
    assert all((E[k] == E2[k]).all() for k in E)
    # composition: hash-embed -> top-k; doc 1 retrieves doc 0 at cosine 1
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = S.cosine_topk_bruteforce(emb, q, k=2).collect()
    assert {r.vec_id for r in top} == {0, 1} and all(abs(r.cosine - 1.0) < 1e-6 for r in top)


def test_ancestor_closure_matches_bruteforce(spark):
    """Semi-naive closure must equal a sequential min-depth ancestor BFS
    on a random multi-inheritance DAG; cycle members reach each other but
    never themselves; max_depth truncates deeper ancestry."""
    import random
    from collections import deque

    from phenoqc_spark.operators.canonicalize import ancestor_closure

    rng = random.Random(13)
    # acyclic by construction: parents always have a smaller id
    edges = [(c, p) for c in range(1, 40) for p in range(c) if rng.random() < 0.09]
    up = {}
    for c, p in edges:
        up.setdefault(c, set()).add(p)
    want = {}
    for n in up:
        dist, dq = {n: 0}, deque([n])
        while dq:
            x = dq.popleft()
            for p in up.get(x, ()):
                if p not in dist:
                    dist[p] = dist[x] + 1
                    dq.append(p)
        for a, d in dist.items():
            if a != n:
                want[(n, a)] = d

    df = spark.createDataFrame(edges, "child long, parent long")
    got = {(r.node, r.ancestor): r.depth for r in ancestor_closure(df).collect()}
    assert got == want

    # 3-cycle: each member reaches the other two, no self-pairs
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "child long, parent long")
    gotc = {(r.node, r.ancestor): r.depth for r in ancestor_closure(cyc).collect()}
    assert gotc == {(0, 1): 1, (1, 2): 1, (2, 0): 1,
                    (0, 2): 2, (1, 0): 2, (2, 1): 2}

    # chain 5->4->3->2->1->0 truncated at depth 2
    chain = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 6)], "child long, parent long"
    )
    trunc = {(r.node, r.ancestor) for r in ancestor_closure(chain, max_depth=2).collect()}
    assert trunc == {(i, i - 1) for i in range(1, 6)} | {(i, i - 2) for i in range(2, 6)}


def test_rollup_counts_hierarchy(spark):
    """Fact counts roll up to every ancestor; distinct_col collapses
    multi-annotated records; include_self keeps terms outside the
    hierarchy; the closure side of the join is broadcast."""
    from phenoqc_spark.operators.canonicalize import ancestor_closure, rollup_counts
    from tests.test_plan_shapes import plan_text

    edges = spark.createDataFrame(
        [("T1", "T0"), ("T2", "T0"), ("T3", "T1")], "child string, parent string"
    )
    closure = ancestor_closure(edges)
    facts = spark.createDataFrame(
        [(1, "T3"), (1, "T1"), (2, "T2"), (3, "T9")], "doc long, term string"
    )
    plain = rollup_counts(facts, closure, term_col="term")
    got = {r.ancestor: r.n for r in plain.collect()}
    # T3 row -> T3,T1,T0; T1 row -> T1,T0; T2 row -> T2,T0; T9 row -> T9
    assert got == {"T3": 1, "T1": 2, "T0": 3, "T2": 1, "T9": 1}
    # doc 1 annotated with both T3 and T1 counts once for T1/T0
    dist = {r.ancestor: r.n for r in
            rollup_counts(facts, closure, term_col="term", distinct_col="doc").collect()}
    assert dist == {"T3": 1, "T1": 1, "T0": 2, "T2": 1, "T9": 1}
    # without self-contribution only ancestor rows remain
    nos = {r.ancestor: r.n for r in
           rollup_counts(facts, closure, term_col="term", include_self=False).collect()}
    assert nos == {"T1": 1, "T0": 3}
    txt = plan_text(plain)
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoop" in txt, txt


def test_dup_span_stats_fraction(spark):
    """dup_span_fraction must equal the python-twin computation: the share
    of a doc's winnow fingerprints held by >= min_df docs; short docs are
    absent; a fully-copied doc scores 1.0, an unrelated doc 0.0."""
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, f"{span} plus some original trailing content here today"),
        (1, f"{span} and different original ending words entirely now"),
        (2, "independent content with no shared runs anywhere at all present"),
        (3, span),           # fully duplicated vs 0/1's prefix
        (4, "tiny doc"),     # < k + window - 1 tokens -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 5, 3
    got = {r.doc_id: r for r in
           D.dup_span_stats(df, k=k, window=w, hash_fn="md5").collect()}
    assert 4 not in got
    sets = {i: _py_winnow(t, k, w) for i, t in rows if len(t.split()) >= k + w - 1}
    from collections import Counter
    freq = Counter(fp for s in sets.values() for fp in s)
    for i, s in sets.items():
        n_shared = sum(1 for fp in s if freq[fp] >= 2)
        assert got[i].n_fingerprints == len(s), i
        assert got[i].n_shared == n_shared, i
        assert abs(got[i].dup_span_fraction - n_shared / len(s)) < 1e-12, i
    assert got[3].dup_span_fraction == 1.0
    assert got[2].dup_span_fraction == 0.0


def test_term_pair_similarity(spark):
    """Ancestor-set Jaccard: sibling terms share their parent chain,
    distinct branches share only the root, a term vs itself scores 1.0,
    closure-absent terms fall back to singleton sets; the set joins are
    broadcast."""
    from phenoqc_spark.operators.canonicalize import (
        ancestor_closure,
        term_pair_similarity,
    )
    from tests.test_plan_shapes import plan_text

    #        R
    #      /   \
    #     A     B
    #    / \     \
    #   A1  A2    B1
    edges = spark.createDataFrame(
        [("A", "R"), ("B", "R"), ("A1", "A"), ("A2", "A"), ("B1", "B")],
        "child string, parent string",
    )
    closure = ancestor_closure(edges)
    pairs = spark.createDataFrame(
        [("A1", "A2"), ("A1", "B1"), ("A1", "A1"), ("A", "R"), ("A1", "ZZZ")],
        "term_a string, term_b string",
    )
    out = term_pair_similarity(pairs, closure)
    got = {(r.term_a, r.term_b): (r.n_common, round(r.jaccard, 6)) for r in out.collect()}
    # sets: A1={A1,A,R}, A2={A2,A,R}, B1={B1,B,R}, A={A,R}, R={R}, ZZZ={ZZZ}
    assert got[("A1", "A2")] == (2, round(2 / 4, 6))
    assert got[("A1", "B1")] == (1, round(1 / 5, 6))
    assert got[("A1", "A1")] == (3, 1.0)
    assert got[("A", "R")] == (1, round(1 / 2, 6))
    assert got[("A1", "ZZZ")] == (0, 0.0)
    txt = plan_text(out)
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt


def test_term_ic_matches_twin(spark):
    """IC = -ln(rollup_freq / total): the root covering every annotation
    scores exactly 0; leaves score highest; distinct_col counts records
    once; unannotated branches are absent."""
    import math

    from phenoqc_spark.operators.canonicalize import ancestor_closure, term_ic

    edges = spark.createDataFrame(
        [("A", "R"), ("B", "R"), ("A1", "A"), ("A2", "A"), ("B1", "B"), ("C", "R")],
        "child string, parent string",
    )
    closure = ancestor_closure(edges)
    # recs: r1 on A1 twice (dup mention), r2 on A2, r3 on B1, r4 on A
    facts = spark.createDataFrame(
        [("A1", 1), ("A1", 1), ("A2", 2), ("B1", 3), ("A", 4)],
        "term string, rec int",
    )
    got = {r.term: (r.n, r.ic) for r in
           term_ic(facts, closure, distinct_col="rec").collect()}
    # rollup distinct recs: A1={1}, A2={2}, B1={3}, A={1,2,4}, B={3}, R=all 4
    exp_n = {"A1": 1, "A2": 1, "B1": 1, "A": 3, "B": 1, "R": 4}
    assert {k: v[0] for k, v in got.items()} == exp_n
    for t, n in exp_n.items():
        assert abs(got[t][1] - (-math.log(n / 4))) < 1e-12, t
    assert got["R"][1] == 0.0
    assert "C" not in got  # unannotated branch: no IC on this corpus


def test_resnik_lin_similarity(spark):
    """resnik = IC(MICA) over ancestor-or-self sets; lin normalizes to
    0..1 with 1.0 on the diagonal; the set/IC joins are all broadcast."""
    import math

    from phenoqc_spark.operators.canonicalize import (
        ancestor_closure,
        resnik_lin_similarity,
        term_ic,
    )
    from tests.test_plan_shapes import plan_text

    edges = spark.createDataFrame(
        [("A", "R"), ("B", "R"), ("A1", "A"), ("A2", "A"), ("B1", "B")],
        "child string, parent string",
    )
    closure = ancestor_closure(edges)
    facts = spark.createDataFrame(
        [("A1", 1), ("A2", 2), ("B1", 3), ("A", 4)], "term string, rec int"
    )
    ic = term_ic(facts, closure, distinct_col="rec")
    ic_of = {"A1": -math.log(1 / 4), "A2": -math.log(1 / 4), "B1": -math.log(1 / 4),
             "A": -math.log(3 / 4), "B": -math.log(1 / 4), "R": 0.0}
    pairs = spark.createDataFrame(
        [("A1", "A2"), ("A1", "B1"), ("A1", "A1"), ("A1", "ZZZ"), ("R", "B")],
        "term_a string, term_b string",
    )
    out = resnik_lin_similarity(pairs, ic, closure)
    got = {(r.term_a, r.term_b): r for r in out.collect()}
    # MICA(A1,A2)=A; MICA(A1,B1)=R; MICA(A1,A1)=A1 (self in set)
    assert abs(got[("A1", "A2")].resnik - ic_of["A"]) < 1e-12
    exp_lin = 2 * ic_of["A"] / (ic_of["A1"] + ic_of["A2"])
    assert abs(got[("A1", "A2")].lin - exp_lin) < 1e-12
    assert got[("A1", "B1")].resnik == 0.0 and got[("A1", "B1")].lin == 0.0
    assert abs(got[("A1", "A1")].resnik - ic_of["A1"]) < 1e-12
    assert got[("A1", "A1")].lin == 1.0
    # ZZZ: no IC -> resnik 0, lin NULL
    assert got[("A1", "ZZZ")].resnik == 0.0 and got[("A1", "ZZZ")].lin is None
    # MICA(R,B)=R with IC 0 -> resnik 0; denom > 0 -> lin 0
    assert got[("R", "B")].resnik == 0.0 and got[("R", "B")].lin == 0.0
    txt = plan_text(out)
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt


def test_bma_similarity_matches_twin(spark):
    """Phenomizer best-match average vs a sequential python twin on a
    random DAG + random annotation sets; symmetric form, deduped
    annotations, entities missing annotations absent."""
    import math
    import random

    from phenoqc_spark.operators.canonicalize import (
        ancestor_closure,
        bma_similarity,
        term_ic,
    )

    rng = random.Random(7)
    terms = list(range(1, 40))
    edges = [(f"T{n}", f"T{n // 2}") for n in terms if n // 2 >= 1 or n >= 2]
    edges = [(c, p) for c, p in edges if c != p]
    ann = [(e, f"T{rng.choice(terms)}") for e in range(8) for _ in range(6)]
    ann += [(0, ann[0][1])]  # duplicate mention must not reweight
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8) if rng.random() < 0.5]
    pairs += [(0, 9)]  # 9 has no annotations -> absent from output

    edf = spark.createDataFrame(edges, "child string, parent string")
    adf = spark.createDataFrame(ann, "entity int, term string")
    pdf = spark.createDataFrame(pairs, "entity_a int, entity_b int")
    closure = ancestor_closure(edf)
    ic = term_ic(adf.select("term"), closure)
    out = bma_similarity(pdf, adf, ic, closure)
    got = {(r.entity_a, r.entity_b): r for r in out.collect()}

    # ---- twin ----
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)

    def aos(t):
        s, stack = {t}, [t]
        while stack:
            for p in parents.get(stack.pop(), ()):
                if p not in s:
                    s.add(p)
                    stack.append(p)
        return s

    from collections import Counter
    roll = Counter()
    for _, t in ann:
        for a in aos(t):
            roll[a] += 1
    N = len(ann)
    icpy = {t: -math.log(n / N) for t, n in roll.items()}

    def resnik(a, b):
        common = {x for x in aos(a) & aos(b) if x in icpy}
        return max((icpy[x] for x in common), default=0.0)

    sets = {}
    for e, t in ann:
        sets.setdefault(e, set()).add(t)
    for (ea, eb), r in got.items():
        A, B = sets[ea], sets[eb]
        sab = sum(max(resnik(a, b) for b in B) for a in A) / len(A)
        sba = sum(max(resnik(a, b) for a in A) for b in B) / len(B)
        assert abs(r.sim_ab - sab) < 1e-9, (ea, eb)
        assert abs(r.sim_ba - sba) < 1e-9, (ea, eb)
        assert abs(r.bma - (sab + sba) / 2) < 1e-9, (ea, eb)
    assert set(got) == {(a, b) for a, b in pairs if b != 9}


def test_soft_link_pr(spark):
    """Exact P/R counts matches; soft P/R credits near-misses with best
    Lin similarity per key; unmatched keys score 0 on both sides."""
    import math

    from phenoqc_spark.operators.canonicalize import (
        ancestor_closure,
        soft_link_pr,
        term_ic,
    )

    edges = spark.createDataFrame(
        [("A", "R"), ("B", "R"), ("A1", "A"), ("A2", "A"), ("B1", "B")],
        "child string, parent string",
    )
    closure = ancestor_closure(edges)
    facts = spark.createDataFrame(
        [("A1", 1), ("A2", 2), ("B1", 3), ("A", 4)], "term string, rec int"
    )
    ic = term_ic(facts, closure, distinct_col="rec")
    gold = spark.createDataFrame(
        [("u1", "A1"), ("u2", "B1"), ("u3", "A"), ("u5", "A2")],
        "url string, term string",
    )
    produced = spark.createDataFrame(
        [("u1", "A1"), ("u2", "B"), ("u4", "A2"), ("u1", "A1")],  # dup row deduped
        "url string, term string",
    )
    r = soft_link_pr(produced, gold, ic, closure).collect()[0]
    assert (r.n_produced, r.n_gold, r.n_exact) == (3, 4, 1)
    assert abs(r.precision_exact - 1 / 3) < 1e-12
    assert abs(r.recall_exact - 1 / 4) < 1e-12
    # lin(B, B1): MICA=B, IC(B)=IC(B1)=ln4 -> 1.0 (informationally equal
    # in this corpus); u4 has no gold -> 0
    assert abs(r.soft_precision - (1.0 + 1.0 + 0.0) / 3) < 1e-12
    # recall side: u1->1, u2 (B1 vs B)->1, u3 and u5 unmatched -> 0
    assert abs(r.soft_recall - (1.0 + 1.0 + 0.0 + 0.0) / 4) < 1e-12
    assert math.isclose(r.soft_precision, 2 / 3)


def test_final_r4_ops_empty_inputs(spark):
    """The last round-4 wave (latest-capture, MERGE state, LPA,
    modularity, PMI, negatives, z-order, host cap, shape rules) must
    handle empty inputs without crashing."""
    from phenoqc_spark.operators.canonicalize import (
        graph_modularity,
        label_propagation,
    )
    from phenoqc_spark.operators.layout import zorder_layout
    from phenoqc_spark.operators.resume import merge_triple_state, triples_to_state
    from phenoqc_spark.operators.sessions import latest_snapshot
    from phenoqc_spark.operators.textstats import cap_per_host, pmi_cooccurrence
    from phenoqc_spark.operators.triples import negative_samples, validate_triple_shapes

    ee = spark.createDataFrame([], "url string, warc_ts timestamp, text string")
    assert latest_snapshot(ee, "url", "warc_ts", tiebreak_col="text").count() == 0

    et = spark.createDataFrame(
        [], "subject string, predicate string, object string, confidence double"
    )
    s0 = triples_to_state(et, 1)
    assert s0.count() == 0
    one = spark.createDataFrame(
        [("s", "p", "o", 0.5)],
        "subject string, predicate string, object string, confidence double",
    )
    assert merge_triple_state(s0, triples_to_state(one, 2)).count() == 1

    eg = spark.createDataFrame([], "src string, dst string")
    assert label_propagation(eg, iters=2).count() == 0
    el = spark.createDataFrame([], "node string, label string")
    assert graph_modularity(eg, el).count() == 0

    ed = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_cooccurrence(ed).count() == 0
    assert negative_samples(spark.createDataFrame([], "subj string, pred string, obj string")).count() == 0

    ez = spark.createDataFrame([], "id long, x long, y long")
    assert zorder_layout(ez, ["x", "y"], num_partitions=2).count() == 0

    eu = spark.createDataFrame([], "doc_id long, url string")
    assert cap_per_host(eu, 3).count() == 0

    rules = spark.createDataFrame(
        [("rel", None, "^e$")], "pred string, subj_regex string, obj_regex string"
    )
    etr = spark.createDataFrame([], "subj string, pred string, obj string")
    assert validate_triple_shapes(etr, rules).count() == 0
    # empty RULES against real triples also passes everything
    tr = spark.createDataFrame([("s", "rel", "o")], "subj string, pred string, obj string")
    erules = spark.createDataFrame([], "pred string, subj_regex string, obj_regex string")
    assert validate_triple_shapes(tr, erules).count() == 0


def test_compact_dedup_state_recovers_crashed_swap(spark, tmp_path):
    """compact_dedup_state must recover a state staged at __old by a swap
    that crashed between its two renames (same discipline as
    merge_state_into)."""
    import os
    import shutil

    from phenoqc_spark.operators.dedup import (
        compact_dedup_state,
        minhash_doc_sets,
    )

    docs = spark.createDataFrame(
        [(i, f"some shared text body number {i % 3} with words") for i in range(12)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sig_state")
    minhash_doc_sets(docs).write.mode("overwrite").parquet(path)
    n0 = spark.read.parquet(path).count()
    shutil.move(path, path + "__old")  # the crash window
    assert not os.path.exists(path)
    res = compact_dedup_state(spark, path)
    assert res["rows_before"] == n0 and res["rows_after"] >= 1
    assert os.path.exists(path) and not os.path.exists(path + "__old")


def test_kmeans_recovers_separated_clusters(spark):
    """Three well-separated blobs: every member lands with its blob,
    assignments are repartitioning-invariant, and k > n raises."""
    import pytest

    from phenoqc_spark.operators.clustering import kmeans

    # 3 blobs of 8 points in 4-d, centers at 0, 10, 20 on each axis;
    # deterministic +/-0.25 jitter from the point index
    rows = []
    for b in range(3):
        for i in range(8):
            base = float(10 * b)
            jit = 0.25 if i % 2 == 0 else -0.25
            rows.append((b * 8 + i, [base + jit, base - jit, base + jit, base - jit]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans(df, k=3, iters=4).collect()}
    # cluster labels are init-order-dependent; check the partition, not ids
    groups = {}
    for vid, c in got.items():
        groups.setdefault(c, set()).add(vid)
    assert sorted(len(g) for g in groups.values()) == [8, 8, 8]
    for g in groups.values():
        blobs = {vid // 8 for vid in g}
        assert len(blobs) == 1, f"cluster mixes blobs: {g}"
    # md5-seeded init + fixed iters => identical under repartition(7)
    got2 = {
        r.vec_id: r.cluster
        for r in kmeans(df.repartition(7), k=3, iters=4).collect()
    }
    assert got == got2
    with pytest.raises(ValueError, match="only"):
        kmeans(df, k=99, iters=1).collect()


def test_kmeans_init_centroids_override(spark):
    """Planted centers passed as init_centroids give perfect recovery in
    one round and shape validation raises on a k mismatch."""
    import pytest

    from phenoqc_spark.operators.clustering import kmeans

    rows = []
    for b in range(3):
        for i in range(6):
            base = float(10 * b)
            rows.append((b * 6 + i, [base + 0.1 * i, base - 0.1 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = [[0.0, 0.0], [10.0, 10.0], [20.0, 20.0]]
    got = {r.vec_id: r.cluster for r in kmeans(df, k=3, iters=1, init_centroids=init).collect()}
    for vid, c in got.items():
        assert c == vid // 6, (vid, c)
    with pytest.raises(ValueError, match="init_centroids"):
        kmeans(df, k=4, iters=1, init_centroids=init).collect()


def test_containment_pairs_directed_asymmetry(spark):
    """Containment catches a short doc quoted inside a long page (1.0
    from the quote side) where Jaccard stays tiny; direction matters;
    identical docs contain each other both ways; df-cut never changes a
    reported value."""
    long_page = "the quick brown fox jumps over the lazy dog " * 6
    quote = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, long_page + " " + quote),
            (3, quote),  # identical to 1
            (4, "completely different content with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_src, r.doc_dst): r.containment
        for r in D.containment_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(3, 2)] == 1.0  # quote -> page
    assert (2, 1) not in got  # page -> quote fails the threshold
    assert got[(1, 3)] == 1.0 and got[(3, 1)] == 1.0  # identical, both ways
    assert not any(4 in p for p in got)
    # jaccard on the same pair is far below the containment
    j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.01).collect()
    }
    assert j[(1, 2)] < 0.3  # vs containment 1.0 on the same pair
    # df-cut drops candidates only, never changes scores
    capped = {
        (r.doc_src, r.doc_dst): r.containment
        for r in D.containment_pairs(docs, n=3, threshold=0.8, max_doc_freq=50).collect()
    }
    for k, v in capped.items():
        assert got[k] == v
