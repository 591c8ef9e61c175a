"""Similarity search over embedding columns (array<float>).

Operator guide (which ANN to reach for):

- :func:`cosine_topk_bruteforce` — exact baseline.  JVM-side
  ``aggregate(zip_with(...))`` dot products; queries broadcast, corpus
  never shuffled.
- :func:`cosine_topk_ivf` — **the general-purpose ANN default**: recall
  is monotone in ``n_probe`` (measured 0.32 → 1.0, BENCH/ANN.md) in
  EVERY regime, and the cell id becomes a partition column at scale
  (probe = partition pruning).
- :func:`cosine_topk_lsh` — sign-LSH multiprobe: the cheap path, but ONLY
  when true neighbors are at high cosine (near-dup corpora, tight
  clusters): a 1-bit probe reaches neighbors only while
  ``n_planes·θ/π ≲ 1``; on isotropic embeddings (k-NN cosine ≈ 0.26 →
  ~5 expected differing bits at 12 planes) recall craters — measured
  0.10–0.19 (vs 0.96–0.99 clustered).  The operator probes a sample and
  WARNS in that regime (``regime_check``).
- :func:`cosine_topk_pq` (+ :func:`cosine_topk_ivf_pq`) — memory-bound
  tier: 8 B codes vs 256 B vectors; ADC shortlist + exact re-rank.  The
  per-query ADC *coverage* (Σ_m max_j dot(q_m, c_mj) ≤ 1, computed for
  free from the lookup tables) measures how quantization-blind the
  regime is — measured 1.01 on a clustered fixture vs 0.47 on isotropic
  — and sizes ``rerank_factor="auto"``.
- :func:`cosine_topk_auto` — regime-routed entry point: probes a sample
  (:func:`probe_cosine_regime`) and dispatches LSH when the 1-bit reach
  holds, else IVF.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def _norm_expr(col: str):
    return F.sqrt(
        F.aggregate(
            F.col(col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank ≤ k) — exact top-k per query.

    Plan shape: broadcast(queries) ⋈ corpus → per-partition scoring in
    whole-stage codegen → window top-k.  Corpus never shuffles; the only
    shuffle is the (query_id)-partitioned top-k, whose input is already cut
    to candidate scores.  Ties break on (cosine desc, vec_id asc) for
    determinism.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            F.aggregate(
                F.zip_with(F.col("v"), F.col("q"), lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (_norm_expr("v") * _norm_expr("q"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hash_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """(vec_id, embedding array<double>): deterministic bag-of-words
    feature-hashing embedding (the hashing trick, Weinberger et al. 2009)
    — token t adds ``sign(h2(t))`` to bucket ``h1(t) mod dim``; the
    vector is L2-normalized.  No model, no Python: a fully reproducible,
    SQL-recomputable text representation that bridges the documents
    table into the ANN/near-dup operators (hash_embedding →
    cosine_topk_ivf / embedding_near_dups) when no learned embeddings
    exist yet.

    Plan shape: explode tokens → ONE hash-keyed (id, bucket) groupBy
    (map-side partial sums collapse repeated tokens) → per-doc assembly
    of the dense vector from the sparse (bucket, weight) pairs.  The
    text column never shuffles; the shuffle carries 16-byte rows.
    """
    toks = df.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
        ).alias("tok"),
    ).filter(F.length("tok") > 0)
    h1 = F.pmod(F.xxhash64(F.col("tok"), F.lit(seed)), F.lit(dim)).cast("int")
    h2 = F.when(
        F.pmod(F.xxhash64(F.col("tok"), F.lit(seed + 1)), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    sparse = (
        toks.select("vec_id", h1.alias("bucket"), h2.alias("sign"))
        .groupBy("vec_id", "bucket")
        .agg(F.sum("sign").alias("w"))
    )
    assembled = sparse.groupBy("vec_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "w"))).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)),
    )
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    staged = assembled.select("vec_id", vec.alias("_v"), norm.alias("_n"))
    return staged.select(
        "vec_id",
        F.when(F.col("_n") == 0.0, F.col("_v"))
        .otherwise(F.transform(F.col("_v"), lambda x: x / F.col("_n")))
        .alias("embedding"),
    )


def probe_cosine_regime(
    df: DataFrame,
    vec_col: str = "embedding",
    sample_n: int = 512,
    k: int = 10,
    n_planes: int = 12,
) -> dict:
    """Sampled-neighborhood regime probe for ANN routing (driver-side
    numpy over ≤ ``sample_n`` vectors — one bounded collect).

    The statistic that predicts sign-LSH recall is the k-NN cosine
    itself: a neighbor at angle θ differs on ``n_planes·θ/π`` sign bits
    in expectation, and the 1-bit multiprobe only reaches bucket
    distance 1.  Returns ``knn_cos`` (median k-th-neighbor cosine within
    the sample), ``expected_bits`` (= n_planes·arccos(knn_cos)/π),
    ``lsh_suitable`` (expected_bits ≤ 1.25) and ``regime``
    ('clustered' | 'isotropic').  Measured: isotropic bench embeddings
    5.0 expected bits (LSH recall 0.10–0.19), clustered fixture 0.28
    (recall 0.96–0.99).  The within-sample k-NN cosine underestimates the
    full-corpus one, which only makes the gate conservative."""
    import numpy as np

    rows = df.select(F.col(vec_col).alias("v")).limit(sample_n).collect()
    X = np.array([list(r.v) for r in rows], dtype=np.float64)
    n = len(X)
    if n < max(8, k + 1):
        return {
            "n_sampled": n,
            "knn_cos": None,
            "expected_bits": None,
            "lsh_suitable": False,
            "regime": "unknown",
        }
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    sims = X @ X.T
    np.fill_diagonal(sims, -np.inf)
    kth = np.sort(sims, axis=1)[:, -min(k, n - 1)]
    knn_cos = float(np.median(kth))
    theta = float(np.arccos(min(1.0, max(-1.0, knn_cos))))
    expected_bits = n_planes * theta / math.pi
    suitable = expected_bits <= 1.25
    return {
        "n_sampled": n,
        "knn_cos": knn_cos,
        "expected_bits": expected_bits,
        "lsh_suitable": suitable,
        "regime": "clustered" if suitable else "isotropic",
    }


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller on a
    splitmix-style hash — no numpy needed on executors)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    H = rng.normal(size=(n_planes, dim))
    H /= np.linalg.norm(H, axis=1, keepdims=True)
    return H.tolist()


def lsh_sign_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — random-hyperplane sign signature as one long key.

    The hyperplane matrix is a literal array-of-arrays; the signs are
    computed with zip_with/aggregate, JVM-side.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    sign_bits = []
    for i, p in enumerate(planes):
        dot = _dot_literal_expr("v", p)
        sign_bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
    bucket = sign_bits[0]
    for b in sign_bits[1:]:
        bucket = bucket + b
    return base.withColumn("bucket", bucket.cast("long"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    regime_check: Optional[int] = 512,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates → exact cosine re-rank.

    At 100 TB the bucket join replaces the full cross product with
    |bucket|-local work; multi-probe (flip one bit) widens recall.

    ONLY suitable when true neighbors sit at high cosine (see the module
    guide): with ``regime_check`` (default 512-vector sample) the
    operator probes the corpus and warns — pointing at
    :func:`cosine_topk_ivf` / :func:`cosine_topk_auto` — when the 1-bit
    probe cannot reach the k-NN angle.  Set ``regime_check=None`` to
    skip the probe job (e.g. when the regime is already known).
    """
    if regime_check:
        probe_stats = probe_cosine_regime(corpus, vec_col, regime_check, k, n_planes)
        if not probe_stats["lsh_suitable"]:
            import warnings

            warnings.warn(
                "cosine_topk_lsh: sampled k-NN cosine "
                f"{probe_stats['knn_cos']} implies "
                f"{probe_stats['expected_bits']:.1f} expected differing sign "
                f"bits at n_planes={n_planes} — beyond the 1-bit multiprobe "
                "reach, so recall will be poor (measured 0.10-0.19 on "
                "isotropic corpora).  Use cosine_topk_ivf (recall monotone "
                "in n_probe) or cosine_topk_auto instead.",
                stacklevel=2,
            )
    cb = lsh_sign_buckets(corpus, dim, n_planes, seed, id_col, vec_col)
    qb = lsh_sign_buckets(
        queries.select(
            F.col(query_id_col).alias(id_col), F.col(query_vec_col).alias(vec_col)
        ),
        dim,
        n_planes,
        seed,
        id_col,
        vec_col,
    ).withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "q")
    # multi-probe: exact bucket + all 1-bit-flip probes of the query bucket
    probes = qb.select(
        "query_id",
        "q",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(2**i)).cast("long")
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cand = cb.join(F.broadcast(probes), "bucket").select("query_id", "vec_id", "v", "q")
    scored = cand.select(
        "query_id",
        "vec_id",
        (
            F.aggregate(
                F.zip_with(F.col("v"), F.col("q"), lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (_norm_expr("v") * _norm_expr("q"))
        ).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_n: int = 4096,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Spherical k-means centroids from a deterministic driver-side sample.

    IVF coarse quantizer: the codebook is tiny (n_centroids × dim floats)
    and training needs only a bounded sample — the classic pattern at the
    100 TB tier (train on ≤ millions, broadcast the codebook, assign the
    corpus distributed).  Normalized vectors ⇒ cosine ≙ dot.
    """
    import numpy as np

    pdf = (
        df.select(F.col(vec_col).alias("v"))
        .withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(sample_n)
        .toPandas()
    )
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    rng = np.random.RandomState(seed)
    kk = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=kk, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(kk):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C.tolist()


def _dot_literal_expr(vec_col: str, vec: List[float]):
    """dot(col, literal vector) as one zip_with/aggregate pair.

    NOTE a measured anti-lesson: unrolling this to 64 element_at terms
    (the _pq_sub_scores rewrite, which wins at d=8) is 5× SLOWER at
    d=64 × 16 centroids — the ~1 000-node expression tree exceeds the
    JIT/codegen method limits and everything falls back to interpreted
    evaluation.  The lambda form stays one compact code unit."""
    plane = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_dots(vec_col: str, centroids: List[List[float]]):
    """array<double> of dot(vec, centroid_j).

    NO norm division: every consumer (cell assignment argmax, per-query
    probe ranking) compares the dots WITHIN one row, where the row's
    norm is a positive constant — dividing cannot change the argmax or
    the ordering.  (The earlier form divided by the row norm once per
    centroid: |centroids| redundant norm evaluations per row.)"""
    return F.array(*[_dot_literal_expr(vec_col, c) for c in centroids])


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: Optional[List[List[float]]] = None,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus to its nearest centroid
    (broadcast codebook, argmax of JVM dot products), probe the query's
    ``n_probe`` nearest cells, exact-cosine re-rank within them.

    Scale shape: the corpus is scanned once for assignment (map-only; at
    scale the cell id is a partition column of the vector table so probes
    become partition pruning), candidates per query are |probed cells|,
    never the corpus.
    """
    C = centroids or ivf_centroids(corpus, n_centroids, seed=seed, vec_col=vec_col)
    base = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    dots = _centroid_dots("v", C)
    cass = base.withColumn(
        "cid", (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    )
    qd = q.select("query_id", "q", F.posexplode(_centroid_dots("q", C)).alias("cid", "cdot"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cid"))
    probes = (
        qd.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "q", "cid")
    )
    cand = cass.join(F.broadcast(probes), "cid").select("query_id", "vec_id", "v", "q")
    cos = (_dot_expr("v", "q") / (_norm_expr("v") * _norm_expr("q"))).alias("cosine")
    scored = cand.select("query_id", "vec_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_topk_auto(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_centroids: int = 16,
    n_probe: Optional[int] = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: Optional[List[List[float]]] = None,
    sample_n: int = 512,
) -> DataFrame:
    """Regime-routed ANN: probe a corpus sample
    (:func:`probe_cosine_regime`) and dispatch to sign-LSH multiprobe
    when the k-NN angle is within the 1-bit reach (near-dup / tightly
    clustered corpora — the cheap path), else to IVF, whose recall is
    monotone in ``n_probe`` in every regime.  ``n_probe`` defaults to 4
    on clustered corpora and ``n_centroids // 2`` on isotropic ones
    (where neighbors spread across many cells)."""
    stats = probe_cosine_regime(corpus, vec_col, sample_n, k, n_planes)
    if stats["lsh_suitable"]:
        return cosine_topk_lsh(
            corpus,
            queries,
            dim,
            k,
            n_planes,
            seed,
            id_col,
            vec_col,
            query_id_col,
            query_vec_col,
            regime_check=None,  # just probed
        )
    if n_probe is None:
        n_probe = 4 if stats["regime"] == "clustered" else max(4, n_centroids // 2)
    return cosine_topk_ivf(
        corpus,
        queries,
        k,
        n_centroids,
        n_probe,
        seed,
        id_col,
        vec_col,
        query_id_col,
        query_vec_col,
        centroids,
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine ≥ t) near-duplicate pairs via sign-LSH buckets +
    exact verify — the embedding-cosine dedup path."""
    b = lsh_sign_buckets(df, dim, n_planes, seed, id_col, vec_col)
    cand = (
        b.alias("l")
        .join(b.alias("r"), "bucket")
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = (
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (_norm_expr("va") * _norm_expr("vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): 100 TB vector compression for ANN
# ---------------------------------------------------------------------------

def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> List[List[List[float]]]:
    """Per-subvector k-means codebooks ``[m][ksub][dim/m]`` from a bounded
    deterministic sample (the same train-small / broadcast / apply-wide
    pattern as :func:`ivf_centroids`).

    Vectors are L2-normalized before splitting, so the additive ADC score
    (sum of per-subvector dot products against the reconstruction)
    approximates COSINE directly.  At the 100 TB tier the payoff is the
    encoded table: ``m`` small ints per vector (8 bytes at m=8) instead of
    ``dim`` floats (256 bytes at dim=64/fp32) — the scan becomes
    memory-bandwidth-cheap and the full-precision vectors are only touched
    by an optional exact re-rank of the final candidates.
    """
    import numpy as np

    pdf = (
        df.select(F.col(vec_col).alias("v"))
        .withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(sample_n)
        .toPandas()
    )
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} must divide by m {m}"
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for mi in range(m):
        S = X[:, mi * dsub : (mi + 1) * dsub]
        kk = min(ksub, len(S))
        C = S[rng.choice(len(S), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(kk):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append(C.tolist())
    return books


def _pq_sub_scores(vn_col: str, book: List[List[float]], offset: int, cn: List[float]):
    """array<double> of (dot(vn[offset:offset+d], c_j) - ||c_j||²/2) per
    centroid j — the argmax of this is the L2-nearest centroid.  ``cn``
    carries the pinned ||c_j||²/2 literals so an external SQL oracle can
    reproduce the tie-break bit-for-bit.

    Each dot is UNROLLED plain arithmetic (element_at × literal, summed
    left-to-right — the same accumulation order as a zip_with fold, so
    values are bit-identical to the lambda form), not slice + zip_with +
    aggregate: the lambda form allocates a sliced array and a product
    array per (row, centroid) — measured 35.4 s/1M×64d vectors vs 22.1 s
    unrolled on local[32] (163M vectors/hour; BENCH/ANN.md); whole-stage
    codegen turns the unrolled form into straight-line multiply-adds (the
    remaining cost is the 1024 element_at calls per row)."""
    d = len(book[0])
    scores = []
    for j, c in enumerate(book):
        dot = None
        for k in range(d):
            term = F.element_at(F.col(vn_col), offset + k + 1) * F.lit(float(c[k]))
            dot = term if dot is None else dot + term
        scores.append(dot - F.lit(float(cn[j])))
    return F.array(*scores)


def _pq_halfnorms(books: List[List[List[float]]]) -> List[List[float]]:
    return [[sum(x * x for x in c) / 2.0 for c in book] for book in books]


def pq_encode(
    corpus: DataFrame,
    codebooks: List[List[List[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Optional[List[str]] = None,
) -> DataFrame:
    """(vec_id[, extra_cols…], codes array<int>): nearest sub-centroid per
    subvector — map-only JVM expressions over the broadcast (literal)
    codebooks, no shuffle.  Ties resolve to the smallest centroid index
    (first max).  ``extra_cols`` pass through the projection (e.g. the IVF
    ``cid`` for the combined layout) so no re-join is ever needed.  Write
    this table partitioned/bucketed as the compressed ANN index."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cn = _pq_halfnorms(codebooks)
    extras = list(extra_cols or [])
    base = corpus.select(
        F.col(id_col).alias("vec_id"), *[F.col(c) for c in extras], F.col(vec_col).alias("v")
    )
    # Zero-norm guard (query side already has one): an all-zero corpus
    # vector must encode deterministically (as the zero vector → nearest
    # sub-centroids), not yield null/NaN codes through a 0/0 division.
    # Conditional rather than +eps so nonzero vectors normalize
    # bit-identically to before (the pinned ADC oracles stay exact).
    safe_norm = F.when(_norm_expr("v") == 0.0, F.lit(1.0)).otherwise(_norm_expr("v"))
    staged = base.withColumn(
        "_vn", F.transform(F.col("v"), lambda x: x.cast("double") / safe_norm)
    )
    code_exprs = []
    for mi in range(m):
        s = _pq_sub_scores("_vn", codebooks[mi], mi * d, cn[mi])
        code_exprs.append((F.array_position(s, F.array_max(s)) - 1).cast("int"))
    return staged.select("vec_id", *extras, F.array(*code_exprs).alias("codes"))


def _pq_query_tables(
    spark,
    queries: DataFrame,
    codebooks: List[List[List[float]]],
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, T array<array<double>>): the per-query ADC lookup table
    — dot(normalized query subvector, sub-centroid) for every (m, j).
    Built driver-side (queries are a bounded dimension, like IVF probe
    lists) and broadcast.

    Also computes each query's ADC *coverage* Σ_m max_j T[m][j] (≤ 1 for
    a normalized query) — how much of the query's energy the codebooks
    can express, i.e. how quantization-blind the regime is (measured:
    ≈1.01 clustered fixture, ≈0.47 isotropic bench embeddings).  The
    median is attached to the returned DataFrame as
    ``df._pq_coverage`` for the shortlist-sizing rule in
    :func:`cosine_topk_pq` — free, no extra pass."""
    import numpy as np

    m = len(codebooks)
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    ).collect()
    data = []
    coverages = []
    for r in qrows:
        q = np.array(list(r.q), dtype=np.float64)
        q = q / (np.linalg.norm(q) + 1e-12)
        dsub = len(q) // m
        T = [
            [
                float(np.dot(q[mi * dsub : (mi + 1) * dsub], np.array(c)))
                for c in codebooks[mi]
            ]
            for mi in range(m)
        ]
        coverages.append(sum(max(row) for row in T))
        data.append((r.query_id, T))
    # derive the id type from the input frame: string / int / long query
    # ids all work (a hardcoded 'long' used to reject string ids)
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("query_id", queries.schema[query_id_col].dataType),
            StructField("T", ArrayType(ArrayType(DoubleType()))),
        ]
    )
    out = spark.createDataFrame(data, schema)
    out._pq_coverage = (  # type: ignore[attr-defined]
        float(sorted(coverages)[len(coverages) // 2]) if coverages else None
    )
    return out


def cosine_topk_pq(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: List[List[List[float]]],
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    rerank: Optional[DataFrame] = None,
    rerank_factor: "int | str" = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: per query, a tiny ``m × ksub`` lookup table of
    dot(query_subvector, sub_centroid) is built driver-side (queries are a
    bounded dimension, like IVF probe lists) and shipped as a column of the
    broadcast query frame; each corpus row's score is the m-term sum of
    table entries selected by its codes — one ``zip_with`` + fold, never
    touching the original vectors.

    ADC ranks at CODE granularity: members of a tight cluster share codes,
    so their relative order is quantization-blind (measured recall@10 ≈
    0.55 on a 6-cluster fixture) — by design.  Pass ``rerank`` (the
    full-precision vector table) to run the production second stage: the
    ADC top ``k × rerank_factor`` shortlist joins its real vectors and is
    re-ranked by exact cosine; only |queries| × k × factor rows ever touch
    full-precision data.

    Shortlist sizing rule: the per-query ADC coverage (Σ_m max_j T[m][j],
    computed for free by :func:`_pq_query_tables`) measures how much of
    the query's energy the codebooks express.  High coverage (≥ 0.7,
    clustered regime): codes separate neighbors well — factor 4 recovers
    ≥ 0.9 recall (test-asserted).  Low coverage (isotropic regime): ADC
    order is noisy — factor 4 recovered only 0.448 (BENCH/ANN.md), so
    ``rerank_factor="auto"`` (default) picks 16 there and 4 otherwise;
    ADC-only calls in a low-coverage regime get a warning.  Returns
    (query_id, vec_id, adc_score, rank) or, reranked, (query_id, vec_id,
    cosine, rank)."""
    qt = _pq_query_tables(codes_df.sparkSession, queries, codebooks, query_id_col, query_vec_col)
    coverage = getattr(qt, "_pq_coverage", None)
    if rerank_factor == "auto":
        rerank_factor = 4 if (coverage is None or coverage >= 0.7) else 16
    if rerank is None and coverage is not None and coverage < 0.7:
        import warnings

        warnings.warn(
            f"cosine_topk_pq: ADC coverage {coverage:.2f} < 0.7 — the "
            "codebooks express little of the query energy in this regime, "
            "so ADC-only ranking is quantization-noisy; pass rerank= (the "
            "full-precision vector table) for the exact re-rank stage.",
            stacklevel=2,
        )
    scored = codes_df.crossJoin(F.broadcast(qt)).select(
        "query_id",
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("T"),
                    lambda c, trow: F.element_at(trow, c + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("adc_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "adc_score", "rank")
        )
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "vec_id")
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    )
    cand = (
        shortlist.join(
            rerank.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
            "vec_id",
        )
        .join(F.broadcast(qv), "query_id")
    )
    cos = (_dot_expr("v", "q") / (_norm_expr("v") * _norm_expr("q"))).alias("cosine")
    rescored = cand.select("query_id", "vec_id", cos)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_topk_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    k: int = 10,
    n_probe: int = 4,
    rerank_factor: "int | str" = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The full production corpus-scale retrieval path, composed from the
    tested pieces: IVF cell assignment (map-only, broadcast coarse
    codebook) → probe the query's ``n_probe`` nearest cells → PQ ADC
    scoring over the 8-byte codes WITHIN probed cells only → exact-cosine
    re-rank of the top ``k × rerank_factor`` shortlist against the
    full-precision vectors.

    Scale shape: the corpus is touched by exactly one map-only
    assign+encode pass (at rest this is the cid-partitioned codes table —
    probes become partition pruning, see ``cosine_topk_ivf_partitioned``);
    the candidate set per query is |probed cells|, scored at 8 bytes per
    vector; full-precision rows are read only for the shortlist.
    """
    assigned = ivf_assign_cells(corpus, centroids, id_col, vec_col)
    codes = pq_encode(assigned, codebooks, id_col="vec_id", vec_col="embedding",
                      extra_cols=["cid"])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    )
    qd = q.select(
        "query_id", F.posexplode(_centroid_dots("q", centroids)).alias("cid", "cdot")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cid"))
    probes = (
        qd.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "cid")
    )
    qt = _pq_query_tables(corpus.sparkSession, queries, codebooks, query_id_col, query_vec_col)
    if rerank_factor == "auto":
        cov = getattr(qt, "_pq_coverage", None)
        rerank_factor = 4 if (cov is None or cov >= 0.7) else 16
    cand = codes.join(F.broadcast(probes), "cid").join(F.broadcast(qt), "query_id")
    scored = cand.select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("T"),
                lambda c, trow: F.element_at(trow, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("adc_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "vec_id")
    )
    cand_full = shortlist.join(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")), "vec_id"
    ).join(F.broadcast(q), "query_id")
    cos = (_dot_expr("v", "q") / (_norm_expr("v") * _norm_expr("q"))).alias("cosine")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand_full.select("query_id", "vec_id", cos)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_assign_cells(
    corpus: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, cid): nearest-centroid cell per vector, computed
    map-only from the broadcast codebook.  Write this partitioned by ``cid``
    (``.write.partitionBy("cid")`` / an Iceberg identity partition) to get
    the 100 TB IVF layout — probes then become partition pruning."""
    base = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    dots = _centroid_dots("embedding", centroids)
    return base.withColumn("cid", (F.array_position(dots, F.array_max(dots)) - 1).cast("int"))


def cosine_topk_ivf_partitioned(
    spark,
    table_path: str,
    queries: DataFrame,
    centroids: List[List[float]],
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF ANN over a cell-PARTITIONED vector table: the probe-cell filter
    is a partition predicate, so the scan reads ONLY the probed cells'
    files (``PartitionFilters`` in the plan — the part of the corpus
    touched is |probed cells| / |cells|, independent of corpus size).

    The probe set is computed driver-side from the broadcast codebook
    (|queries| × n_probe cell ids — bounded), because a partition filter
    must be a literal predicate to prune at planning time.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("q")
    )
    qd = q.select("query_id", "q", F.posexplode(_centroid_dots("q", centroids)).alias("cid", "cdot"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cid"))
    probes = (
        qd.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "q", "cid")
    )
    probe_cells = sorted({r.cid for r in probes.select("cid").distinct().collect()})
    corpus = spark.read.parquet(table_path).filter(F.col("cid").isin(probe_cells))
    cand = corpus.join(F.broadcast(probes), "cid").select(
        "query_id", "vec_id", F.col("embedding").alias("v"), "q"
    )
    cos = (_dot_expr("v", "q") / (_norm_expr("v") * _norm_expr("q"))).alias("cosine")
    scored = cand.select("query_id", "vec_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
