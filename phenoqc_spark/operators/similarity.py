"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline.  The dot product is computed
  JVM-side with ``aggregate(zip_with(...))`` — no Python in the scoring
  loop; queries are broadcast so the corpus is never shuffled.
- LSH-bucketed ANN (random hyperplane signs → bucket join): the scale
  path — candidates come only from matching buckets, then exact cosine
  re-ranks.  Recall/probes trade off via number of hyperplanes/tables.
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
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col("v"), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
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
) -> DataFrame:
    """Approximate top-k: bucket-join candidates → exact cosine re-rank.

    At 100 TB the bucket join replaces the full cross product with
    |bucket|-local work; multi-probe (flip one bit) widens recall.
    """
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


def _centroid_dots(vec_col: str, centroids: List[List[float]]):
    """array<double> of dot(vec, centroid_j) — JVM literals, codegen."""
    dots = []
    for c in centroids:
        plane = F.array(*[F.lit(float(x)) for x in c])
        dots.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / _norm_expr(vec_col)
        )
    return F.array(*dots)


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
