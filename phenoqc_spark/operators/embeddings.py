"""Distributed SGNS (skip-gram with negative sampling) embedding
training — the training step that consumes the engine's walk corpora
(`random_walks` / `node2vec_walks` → `walks_to_skipgrams`) and filtered
`negative_samples`, closing the KG-embedding loop end to end.

Design (Spark-first, zero Python in the per-row math):

- Embeddings live as (node, vec array<double>) DataFrames (input matrix
  U for centers, output matrix W for contexts), initialized from md5
  hashes so runs are bit-reproducible and the numpy twin can replicate
  them exactly.
- FULL-BATCH gradient descent per epoch (not async SGD): every
  (center, target, label) row scores via a JVM ``zip_with`` dot product
  + sigmoid, per-row gradient coefficients scale the opposite vector
  with ``transform``, and gradients aggregate with the
  ``posexplode → groupBy(node, pos) → sum`` shape whose map-side
  partials bound the shuffle at O(V·d·partitions) — the k-means update
  pattern.  Full-batch makes the computation deterministic (modulo
  float-sum order ~1e-12) and therefore twin-checkable; async SGD is
  faster per epoch but unreproducible by construction.
- Negatives are md5-drawn per (center, context, j) from the vocab —
  the same portable-hash trick as the walk operators, so the twin
  reproduces the exact sample.
- The vocab (bounded dimension data — graph nodes, not corpus rows) is
  collected once for the literal negative-lookup array and the init;
  per-epoch state is localCheckpoint-truncated.

At the 100 TB tier the pairs table is corpus-sized but each epoch is
one scan + two bounded-shuffle aggregates; U/W are vocab-sized tables
that join broadcast (small vocab) or shuffled-on-node (large vocab) as
Catalyst picks.
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import DataFrame, functions as F


def _hash_unit(key: str) -> float:
    """md5-derived uniform in [-0.5, 0.5) — portable Spark/numpy."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32 - 0.5


def _init_matrix(spark, vocab: List[str], d: int, tag: str) -> DataFrame:
    rows = [
        (v, [_hash_unit(f"{v}|{tag}|{i}") / d for i in range(d)]) for v in vocab
    ]
    return spark.createDataFrame(rows, "node string, vec array<double>")


def sgns_train(
    pairs: DataFrame,
    d: int = 8,
    epochs: int = 3,
    lr: float = 0.05,
    negatives: int = 2,
    center_col: str = "center",
    context_col: str = "context",
):
    """Train SGNS embeddings on (center, context) pairs; returns
    ``(embeddings_df, losses)`` — the final input matrix U as a
    (node, vec) DataFrame and the per-epoch full-batch loss list
    (Σ −ln σ(u·w) − Σ_neg ln σ(−u·w′), evaluated BEFORE each update,
    so losses[0] is the init loss and a decreasing curve is the
    training-works signal).
    """
    spark = pairs.sparkSession
    p = (
        pairs.select(
            F.col(center_col).cast("string").alias("c"),
            F.col(context_col).cast("string").alias("x"),
        )
        .filter(F.col("c").isNotNull() & F.col("x").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    vocab = sorted(
        r.n
        for r in p.select(F.col("c").alias("n"))
        .union(p.select(F.col("x").alias("n")))
        .distinct()
        .collect()
    )
    V = len(vocab)
    if V == 0:
        raise ValueError("sgns_train: no pairs")
    vocab_arr = F.array(*[F.lit(v) for v in vocab])

    # (c, t, y) rows: the positive pair + `negatives` md5-drawn targets
    neg_cols = []
    for j in range(negatives):
        idx = (
            F.conv(F.substring(F.md5(F.concat_ws("|", "c", "x", F.lit(f"n{j}"))), 1, 8), 16, 10)
            .cast("long")
            % V
        )
        neg_cols.append(F.element_at(vocab_arr, (idx + 1).cast("int")))
    rows = (
        p.select(
            "c",
            F.explode(
                F.concat(
                    F.array(F.struct(F.col("x").alias("t"), F.lit(1.0).alias("y"))),
                    F.array(*[
                        F.struct(nc.alias("t"), F.lit(0.0).alias("y"))
                        for nc in neg_cols
                    ]),
                )
            ).alias("s"),
        )
        .select("c", F.col("s.t").alias("t"), F.col("s.y").alias("y"))
        .localCheckpoint(eager=True)
    )

    U = _init_matrix(spark, vocab, d, "u")
    W = _init_matrix(spark, vocab, d, "w")
    losses: List[float] = []
    dot = lambda a, b: F.aggregate(  # noqa: E731 — fixed-order JVM fold
        F.zip_with(a, b, lambda l, r: l * r), F.lit(0.0), lambda acc, v: acc + v
    )
    for _ in range(epochs):
        scored = (
            rows.join(U.withColumnRenamed("node", "c").withColumnRenamed("vec", "u"), "c")
            .join(W.withColumnRenamed("node", "t").withColumnRenamed("vec", "w"), "t")
            .withColumn("s", dot(F.col("u"), F.col("w")))
            .withColumn("sig", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))))
            .withColumn("coef", F.col("sig") - F.col("y"))
            .persist()
        )
        loss = scored.agg(
            F.sum(
                F.when(F.col("y") == 1.0, -F.log(F.col("sig"))).otherwise(
                    -F.log(F.lit(1.0) - F.col("sig"))
                )
            ).alias("l")
        ).collect()[0].l
        losses.append(float(loss))
        gu = (
            scored.select(
                "c", F.posexplode(F.transform("w", lambda e: F.col("coef") * e)).alias("pos", "g")
            )
            .groupBy("c", "pos")
            .agg(F.sum("g").alias("g"))
            .groupBy("c")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "g"))).alias("gs"))
            .select(F.col("c").alias("node"), F.col("gs.g").alias("grad"))
        )
        gw = (
            scored.select(
                "t", F.posexplode(F.transform("u", lambda e: F.col("coef") * e)).alias("pos", "g")
            )
            .groupBy("t", "pos")
            .agg(F.sum("g").alias("g"))
            .groupBy("t")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "g"))).alias("gs"))
            .select(F.col("t").alias("node"), F.col("gs.g").alias("grad"))
        )
        U = (
            U.join(gu, "node", "left")
            .select(
                "node",
                F.when(F.col("grad").isNull(), F.col("vec"))
                .otherwise(F.zip_with("vec", "grad", lambda v, g: v - lr * g))
                .alias("vec"),
            )
            .localCheckpoint(eager=True)
        )
        W = (
            W.join(gw, "node", "left")
            .select(
                "node",
                F.when(F.col("grad").isNull(), F.col("vec"))
                .otherwise(F.zip_with("vec", "grad", lambda v, g: v - lr * g))
                .alias("vec"),
            )
            .localCheckpoint(eager=True)
        )
        scored.unpersist()
    return U, losses
