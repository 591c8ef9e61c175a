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
- Init is pure JVM over the distinct-node frame (no driver
  materialization).  Only the DEFAULT negative-sampling path collects
  the vocab (for its literal lookup array — bounded-vocab contract);
  with ``neg_pairs`` nothing vocabulary-sized ever reaches the driver.
  Per-epoch state is localCheckpoint-truncated.

At the 100 TB tier the pairs table is corpus-sized but each epoch is
one scan + two bounded-shuffle aggregates; U/W are vocab-sized tables
that join broadcast (small vocab) or shuffled-on-node (large vocab) as
Catalyst picks.
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def _hash_unit(key: str) -> float:
    """md5-derived uniform in [-0.5, 0.5) — portable Spark/numpy."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32 - 0.5


def _init_matrix(nodes: DataFrame, d: int, tag: str) -> DataFrame:
    """(node, vec) md5-initialized embedding table, computed with JVM
    expressions over the distinct-node frame — no driver materialization
    (the web-scale path), and bit-identical to the Python-side
    :func:`_hash_unit` formula the numpy twin uses."""
    comps = [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "node", F.lit(tag), F.lit(str(i)))), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**32))
            - F.lit(0.5)
        )
        / F.lit(float(d))
        for i in range(d)
    ]
    return nodes.select("node", F.array(*comps).alias("vec"))


def sgns_train(
    pairs: DataFrame,
    d: int = 8,
    epochs: int = 3,
    lr: float = 0.05,
    negatives: int = 2,
    center_col: str = "center",
    context_col: str = "context",
    neg_pairs: "DataFrame | None" = None,
    return_output_matrix: bool = False,
):
    """Train SGNS embeddings on (center, context) pairs; returns
    ``(embeddings_df, losses)`` — the final input matrix U as a
    (node, vec) DataFrame and the per-epoch full-batch loss list —
    or ``(U, W, losses)`` with ``return_output_matrix=True`` (the output
    matrix W is what :func:`score_pairs` needs for link scoring) —
    (Σ −ln σ(u·w) − Σ_neg ln σ(−u·w′), evaluated BEFORE each update,
    so losses[0] is the init loss and a decreasing curve is the
    training-works signal).

    Negative sampling has two regimes:

    - default (``neg_pairs=None``): ``negatives`` md5-drawn targets per
      pair via a LITERAL vocab array in the plan — exactly twin-
      reproducible, but the array is a plan expression, so this path is
      for BOUNDED vocabularies (ontology-term graphs, ≤ ~10k nodes).
    - ``neg_pairs``: a pre-materialized (center, context) DataFrame of
      negatives (e.g. :func:`~phenoqc_spark.operators.triples.
      negative_samples` — filtered corruptions) used as the y=0 rows —
      the web-scale path: no literal array, negatives arrive as data
      and the same join/aggregate machinery trains against them.
    """
    p = (
        pairs.select(
            F.col(center_col).cast("string").alias("c"),
            F.col(context_col).cast("string").alias("x"),
        )
        .filter(F.col("c").isNotNull() & F.col("x").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = p.select(F.col("c").alias("n")).union(p.select(F.col("x").alias("n")))
    if neg_pairs is not None:
        np_ = (
            neg_pairs.select(
                F.col(center_col).cast("string").alias("c"),
                F.col(context_col).cast("string").alias("x"),
            )
            .filter(F.col("c").isNotNull() & F.col("x").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
        nodes = nodes.union(np_.select(F.col("c").alias("n"))).union(
            np_.select(F.col("x").alias("n"))
        )
    vnodes = (
        nodes.distinct().select(F.col("n").alias("node")).localCheckpoint(eager=True)
    )
    if neg_pairs is None:
        # the literal negative array needs the vocab driver-side —
        # bounded-vocab contract (see docstring); the neg_pairs path
        # never materializes the vocabulary.  ENFORCE the bound: past
        # ~10k nodes the literal array becomes a multi-MB plan
        # expression replicated into every task — fail fast and point at
        # the web-scale path instead of degrading silently.
        V_probe = vnodes.count()
        if V_probe > 10_000:
            raise ValueError(
                f"sgns_train: vocabulary has {V_probe} nodes — the literal-"
                "vocab negative sampler is bounded to ~10k (the vocab is "
                "inlined into the plan). Pre-draw corruptions with "
                "triples.negative_samples and pass them as neg_pairs=, "
                "which never materializes the vocabulary driver-side."
            )
        vocab = sorted(r.node for r in vnodes.collect())
        V = len(vocab)
    else:
        V = vnodes.count()
    if V == 0:
        raise ValueError("sgns_train: no pairs")

    if neg_pairs is not None:
        rows = (
            p.select("c", F.col("x").alias("t"), F.lit(1.0).alias("y"))
            .unionByName(np_.select("c", F.col("x").alias("t"), F.lit(0.0).alias("y")))
            .localCheckpoint(eager=True)
        )
    else:
        vocab_arr = F.array(*[F.lit(v) for v in vocab])
        # (c, t, y) rows: the positive pair + `negatives` md5-drawn targets
        neg_cols = []
        for j in range(negatives):
            idx = (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", "c", "x", F.lit(f"n{j}"))), 1, 8),
                    16,
                    10,
                )
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

    U = _init_matrix(vnodes, d, "u")
    W = _init_matrix(vnodes, d, "w")
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
    if return_output_matrix:
        return U, W, losses
    return U, losses


def score_pairs(
    emb_u: DataFrame,
    emb_w: DataFrame,
    pairs: DataFrame,
    center_col: str = "center",
    context_col: str = "context",
    keep_cols: "List[str] | None" = None,
) -> DataFrame:
    """(center, context, [keep_cols...], s): dot-product scores of pairs
    under (U, W) embedding tables — two joins + a JVM ``zip_with`` fold,
    the scoring half of :func:`sgns_train` exposed for evaluation /
    inference.  ``keep_cols`` ride through (e.g. an eval label), so
    duplicate (center, context) rows with different labels score
    per-row rather than fanning out on a join-back."""
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda l, r: l * r), F.lit(0.0), lambda acc, v: acc + v
    )
    keep = keep_cols or []
    return (
        pairs.select(
            F.col(center_col).cast("string").alias("center"),
            F.col(context_col).cast("string").alias("context"),
            *[F.col(c) for c in keep],
        )
        .join(
            emb_u.withColumnRenamed("node", "center").withColumnRenamed("vec", "u"),
            "center",
        )
        .join(
            emb_w.withColumnRenamed("node", "context").withColumnRenamed("vec", "w"),
            "context",
        )
        .select("center", "context", *keep, dot(F.col("u"), F.col("w")).alias("s"))
    )


def pair_auc(scored: DataFrame, score_col: str = "s", label_col: str = "y") -> float:
    """Exact tie-aware ROC-AUC of labeled pair scores (Mann-Whitney:
    AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with average ranks on ties).

    Plan: one groupBy on the score value (ties collapse), a running-sum
    window over the DISTINCT-score rows, one scalar aggregate.  The
    window is global — correct here because link-prediction EVAL frames
    are sampled/bounded by construction (like ``reservoir_sample``
    diagnostics); score a 10¹²-pair corpus through this and the global
    sort is the bill, so don't.
    """
    g = scored.groupBy(F.col(score_col).alias("sv")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("double")).alias("np"),
    )
    w = Window.orderBy("sv").rowsBetween(Window.unboundedPreceding, 0)
    ranked = g.withColumn("cum", F.sum("n").over(w)).withColumn(
        "avg_rank", F.col("cum") - (F.col("n") - 1) / 2.0
    )
    row = ranked.agg(
        F.sum(F.col("np") * F.col("avg_rank")).alias("rpos"),
        F.sum("np").alias("npos"),
        F.sum(F.col("n") - F.col("np")).alias("nneg"),
    ).collect()[0]
    n_pos, n_neg = float(row.npos or 0), float(row.nneg or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("pair_auc: need both positive and negative pairs")
    return float((row.rpos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
