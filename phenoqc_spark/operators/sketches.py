"""Mergeable HyperLogLog sketch operators (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_union``
/ ``hll_sketch_estimate`` — all JVM aggregates, zero Python).

Why sketches are a first-class 100 TB primitive: COUNT(DISTINCT) over a
petabyte corpus re-scans history on every refresh, while an HLL state
table is a few KB per group, merges associatively (per-batch sketches →
union into the running state — the same incremental-state pattern as the
MinHash dedup signature table), and answers "distinct URLs per host so
far" without touching old data again.

Accuracy contract (measured, lgk=12): estimates are EXACT while a
sketch is in sparse mode (≲512 distinct values — the coupon phase of
the DataSketches HLL), then switch to estimation with ~1.6% relative
standard error.  The oracle queries sit deliberately below the sparse
threshold so the differential is exact; the caveat travels in every
docstring rather than being discovered in production.

No reference analogue (pandas has no mergeable distinct state) — this
is a beyond-reference training-data-pipeline extra.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def cardinality_sketches(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """(keys..., sketch): one HLL sketch of ``value_col``'s distinct
    values per key group — ONE partial+final hash aggregate (sketches
    combine map-side, so the shuffle carries one ~KB sketch per
    (key, partition), never values)."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def merge_cardinality_sketches(*states: DataFrame) -> DataFrame:
    """Union any number of compatible sketch states (same key columns) —
    the incremental-ingest merge: yesterday's state ∪ today's batch.
    Associative and idempotent per distinct value, so replaying a batch
    cannot inflate counts (the property that makes checkpoint-resume
    safe without an epoch ledger)."""
    if not states:
        raise ValueError("merge_cardinality_sketches: no states given")
    keys = [c for c in states[0].columns if c != "sketch"]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.hll_union_agg(F.col("sketch"), True).alias("sketch")
    )


def estimate_cardinalities(state: DataFrame) -> DataFrame:
    """(keys..., n_distinct) from a sketch state — pure JVM estimate."""
    keys = [c for c in state.columns if c != "sketch"]
    return state.select(
        *keys, F.hll_sketch_estimate(F.col("sketch")).alias("n_distinct")
    )


def hyperanf(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
    lgk: int = 12,
) -> DataFrame:
    """(hops, n_pairs): the neighborhood function of the directed graph —
    n_pairs(t) = |{(v, w) : w reachable from v in ≤ t hops}| (self
    included, so n_pairs(0) = #nodes).  The Boldi-Vigna HyperANF idea
    re-expressed on Spark aggregates: each node carries an HLL sketch of
    its reachability set; one round is

        R_t(v) = R_{t-1}(v) ∪ ⋃_{v→u} R_{t-1}(u)

    i.e. one edge×sketch join + ``hll_union_agg`` + a full-outer merge
    with the node's own sketch — two shuffles per hop carrying ~KB
    sketches, never node sets.  This is how effective-diameter /
    reachability-mass curves are computable on web-scale graphs where
    exact closures (|pairs| ~ n²) cannot exist.

    Fixed ``max_hops`` rounds (no early stop) so the output shape is
    deterministic; sketch lineage is localCheckpoint-truncated per hop.
    Counts are exact below the sparse threshold (see module docstring),
    ~1.6% RSE above it.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    sk = nodes.groupBy("node").agg(
        F.hll_sketch_agg(F.col("node"), F.lit(lgk)).alias("sk")
    ).localCheckpoint(eager=True)

    def total(s: DataFrame) -> int:
        return int(
            s.agg(F.sum(F.hll_sketch_estimate(F.col("sk"))).alias("t")).collect()[0].t
        )

    curve = [(0, total(sk))]
    for t in range(1, max_hops + 1):
        nbr = (
            e.join(sk.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.hll_union_agg(F.col("sk"), True).alias("nsk"))
        )
        sk = (
            sk.join(nbr, "node", "full_outer")
            .select(
                "node",
                F.when(F.col("sk").isNull(), F.col("nsk"))
                .when(F.col("nsk").isNull(), F.col("sk"))
                .otherwise(F.hll_union(F.col("sk"), F.col("nsk"), True))
                .alias("sk"),
            )
            .localCheckpoint(eager=True)
        )
        curve.append((t, total(sk)))
    spark = edges.sparkSession
    return spark.createDataFrame(curve, "hops int, n_pairs bigint")


def hyperball_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
    lgk: int = 12,
) -> DataFrame:
    """(node, centrality, n_reachers): harmonic centrality by HyperBall
    (Boldi-Vigna) — ``H(v) = Σ_{w≠v, w→…→v} 1 / d(w, v)`` truncated at
    ``max_hops``, estimated from per-node HLL balls of the INCOMING
    reachability set:

        B_t(v) = B_{t-1}(v) ∪ ⋃_{u→v} B_{t-1}(u)
        H(v)  += (|B_t(v)| - |B_{t-1}(v)|) / t      (each w first appears
                                                     at t = d(w, v))

    The centrality the crawl/KG literature actually recommends for
    ranking pages and entities (well-defined on disconnected graphs,
    unlike closeness) — computable at web scale because each round is
    one edge×sketch join + ``hll_union_agg`` carrying ~KB sketches,
    never node sets (the same shape as :func:`hyperanf`).

    ``n_reachers`` is the final ball size minus self.  Counts are exact
    below the HLL sparse threshold (~512 distinct per ball — the oracle
    zone where the recursive-CTE differential is a true equality);
    ~1.6% RSE above it, where exact closures cannot exist anyway.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    state = (
        nodes.groupBy("node")
        .agg(F.hll_sketch_agg(F.col("node"), F.lit(lgk)).alias("sk"))
        .select(
            "node",
            "sk",
            F.hll_sketch_estimate(F.col("sk")).alias("prev_est"),
            F.lit(0.0).alias("hc"),
        )
        .localCheckpoint(eager=True)
    )
    for t in range(1, max_hops + 1):
        nbr = (
            e.join(state.select(F.col("node").alias("a"), "sk"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.hll_union_agg(F.col("sk"), True).alias("nsk"))
        )
        merged = state.join(nbr, "node", "left").select(
            "node",
            F.when(F.col("nsk").isNull(), F.col("sk"))
            .otherwise(F.hll_union(F.col("sk"), F.col("nsk"), True))
            .alias("sk"),
            "prev_est",
            "hc",
        )
        state = merged.select(
            "node",
            "sk",
            F.hll_sketch_estimate(F.col("sk")).alias("prev_est"),
            (
                F.col("hc")
                + (F.hll_sketch_estimate(F.col("sk")) - F.col("prev_est")) / F.lit(float(t))
            ).alias("hc"),
        ).localCheckpoint(eager=True)
    return state.select(
        "node",
        F.round(F.col("hc"), 6).alias("centrality"),
        (F.col("prev_est") - 1).cast("long").alias("n_reachers"),
    )


def effective_diameter(curve, q: float = 0.9) -> float:
    """Interpolated effective diameter from a :func:`hyperanf` curve —
    the smallest (fractional) hop count at which ≥ ``q`` of the final
    reachable-pair mass is covered (the standard HyperANF readout).

    ``curve`` is the (hops, n_pairs) rows (any order); linear
    interpolation between the two bracketing hops, 0.0 if the t=0 mass
    already covers q (e.g. an edgeless graph).  Driver-side arithmetic
    over ≤ max_hops numbers."""
    pts = sorted((int(h), int(n)) for h, n in curve)
    if not pts:
        raise ValueError("effective_diameter: empty curve")
    target = q * pts[-1][1]
    prev_h, prev_n = pts[0]
    if prev_n >= target:
        return 0.0
    for h, n in pts[1:]:
        if n >= target:
            if n == prev_n:
                return float(h)
            return prev_h + (target - prev_n) / (n - prev_n)
        prev_h, prev_n = h, n
    return float(pts[-1][0])


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequency summaries)
# ---------------------------------------------------------------------------

_MG_ERR_TOKEN = None  # per-group error ledger rides as a token=NULL row


def mg_summary(
    df: DataFrame,
    key_cols: List[str],
    token_col: str,
    m: int = 100,
) -> DataFrame:
    """(keys..., token, cnt) Misra-Gries frequency summary per key group:
    at most ``m`` token rows plus one ``token IS NULL`` error-ledger row
    whose cnt upper-bounds how much every kept count may undercount.

    Built from the batch's exact counts (one hash aggregate) folded to a
    valid MG summary: subtract the (m+1)-th largest count from every
    token and keep the positive remainder — the classical reduction, so
    ``cnt`` is a LOWER bound of the true in-batch frequency and
    ``cnt + err`` an upper bound.  Every true heavy hitter with
    frequency > N/(m+1) survives (the MG guarantee).  When a group has
    ≤ m distinct tokens the summary is EXACT (err = 0) — the oracle
    zone, like the HLL sparse mode above.

    All plan: counts → window rank (cnt desc, token asc — total order,
    deterministic) → broadcast-size join of the per-group pivot count.
    Summary size is O(groups·m) rows regardless of corpus size.
    """
    counts = (
        df.filter(F.col(token_col).isNotNull())
        .groupBy(*key_cols, F.col(token_col).alias("token"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("cnt"), F.asc("token"))
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    pivot = (
        ranked.filter(F.col("_rn") == m + 1)
        .select(*key_cols, F.col("cnt").alias("_pivot"))
    )
    folded = (
        ranked.filter(F.col("_rn") <= m)
        .join(pivot, key_cols, "left")
        .select(
            *key_cols,
            "token",
            (F.col("cnt") - F.coalesce(F.col("_pivot"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    # the error-ledger rows' NULL token casts to the SOURCE column type —
    # a "string" cast would silently widen a non-string token column in
    # the unionByName, changing the summary schema vs the input
    tok_type = counts.schema["token"].dataType
    err = pivot.select(
        *key_cols, F.lit(None).cast(tok_type).alias("token"), F.col("_pivot").alias("cnt")
    )
    # groups with <= m distinct tokens have no pivot row -> no err row ->
    # normalize: always emit an err row (0) so merge arithmetic is uniform
    zero_err = (
        counts.select(*key_cols).distinct()
        .join(pivot.select(*key_cols), key_cols, "left_anti")
        .select(*key_cols, F.lit(None).cast(tok_type).alias("token"), F.lit(0).cast("long").alias("cnt"))
    )
    return folded.unionByName(err).unionByName(zero_err)


def mg_merge(*summaries: DataFrame, m: int = 100) -> DataFrame:
    """Merge MG summaries (same key columns): sum counters per token,
    re-fold to ``m`` rows, and accumulate the error ledger — the
    Agarwal et al. mergeable-summaries construction, so bounds stay
    valid under ANY merge tree (batch → day → month states)."""
    if not summaries:
        raise ValueError("mg_merge: no summaries given")
    keys = [c for c in summaries[0].columns if c not in ("token", "cnt")]
    u = summaries[0]
    for s in summaries[1:]:
        u = u.unionByName(s)
    summed = u.groupBy(*keys, "token").agg(F.sum("cnt").alias("cnt"))
    toks = summed.filter(F.col("token").isNotNull())
    errs = summed.filter(F.col("token").isNull())
    w = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("token"))
    ranked = toks.withColumn("_rn", F.row_number().over(w))
    pivot = ranked.filter(F.col("_rn") == m + 1).select(
        *keys, F.col("cnt").alias("_pivot")
    )
    folded = (
        ranked.filter(F.col("_rn") <= m)
        .join(pivot, keys, "left")
        .select(
            *keys,
            "token",
            (F.col("cnt") - F.coalesce(F.col("_pivot"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    new_err = (
        errs.join(pivot, keys, "left")
        .select(
            *keys,
            F.lit(None).cast(u.schema["token"].dataType).alias("token"),
            (F.col("cnt") + F.coalesce(F.col("_pivot"), F.lit(0))).alias("cnt"),
        )
    )
    return folded.unionByName(new_err)


def mg_estimates(summary: DataFrame) -> DataFrame:
    """(keys..., token, cnt_lower, cnt_upper) from an MG summary — the
    per-group error ledger joined back onto every kept token."""
    keys = [c for c in summary.columns if c not in ("token", "cnt")]
    toks = summary.filter(F.col("token").isNotNull())
    errs = summary.filter(F.col("token").isNull()).select(
        *keys, F.col("cnt").alias("_err")
    )
    join_on = keys if keys else None
    if join_on:
        j = toks.join(errs, join_on, "left")
    else:
        j = toks.crossJoin(errs)
    return j.select(
        *keys,
        "token",
        F.col("cnt").alias("cnt_lower"),
        (F.col("cnt") + F.coalesce(F.col("_err"), F.lit(0))).alias("cnt_upper"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram state (mergeable quantiles / distribution monitoring)
# ---------------------------------------------------------------------------

def histogram_sketches(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(keys..., bin, cnt): equal-width histogram of ``value_col`` over
    [lo, hi) per key group — the third mergeable state next to HLL
    (distinct) and Misra-Gries (frequency): distribution monitoring and
    quantile estimation that refreshes per ingest batch without
    re-scanning history.  ``bin`` -1 holds underflow, ``n_bins``
    overflow; nulls are not counted.  One hash aggregate; state size is
    O(groups·n_bins) regardless of corpus size.  Merging is plain count
    addition (:func:`histogram_merge`) — associative, so any batch →
    day → month roll-up tree is valid."""
    if not hi > lo:
        raise ValueError("histogram_sketches: need hi > lo")
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    bin_ = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(*key_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*states: DataFrame) -> DataFrame:
    """Sum histogram states (same keys, SAME lo/hi/n_bins binning —
    the caller's contract, as with any fixed-layout sketch)."""
    if not states:
        raise ValueError("histogram_merge: no states given")
    keys = [c for c in states[0].columns if c not in ("bin", "cnt")]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    state: DataFrame,
    qs: List[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(keys..., q, value): discrete quantile estimates from a histogram
    state — for each q, the LOWER EDGE of the first bin whose cumulative
    count reaches ceil(q·n) (the ``quantile_disc`` rule applied to bins).

    Resolution is one bin width; when values are integers and the bin
    width is exactly 1, the estimate IS the exact discrete quantile —
    the oracle zone.  Underflow/overflow bins clamp to lo / hi.  Plan:
    one running-sum window per key over ≤ n_bins+2 rows per group (the
    state, not the data), then a bin×quantile expansion — driver never
    involved."""
    keys = [c for c in state.columns if c not in ("bin", "cnt")]
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = state.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy(*keys, "q")
        .agg(F.min("bin").alias("bin"))
    )
    value = (
        F.when(F.col("bin") < 0, F.lit(float(lo)))
        .when(F.col("bin") >= n_bins, F.lit(float(hi)))
        .otherwise(F.lit(float(lo)) + F.col("bin") * F.lit(float(width)))
    )
    return hit.select(*keys, "q", value.alias("value"))


# ---------------------------------------------------------------------------
# Count-Min sketch state (mergeable point-frequency estimates)
# ---------------------------------------------------------------------------

def _cms_pos(tok_col, depth_col, w: int):
    """Deterministic md5-derived probe position — the first 8 hex chars of
    md5('tok|depth') mod w.  md5 (not xxhash64) so the DuckDB oracle can
    recompute the sketch bit-for-bit (same pattern as the walk/SGNS
    draws)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", tok_col, depth_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(w),
    )


def cms_state(
    df: DataFrame,
    key_cols: List[str],
    token_col: str,
    w: int = 2048,
    d: int = 4,
) -> DataFrame:
    """(keys..., depth, pos, cnt): Count-Min sketch per key group in
    sparse COO form — the complement of :func:`mg_summary`: MG keeps the
    top-m heavy hitters with deterministic bounds, CMS answers point
    frequency for ANY token (estimate ≥ truth; overestimate ≤ εN with
    prob 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ — Cormode-Muthukrishnan).

    State shape: at most ``w·d`` occupied cells per key group regardless
    of corpus size (empty cells are absent rows — COO, not a dense
    array, so the state table stays a plain columnar frame that
    ``unionByName + groupBy-sum`` merges associatively under any merge
    tree, the same contract as the HLL/MG/histogram states).

    Everything is JVM codegen: one explode(sequence) per depth, the md5
    probe position, one hash aggregate.  No Python, no collect.
    """
    toks = df.filter(F.col(token_col).isNotNull()).select(
        *key_cols,
        F.col(token_col).cast("string").alias("_tok"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth"),
    )
    return (
        toks.select(
            *key_cols, "depth", _cms_pos(F.col("_tok"), F.col("depth"), w).alias("pos")
        )
        .groupBy(*key_cols, "depth", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*states: DataFrame) -> DataFrame:
    """Merge CMS states (same key columns, same (w, d)): cells sum —
    valid under any merge tree because the sketch is a linear projection
    of the token frequency vector."""
    if not states:
        raise ValueError("cms_merge: no states given")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    keys = [c for c in u.columns if c not in ("cnt",)]
    return u.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    state: DataFrame,
    tokens: DataFrame,
    token_col: str = "token",
    w: int = 2048,
    d: int = 4,
) -> DataFrame:
    """(keys..., token, est): CMS point-frequency estimates for every
    (key group × probe token) — est = min over the d rows of the probed
    cell (absent cell ⇒ 0 ⇒ estimate 0, correctly: CMS never
    underestimates, so a zero row proves the token was unseen).

    ``tokens`` is the probe list (small — broadcast into the join); the
    state never shuffles on anything but its own (keys, depth, pos).
    """
    keys = [c for c in state.columns if c not in ("depth", "pos", "cnt")]
    probes = tokens.select(F.col(token_col).cast("string").alias("token")).distinct().select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth"),
    )
    probes = probes.withColumn("pos", _cms_pos(F.col("token"), F.col("depth"), w))
    groups = state.select(*keys).distinct() if keys else None
    j = state.join(F.broadcast(probes), ["depth", "pos"], "right" if not keys else "inner")
    if keys:
        # absent cells for a (group, token, depth) probe mean count 0 in
        # that row -> min is 0; realize them by probing every group
        full = groups.crossJoin(F.broadcast(probes))
        j = full.join(state, [*keys, "depth", "pos"], "left")
    est = (
        j.groupBy(*keys, "token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    return est
