"""Identity canonicalization via connected components (SURVEY.md §2.9 G3).

The reference canonicalizes 1-hop (alt_id → primary, xref → id) inside the
dictionary (reference: src/phenoqc/mapping.py:223-262,294-313).  The engine
generalizes to transitive same-as closure over alt/xref/custom-mapping
edges: connected components computed with the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) — pure DataFrame joins/aggregations, converging in
O(log² n) rounds, with ``localCheckpoint`` each round to truncate lineage.

Component label = min(node id) lexicographically; the canonical id of a
component is then chosen as the primary-preferred member (see
``canonical_mapping``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, component) with component = min member id of the node's CC.

    Implementation: min-label propagation expressed as alternating
    large-star/small-star operations on the edge list.  Each round is two
    shuffles (groupBy min + join); lineage is truncated via
    localCheckpoint so the iterative plan doesn't blow up the optimizer —
    the driver-side loop is inherent (fixpoints are not a single Catalyst
    plan, SURVEY.md §4.2).
    """
    # undirected: keep each edge both ways, self-loops dropped.  One
    # distinct over the symmetric union suffices — a pre-distinct on the
    # raw edges would be a second full shuffle of the edge list for the
    # same result.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # Persist the symmetric edge list: every iteration joins against it, and
    # without the persist each round would re-execute the FULL upstream
    # lineage (for minhash_near_dedup that is the whole LSH+verify pipeline
    # — measured 4× the total wall-clock on a 1M-doc dedup).
    sym = sym.persist()
    # labels: start with each node's min neighbor (or itself)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nbr_min"))
        .select("node", F.least("node", "nbr_min").alias("comp"))
    )
    for i in range(max_iter):
        # propagate: node's comp = min(own comp, neighbors' comps)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        # pointer-jumping: comp = comp's comp (halves chain depth per round)
        jumped = (
            new_labels.alias("l")
            .join(
                new_labels.select(
                    F.col("node").alias("cnode"), F.col("comp").alias("ccomp")
                ).alias("r"),
                F.col("l.comp") == F.col("r.cnode"),
                "left",
            )
            .select(
                F.col("l.node").alias("node"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("r.ccomp"), F.col("l.comp"))
                ).alias("comp"),
            )
        )
        if checkpoint_every and (i % checkpoint_every == 0):
            jumped = jumped.localCheckpoint(eager=True)
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    # labels are localCheckpoint-ed (materialized) — safe to free the edges
    sym.unpersist()
    return labels.select("node", F.col("comp").alias("component"))


def canonical_mapping(
    edges: DataFrame,
    primaries: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, canonical_id): every same-as-connected node maps to one id.

    If ``primaries`` (single column ``id``) is given, the canonical id of a
    component is its minimal primary member when one exists (alt ids never
    become canonical); otherwise the min member.
    """
    cc = connected_components(edges, src, dst)
    if primaries is None:
        return cc.select("node", F.col("component").alias("canonical_id"))
    prim = primaries.select(F.col(primaries.columns[0]).alias("node")).withColumn(
        "_is_prim", F.lit(1)
    )
    tagged = cc.join(F.broadcast(prim), "node", "left")
    best = (
        tagged.filter(F.col("_is_prim") == 1)
        .groupBy("component")
        .agg(F.min("node").alias("prim_id"))
    )
    return (
        cc.join(best, "component", "left")
        .select(
            "node",
            F.coalesce(F.col("prim_id"), F.col("component")).alias("canonical_id"),
        )
    )


def graph_degree_stats(
    triples: DataFrame, subj: str = "subj", obj: str = "obj"
) -> DataFrame:
    """(entity, out_degree, in_degree): per-entity degree over the triple
    graph — the first materialized-graph diagnostic (hub entities, orphan
    nodes, degree skew feeding salting decisions).

    Two hash-groupBys on the entity keys + one full-outer merge of the
    (already aggregated, entity-sized) results — the fact table itself is
    aggregated before any join, so hub skew collapses map-side.
    """
    out_deg = triples.groupBy(F.col(subj).alias("entity")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = triples.groupBy(F.col(obj).alias("entity")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "entity", "full")
        .select(
            "entity",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def graph_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_triangles): per-node triangle count over the undirected
    simple graph of ``edges`` — the KG cohesion diagnostic behind
    clustering-coefficient / community-density checks.

    Degree-ordered orientation (the standard scale trick): orient every
    undirected edge from its LOWER-degree endpoint to the higher
    (ties by id), so each wedge is enumerated exactly once from its
    smallest-degree corner and the wedge join's per-key fan-out is
    bounded by O(sqrt(|E|)) even on hub-skewed graphs — a hub of degree d
    contributes wedges only through its (low-degree) neighbors, never
    d² pairs.  Plan: one degree aggregate, one map-side orientation, one
    self-join on the wedge pivot, one semi-join against the oriented edge
    set to close each wedge, one count per corner; each triangle is found
    once and credited to all three corners.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
    )
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    deg = und.groupBy(F.col("a").alias("n")).agg(F.count(F.lit(1)).alias("d"))
    # orient: keep (a,b) iff (deg(a), a) < (deg(b), b)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .filter((F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))))
        .select("a", "b")
        .persist()
    )
    # wedges pivoting at a: (a→b, a→c) with b < c in orientation order;
    # closing edge must be the ORIENTED (b,c) (b precedes c by construction)
    w1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        oriented.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    tris = wedges.join(closing, ["x", "y"], "left_semi").persist()
    counts = (
        tris.select(F.col("p").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = deg.select(F.col("n").alias("node")).join(counts, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
    out._phenoqc_persisted = [oriented, tris]  # type: ignore[attr-defined]
    return out


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, n_triangles, clustering_coeff): local clustering
    coefficient ``2·T / (d·(d-1))`` over the undirected simple graph —
    the density diagnostic next to :func:`graph_triangles` (d ≤ 1 nodes
    get coefficient 0.0).  One extra aggregate over the same oriented
    plan; no new shuffle class."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
    )
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    tri = graph_triangles(edges, src, dst)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") > 1,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    weight: "str | None" = None,
) -> DataFrame:
    """(node, rank): fixed-iteration power-method PageRank over the
    directed edge list — entity importance on the materialized KG (e.g.
    picking representative entities, weighting canonical ids).

    Standard formulation: each round every node sends rank/out_degree
    along its out-edges; dangling (sink) mass and the teleport term are
    redistributed uniformly, so Σrank = 1 is invariant.  Per round: one
    join against the persisted (edge, out_degree) list + one groupBy sum —
    the same two-shuffle round shape as :func:`connected_components`, with
    ``localCheckpoint`` truncating the iterative lineage.  The per-round
    dangling-mass scalar is a driver-side aggregate (one double), like the
    CC convergence check.  Deterministic for a fixed ``iters``.

    ``checkpoint_every=1`` (the default) eagerly materializes every
    round's ranks: each round is consumed by TWO actions (the next
    round's dangling collect and its contribs join), so any
    un-checkpointed round executes its join+agg twice.  Measured on the
    1M-page triple graph (6.8M edges, 979k nodes, local[32], 10 iters):
    45.8 s at every-2 vs 25.6 s at every-1 — the node-sized materialize
    is far cheaper than recomputing the edge-sized join.

    ``weight`` names an edge-weight column (e.g. the triple confidence
    score): contributions become rank·w/Σw(out), parallel edges collapse
    by SUMMING weights, and a source whose total out-weight is 0 is
    treated as dangling.  ``weight=None`` is exactly the unweighted
    formulation above (w ≡ 1 ⇒ Σw(out) = out-degree).
    """
    if weight is None:
        e = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        e = (
            edges.select(
                F.col(src).alias("a"),
                F.col(dst).alias("b"),
                F.col(weight).cast("double").alias("_w"),
            )
            .filter(
                F.col("a").isNotNull() & F.col("b").isNotNull() & F.col("_w").isNotNull()
            )
            .groupBy("a", "b")
            .agg(F.sum("_w").alias("_w"))
        )
    nodes = e.select(F.col("a").alias("node")).union(
        e.select(F.col("b").alias("node"))
    ).distinct().persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("a").agg(F.sum("_w").alias("deg")).filter(F.col("deg") > 0)
    links = e.join(out_deg, "a").persist()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    dangling_nodes = nodes.join(
        out_deg.withColumnRenamed("a", "node"), "node", "left_anti"
    ).persist()
    for i in range(iters):
        contribs = (
            links.join(ranks.withColumnRenamed("node", "a"), "a")
            .select(
                F.col("b").alias("node"),
                (F.col("rank") * F.col("_w") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        row = dangling_nodes.join(ranks, "node").agg(F.sum("rank").alias("d")).collect()[0]
        dangling = float(row.d or 0.0)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if checkpoint_every and (i % checkpoint_every == 0):
            ranks = ranks.localCheckpoint(eager=True)
    links.unpersist()
    dangling_nodes.unpersist()
    nodes.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
) -> DataFrame:
    """(node, hub, authority): Kleinberg HITS over the directed edge
    list — the natural web-KG dual of PageRank (pages are hubs, ontology
    terms are authorities; a good hub cites good authorities and vice
    versa).  Mutual power iteration with L2 normalization each half-step:
    ``auth = Aᵀ·hub / ‖·‖₂`` then ``hub = A·auth / ‖·‖₂``.

    Round shape: per half-step one join of the persisted edge list
    against the node-sized score frame + one groupBy sum, then a
    driver-side scalar for the norm (the same bounded-collect tier as
    PageRank's dangling mass); ``localCheckpoint`` per iteration.  Nodes
    with no out-edges have hub 0, no in-edges authority 0 — both still
    appear.  Deterministic for fixed ``iters`` up to float summation
    order (oracle rounds to 6 dp, ~1e8× the divergence)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn("authority", F.lit(0.0))
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(iters):
        raw_a = (
            e.join(hub.withColumnRenamed("node", "a").withColumnRenamed("h", "_s"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("_s").alias("s"))
        )
        auth = nodes.join(raw_a, "node", "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("x")
        )
        norm = float(auth.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).collect()[0][0])
        auth = auth.select("node", (F.col("x") / F.lit(norm)).alias("x"))
        raw_h = (
            e.join(auth.withColumnRenamed("node", "b").withColumnRenamed("x", "_s"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.sum("_s").alias("s"))
        )
        hub = nodes.join(raw_h, "node", "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("h")
        )
        norm_h = float(hub.agg(F.sqrt(F.sum(F.col("h") * F.col("h")))).collect()[0][0])
        hub = hub.select("node", (F.col("h") / F.lit(norm_h)).alias("h")).localCheckpoint(
            eager=True
        )
    out = hub.join(auth.withColumnRenamed("x", "authority"), "node").select(
        "node", F.col("h").alias("hub"), "authority"
    )
    e.unpersist()
    nodes.unpersist()
    return out


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 10_000,
) -> DataFrame:
    """(node, coreness): k-core decomposition of the undirected simple
    graph — coreness k means the node survives in the maximal subgraph
    of minimum degree k but not k+1.  The KG robustness diagnostic
    complementing :func:`graph_triangles` (dense nucleus extraction,
    peel-layer pruning of weakly-attached entities before canonical-id
    election).

    Distributed peeling: phase k repeatedly removes every still-alive
    node whose remaining degree is ≤ k (including nodes isolated by
    earlier removals in the same phase) and assigns it coreness k; when
    a sweep removes nothing, k advances.  The k-core is unique, so the
    result is deterministic regardless of execution order.  Each sweep
    is one degree aggregate over the remaining symmetric edge list + two
    anti-joins — the :func:`connected_components` round shape, with
    ``localCheckpoint`` truncating lineage per sweep and ONE driver
    action per sweep (the peeled-count, which also advances the
    remaining-alive counter arithmetically — no separate emptiness
    probe).  Total sweeps are bounded by degeneracy + number of distinct
    core levels, both tiny for web-KG graphs (hub-heavy ⇒ shallow peel
    depth); measured 1M hub-skewed edges / 392k nodes / max core 6 in
    ~90 s on local[32] (~30 sweeps at a ~3 s/sweep scheduling +
    checkpoint floor — the edge set shrinks as phases peel, so sweep
    cost falls off after the bulk layers; BENCH/DEDUP.md).
    Reference analogue: none (graph materialize extra)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
    )
    rem = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    rem = rem.localCheckpoint(eager=True)
    alive = rem.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node string, coreness long") if dict(
        edges.dtypes
    )[src] == "string" else spark.createDataFrame([], f"node {dict(edges.dtypes)[src]}, coreness long")
    n_alive = alive.count()
    k = 0
    for _ in range(max_rounds):
        if n_alive == 0:
            break
        # alive nodes with remaining degree > k keep living; everything
        # else (degree ≤ k, or 0 via isolation) peels at this k
        high = (
            rem.groupBy("a")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") > k)
            .select(F.col("a").alias("node"))
        )
        low = alive.join(high, "node", "left_anti").localCheckpoint(eager=True)
        n_low = low.count()  # the sweep's single driver action
        if n_low == 0:
            k += 1
            continue
        n_alive -= n_low
        # no checkpoint on `out`: its lineage is a flat union of already
        # checkpointed `low` leaves, so it stays shallow by construction
        out = out.union(low.select("node", F.lit(k).cast("long").alias("coreness")))
        alive = alive.join(low, "node", "left_anti").localCheckpoint(eager=True)
        rem = (
            rem.join(low.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(low.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"coreness: did not converge in {max_rounds} sweeps")
    return out


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 50,
) -> DataFrame:
    """(node, distance): unweighted shortest-path distance from the
    ``sources`` node set (a DataFrame with a ``node`` column, distance 0)
    over the undirected simple graph — KG reachability/radius diagnostic
    (how far is every entity from the canonical seed set; unreachable
    nodes are absent from the result).

    Level-synchronous frontier expansion: each round joins the current
    frontier against the symmetric edge list, anti-joins already-visited
    nodes, and appends the new level — one join + one anti-join per
    level, ``localCheckpoint`` per round (the
    :func:`connected_components` lineage discipline).  Rounds = graph
    diameter from the seed set, which is small on hub-heavy KGs (hubs
    compress distances).  Deterministic: BFS level sets are unique.

    ``max_depth`` caps the rounds: nodes farther than it are ABSENT from
    the result, indistinguishable from unreachable — raise it when the
    graph's diameter from the seeds could exceed the default (50 is far
    beyond any hub-heavy KG's diameter, which is what the default is
    sized for).  Reference analogue: none (graph materialize extra)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
    )
    rem = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    rem = rem.localCheckpoint(eager=True)
    visited = sources.select("node").distinct().localCheckpoint(eager=True)
    frontier = visited
    out = visited.select("node", F.lit(0).cast("long").alias("distance"))
    for d in range(1, max_depth + 1):
        nxt = (
            rem.join(frontier.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        out = out.union(nxt.select("node", F.lit(d).cast("long").alias("distance")))
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return out


def canonicalize_objects(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite triple objects through the canonical mapping (broadcast join —
    the mapping is ontology-sized, ~10⁵ rows, never the fact side)."""
    m = F.broadcast(mapping.withColumnRenamed("node", "obj"))
    return (
        triples.join(m, "obj", "left")
        .withColumn("obj", F.coalesce(F.col("canonical_id"), F.col("obj")))
        .drop("canonical_id")
    )


def ancestor_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 100,
) -> DataFrame:
    """(node, ancestor, depth): transitive closure of the ``is_a``
    subsumption DAG, depth = MINIMUM hop count ≥ 1 (direct parent = 1).
    Self-pairs are excluded; nodes appearing only as parents contribute
    ancestors, not rows.

    Semi-naive iteration: each round extends only the previous round's
    NEW pairs by one parent hop, anti-joins pairs already known, and
    ``localCheckpoint``\\ s the delta (the :func:`connected_components`
    lineage discipline).  Rounds = hierarchy depth — ~16 for HPO-sized
    ontologies.  Because BFS discovers each (node, ancestor) pair first
    at its minimum depth, the depth column needs no post-aggregation.

    Scale posture: ontologies are DIMENSION data (10⁴–10⁵ terms, ~1.2
    edges/term), so the closure output — |terms| × avg-ancestor-set, ~2M
    rows for HPO — is computed once and then **broadcast** against
    billion-row fact tables (:func:`rollup_counts`); the iteration here
    is distributed for generality but never sits on the fact path.
    Cycles (ill-formed ontologies) cannot loop the iteration — the pair
    space is finite and the anti-join rejects rediscoveries — but
    members of a cycle reach themselves; those self-pairs are dropped,
    matching the DAG reading.  ``max_depth`` truncates deeper ancestry
    (absent rows, same contract as :func:`bfs_distances`).

    Reference analogue: none — the reference never reads the hierarchy
    (mapping.py builds flat surface-form dicts only); this powers the
    ancestor-category rollup view its per-term reports stop short of.
    """
    e = (
        edges.select(F.col(child).alias("node"), F.col(parent).alias("ancestor"))
        .filter(
            F.col("node").isNotNull()
            & F.col("ancestor").isNotNull()
            & (F.col("node") != F.col("ancestor"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # hop table for extension: (mid, ancestor) keyed by the node whose
    # parents we append
    hop = e.select(F.col("node").alias("mid"), F.col("ancestor").alias("anc2"))
    out = e.select("node", "ancestor", F.lit(1).cast("int").alias("depth"))
    delta = out
    for d in range(2, max_depth + 1):
        nxt = (
            delta.join(hop, delta["ancestor"] == hop["mid"])
            .select("node", F.col("anc2").alias("ancestor"))
            .filter(F.col("node") != F.col("ancestor"))
            .distinct()
            .join(out.select("node", "ancestor"), ["node", "ancestor"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        new = nxt.select("node", "ancestor", F.lit(d).cast("int").alias("depth"))
        out = out.union(new)
        delta = new
    return out


def rollup_counts(
    facts: DataFrame,
    closure: DataFrame,
    term_col: str = "term",
    distinct_col: "str | None" = None,
    include_self: bool = True,
) -> DataFrame:
    """(ancestor, n): fact counts rolled up the subsumption hierarchy —
    every fact annotated with term t counts toward t (when
    ``include_self``) and toward each ancestor of t.  The standard
    ontology reporting view ("how many records under *Abnormality of the
    cardiovascular system*"), which per-term counts understate because
    annotations attach at the leaves.

    ``distinct_col``: count DISTINCT values of that column per ancestor
    (e.g. records annotated with two siblings count once for the shared
    parent) instead of fact rows.

    Scale shape: the closure is dimension-sized and **broadcast**; the
    fact side is touched by one map-side inner join (each fact row fans
    out to its term's ancestor set — bounded by hierarchy size, not
    corpus size) followed by a single hash aggregate.  Plain counts
    partial-aggregate map-side; distinct counts shuffle (ancestor,
    distinct_col) pairs once — both fact-partition-parallel with no
    driver involvement.
    """
    anc = closure.select(F.col("node").alias(term_col), "ancestor")
    val = F.col(distinct_col) if distinct_col is not None else F.lit(1)
    contrib = facts.join(F.broadcast(anc), term_col).select(
        "ancestor", val.alias("_v")
    )
    if include_self:
        # self contribution straight from the fact row — terms with no
        # hierarchy edges (absent from the closure) still count
        contrib = contrib.union(
            facts.select(F.col(term_col).alias("ancestor"), val.alias("_v"))
        )
    agg = (
        F.countDistinct("_v") if distinct_col is not None else F.count(F.lit(1))
    )
    return contrib.groupBy("ancestor").agg(agg.alias("n"))


def term_pair_similarity(
    pairs: DataFrame,
    closure: DataFrame,
    a_col: str = "term_a",
    b_col: str = "term_b",
) -> DataFrame:
    """(term_a, term_b, n_common, jaccard): ontology semantic similarity
    of term pairs as the Jaccard of their ancestor sets (each set
    includes the term itself) — the standard subsumption-based measure
    for "how related are these two mappings" (sibling terms share a
    parent, unrelated branches only the root), used to grade
    entity-linking near-misses beyond exact-match P/R.

    Scale shape: ancestor sets are built ONCE from the dimension-sized
    closure (one groupBy) and **broadcast**; the pair table — which may
    be fact-scale, e.g. every (produced, expected) disagreement from a
    linking run — is touched by two map-side joins and per-row JVM array
    intersections.  No fact-side shuffle.  Set semantics make the result
    independent of ``collect_set`` ordering.  Terms absent from the
    closure fall back to the singleton {self} (roots and isolated terms
    score 0 against everything but themselves).
    """
    sets = (
        closure.groupBy("node")
        .agg(F.collect_set("ancestor").alias("_anc"))
        .select("node", F.array_union(F.array("node"), F.col("_anc")).alias("_set"))
    )
    sa = sets.select(F.col("node").alias(a_col), F.col("_set").alias("_sa"))
    sb = sets.select(F.col("node").alias(b_col), F.col("_set").alias("_sb"))
    out = (
        pairs.join(F.broadcast(sa), a_col, "left")
        .join(F.broadcast(sb), b_col, "left")
        .withColumn("_sa", F.coalesce(F.col("_sa"), F.array(F.col(a_col))))
        .withColumn("_sb", F.coalesce(F.col("_sb"), F.array(F.col(b_col))))
    )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union = F.size(F.col("_sa")) + F.size(F.col("_sb")) - inter
    return out.select(
        a_col,
        b_col,
        inter.alias("n_common"),
        (inter.cast("double") / union).alias("jaccard"),
    )
