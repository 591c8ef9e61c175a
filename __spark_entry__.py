"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive a Common-Crawl-style ``pages`` table
from ``documents.parquet`` at sf0.001, run the full KG pipeline (extract →
parse → validate → link against broadcast ontology dicts → triples).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extras (dedup, similarity,
text analytics).  Every query is oracle-checked; the grading driver records
at most 50 entries, so the full registry (``_all_queries`` /
``_all_oracle_sql``, 117 queries) is split by the ``_RECORDED`` rotation
list: the 50 recorded names go to ``queries()``/``oracle_sql()`` and the
remainder to ``extra_queries()``/``extra_oracle_sql()``, which
``scripts/check_correctness.py`` runs through the identical differential
check.  Rotating the window each round is a one-list edit, so every
operator gets an authoritative driver row across rounds and the
out-of-band checks cannot rot (ADVICE r3 item 5).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from phenoqc_spark.sources import load_table


def _par(df: DataFrame, key: str) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy per-row queries.

    The local test tables are single parquet files with one row group, so
    they scan as 1-2 partitions and per-row-expensive stages (tokenize,
    HOF scoring, vector math) run on 1-2 of the cluster's cores.  When
    scan parallelism is below ``defaultParallelism``, hash-repartition on
    the unique row key — a tiny deterministic shuffle.  At production
    scale inputs have far more partitions than cores and this is a no-op.
    Only used by queries whose results are provably partition-independent
    (row-wise maps / aggregates with a final orderBy)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, F.col(key))
    return df


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

_RESOLVER = None


def _resolver():
    global _RESOLVER
    if _RESOLVER is None:
        from phenoqc_spark.fixtures import fixture_config
        from phenoqc_spark.ontology import TermResolver

        d = os.path.join(tempfile.gettempdir(), "phenoqc_spark_onto")
        _RESOLVER = TermResolver.from_config(fixture_config(d))
    return _RESOLVER


# exact-resolving surface pools for the oracle-checked KG query; the
# expected ids are the full cascade's output (verified by tests/test_mapper)
PRIMARY_EXACT = [
    "Hypertension",
    "High blood pressure",
    "Asthma",
    "Diabetes",
    "Sugar diabetes",
    "HP:0000822",
    "Reactive airway disease",
]
DISEASE_EXACT = [
    "DOID:1612",
    "doid:1612",
    "Diabetes Mellitus",
    "ICD10CM:E11",
    "Anemia",
    "Fatty syndrome",
    "Obesity",
]

# (column, idx, ontology, term_id) — resolver cascade results, pinned
_KG_EXPECTED = [
    ("PrimaryPhenotype", 0, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 0, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 1, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 1, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 2, "HPO", "HP:0002090"),
    ("PrimaryPhenotype", 2, "DO", "DOID:9352"),
    ("PrimaryPhenotype", 3, "HPO", "HP:0001627"),
    ("PrimaryPhenotype", 3, "DO", "DOID:1612"),
    ("PrimaryPhenotype", 4, "HPO", "HP:0001627"),
    ("PrimaryPhenotype", 4, "DO", "DOID:1612"),
    ("PrimaryPhenotype", 5, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 6, "HPO", "HP:0002090"),
    ("PrimaryPhenotype", 6, "DO", "DOID:9352"),
    ("DiseaseCode", 0, "DO", "DOID:1612"),
    ("DiseaseCode", 1, "DO", "DOID:1612"),
    ("DiseaseCode", 2, "HPO", "HP:0001627"),  # fuzzy: 'diabetes mellitus'
    ("DiseaseCode", 2, "DO", "DOID:1612"),
    ("DiseaseCode", 3, "DO", "DOID:1612"),
    ("DiseaseCode", 4, "DO", "DOID:1388"),
    ("DiseaseCode", 5, "DO", "DOID:9351"),
    ("DiseaseCode", 6, "DO", "DOID:9351"),
    ("DiseaseCode", 6, "MPO", "MP:0001943"),
]


def _kg_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → record frame with deterministic modulo term picks."""
    docs = load_table(spark, sf_dir, "documents")
    p_arr = F.array(*[F.lit(s) for s in PRIMARY_EXACT])
    d_arr = F.array(*[F.lit(s) for s in DISEASE_EXACT])
    return docs.select(
        F.format_string("https://example.org/doc/%08d", F.col("doc_id")).alias("url"),
        F.col("doc_id").cast("string").alias("SampleID"),
        F.element_at(p_arr, (F.col("doc_id") % 7 + 1).cast("int")).alias("PrimaryPhenotype"),
        F.element_at(d_arr, ((F.col("doc_id") + 3) % 7 + 1).cast("int")).alias("DiseaseCode"),
    )


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from phenoqc_spark.operators import triples as T

    recs = _kg_records(spark, sf_dir)
    bc = spark.sparkContext.broadcast(_resolver())
    terms = T.terms_long(recs, ["PrimaryPhenotype", "DiseaseCode"], [])
    links = T.resolve_vocab(terms, bc)
    linked = T.link_terms(terms, links)
    return T.triples(linked).select("subj", "pred", "obj").orderBy("subj", "pred", "obj")


_KG_ORACLE_VALUES = ",\n        ".join(
    f"('{c}', {i}, '{o}', '{t}')" for (c, i, o, t) in _KG_EXPECTED
)

# kg_pagerank graph pieces — MUST stay in sync with
# scripts/gen_pagerank_golden.py and scripts/gen_lpa_golden.py (pinned twins)
_PR_MAPPING = [
    (1, "HP:0000822"), (1, "DOID:0050167"),
    (2, "HP:0002090"), (2, "DOID:9352"), (2, "HP:0001627"), (2, "DOID:1612"),
    (3, "HP:0000822"), (3, "DOID:1388"),
]
_PR_XREF = [
    ("HP:0000822", "DOID:0050167"),
    ("DOID:1612", "HP:0001627"),
    ("HP:0002090", "DOID:9352"),
    ("DOID:1388", "HP:0000822"),
]

# (column, pool_idx, ontology, term_id) for the FULL pools (fuzzy/prefix/
# junk cascade surfaces, pages.py PHENO_POOLS) — pinned from the
# deterministic resolver so the fuzzy path is hash-checked, not rows-only.
# Regenerate with scripts/gen_full_expected.py if the fixture ontologies or
# the cascade change.
_KG_FULL_EXPECTED = [
    ("PrimaryPhenotype", 0, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 0, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 1, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 1, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 2, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 2, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 3, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 4, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 5, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 6, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 7, "DO", "DOID:9352"),
    ("PrimaryPhenotype", 7, "HPO", "HP:0002090"),
    ("PrimaryPhenotype", 8, "DO", "DOID:9352"),
    ("PrimaryPhenotype", 8, "HPO", "HP:0002090"),
    ("PrimaryPhenotype", 9, "DO", "DOID:1612"),
    ("PrimaryPhenotype", 9, "HPO", "HP:0001627"),
    ("SecondaryPhenotype", 0, "DO", "DOID:1612"),
    ("SecondaryPhenotype", 0, "HPO", "HP:0001627"),
    ("SecondaryPhenotype", 1, "DO", "DOID:1612"),
    ("SecondaryPhenotype", 1, "HPO", "HP:0001627"),
    ("SecondaryPhenotype", 2, "DO", "DOID:9352"),
    ("SecondaryPhenotype", 2, "HPO", "HP:0002090"),
    ("SecondaryPhenotype", 3, "DO", "DOID:0050167"),
    ("SecondaryPhenotype", 3, "HPO", "HP:0000822"),
    ("SecondaryPhenotype", 4, "HPO", "HP:0002090"),
    ("TertiaryPhenotype", 0, "DO", "DOID:9351"),
    ("TertiaryPhenotype", 0, "MPO", "MP:0001943"),
    ("TertiaryPhenotype", 1, "MPO", "MP:0001902"),
    # id keys are fuzzy candidates in the reference (mapping.py:259):
    # mp:0001943 ~ hp:0001939 scores exactly 80.0 = the default cutoff
    ("TertiaryPhenotype", 2, "HPO", "HP:0001939"),
    ("TertiaryPhenotype", 2, "MPO", "MP:0001943"),
    ("TertiaryPhenotype", 3, "MPO", "MP:1902"),
    ("DiseaseCode", 0, "DO", "DOID:1612"),
    ("DiseaseCode", 1, "DO", "DOID:1612"),
    ("DiseaseCode", 2, "DO", "DOID:1612"),
    ("DiseaseCode", 3, "DO", "DOID:1612"),
    ("DiseaseCode", 3, "HPO", "HP:0001627"),
    ("DiseaseCode", 4, "DO", "DOID:1612"),
    ("DiseaseCode", 5, "DO", "DOID:1388"),
    ("DiseaseCode", 6, "DO", "DOID:9351"),
]

_KG_FULL_ORACLE_VALUES = ",\n        ".join(
    f"('{c}', {i}, '{o}', '{t}')" for (c, i, o, t) in _KG_FULL_EXPECTED
)

# Pinned linear-classifier model for td_classifier_filter: deterministic
# weights (a fixed affine-mod ramp over the 64 embedding dims, range
# [-0.50, 0.50]) and bias — the same literals feed the Spark plan and the
# DuckDB oracle.  Margin audit at sf0.001/sf0.01: min |score − 0.5| ≥
# 4.8e-5 and ≥1.4e-9 to any 6-dp rounding boundary, so the keep/drop set
# and the rounded hashes are numerically stable.
_CLS_W = [(((i * 37 + 11) % 101) - 50) / 100.0 for i in range(64)]
_CLS_B = 0.05
_CLS_W_SQL = "[" + ", ".join(f"{w!r}" for w in _CLS_W) + "]"

# Unicode-noise cascade surfaces: full-width compatibility forms, zero-width
# chars, NBSP whitespace, combining accents, mixed case — the adversarial
# inputs web text actually carries.  The resolver's NFKC normalization
# cascade (ontology/normalize.py, byte-parity with the reference) must fold
# each to its fixture term; the expected ids below are pinned from the
# resolver itself (scripts/gen_unicode_expected.py), so the whole
# normalize→resolve path is hash-checked by the driver, not just
# property-tested.
_KG_UNI_POOLS = {
    "PrimaryPhenotype": [
        "Ｈｙｐｅｒｔｅｎｓｉｏｎ",  # full-width 'Hypertension'
        "Hyper​tension",  # zero-width space inside
        "HYPERTENSION",  # case fold
        "ＡＳＴＨＭＡ",  # full-width 'ASTHMA'
        " High blood pressure ",  # NBSP padding + inner NBSP
        "ｈｐ＿００００８２２",  # full-width 'hp_0000822'
        "Sugar diabetes",
    ],
    "DiseaseCode": [
        "ｄｏｉｄ：１６１２",  # full-width 'doid:1612'
        "ＤＯＩＤ:1612",  # mixed full-width prefix, ASCII digits
        "Diabetes​ Mellitus",  # zero-width space before the space
        "ANEMIA",
        "Obesity‍",  # trailing zero-width joiner
        "Fatty syndrome",
        "ICD10CM：E11",  # full-width colon in the xref
    ],
}

# (column, pool_idx, ontology, term_id) pinned from the resolver over
# _KG_UNI_POOLS — regenerate with scripts/gen_unicode_expected.py.
_KG_UNICODE_EXPECTED = [
    ("PrimaryPhenotype", 0, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 0, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 1, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 1, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 2, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 2, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 3, "DO", "DOID:9352"),
    ("PrimaryPhenotype", 3, "HPO", "HP:0002090"),
    ("PrimaryPhenotype", 4, "DO", "DOID:0050167"),
    ("PrimaryPhenotype", 4, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 5, "HPO", "HP:0000822"),
    ("PrimaryPhenotype", 6, "DO", "DOID:1612"),
    ("PrimaryPhenotype", 6, "HPO", "HP:0001627"),
    ("DiseaseCode", 0, "DO", "DOID:1612"),
    ("DiseaseCode", 1, "DO", "DOID:1612"),
    ("DiseaseCode", 2, "DO", "DOID:1612"),
    ("DiseaseCode", 2, "HPO", "HP:0001627"),
    ("DiseaseCode", 3, "DO", "DOID:1388"),
    ("DiseaseCode", 4, "DO", "DOID:9351"),
    ("DiseaseCode", 4, "MPO", "MP:0001943"),
    ("DiseaseCode", 5, "DO", "DOID:9351"),
    ("DiseaseCode", 6, "DO", "DOID:1612"),
]

_KG_UNICODE_ORACLE_VALUES = ",\n        ".join(
    f"('{c}', {i}, '{o}', '{t}')" for (c, i, o, t) in _KG_UNICODE_EXPECTED
)


# ---------------------------------------------------------------------------
# helper frames with synthesized quirks (oracle replicates the same CASEs)
# ---------------------------------------------------------------------------

def _events_nulls(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "value", F.when(F.col("event_id") % 10 == 0, F.lit(None)).otherwise(F.col("value"))
    )


def _events_impute2(spark, sf_dir):
    """Bit-deterministic two-column imputation frame (matches
    scripts/gen_impute_golden.py): events with ``event_id < 2000``, sorted
    into ONE partition so the mapInPandas chunk is exactly the frame the
    golden generator built; ``value`` nulled at ``event_id % 10 == 0`` and
    ``feat`` (= user_id as double) at ``event_id % 7 == 3`` — interleaved
    masks so KNN really selects donors by distance and MICE really
    regresses (a single missing column degenerates both to column-mean)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return (
        ev.select(
            "event_id",
            F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("value"),
            F.when(F.col("event_id") % 7 == 3, F.lit(None).cast("double"))
            .otherwise(F.col("user_id").cast("double"))
            .alias("feat"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_id")
    )


def _imputed_masked(df):
    """Project the imputed frame down to the golden-pinned rows."""
    return (
        df.filter((F.col("event_id") % 10 == 0) | (F.col("event_id") % 7 == 3))
        .select(
            "event_id",
            F.col("value").alias("value_filled"),
            F.col("feat").alias("feat_filled"),
        )
        .orderBy("event_id")
    )


def _events_outliers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "value",
        F.when(F.col("event_id") % 1000 == 0, F.col("value") * 50).otherwise(F.col("value")),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents(sf0.001) → pages → full KG pipeline → triples."""
    from phenoqc_spark.pipeline import run_pipeline

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    recs = _kg_records(spark, sf_dir)
    lines = [
        F.concat(F.lit("SampleID: "), F.col("SampleID")),
        F.concat(F.lit("PrimaryPhenotype: "), F.coalesce(F.col("PrimaryPhenotype"), F.lit(""))),
        F.concat(F.lit("DiseaseCode: "), F.coalesce(F.col("DiseaseCode"), F.lit(""))),
    ]
    pages = recs.withColumn("text", F.concat_ws("\n", *lines)).select(
        "url",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.concat(
            F.lit(b"<html><body><p>"),
            F.encode(F.col("text"), "utf-8"),
            F.lit(b"</p></body></html>"),
        ).alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    out = run_pipeline(spark, pages, _resolver())
    return out["triples"].select("subj", "pred", "obj", "tier", "score")


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Full query registry: EVERY oracle-checked query, recorded or not.

    ``queries()``/``extra_queries()`` below split this by ``_RECORDED``.
    """
    from phenoqc_spark.operators import (
        canonicalize as C,
        dedup as D,
        imputation as I,
        quality as Q,
        similarity as S,
        textstats as X,
        validation as V,
    )
    from phenoqc_spark.operators import triples as T

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- KG construction ---------------------------------------------------
    # The resurrected r2 trio lives at the end of this registry; see the
    # module docstring for the rotation scheme.
    q["kg_triples_exact"] = _kg_triples

    def kg_triples_full(spark, sf_dir):
        # full pools incl. fuzzy/prefix/junk surfaces; oracle = pinned
        # resolver outputs (_KG_FULL_EXPECTED), so the whole cascade is
        # hash-checked
        from phenoqc_spark.pages import PHENO_POOLS

        docs = load_table(spark, sf_dir, "documents")
        recs = docs.select(
            F.format_string("https://example.org/doc/%08d", "doc_id").alias("url"),
            F.col("doc_id").cast("string").alias("SampleID"),
            *[
                F.element_at(
                    F.array(*[F.lit(s) for s in pool]),
                    ((F.col("doc_id") + off) % len(pool) + 1).cast("int"),
                ).alias(col)
                for off, (col, pool) in enumerate(PHENO_POOLS.items())
            ],
        )
        bc = spark.sparkContext.broadcast(_resolver())
        terms = T.terms_long(recs, list(PHENO_POOLS), [])
        links = T.resolve_vocab(terms, bc)
        return (
            T.triples(T.link_terms(terms, links))
            .select("subj", "pred", "obj")
            .orderBy("subj", "pred", "obj")
        )

    q["kg_triples_full"] = kg_triples_full

    def kg_triples_unicode(spark, sf_dir):
        # adversarial unicode surfaces (full-width forms, zero-width chars,
        # NBSP, ZWJ, mixed case) through the SAME cascade; oracle = pinned
        # resolver outputs (_KG_UNICODE_EXPECTED), so the NFKC
        # normalization byte-parity claim is driver-hash-checked, not just
        # property-tested (reference: mapping.py:315-334 normalize path)
        docs = load_table(spark, sf_dir, "documents")
        recs = docs.select(
            F.format_string("https://example.org/doc/%08d", "doc_id").alias("url"),
            F.col("doc_id").cast("string").alias("SampleID"),
            *[
                F.element_at(
                    F.array(*[F.lit(s) for s in pool]),
                    ((F.col("doc_id") + 3 * off) % len(pool) + 1).cast("int"),
                ).alias(col)
                for off, (col, pool) in enumerate(_KG_UNI_POOLS.items())
            ],
        )
        bc = spark.sparkContext.broadcast(_resolver())
        terms = T.terms_long(recs, list(_KG_UNI_POOLS), [])
        links = T.resolve_vocab(terms, bc)
        return (
            T.triples(T.link_terms(terms, links))
            .select("subj", "pred", "obj")
            .orderBy("subj", "pred", "obj")
        )

    q["kg_triples_unicode"] = kg_triples_unicode

    def kg_triples_array(spark, sf_dir):
        # array-column (ObservedFeatures) explode path, exact-tier pools
        docs = load_table(spark, sf_dir, "documents")
        obs_pool = [
            [],
            ["Hypertension"],
            ["Asthma", "Sugar diabetes"],
            ["HP:0000822", "Anemia"],
        ]
        arr = F.array(*[
            F.array(*[F.lit(t) for t in items]) for items in obs_pool
        ])
        recs = docs.select(
            F.format_string("https://example.org/doc/%08d", "doc_id").alias("url"),
            F.col("doc_id").cast("string").alias("SampleID"),
            F.element_at(arr, (F.col("doc_id") % 4 + 1).cast("int")).alias("ObservedFeatures"),
        )
        bc = spark.sparkContext.broadcast(_resolver())
        terms = T.terms_long(recs, [], ["ObservedFeatures"])
        links = T.resolve_vocab(terms, bc)
        return (
            T.triples(T.link_terms(terms, links))
            .select("subj", "pred", "obj")
            .orderBy("subj", "pred", "obj")
        )

    q["kg_triples_array"] = kg_triples_array

    def kg_mapping_stats(spark, sf_dir):
        bc = spark.sparkContext.broadcast(_resolver())
        terms = T.terms_long(_kg_records(spark, sf_dir), ["PrimaryPhenotype", "DiseaseCode"], [])
        links = T.resolve_vocab(terms, bc)
        return (
            T.mapping_stats(terms, links)
            .select(
                "column",
                "ontology",
                F.col("total_terms").cast("long").alias("total_terms"),
                F.col("mapped_terms").cast("long").alias("mapped_terms"),
                "success_rate_pct",
            )
            .orderBy("column", "ontology")
        )

    q["kg_mapping_stats"] = kg_mapping_stats

    def kg_canonicalize_cc(spark, sf_dir):
        nation = load_table(spark, sf_dir, "nation")
        edges = nation.select(
            F.col("n_nationkey").cast("long").alias("src"),
            (F.col("n_regionkey") + 1000).cast("long").alias("dst"),
        )
        return C.connected_components(edges).orderBy("node")

    q["kg_canonicalize_cc"] = kg_canonicalize_cc

    # ---- validation family ---------------------------------------------------
    def v_range_accuracy(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        return Q.check_accuracy(
            li,
            {"properties": {"l_quantity": {"minimum": 1, "maximum": 45}}},
            ["l_orderkey", "l_linenumber"],
        ).orderBy("l_orderkey", "l_linenumber")

    q["v_range_accuracy"] = v_range_accuracy

    def v_required_missing(spark, sf_dir):
        ev = _events_nulls(spark, sf_dir)
        return V.required_missing(ev, ["value"]).select("event_id", "user_id").orderBy("event_id")

    q["v_required_missing"] = v_required_missing

    def v_referential_integrity(spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 != 0)
        return (
            V.referential_integrity_issues(orders, cust, "o_custkey", "c_custkey")
            .select("o_orderkey", "o_custkey")
            .orderBy("o_orderkey")
        )

    q["v_referential_integrity"] = v_referential_integrity

    def v_duplicates(spark, sf_dir):
        sup = load_table(spark, sf_dir, "supplier")
        return V.duplicates(sup, ["s_nationkey"]).select("s_suppkey", "s_nationkey").orderBy("s_suppkey")

    q["v_duplicates"] = v_duplicates

    def v_conflicts(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
        return V.conflicts(ev, ["user_id"]).orderBy("user_id", "event_type")

    q["v_conflicts"] = v_conflicts

    def v_anomalies_zscore(spark, sf_dir):
        ev = _events_outliers(spark, sf_dir)
        return V.anomalies_zscore(ev, ["value"]).select("event_id", "value").orderBy("event_id")

    q["v_anomalies_zscore"] = v_anomalies_zscore

    def v_timeliness(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events").withColumn("ts_s", F.col("ts").cast("string"))
        return (
            Q.check_timeliness(ev, "ts_s", max_lag_days=20, now="2024-01-25 00:00:00")
            .select("event_id", "issue")
            .orderBy("event_id")
        )

    q["v_timeliness"] = v_timeliness

    def v_missing_counts(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("text")).alias("text"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
            "source",
        )
        return V.missing_counts(docs).orderBy("column")

    q["v_missing_counts"] = v_missing_counts

    def v_schema_flag(spark, sf_dir):
        ev = _events_nulls(spark, sf_dir).select("event_id", "user_id", "value")
        schema = {
            "type": "object",
            "properties": {
                "user_id": {"type": "integer"},
                "value": {"type": ["number", "null"], "minimum": 10.0},
            },
            "required": ["user_id"],
        }
        return (
            V.schema_violation_flag(ev, schema)
            .select("event_id", F.col("SchemaViolationFlag").alias("flag"))
            .orderBy("event_id")
        )

    q["v_schema_flag"] = v_schema_flag

    # ---- aggregation family ------------------------------------------------
    def agg_class_distribution(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return (
            Q.class_distribution(emb, "label", warn_threshold=0.10)
            .select(
                "label",
                "count",
                F.round("proportion", 6).alias("proportion"),
                "is_minority",
                "warning",
            )
            .orderBy("label")
        )

    q["agg_class_distribution"] = agg_class_distribution

    def agg_impute_mean(spark, sf_dir):
        ev = _events_nulls(spark, sf_dir).select("event_id", "value")
        return (
            I.impute(ev, "mean")
            .select("event_id", F.round("value", 4).alias("value_filled"))
            .orderBy("event_id")
        )

    q["agg_impute_mean"] = agg_impute_mean

    def agg_impute_median(spark, sf_dir):
        ev = _events_nulls(spark, sf_dir).select("event_id", "value")
        return (
            I.impute(ev, "median")
            .select("event_id", F.round("value", 4).alias("value_filled"))
            .orderBy("event_id")
        )

    q["agg_impute_median"] = agg_impute_median

    def agg_impute_mode(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.when(F.col("event_id") % 10 == 0, F.lit(None)).otherwise(
                F.col("event_type")
            ).alias("event_type"),
        )
        return I.impute(ev, "none", field_strategies={"event_type": "mode"}).orderBy("event_id")

    q["agg_impute_mode"] = agg_impute_mode

    def agg_impute_knn(spark, sf_dir):
        # I2: mapInPandas partition-local KNN.  The query is constructed
        # bit-deterministic (see _events_impute2), so the oracle is the
        # pinned numpy-twin golden (phenoqc_spark/impute_golden.KNN_2000)
        # — upgraded from rows-only to a full hash check in round 4.
        ev = _events_impute2(spark, sf_dir)
        return _imputed_masked(I.impute(ev, "knn", params={"n_neighbors": 5}))

    q["agg_impute_knn"] = agg_impute_knn

    def agg_impute_mice(spark, sf_dir):
        # I3: chained-equation imputation, mapInPandas partition-local
        # (chunk-local statistics = reference parity); pinned numpy-twin
        # golden oracle (MICE_2000)
        ev = _events_impute2(spark, sf_dir)
        return _imputed_masked(
            I.impute(ev, "mice", params={"max_iter": 5, "random_state": 0})
        )

    q["agg_impute_mice"] = agg_impute_mice

    def agg_impute_svd(spark, sf_dir):
        # I4: iterative-SVD imputation (rank-1, mean fallback); pinned
        # numpy-twin golden oracle (SVD_2000)
        ev = _events_impute2(spark, sf_dir)
        return _imputed_masked(I.impute(ev, "svd", params={"rank": 1}))

    q["agg_impute_svd"] = agg_impute_svd

    def agg_redundancy(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").alias("a"),
            F.col("l_quantity").alias("b"),
            F.col("l_extendedprice").alias("c"),
        )
        return Q.detect_redundancy(li, threshold=0.98).orderBy("column_1", "column_2")

    q["agg_redundancy"] = agg_redundancy

    def agg_topk_terms(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            F.explode(
                F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
            ).alias("token")
        )
        return (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("token"))
            .limit(20)
        )

    q["agg_topk_terms"] = agg_topk_terms

    def agg_window_running(spark, sf_dir):
        from pyspark.sql import Window

        ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return ev.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        ).orderBy("event_id")

    q["agg_window_running"] = agg_window_running

    def agg_time_window(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
            .orderBy("window_start", "event_type")
        )

    q["agg_time_window"] = agg_time_window

    def agg_sessionize(spark, sf_dir):
        # gap-based batch sessionization (lag → new-session flag → running
        # sum → per-session aggregate); oracle = the identical window
        # idiom in DuckDB SQL — deterministic under the event_id tiebreak
        from phenoqc_spark.operators.sessions import sessionize

        ev = load_table(spark, sf_dir, "events")
        return sessionize(ev, gap_minutes=30).orderBy("user_id", "session_idx")

    q["agg_sessionize"] = agg_sessionize

    def agg_asof_join(spark, sf_dir):
        # as-of join via the one-shuffle union-carry window (each click
        # picks the latest error at-or-before it per user); oracle =
        # DuckDB's native ASOF LEFT JOIN over the same tie-broken right
        # side — two entirely different machineries must agree
        from phenoqc_spark.operators.sessions import asof_join

        ev = load_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = ev.filter(F.col("event_type") == "error")
        out = asof_join(clicks, errors)
        # no-match rows surface as sentinels (the gate's order-insensitive
        # hash sorts row tuples, which a mixed None/datetime column breaks)
        return out.select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("asof_ts"), F.to_timestamp(F.lit("1970-01-01"))).alias(
                "asof_ts"
            ),
            F.coalesce(F.col("asof_value"), F.lit(-1.0)).alias("asof_value"),
        ).orderBy("event_id")

    q["agg_asof_join"] = agg_asof_join

    def agg_latest_event(spark, sf_dir):
        # CDX-style latest-capture selection: one hash aggregate with
        # max_by(struct(payload), struct(ts, tiebreak)) — partial-combines
        # map-side where the window form would full-sort every capture;
        # oracle = the classic row_number window in DuckDB (two different
        # machineries, same deterministic winner under the tiebreak)
        from phenoqc_spark.operators.sessions import latest_snapshot

        ev = load_table(spark, sf_dir, "events")
        return latest_snapshot(
            ev, key_col="user_id", ts_col="ts", tiebreak_col="event_id"
        ).orderBy("user_id")

    q["agg_latest_event"] = agg_latest_event

    def agg_range_join(spark, sf_dir):
        # slice-bucketed range join (clicks inside each error's 30-minute
        # incident window, per user) aggregated to a per-window count;
        # zero-click windows restored with a left join against the
        # (entity-sized) interval list.  Oracle = DuckDB's plain theta
        # join — the quadratic plan this operator exists to avoid, which
        # is exactly why it is the right independent check
        from phenoqc_spark.operators.sessions import range_join

        ev = load_table(spark, sf_dir, "events")
        errors = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
        pairs = range_join(clicks, errors)
        counts = pairs.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_clicks"))
        return (
            errors.join(counts, "err_id", "left")
            .select(
                "err_id",
                "user_id",
                "w_start",
                F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            )
            .orderBy("err_id")
        )

    q["agg_range_join"] = agg_range_join

    def agg_percentiles(spark, sf_dir):
        # exact interpolated percentiles per group (Spark `percentile`,
        # NOT approx_percentile — approx sketches differ across engines
        # by design and can never hash-match; the exact form is the
        # oracle-checkable one and the per-group sort is bounded by
        # group size)
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
                F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            )
            .orderBy("event_type")
        )

    q["agg_percentiles"] = agg_percentiles

    def agg_pivot(spark, sf_dir):
        # wide pivot (groupBy().pivot().count()) with the value set given
        # explicitly — at scale an unlisted pivot forces a distinct scan
        # to discover columns; listing them keeps the plan one pass
        ev = load_table(spark, sf_dir, "events")
        types = ["click", "error", "purchase", "signup", "view"]
        out = (
            ev.groupBy((F.col("user_id") % 10).alias("bucket"))
            .pivot("event_type", types)
            .count()
        )
        return out.select(
            "bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
        ).orderBy("bucket")

    q["agg_pivot"] = agg_pivot

    def agg_rollup(spark, sf_dir):
        # rollup grouping sets (per-type-and-parity, per-type, grand
        # total) — subtotal indicator rows surfaced via coalesce
        # sentinels so the differential hash stays single-typed
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.rollup("event_type", (F.col("user_id") % 2).alias("parity"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
                F.coalesce(F.col("parity").cast("string"), F.lit("<all>")).alias("parity"),
                "cnt",
                "sum_value",
            )
            .orderBy("event_type", "parity")
        )

    q["agg_rollup"] = agg_rollup

    def agg_cube(spark, sf_dir):
        # full cube grouping sets (all four combinations of the two
        # dimensions) — the rollup's sibling; same sentinel treatment
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.cube("event_type", (F.col("user_id") % 2).alias("parity"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
                F.coalesce(F.col("parity").cast("string"), F.lit("<all>")).alias("parity"),
                "cnt",
                "sum_value",
            )
            .orderBy("event_type", "parity")
        )

    q["agg_cube"] = agg_cube

    def f_json_extract(spark, sf_dir):
        # per-row JSON field extraction from the props column, JVM-side
        # (get_json_object compiles to Jackson path evaluation — no UDF),
        # aggregated per type; oracle = DuckDB's json_extract_string
        ev = load_table(spark, sf_dir, "events")
        k = F.get_json_object("props", "$.k").cast("int")
        return (
            ev.groupBy("event_type")
            .agg(
                F.sum(k).cast("bigint").alias("sum_k"),
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg(k), 6).alias("avg_k"),
            )
            .orderBy("event_type")
        )

    q["f_json_extract"] = f_json_extract

    def agg_drift_psi(spark, sf_dir):
        # distributed PSI (click-vs-error value distributions, fixed
        # decile-ish edges) — gives the F11 drift-metric family a
        # hash-checked differential instead of unit-only coverage; the
        # oracle recomputes bucket fractions and the Σ(a−e)·ln(a/e)
        # directly in SQL
        from phenoqc_spark.operators.diagnostics import psi_distributed

        ev = load_table(spark, sf_dir, "events")
        edges = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]
        return psi_distributed(ev, "value", "event_type", "click", "error", edges)

    q["agg_drift_psi"] = agg_drift_psi

    def agg_drift_panel(spark, sf_dir):
        # one-row drift panel (exact two-sample KS + SMD + variance
        # ratio) between the click and error value distributions — the
        # distributed twins of the F11 driver-side drift metrics; the
        # oracle recomputes the cumulative-fraction KS and the moment
        # statistics directly in SQL
        from phenoqc_spark.operators.diagnostics import drift_panel_distributed

        ev = load_table(spark, sf_dir, "events")
        return drift_panel_distributed(ev, "value", "event_type", "click", "error")

    q["agg_drift_panel"] = agg_drift_panel

    def u_snapshot_diff(spark, sf_dir):
        # crawl-to-crawl snapshot diff: old = doc_id%5≠0 slice, new =
        # doc_id%7≠0 slice with every 11th text perturbed — exercises
        # all three change classes.  The operator compares md5
        # fingerprints; the oracle compares the text DIRECTLY (hash
        # equality ≡ content equality), so the check is independent
        from phenoqc_spark.operators.diff import snapshot_diff

        docs = load_table(spark, sf_dir, "documents")
        old = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
        new = docs.filter(F.col("doc_id") % 7 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return snapshot_diff(old, new, "doc_id").orderBy("doc_id")

    q["u_snapshot_diff"] = u_snapshot_diff

    def v_cell_violations(spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "d",
            F.when(F.col("o_orderkey") % 20 == 0, F.lit("NOT_A_DATE")).otherwise(
                F.col("o_orderdate").cast("string")
            ),
        )
        schema = {
            "properties": {
                "o_totalprice": {"type": ["number", "null"], "minimum": 1000, "maximum": 400000},
                "d": {"type": ["string", "null"], "format": "date"},
            }
        }
        return V.cell_violations(orders, schema, ["o_orderkey"]).orderBy(
            "o_orderkey", "column", "reason"
        )

    q["v_cell_violations"] = v_cell_violations

    def q1_pricing(spark, sf_dir):
        # Sums are exact to 2/4 decimal digits on both engines; the final
        # DOUBLE value is identical regardless of each engine's internal
        # representation.  The sums run over LONG fixed-point units
        # (cents / ten-thousandths) instead of SUM(decimal): the decimal
        # accumulator exceeds Spark's 18-digit compact-long range and
        # falls back to per-row java BigDecimal, measured 1.07 s vs
        # 0.66 s at sf1.0.  Equivalence is exact, not approximate: the
        # unscaled long is the decimal's exact value, long sums cannot
        # overflow at any driver SF (≤ 6e14 « 2^63), and the final
        # division of an exactly-represented long by 100/10000 is a
        # single correctly-rounded IEEE op — bit-identical doubles to
        # cast(sum(decimal) as double), verified per-row at sf0.01/0.1/1.0.
        li = load_table(spark, sf_dir, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        cents = lambda c: (dec(c) * 100).cast("long")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                (F.sum(cents("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
                (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("sum_base_price"),
                (
                    F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount")))
                    / F.lit(10000.0)
                ).alias("sum_disc_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["q1_pricing"] = q1_pricing

    def q3_shipping(spark, sf_dir):
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (
            cust.filter(F.col("c_mktsegment") == "BUILDING")
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter((F.col("o_orderdate") < "1995-03-15") & (F.col("l_shipdate") > "1995-03-15"))
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(28,4)")
                .alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    q["q3_shipping"] = q3_shipping

    # ---- dedup family --------------------------------------------------------
    def dd_exact_groups(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("dup bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return D.exact_duplicate_groups(docs).orderBy("content_hash")

    q["dd_exact_groups"] = dd_exact_groups

    def dd_exact_bloom(spark, sf_dir):
        # incremental exact dedup with the bucketed-bloom state prefilter:
        # docs in the doc_id%7<2 slice are the "already ingested" hash
        # state, the rest arrive as the new batch; shared-content rows
        # (doc_id%10<3 → one of 6 strings) exercise state drops, the
        # bloom-positive verify join AND intra-batch min-id collapse.
        # Output must equal the plain anti-join (bloom has no false
        # negatives; positives are exactly verified) — the oracle IS the
        # plain-semantics SQL.
        from phenoqc_spark.operators import bloom as B

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 3,
                F.concat(F.lit("shared content "), (F.col("doc_id") % 6).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        state = (
            docs.filter(F.col("doc_id") % 7 < 2)
            .select(F.md5("text").alias("content_hash"))
            .distinct()
        )
        batch = docs.filter(F.col("doc_id") % 7 >= 2)
        return B.dedup_exact_incremental_bloom(batch, state).orderBy("doc_id")

    q["dd_exact_bloom"] = dd_exact_bloom

    def dd_ngram_jaccard(spark, sf_dir):
        # synthesize near-duplicates among doc_id<60 (natural trigram
        # jaccard in this corpus maxes at 0.02 — a 0-row check is weak)
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
        docs = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.lit("alpha beta gamma delta epsilon zeta eta theta bucket "), (F.col("doc_id") % 3).cast("string")),
            )
            .when(
                F.col("doc_id") % 10 == 1,
                F.concat(F.lit("alpha beta gamma delta epsilon zeta eta theta variant "), (F.col("doc_id") % 3).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            D.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("doc_a", "doc_b")
        )

    q["dd_ngram_jaccard"] = dd_ngram_jaccard

    def dd_containment(spark, sf_dir):
        # directed quote detection: doc_id%10==0 are short canonical
        # sentences, %10==1 are full pages with that sentence APPENDED —
        # containment short→long is 1.0 while Jaccard is near 0 (the
        # asymmetry the operator exists for).  Oracle recomputes directed
        # |∩|/|src| over the same 3-gram shingle sets in SQL.
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
        quote = F.concat(
            F.lit("alpha beta gamma delta epsilon zeta canon "),
            (F.col("doc_id") % 3).cast("string"),
        )
        docs = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, quote)
            .when(F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" "), quote))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            D.containment_pairs(docs, n=3, threshold=0.8)
            .orderBy("doc_src", "doc_dst")
        )

    q["dd_containment"] = dd_containment

    def dd_minhash_lsh(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("near duplicate text bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            D.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=32, bands=8)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("doc_a", "doc_b")
        )

    q["dd_minhash_lsh"] = dd_minhash_lsh

    def dd_near_dedup(spark, sf_dir):
        # corpus near-dedup keep-list (the 100 TB product: one survivor per
        # near-dup cluster, never materializes member pairs); oracle is a
        # recursive-CTE connected-components over the exact pair set
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("near duplicate text bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            D.minhash_near_dedup(docs, threshold=0.8, num_hashes=32, bands=8)
            .select("doc_id")
            .orderBy("doc_id")
        )

    q["dd_near_dedup"] = dd_near_dedup

    def dd_near_dedup_best(spark, sf_dir):
        # quality-argmax survivor policy (keep_by): same clusters as
        # dd_near_dedup but the kept member is the max-quality doc
        # (min-id tiebreak); quality is a deterministic pseudo-score that
        # varies WITHIN each near-dup bucket, so winners differ from the
        # min-id keep-list and the argmax path is genuinely exercised
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("near duplicate text bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            ((F.col("doc_id") * 7) % 13).cast("double").alias("quality"),
        )
        return (
            D.minhash_near_dedup(
                docs, threshold=0.8, num_hashes=32, bands=8, keep_by="quality"
            )
            .select("doc_id")
            .orderBy("doc_id")
        )

    q["dd_near_dedup_best"] = dd_near_dedup_best

    def dd_span_winnow(spark, sf_dir):
        # substring-level duplicate detection: winnowing fingerprints
        # (MOSS) pair docs sharing verbatim token runs >= k+window-1 that
        # doc-level minhash misses; 20% of docs get an injected copied
        # sentence (5 variants -> 5 cliques) on top of the corpus's
        # natural span sharing.  md5 hash path so DuckDB recomputes the
        # identical fingerprints
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(
                    F.lit("copied span sentence alpha beta gamma delta epsilon variant "),
                    (F.col("doc_id") % 5).cast("string"),
                    F.lit(" tail marker "),
                    F.col("doc_id").cast("string"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return D.shared_span_pairs(
            docs, k=5, window=3, min_shared=2, hash_fn="md5"
        ).orderBy("doc_a", "doc_b")

    q["dd_span_winnow"] = dd_span_winnow

    def txt_dup_spans(spark, sf_dir):
        # per-doc duplicated-span fraction over the same injected-span
        # corpus as dd_span_winnow; md5 hash path so DuckDB recomputes
        # the fingerprints; fraction rounded for cross-engine hashing
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(
                    F.lit("copied span sentence alpha beta gamma delta epsilon variant "),
                    (F.col("doc_id") % 5).cast("string"),
                    F.lit(" tail marker "),
                    F.col("doc_id").cast("string"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        out = D.dup_span_stats(docs, k=5, window=3, hash_fn="md5")
        return out.select(
            "doc_id",
            "n_fingerprints",
            "n_shared",
            F.round("dup_span_fraction", 6).alias("dup_span_fraction"),
        ).orderBy("doc_id")

    q["txt_dup_spans"] = txt_dup_spans

    def dd_simhash(spark, sf_dir):
        # md5-derived token hash -> the fingerprint and therefore the exact
        # hamming pairs are recomputable in SQL: oracle does brute-force
        # bit_count(xor) over all pairs, so LSH recall is hash-checked too
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
        return D.simhash_near_dups(docs, max_hamming=8, hash_fn="md5").orderBy(
            "doc_a", "doc_b"
        )

    q["dd_simhash"] = dd_simhash

    def dd_embedding_neardup(spark, sf_dir):
        # synthesize exact-direction duplicates (x2.0 is exact in fp, and a
        # scaled vector lands in the same sign-LSH bucket by construction)
        emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
        dups = emb.select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias("embedding"),
        )
        both = emb.select("vec_id", "embedding").unionByName(dups)
        return S.embedding_near_dups(both, dim=64, threshold=0.95).orderBy("id_a", "id_b")

    q["dd_embedding_neardup"] = dd_embedding_neardup

    # ---- similarity -----------------------------------------------------------
    def sim_knn_bruteforce(spark, sf_dir):
        emb = _par(load_table(spark, sf_dir, "embeddings"), "vec_id")
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        out = S.cosine_topk_bruteforce(emb, queries_df, k=10)
        return out.select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        ).orderBy("query_id", "rank")

    q["sim_knn_bruteforce"] = sim_knn_bruteforce

    def sim_ann_lsh(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return S.cosine_topk_lsh(emb, queries_df, dim=64, k=10).orderBy("query_id", "rank")

    q["sim_ann_lsh"] = sim_ann_lsh

    def sim_ann_ivf(spark, sf_dir):
        # IVF ANN with the PINNED codebook artifact (the production
        # pattern: centroids are a versioned model applied unchanged at any
        # corpus size) → cell assignment (JVM argmax) → probe n cells →
        # exact re-rank.  With literal centroids the whole query is
        # SQL-recomputable, so it is oracle-checked.
        from phenoqc_spark.ivf_codebook import IVF_CODEBOOK_8x64

        emb = load_table(spark, sf_dir, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return S.cosine_topk_ivf(
            emb, queries_df, k=10, n_probe=4, centroids=IVF_CODEBOOK_8x64
        ).orderBy("query_id", "rank")

    q["sim_ann_ivf"] = sim_ann_ivf

    # ---- quality scores / set ops / formats / hashing / accuracy -------------
    def agg_quality_scores(spark, sf_dir):
        # A8: one distributed aggregate → the reference's three scores + overall
        ev = _events_nulls(spark, sf_dir).select("event_id", "user_id", "value")
        return Q.quality_scores_df(
            ev, violation_expr=(F.col("value") < 10.0), mapping_rates=[100.0, 50.0]
        )

    q["agg_quality_scores"] = agg_quality_scores

    def agg_profile(spark, sf_dir):
        # one-pass numeric profile (count/nulls/min/max/mean/stddev +
        # exact interpolated percentiles) over three events columns —
        # single partial+final aggregate, column-pruned scan, one-row
        # transfer; exact=True here because the oracle needs bit-stable
        # quantiles (percentile_approx is the documented 100 TB default).
        from phenoqc_spark.operators.quality import numeric_profile

        ev = load_table(spark, sf_dir, "events")
        prof = numeric_profile(ev, ["value", "user_id", "event_id"], exact=True)
        return prof.select(
            "column",
            "n",
            "n_null",
            F.round("min", 6).alias("min"),
            F.round("max", 6).alias("max"),
            F.round("mean", 6).alias("mean"),
            F.round("stddev", 6).alias("stddev"),
            F.round("p25", 6).alias("p25"),
            F.round("p50", 6).alias("p50"),
            F.round("p75", 6).alias("p75"),
            F.round("p95", 6).alias("p95"),
        ).orderBy("column")

    q["agg_profile"] = agg_profile

    def agg_sample_reservoir(spark, sf_dir):
        # A11: bounded deterministic sample (seed 42) — cardinality contract
        ev = load_table(spark, sf_dir, "events")
        return Q.reservoir_sample(ev, n=1000, seed=42).agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled")
        )

    q["agg_sample_reservoir"] = agg_sample_reservoir

    def u_issue_union(spark, sf_dir):
        # U1/U3: concat issue frames + drop_duplicates (unionByName + dedup)
        missing = (
            V.required_missing(_events_nulls(spark, sf_dir).select("event_id", "value"), ["value"])
            .select("event_id")
            .withColumn("issue", F.lit("required_missing"))
        )
        anom = (
            V.anomalies_zscore(_events_outliers(spark, sf_dir), ["value"])
            .select("event_id")
            .withColumn("issue", F.lit("anomaly_zscore"))
        )
        return missing.unionByName(anom).dropDuplicates().orderBy("event_id", "issue")

    q["u_issue_union"] = u_issue_union

    def v_format_multi(spark, sf_dir):
        # V3: email / identifier / percentage format audits in one pass
        k = F.col("o_orderkey")
        df = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.when(k % 3 == 0, F.lit("user@example.com"))
            .when(k % 3 == 1, F.concat(F.lit("bad-email-"), k.cast("string")))
            .otherwise(F.lit("a@b.co"))
            .alias("email"),
            F.when(k % 4 == 0, F.lit("HP:0000118"))
            .when(k % 4 == 1, F.lit("hp_0000118"))
            .otherwise(F.lit("DOID:1612"))
            .alias("ident"),
            F.when(k % 5 == 0, F.lit("150%")).otherwise(F.lit("85%")).alias("pct"),
        )
        out = None
        for col_name, fmt in [("email", "email"), ("ident", "identifier"), ("pct", "percentage")]:
            part = df.filter(~V.format_valid(F.col(col_name), fmt)).select(
                "o_orderkey", F.lit(col_name).alias("column"), F.lit(fmt).alias("fmt")
            )
            out = part if out is None else out.unionByName(part)
        return out.orderBy("o_orderkey", "column")

    q["v_format_multi"] = v_format_multi

    def f_hash_lineage(spark, sf_dir):
        # F7/F8: deterministic lineage hashes (md5 short-name + sha256), JVM-side
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id",
            F.md5(F.col("text")).alias("md5_hash"),
            F.sha2(F.col("text"), 256).alias("sha256_hash"),
        ).orderBy("doc_id")

    q["f_hash_lineage"] = f_hash_lineage

    def kg_accuracy_gt(spark, sf_dir):
        # J3: ground-truth accuracy merge (check_ontology_accuracy.py:45-60,106)
        # — left-join emitted triples to a GT table (one entry deliberately
        # wrong so accuracy < 100 is actually exercised)
        trips = _kg_triples(spark, sf_dir)
        gt_rows = [
            (c, i, o_, "HP:9999999" if (c, i, o_) == ("PrimaryPhenotype", 2, "HPO") else t)
            for (c, i, o_, t) in _KG_EXPECTED
        ]
        gt = spark.createDataFrame(gt_rows, "gcol string, idx int, onto string, gt_id string")
        docs = load_table(spark, sf_dir, "documents")
        d = docs.select(
            F.concat(
                F.format_string("https://example.org/doc/%08d", "doc_id"),
                F.lit("#"),
                F.col("doc_id").cast("string"),
            ).alias("subj"),
            (F.col("doc_id") % 7).cast("int").alias("pidx"),
            ((F.col("doc_id") + 3) % 7).cast("int").alias("didx"),
        )
        per = d.join(
            F.broadcast(gt),
            ((gt.gcol == "PrimaryPhenotype") & (gt.idx == d.pidx))
            | ((gt.gcol == "DiseaseCode") & (gt.idx == d.didx)),
        ).select("subj", F.concat("gcol", F.lit("->"), "onto").alias("pred"), "gt_id")
        joined = per.join(trips, ["subj", "pred"], "left")
        return (
            joined.groupBy("pred")
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("obj") == F.col("gt_id"), 1).otherwise(0)).alias("matches"),
            )
            .select(
                "pred",
                "total",
                "matches",
                F.round(F.lit(100.0) * F.col("matches") / F.col("total"), 2).alias("accuracy_pct"),
            )
            .orderBy("pred")
        )

    q["kg_accuracy_gt"] = kg_accuracy_gt

    def kg_canonical_triples(spark, sf_dir):
        # G1-G3: cross-ontology same-as edges → CC canonical mapping →
        # broadcast rewrite of triple objects (canonical = primary member)
        trips = _kg_triples(spark, sf_dir)
        edges = spark.createDataFrame(
            [
                ("DOID:0050167", "HP:0000822"),
                ("DOID:1612", "HP:0001627"),
                ("DOID:9352", "HP:0002090"),
            ],
            "src string, dst string",
        )
        primaries = spark.createDataFrame(
            [("HP:0000822",), ("HP:0001627",), ("HP:0002090",)], "id string"
        )
        mapping = C.canonical_mapping(edges, primaries)
        return (
            C.canonicalize_objects(trips, mapping)
            .select("subj", "pred", "obj")
            .orderBy("subj", "pred", "obj")
        )

    q["kg_canonical_triples"] = kg_canonical_triples

    # ---- training-data prep composition ---------------------------------------
    def td_prep(spark, sf_dir):
        # the end-to-end training-data shape: exact-dedup (keep min id) →
        # quality gate → language filter → token counts; one lazy plan
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("dup bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        kept = D.dedup_exact(docs)
        enriched = X.token_count(X.language_id(X.quality_score(kept)))
        return (
            enriched.filter(
                (F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.6)
            )
            .select("doc_id", "n_tokens", "quality_score")
            .orderBy("doc_id")
        )

    q["td_prep"] = td_prep

    # ---- multimodal (binary columns + Arrow plumbing) -------------------------
    def _media_from_docs(spark, sf_dir):
        # documents → media table with SQL-replicable metadata (payload is
        # the utf-8 text; kind/duration derived by modulo, not hash)
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            F.col("doc_id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            ((F.col("doc_id") * 37) % 5000 + 1000).cast("int").alias("duration_ms"),
        )

    def mm_frame_plan(spark, sf_dir):
        # video frame-sampling plan: JVM sequence explode (decode stubbed)
        from phenoqc_spark.operators import multimodal as M

        return (
            M.frame_sample_plan(_media_from_docs(spark, sf_dir), every_ms=1000)
            .orderBy("media_id", "frame_ts_ms")
        )

    q["mm_frame_plan"] = mm_frame_plan

    def mm_features(spark, sf_dir):
        # Arrow-batched feature extraction over binary payloads —
        # deterministic fake kernel (no codecs in container).  The exposed
        # f0 is SQL-recomputable (sha256 hex byte math), so this is
        # oracle-checked despite the Python kernel.
        from phenoqc_spark.operators import multimodal as M

        out = M.extract_features(_media_from_docs(spark, sf_dir), dim=16)
        return out.select(
            "media_id", "kind", F.round(F.element_at("feature", 1), 6).alias("f0")
        ).orderBy("media_id")

    q["mm_features"] = mm_features

    # ---- text analytics -------------------------------------------------------
    def txt_tokens(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.token_count(docs).select("doc_id", "n_tokens", "n_subword_est").orderBy("doc_id")

    q["txt_tokens"] = txt_tokens

    def txt_quality(spark, sf_dir):
        docs = _par(load_table(spark, sf_dir, "documents"), "doc_id")
        return X.quality_score(docs).select(
            "doc_id", "n_words", "punct_ratio", "stopword_ratio", "mean_word_len", "quality_score"
        # a second keyed exchange AFTER the per-doc stats: the global
        # orderBy executes its child twice (range-sample pass + sort
        # pass), and without this boundary the child is the narrow
        # tokenizer/HOF stage — both passes would re-run it.  The narrow
        # (doc_id + 5 doubles) shuffle is ~free; the stats then run once
        # as this exchange's map side (guide §2.4; measured, r6 notes).
        ).repartition(F.col("doc_id")).orderBy("doc_id")

    q["txt_quality"] = txt_quality

    def txt_langid(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.language_id(docs).select("doc_id", "lang_pred").orderBy("doc_id")

    q["txt_langid"] = txt_langid

    def txt_fingerprint(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.fingerprint(docs).select("doc_id", "fp").orderBy("doc_id")

    q["txt_fingerprint"] = txt_fingerprint

    def txt_source_stats(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.corpus_source_stats(docs).orderBy("source")

    q["txt_source_stats"] = txt_source_stats

    def txt_redact(spark, sf_dir):
        # PII scrub: deterministic injected emails/IPs so the pass has work
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 10.0.0."),
                    (F.col("doc_id") % 255).cast("string"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            X.redact_pii(docs)
            .select(
                "doc_id",
                "n_emails",
                "n_ips",
                "n_phones",
                F.md5("text_redacted").alias("redacted_md5"),
            )
            .orderBy("doc_id")
        )

    q["txt_redact"] = txt_redact

    def td_contamination(spark, sf_dir):
        # decontamination: flag corpus docs sharing any word 8-gram with
        # the "benchmark" slice (docs 0-99 stand in for an eval suite)
        docs = load_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") < 100).select("text")
        corpus = docs.filter(F.col("doc_id") >= 100)
        return X.contamination_flags(corpus, bench, n=8).orderBy("doc_id")

    q["td_contamination"] = td_contamination

    # ---- round-3 additions (promoted to the recorded window in r4) --------

    def txt_repetition(spark, sf_dir):
        # inject deterministic line repetition so the signals have mass
        # (_par: the per-doc O(b²) bigram-mass lambda is the most
        # CPU-expensive per-row text stat — parallelism floor, see _par)
        docs = _par(load_table(spark, sf_dir, "documents"), "doc_id").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat_ws("\n", F.col("text"), F.col("text"), F.lit("tail line")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            X.repetition_stats(docs)
            .select(
                "doc_id",
                "dup_line_frac",
                "dup_line_char_frac",
                "dup_word_frac",
                "top_bigram_char_frac",
            )
            # post-compute exchange so the orderBy's two passes don't each
            # re-run the O(b²) per-doc stats — see txt_quality
            .repartition(F.col("doc_id"))
            .orderBy("doc_id")
        )

    q["txt_repetition"] = txt_repetition

    def dd_paragraph(spark, sf_dir):
        # 2/3 of docs share an injected header + footer paragraph; the
        # boilerplate pass must strip exactly those, preserving bodies
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 != 2,
                F.concat(
                    F.lit("SHARED HEADER NAV\n\n"),
                    F.col("text"),
                    F.lit("\n\nCOPYRIGHT FOOTER"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            D.paragraph_dedup(docs, min_df=5)
            .select("doc_id", F.md5("text_clean").alias("clean_md5"))
            .orderBy("doc_id")
        )

    q["dd_paragraph"] = dd_paragraph

    def txt_tfidf(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.tfidf_topk(docs, k=3).orderBy("doc_id", "rank")

    q["txt_tfidf"] = txt_tfidf

    def txt_hosts(spark, sf_dir):
        # synthesize deterministic URLs over the documents table (37 hosts)
        docs = load_table(spark, sf_dir, "documents").select(
            F.format_string(
                "https://host%02d.example.org/p/%d", (F.col("doc_id") % 37), F.col("doc_id")
            ).alias("url"),
            F.when(
                F.col("doc_id") % 10 < 2,
                F.concat(F.lit("dup bucket "), (F.col("doc_id") % 5).cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return X.url_host_stats(docs).orderBy("host")

    q["txt_hosts"] = txt_hosts

    def sim_pq_adc(spark, sf_dir):
        # PQ encode + ADC top-k with the PINNED codebook artifact — every
        # stage (normalize, sub-centroid argmax, lookup-table sum, rank)
        # SQL-recomputable, so the compressed-ANN path is hash-checked
        from phenoqc_spark.operators import similarity as S
        from phenoqc_spark.pq_codebook import PQ_CODEBOOK_8x16x8

        emb = load_table(spark, sf_dir, "embeddings")
        codes = S.pq_encode(emb, PQ_CODEBOOK_8x16x8)
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return S.cosine_topk_pq(codes, queries_df, PQ_CODEBOOK_8x16x8, k=10).orderBy(
            "query_id", "rank"
        )

    q["sim_pq_adc"] = sim_pq_adc

    def emb_kmeans(spark, sf_dir):
        # distributed Lloyd k-means over the embeddings table (k=10,
        # 5 fixed rounds, md5-seeded deterministic init).  Oracle = the
        # pinned numpy full-Lloyd twin (phenoqc_spark/kmeans_golden.py,
        # scripts/gen_kmeans_golden.py) — different distance arithmetic
        # (direct ||x-c||^2 vs the operator's x.c - ||c||^2/2 argmax),
        # assignment margins ~1e-3 >> float wobble, generator asserts it.
        from phenoqc_spark.operators.clustering import kmeans

        emb = load_table(spark, sf_dir, "embeddings")
        return kmeans(emb, k=10, iters=5).orderBy("vec_id")

    q["emb_kmeans"] = emb_kmeans

    def td_mix_sample(spark, sf_dir):
        # deterministic stratified mixture over sources (the data-mixing
        # primitive: selection is a pure function of (doc_id, seed))
        docs = load_table(spark, sf_dir, "documents")
        fr = {"src0": 0.5, "src1": 0.25, "src2": 1.0}
        return (
            X.deterministic_stratified_sample(docs, "source", fr, seed=42)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )

    q["td_mix_sample"] = td_mix_sample

    def td_classifier_filter(spark, sf_dir):
        # model-based quality gate: broadcast linear classifier over the
        # embedding column — weights are a pinned deterministic artifact
        # baked into the plan as literals (map-only: no join, no
        # shuffle, no Python); oracle recomputes the same sigmoid dot
        # product via DuckDB's list_dot_product
        from phenoqc_spark.operators.classify import classifier_filter

        emb = load_table(spark, sf_dir, "embeddings")
        out = classifier_filter(emb, _CLS_W, bias=_CLS_B, threshold=0.5)
        return out.select(
            "vec_id", "label", F.round("score", 6).alias("score")
        ).orderBy("vec_id")

    q["td_classifier_filter"] = td_classifier_filter

    def txt_unigram_nll(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return X.unigram_logprob_score(docs).orderBy("doc_id")

    q["txt_unigram_nll"] = txt_unigram_nll

    def kg_degree_stats(spark, sf_dir):
        # degree roll-up over a deterministic triple-shaped edge table
        from phenoqc_spark.operators import canonicalize as C

        docs = load_table(spark, sf_dir, "documents")
        trips = docs.select(
            F.format_string("e%02d", (F.col("doc_id") % 40)).alias("subj"),
            F.lit("rel").alias("pred"),
            F.format_string("e%02d", ((F.col("doc_id") * 7 + 3) % 45)).alias("obj"),
        )
        return C.graph_degree_stats(trips).orderBy("entity")

    q["kg_degree_stats"] = kg_degree_stats

    def kg_pagerank(spark, sf_dir):
        # fixed-iteration PageRank over the deterministic doc->term graph
        # (kg_triples_array's 4-idx mapping, doc_id < 400) plus pinned
        # term->term xref edges so rank propagates two hops.  Oracle =
        # the pinned numpy-twin golden (phenoqc_spark/pagerank_golden.py,
        # regenerated by scripts/gen_pagerank_golden.py) — an independent
        # pure-Python power iteration; the 6-dp rounding step is ~1e8×
        # the float-summation-order divergence, so the differential is a
        # genuine implementation check, not a self-comparison.
        from phenoqc_spark.operators.canonicalize import pagerank

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        pr = pagerank(doc_edges.unionByName(xref), iters=10)
        return pr.select(
            "node", F.round("rank", 6).alias("rank")
        ).orderBy("node")

    q["kg_pagerank"] = kg_pagerank

    def kg_pagerank_weighted(spark, sf_dir):
        # confidence-weighted PageRank over the same graph: doc->term
        # edge weight = (doc_id + len(term)) % 3 + 1 (varies WITHIN each
        # source, so weighted ranks genuinely differ from unweighted —
        # all 307 golden nodes do), xref weight 2.0.  Oracle = the
        # weighted numpy twin (PAGERANK_W_400, same generator).
        from phenoqc_spark.operators.canonicalize import pagerank

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
                F.col("doc_id"),
            )
            .join(F.broadcast(m), "idx")
            .select(
                "src",
                F.col("tid").alias("dst"),
                ((F.col("doc_id") + F.length("tid")) % 3 + 1)
                .cast("double")
                .alias("w"),
            )
        )
        xref = spark.createDataFrame(
            [(a, b, 2.0) for a, b in _PR_XREF], "src string, dst string, w double"
        )
        pr = pagerank(doc_edges.unionByName(xref), iters=10, weight="w")
        return pr.select("node", F.round("rank", 6).alias("rank")).orderBy("node")

    q["kg_pagerank_weighted"] = kg_pagerank_weighted

    def kg_ppr(spark, sf_dir):
        # PERSONALIZED PageRank (entity relatedness to a phenotype seed
        # set) over the doc<->term graph: the kg_pagerank doc->term edges
        # plus term->doc "mentioned_in" back-edges for doc_id % 13 == 2
        # (13 coprime to 4, so every idx class contributes back-docs and
        # mass cycles through both ontology branches) plus the xrefs.
        # Teleport + dangling mass land on the uniform seed distribution;
        # seed-unreachable nodes are exactly 0 and filtered out.  Oracle =
        # the pinned pure-Python twin (phenoqc_spark/ppr_golden.py,
        # scripts/gen_ppr_golden.py), 6-dp rounding.
        from phenoqc_spark.operators.canonicalize import pagerank

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        mentions = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("doc"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
                F.col("doc_id"),
            )
            .join(F.broadcast(m), "idx")
        )
        fwd = mentions.select(F.col("doc").alias("src"), F.col("tid").alias("dst"))
        back = mentions.filter(F.col("doc_id") % 13 == 2).select(
            F.col("tid").alias("src"), F.col("doc").alias("dst")
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        pr = pagerank(
            fwd.unionByName(back).unionByName(xref),
            iters=10,
            seeds=["HP:0000822", "DOID:1612"],
        )
        return (
            pr.filter(F.col("rank") > 0.0)
            .select("node", F.round("rank", 6).alias("rank"))
            .orderBy("node")
        )

    q["kg_ppr"] = kg_ppr

    def kg_scc(spark, sf_dir):
        # strongly connected components over a deterministic directed
        # graph from documents (doc_id < 240): 12 rings of 20 with every
        # other ring broken at one link, plus two chord families — three
        # large SCCs (76/76/74) + 14 singletons, exercising trim,
        # coloring, and backward-confirm paths.  Oracle = the pinned
        # iterative-Tarjan twin (phenoqc_spark/scc_golden.py,
        # scripts/gen_scc_golden.py); exact string match, no rounding.
        from phenoqc_spark.operators.canonicalize import (
            strongly_connected_components,
        )

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
        base = docs.select(F.col("doc_id").cast("long").alias("d"))
        ring = base.filter(F.col("d") % 40 != 7).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 12) % 240).alias("dst"),
        )
        chord1 = base.filter(F.col("d") % 5 == 0).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 7 + 3) % 240).alias("dst"),
        )
        chord2 = base.filter(F.col("d") % 7 == 3).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 11 + 5) % 240).alias("dst"),
        )
        out = strongly_connected_components(
            ring.unionByName(chord1).unionByName(chord2)
        )
        return out.orderBy("node")

    q["kg_scc"] = kg_scc

    def kg_spectral(spark, sf_dir):
        # randomized spectral sketch of the kg_ppr doc<->term adjacency:
        # σ̂ = sqrt(eig(ΩᵀAᵀAΩ)) from two distributed matvec aggregates
        # with md5-derived Rademacher Ω.  Oracle = the pinned dense-numpy
        # twin (phenoqc_spark/spectral_golden.py,
        # scripts/gen_spectral_golden.py) — identical projection computed
        # with matmuls instead of shuffles, 6-dp rounding.
        from phenoqc_spark.operators.canonicalize import spectral_sketch

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        mentions = docs.select(
            F.format_string(
                "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
            ).alias("doc"),
            (F.col("doc_id") % 4).cast("int").alias("idx"),
            F.col("doc_id"),
        ).join(F.broadcast(m), "idx")
        fwd = mentions.select(F.col("doc").alias("src"), F.col("tid").alias("dst"))
        back = mentions.filter(F.col("doc_id") % 13 == 2).select(
            F.col("tid").alias("src"), F.col("doc").alias("dst")
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        sig = spectral_sketch(fwd.unionByName(back).unionByName(xref), r=8)
        return spark.createDataFrame(
            [(i, round(s, 6)) for i, s in enumerate(sig)], "component int, sigma double"
        ).orderBy("component")

    q["kg_spectral"] = kg_spectral

    def kg_hyperanf(spark, sf_dir):
        # HyperANF neighborhood function over the kg_scc graph (cycle-
        # rich, so reach mass grows for several hops): per-node HLL
        # reachability sketches, one edge×sketch join + union per hop.
        # At this scale every sketch stays in sparse mode (reach sets
        # ≤ 240 < the ~512 coupon threshold), so counts are EXACT and
        # the oracle is a DuckDB recursive-CTE closure — a true
        # differential, not a tolerance band.
        from phenoqc_spark.operators.sketches import hyperanf

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
        base = docs.select(F.col("doc_id").cast("long").alias("d"))
        ring = base.filter(F.col("d") % 40 != 7).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 12) % 240).alias("dst"),
        )
        chord1 = base.filter(F.col("d") % 5 == 0).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 7 + 3) % 240).alias("dst"),
        )
        chord2 = base.filter(F.col("d") % 7 == 3).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 11 + 5) % 240).alias("dst"),
        )
        return hyperanf(
            ring.unionByName(chord1).unionByName(chord2), max_hops=6
        ).orderBy("hops")

    q["kg_hyperanf"] = kg_hyperanf

    def kg_harmonic(spark, sf_dir):
        # HyperBall harmonic centrality over the same cycle-rich 240-node
        # graph as kg_hyperanf: per-node HLL balls of the INCOMING
        # reachability set, H(v) = sum over t of (|B_t|-|B_{t-1}|)/t.
        # Sparse-mode-exact at this scale, so the oracle is the exact
        # recursive-CTE distance closure: sum(cnt_at_distance/h).
        from phenoqc_spark.operators.sketches import hyperball_centrality

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
        base = docs.select(F.col("doc_id").cast("long").alias("d"))
        ring = base.filter(F.col("d") % 40 != 7).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 12) % 240).alias("dst"),
        )
        chord1 = base.filter(F.col("d") % 5 == 0).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 7 + 3) % 240).alias("dst"),
        )
        chord2 = base.filter(F.col("d") % 7 == 3).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 11 + 5) % 240).alias("dst"),
        )
        return hyperball_centrality(
            ring.unionByName(chord1).unionByName(chord2), max_hops=6
        ).orderBy("node")

    q["kg_harmonic"] = kg_harmonic

    def kg_web_links(spark, sf_dir):
        # crawl link-graph extraction: deterministic HTML (binary, as the
        # input_hint's pages table carries it) with one link of every
        # resolution class per page — absolute, root-relative,
        # document-relative, scheme-relative CDN, plus fragment/javascript
        # links that must be DROPPED and a nested tag in one anchor that
        # must strip.  The oracle recomputes the expected edges from the
        # same id formulas — independent of the operator's regex path.
        from phenoqc_spark.operators.textstats import extract_links

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
        y = (F.col("doc_id") * 7 + 1) % 500
        z = (F.col("doc_id") * 3 + 2) % 500
        w = F.col("doc_id") % 97
        html = F.concat(
            F.lit('<html><body><p>intro</p><a href="'),
            F.format_string("https://host%02d.example.org/dir/p%d.html", (y % 23).cast("int"), y),
            F.lit('">link '), y.cast("string"), F.lit("</a>"),
            F.lit('<a href="/root/p'), z.cast("string"), F.lit('">root '), z.cast("string"), F.lit("</a>"),
            F.lit('<a href="rel/q'), w.cast("string"), F.lit('.html">rel '), w.cast("string"), F.lit("</a>"),
            F.lit('<a href="//cdn.example.org/asset.js"><b>cdn</b> asset</a>'),
            F.lit('<a href="#frag">skip</a><a href="javascript:void(0)">skip</a>'),
            F.lit("</body></html>"),
        )
        pages = docs.select(
            F.format_string(
                "https://host%02d.example.org/dir/p%d.html",
                (F.col("doc_id") % 23).cast("int"),
                F.col("doc_id"),
            ).alias("url"),
            F.encode(html, "utf-8").alias("html"),
        )
        return extract_links(pages).orderBy("src_url", "dst_url", "anchor")

    q["kg_web_links"] = kg_web_links

    def kg_anchor_texts(spark, sf_dir):
        # anchor-text aggregation over the extracted crawl graph: for
        # each landing page, in-degree and the lexicographically-first
        # most-frequent anchor label — the classic entity-naming signal a
        # web KG mines (anchors describe the TARGET).  One hash-groupBy
        # on (dst, anchor) + one max_by; oracle recomputes from the same
        # id formulas in SQL.
        from phenoqc_spark.operators.textstats import extract_links

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
        y = (F.col("doc_id") * 7 + 1) % 100  # 5 source pages per target
        html = F.concat(
            F.lit('<a href="'),
            F.format_string("https://host%02d.example.org/dir/p%d.html", (y % 23).cast("int"), y),
            F.lit('">entity '), (F.col("doc_id") % 4).cast("string"), F.lit("</a>"),
        )
        pages = docs.select(
            F.format_string(
                "https://host%02d.example.org/dir/p%d.html",
                (F.col("doc_id") % 23).cast("int"),
                F.col("doc_id"),
            ).alias("url"),
            F.encode(html, "utf-8").alias("html"),
        )
        links = extract_links(pages)
        per_anchor = links.groupBy("dst_url", "anchor").agg(
            F.count(F.lit(1)).alias("n")
        )
        # deterministic top anchor: min of (-n, anchor) = highest count,
        # lexicographically-first on ties — a partial-combining aggregate,
        # never a window sort
        top = F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("anchor").alias("a")))
        return (
            per_anchor.groupBy("dst_url")
            .agg(
                F.sum("n").alias("in_degree"),
                top.alias("_top"),
            )
            .select(
                "dst_url",
                "in_degree",
                F.col("_top.a").alias("top_anchor"),
                (-F.col("_top.neg_n")).alias("top_anchor_n"),
            )
            .orderBy("dst_url")
        )

    q["kg_anchor_texts"] = kg_anchor_texts

    def kg_redirects(spark, sf_dir):
        # redirect-chain resolution over a deterministic crawl redirect
        # map: p_i -> p_{i-1} chains (terminal every 10th page) plus a
        # 3-cycle p0 -> p10 -> p20 -> p0, so chains below 30 DRAIN into
        # the cycle (unresolved) while the rest resolve with exact hop
        # counts.  Oracle follows the same map with a recursive CTE.
        from phenoqc_spark.operators.canonicalize import resolve_redirects

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
        url = lambda c: F.format_string("https://ex.org/p%d", c)
        chains = docs.filter(F.col("doc_id") % 10 != 0).select(
            url(F.col("doc_id")).alias("src"),
            url(F.col("doc_id") - 1).alias("dst"),
        )
        cyc = docs.filter(F.col("doc_id").isin(0, 10, 20)).select(
            url(F.col("doc_id")).alias("src"),
            url((F.col("doc_id") + 10) % 30).alias("dst"),
        )
        out = resolve_redirects(chains.unionByName(cyc), max_hops=16)
        # the compare harness sorts row tuples — coalesce the NULL
        # (final_url, hops) of unresolved rows into sortable sentinels
        return out.select(
            "src",
            F.coalesce("final_url", F.lit("")).alias("final_url"),
            F.coalesce("hops", F.lit(-1)).alias("hops"),
            "unresolved",
        ).orderBy("src")

    q["kg_redirects"] = kg_redirects

    def kg_cocitation(spark, sf_dir):
        # page-page co-citation projection of a synthetic page->term
        # bipartite graph with a deliberate every-page hub term: max_df
        # cuts the hub BEFORE pairing, min_weight prunes weak pairs.
        from phenoqc_spark.operators.canonicalize import cocitation_project

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
        page = F.format_string("p%d", F.col("doc_id"))
        t = lambda c: F.format_string("t%d", c)
        edges = (
            docs.select(page.alias("src"), t(F.col("doc_id") % 20).alias("dst"))
            .unionByName(docs.select(page.alias("src"), t((F.col("doc_id") + 1) % 20).alias("dst")))
            .unionByName(docs.select(page.alias("src"), t(F.col("doc_id") % 7 + 100).alias("dst")))
            .unionByName(
                docs.filter(F.col("doc_id") % 2 == 0).select(
                    page.alias("src"), F.lit("t999").alias("dst")
                )
            )
        )
        return (
            cocitation_project(edges, max_df=60, min_weight=2)
            .orderBy("node_a", "node_b")
        )

    q["kg_cocitation"] = kg_cocitation

    def txt_html_text(spark, sf_dir):
        # crawl text extraction: pages wrap the corpus text in markup
        # with script/style payloads, a comment, and entities; html_text
        # must recover exactly title + body text + decoded tail.  Oracle
        # rebuilds the expected text from the same formulas.
        from phenoqc_spark.operators.textstats import html_text

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 3000)
        html = F.concat(
            F.lit("<html><head><script>var x = '<p>no</p>';</script>"),
            F.lit("<style>.a{color:red}</style></head><body><h1>Doc "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("</h1><!-- hidden --><p>"),
            F.col("text"),
            F.lit(" &amp; tail &lt;"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("&gt;</p></body></html>"),
        )
        pages = docs.select("doc_id", F.encode(html, "utf-8").alias("html"))
        return html_text(pages).select("doc_id", "text").orderBy("doc_id")

    q["txt_html_text"] = txt_html_text

    def txt_source_cardinality(spark, sf_dir):
        # mergeable distinct-content state: per-source HLL sketches of
        # md5(text), built as TWO half-batches (doc_id parity) and merged
        # — exercising the incremental union path, not just the one-shot
        # aggregate.  Per-source distincts ≲ 50 ⇒ sparse-mode-exact, so
        # the oracle is DuckDB's exact COUNT(DISTINCT md5(text)).
        from phenoqc_spark.operators.sketches import (
            cardinality_sketches,
            estimate_cardinalities,
            merge_cardinality_sketches,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "source", F.md5("text").alias("h"), "doc_id"
        )
        a = cardinality_sketches(docs.filter(F.col("doc_id") % 2 == 0), ["source"], "h")
        b = cardinality_sketches(docs.filter(F.col("doc_id") % 2 == 1), ["source"], "h")
        state = merge_cardinality_sketches(a, b)
        return estimate_cardinalities(state).orderBy("source")

    q["txt_source_cardinality"] = txt_source_cardinality

    def txt_heavy_tokens(spark, sf_dir):
        # Misra-Gries heavy-hitter state over per-source tokens, run in
        # the EXACT zone (m=5000 ≥ distinct tokens per source ⇒ err
        # ledger 0, lower == upper == exact count — the same oracle
        # pattern as the HLL sparse zone).  Built as two half-batches
        # merged through mg_merge, so the differential covers the fold +
        # merge arithmetic, not just one aggregate.  Oracle = exact
        # DuckDB token counts with the shared tokenization.
        from phenoqc_spark.operators.sketches import (
            mg_estimates,
            mg_merge,
            mg_summary,
        )
        from phenoqc_spark.operators.textstats import _tokens_expr

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            "source", "doc_id", F.explode(_tokens_expr("text")).alias("token")
        ).filter(F.length("token") > 0)
        a = mg_summary(toks.filter(F.col("doc_id") % 2 == 0), ["source"], "token", m=5000)
        b = mg_summary(toks.filter(F.col("doc_id") % 2 == 1), ["source"], "token", m=5000)
        est = mg_estimates(mg_merge(a, b, m=5000))
        return (
            est.filter(F.col("cnt_lower") >= 50)
            .orderBy("source", "token")
        )

    q["txt_heavy_tokens"] = txt_heavy_tokens

    def txt_cms_counts(spark, sf_dir):
        # Count-Min point-frequency state per source, built as two
        # half-batches (doc_id parity) merged through cms_merge so the
        # differential covers the fold + linear merge, probed for 4
        # tokens (3 present, 1 unseen).  The sketch positions are
        # md5-deterministic, so the oracle RECOMPUTES the whole sketch in
        # SQL — an exact differential at any collision rate, not a bound.
        from phenoqc_spark.operators.sketches import cms_estimate, cms_merge, cms_state

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            "source",
            "doc_id",
            F.explode(
                F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " ")
            ).alias("token"),
        ).filter(F.length("token") > 0)
        a = cms_state(toks.filter(F.col("doc_id") % 2 == 0), ["source"], "token", w=1024, d=3)
        b = cms_state(toks.filter(F.col("doc_id") % 2 == 1), ["source"], "token", w=1024, d=3)
        state = cms_merge(a, b)
        probes = spark.createDataFrame(
            [("join",), ("hash",), ("customer",), ("zzz_unseen",)], "token string"
        )
        return cms_estimate(state, probes, w=1024, d=3).orderBy("source", "token")

    q["txt_cms_counts"] = txt_cms_counts

    def txt_bpe_merges(spark, sf_dir):
        # distributed BPE tokenizer training: 30 merges over the corpus
        # word vocabulary (one corpus pass; each step = one pair-count
        # aggregate + one JVM replace on the vocab frame).  Oracle = the
        # pinned pure-Python twin (scripts/gen_bpe_golden.py) — same
        # tokenizer, same greedy-replace semantics, same tie-break.
        from phenoqc_spark.operators.bpe import bpe_train

        docs = load_table(spark, sf_dir, "documents")
        merges, _ = bpe_train(docs, n_merges=30)
        rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
        return spark.createDataFrame(
            rows, "step int, left_sym string, right_sym string, n bigint"
        ).orderBy("step")

    q["txt_bpe_merges"] = txt_bpe_merges

    def txt_bm25(spark, sf_dir):
        # Okapi BM25 retrieval for a pinned bag-of-words query — one
        # corpus pass (|Q|+1 conditional aggregates per doc, no
        # token-keyed join), stats broadcast back, TakeOrderedAndProject
        # top-k.  Oracle = the identical Lucene-style formula in DuckDB
        # over the shared tokenization, sorted by the rounded score with
        # doc_id tie-break.
        from phenoqc_spark.operators.textstats import bm25_topk

        docs = load_table(spark, sf_dir, "documents")
        return bm25_topk(
            docs, ["hash", "merge", "window"], k=15
        ).orderBy("rank")

    q["txt_bm25"] = txt_bm25

    def agg_hist_quantiles(spark, sf_dir):
        # mergeable histogram state in the EXACT zone: user_id is
        # integral and the bins are width-1 over [0, 150), so the
        # bin-edge discrete quantile IS quantile_disc — built as two
        # half-batch states merged through histogram_merge (covering the
        # roll-up path), estimates vs DuckDB's exact quantile_disc.
        from phenoqc_spark.operators.sketches import (
            histogram_merge,
            histogram_quantiles,
            histogram_sketches,
        )

        ev = load_table(spark, sf_dir, "events")
        a = histogram_sketches(
            ev.filter(F.col("event_id") % 2 == 0), ["event_type"], "user_id", 0.0, 150.0, 150
        )
        b = histogram_sketches(
            ev.filter(F.col("event_id") % 2 == 1), ["event_type"], "user_id", 0.0, 150.0, 150
        )
        state = histogram_merge(a, b)
        out = histogram_quantiles(state, [0.25, 0.5, 0.9], 0.0, 150.0, 150)
        return out.orderBy("event_type", "q")

    q["agg_hist_quantiles"] = agg_hist_quantiles

    def kg_link_predict(spark, sf_dir):
        # link-prediction scores (common neighbors / Jaccard /
        # Adamic-Adar) over the kg_scc ring+chord graph; pairs with ≥ 1
        # shared neighbor.  Oracle = the identical formulas as plain
        # SQL self-joins in DuckDB (natural log both sides, 6-dp).
        from phenoqc_spark.operators.canonicalize import neighborhood_overlap

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
        base = docs.select(F.col("doc_id").cast("long").alias("d"))
        ring = base.filter(F.col("d") % 40 != 7).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 12) % 240).alias("dst"),
        )
        chord1 = base.filter(F.col("d") % 5 == 0).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 7 + 3) % 240).alias("dst"),
        )
        chord2 = base.filter(F.col("d") % 7 == 3).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") * 11 + 5) % 240).alias("dst"),
        )
        out = neighborhood_overlap(
            ring.unionByName(chord1).unionByName(chord2), min_common=1
        )
        return out.orderBy("node_a", "node_b")

    q["kg_link_predict"] = kg_link_predict

    def kg_sgns_loss(spark, sf_dir):
        # distributed SGNS embedding training on the kg_ppr doc<->term
        # edge pairs: full-batch gradient descent with md5-seeded init
        # and md5-drawn negatives, loss evaluated before each update.
        # Oracle = the pinned dense-numpy twin
        # (phenoqc_spark/sgns_golden.py, scripts/gen_sgns_golden.py) —
        # the differential exercises the join+aggregate gradient chain.
        from phenoqc_spark.operators.embeddings import sgns_train

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        mentions = docs.select(
            F.format_string(
                "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
            ).alias("doc"),
            (F.col("doc_id") % 4).cast("int").alias("idx"),
            F.col("doc_id"),
        ).join(F.broadcast(m), "idx")
        fwd = mentions.select(F.col("doc").alias("center"), F.col("tid").alias("context"))
        back = mentions.filter(F.col("doc_id") % 13 == 2).select(
            F.col("tid").alias("center"), F.col("doc").alias("context")
        )
        xref = spark.createDataFrame(_PR_XREF, "center string, context string")
        _, losses = sgns_train(
            fwd.unionByName(back).unionByName(xref), d=8, epochs=3, lr=0.05, negatives=2
        )
        return spark.createDataFrame(
            [(e, round(l, 6)) for e, l in enumerate(losses)], "epoch int, loss double"
        ).orderBy("epoch")

    q["kg_sgns_loss"] = kg_sgns_loss

    def kg_sgns_eval(spark, sf_dir):
        # link-prediction AUC of the SGNS embeddings over the training
        # rows, init vs after 3 epochs — the learning signal (0.493 →
        # 0.692 on the pinned twin).  Scores are quantized to 9 dp
        # before ranking so cross-impl float wobble is an exact tie,
        # never an order flip.  Oracle = SGNS_AUC in the pinned twin.
        from phenoqc_spark.operators.embeddings import (
            _init_matrix,
            pair_auc,
            score_pairs,
            sgns_train,
        )

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        mentions = docs.select(
            F.format_string(
                "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
            ).alias("doc"),
            (F.col("doc_id") % 4).cast("int").alias("idx"),
            F.col("doc_id"),
        ).join(F.broadcast(m), "idx")
        fwd = mentions.select(F.col("doc").alias("center"), F.col("tid").alias("context"))
        back = mentions.filter(F.col("doc_id") % 13 == 2).select(
            F.col("tid").alias("center"), F.col("doc").alias("context")
        )
        xref = spark.createDataFrame(_PR_XREF, "center string, context string")
        pairs = fwd.unionByName(back).unionByName(xref)
        U, W, _ = sgns_train(
            pairs, d=8, epochs=3, lr=0.05, negatives=2, return_output_matrix=True
        )

        # rebuild the EXACT (c, t, y) training rows for eval (positive +
        # md5-drawn negatives — mirrors sgns_train's default path)
        p = pairs.selectExpr("center as c", "context as x").distinct()
        vocab = sorted(
            r.n
            for r in p.selectExpr("c as n").union(p.selectExpr("x as n")).distinct().collect()
        )
        V = len(vocab)
        vocab_arr = F.array(*[F.lit(v) for v in vocab])
        negs = []
        for j in range(2):
            idx = (
                F.conv(F.substring(F.md5(F.concat_ws("|", "c", "x", F.lit(f"n{j}"))), 1, 8), 16, 10)
                .cast("long") % V
            )
            negs.append(F.element_at(vocab_arr, (idx + 1).cast("int")))
        rows = p.select(
            "c",
            F.explode(
                F.concat(
                    F.array(F.struct(F.col("x").alias("t"), F.lit(1.0).alias("y"))),
                    F.array(*[F.struct(nc.alias("t"), F.lit(0.0).alias("y")) for nc in negs]),
                )
            ).alias("s"),
        ).select(F.col("c").alias("center"), F.col("s.t").alias("context"), F.col("s.y").alias("y"))

        vnodes = (
            p.selectExpr("c as node").union(p.selectExpr("x as node")).distinct()
        )
        out = []
        for phase, (uu, ww) in (
            ("init", (_init_matrix(vnodes, 8, "u"), _init_matrix(vnodes, 8, "w"))),
            ("trained", (U, W)),
        ):
            scored = score_pairs(uu, ww, rows, keep_cols=["y"]).select(
                F.round("s", 9).alias("s"), "y"
            )
            out.append((phase, round(pair_auc(scored), 6)))
        return spark.createDataFrame(out, "phase string, auc double").orderBy("phase")

    q["kg_sgns_eval"] = kg_sgns_eval

    def kg_ktruss(spark, sf_dir):
        # 4-truss of a wheel-with-chords graph (doc_id < 120): peeling
        # leaves the 180 edges whose triangles mutually survive — a
        # proper irregular subgraph, so the cascade matters.  Oracle =
        # the pinned sequential-peeling twin
        # (phenoqc_spark/ktruss_golden.py, scripts/gen_ktruss_golden.py);
        # exact string rows.
        from phenoqc_spark.operators.canonicalize import ktruss

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
        base = docs.select(F.col("doc_id").cast("long").alias("d"))
        e1 = base.select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 1) % 120).alias("dst"),
        )
        e2 = base.select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 2) % 120).alias("dst"),
        )
        e3 = base.filter(F.col("d") % 4 == 0).select(
            F.format_string("n%03d", F.col("d")).alias("src"),
            F.format_string("n%03d", (F.col("d") + 3) % 120).alias("dst"),
        )
        out = ktruss(e1.unionByName(e2).unionByName(e3), k=4)
        return out.orderBy("node_a", "node_b")

    q["kg_ktruss"] = kg_ktruss

    def agg_reliability(spark, sf_dir):
        # calibration curve of the pinned linear classifier's sigmoid
        # scores against the embeddings table's real labels (binary:
        # label < 5) — the model-eval readout before trusting a quality
        # filter's keep threshold.  Oracle = the same score expression
        # (DuckDB list_dot_product) binned with identical edge rules.
        from phenoqc_spark.operators.classify import linear_score, reliability_curve

        emb = load_table(spark, sf_dir, "embeddings")
        scored = linear_score(emb, _CLS_W, bias=_CLS_B).select(
            "score", (F.col("label") < 5).cast("int").alias("y")
        )
        return reliability_curve(scored, "score", "y", n_bins=10).orderBy("bin")

    q["agg_reliability"] = agg_reliability

    def v_anomalies_mad(spark, sf_dir):
        # robust median/MAD anomaly rows on events.value (Iglewicz-
        # Hoberg 3.5 cut) — the z-score twin without self-masking.
        # Oracle = the identical two-median formula in DuckDB.
        from phenoqc_spark.operators.validation import anomalies_mad

        ev = load_table(spark, sf_dir, "events")
        return anomalies_mad(ev, ["value"], threshold=3.5).select(
            "event_id", F.round("value", 6).alias("value")
        ).orderBy("event_id")

    q["v_anomalies_mad"] = v_anomalies_mad

    def v_winsorize(spark, sf_dir):
        # quantile clipping of events.value to [p1, p99] (exact mode for
        # the oracle; percentile_approx is the corpus-scale default).
        from phenoqc_spark.operators.validation import winsorize

        ev = load_table(spark, sf_dir, "events")
        out = winsorize(ev, ["value"], 0.01, 0.99, exact=True)
        return out.select(
            "event_id", F.round("value", 6).alias("value_w")
        ).orderBy("event_id")

    q["v_winsorize"] = v_winsorize

    def kg_hits(spark, sf_dir):
        # Kleinberg HITS over the same doc->term (+xref) graph: docs are
        # hubs, ontology terms authorities.  Oracle = the pinned numpy
        # twin (phenoqc_spark/hits_golden.py, scripts/gen_hits_golden.py)
        # with the operator's exact update order and 6-dp rounding.
        from phenoqc_spark.operators.canonicalize import hits

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        out = hits(doc_edges.unionByName(xref), iters=10)
        return out.select(
            "node", F.round("hub", 6).alias("hub"), F.round("authority", 6).alias("authority")
        ).orderBy("node")

    q["kg_hits"] = kg_hits

    def kg_communities(spark, sf_dir):
        # synchronous label-propagation communities over the same
        # doc->term (+xref) graph as kg_pagerank, 5 rounds.  Oracle = the
        # pinned pure-Python twin (phenoqc_spark/lpa_golden.py,
        # scripts/gen_lpa_golden.py) — integer vote counts + string min
        # tie-break, so the differential is exact (no float rounding).
        from phenoqc_spark.operators.canonicalize import label_propagation

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        out = label_propagation(doc_edges.unionByName(xref), iters=5)
        return out.orderBy("node")

    q["kg_communities"] = kg_communities

    def kg_modularity(spark, sf_dir):
        # Newman modularity of the LPA partition over the same graph:
        # Spark computes BOTH the labels (label_propagation, 5 rounds)
        # and the per-community stats; the oracle recomputes the stats in
        # SQL from the pinned LPA_400 golden labels — so the differential
        # checks the partition AND the modularity aggregation at once.
        from phenoqc_spark.operators.canonicalize import (
            graph_modularity,
            label_propagation,
        )

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        edges = doc_edges.unionByName(xref)
        labels = label_propagation(edges, iters=5)
        out = graph_modularity(edges, labels)
        return out.select(
            "label",
            "n_nodes",
            "degree_sum",
            "intra_edges",
            F.round("contribution", 6).alias("contribution"),
        ).orderBy("label")

    q["kg_modularity"] = kg_modularity

    def txt_pmi(spark, sf_dir):
        # document-level PMI collocations over the documents table; the
        # oracle recomputes distinct-presence pair counts and the PMI
        # formula wholesale in SQL (same tokenizer contract as txt_tokens)
        from phenoqc_spark.operators.textstats import pmi_cooccurrence

        docs = load_table(spark, sf_dir, "documents")
        return pmi_cooccurrence(docs, min_pair_docs=2).orderBy("token_a", "token_b")

    q["txt_pmi"] = txt_pmi

    def kg_negative_samples(spark, sf_dir):
        # filtered negative sampling over the deterministic doc->term
        # graph; the draw is md5(s|p|o|i|seed) mod pool — recomputed
        # wholesale by the SQL oracle, including the pool row_number
        # indexing and the true-triple anti-filter
        from phenoqc_spark.operators.triples import negative_samples

        docs = load_table(spark, sf_dir, "documents")
        trips = docs.select(
            F.format_string("e%02d", (F.col("doc_id") % 40)).alias("subj"),
            F.lit("rel").alias("pred"),
            F.format_string("e%02d", ((F.col("doc_id") * 7 + 3) % 45)).alias("obj"),
        )
        return negative_samples(trips, n_per_positive=2, seed=42).orderBy(
            "subj", "pred", "neg_obj", "sample_idx"
        )

    q["kg_negative_samples"] = kg_negative_samples

    def f_zvalue(spark, sf_dir):
        # Morton z-value codegen (the zorder_layout clustering key) over
        # two quantized event dimensions; the oracle rebuilds the same
        # 32-term bit interleave arithmetically in SQL
        from phenoqc_spark.operators.layout import zvalue_expr

        ev = load_table(spark, sf_dir, "events")
        x = F.pmod(F.col("event_id"), F.lit(65536)).cast("long")
        y = F.pmod(F.col("user_id"), F.lit(65536)).cast("long")
        return ev.select(
            "event_id",
            x.alias("x"),
            y.alias("y"),
            zvalue_expr([x, y], bits=16).alias("z"),
        ).orderBy("event_id")

    q["f_zvalue"] = f_zvalue

    def td_host_cap(spark, sf_dir):
        # per-host document cap (domain balancing): deterministic
        # md5(id:seed) rank within each synthetic host, keep ≤ 10; the
        # oracle recomputes host, rank, and cut in SQL — and the operator
        # extracts the host with try_parse_url while the oracle formats
        # it analytically, so URL-parsing parity is part of the check
        from phenoqc_spark.operators.textstats import cap_per_host

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.format_string(
                "https://host%02d.example.org/p/%d", (F.col("doc_id") % 37), F.col("doc_id")
            ).alias("url"),
        )
        return cap_per_host(docs, k=10).orderBy("doc_id")

    q["td_host_cap"] = td_host_cap

    def td_url_filter(spark, sf_dir):
        # URL/domain blocklist gate (stage 1 of crawl curation): exact
        # host, registrable-domain suffix, and path-regex rules with
        # host > suffix > path reason precedence; the operator parses
        # hosts with try_parse_url (+ www-strip) while the oracle
        # recomputes them analytically from the generation formula, so
        # URL-parsing parity is part of the check
        from phenoqc_spark.operators.textstats import url_filter

        hostpool = [
            "www.spam.example.com",
            "ads.tracker.net",
            "en.wikipedia.org",
            "blog.example.org",
            "files.archive.org",
        ]
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.lit("https://"),
                F.element_at(
                    F.array(*[F.lit(h) for h in hostpool]),
                    (F.col("doc_id") % 5 + 1).cast("int"),
                ),
                F.format_string("/p%d/%d", (F.col("doc_id") % 7), F.col("doc_id")),
            ).alias("url"),
        )
        return (
            url_filter(
                docs,
                block_hosts=["spam.example.com"],
                block_suffixes=["tracker.net"],
                block_path_res=[r"^/p3/"],
                flag_only=True,
            )
            .select(
                "doc_id",
                "blocked",
                F.coalesce("block_reason", F.lit("kept")).alias("block_reason"),
            )
            .orderBy("doc_id")
        )

    q["td_url_filter"] = td_url_filter

    def td_robots(spark, sf_dir):
        # robots.txt politeness gate: per-host robots bodies are PARSED
        # (RFC 9309 groups, $-anchor, comments) then urls are judged for
        # agent=gptbot — even hosts carry a gptbot group (Disallow: / with
        # an Allow: /feed$ carve-out), odd hosts fall back to the * group
        # (Disallow: /private with a host-specific Allow: /private/ok{d});
        # the oracle recomputes every verdict analytically, so group
        # choice, longest-match, allow-tie and anchor semantics are all
        # part of the differential
        from phenoqc_spark.operators.textstats import robots_allowed, robots_rules

        docs = load_table(spark, sf_dir, "documents")
        hd = (F.col("doc_id") % 10).cast("int")
        robots = docs.filter(F.col("doc_id") < 10).select(
            F.format_string("h%d.example.org", hd).alias("host"),
            F.concat(
                F.format_string(
                    "User-agent: *\nDisallow: /private\nAllow: /private/ok%d\n", hd
                ),
                F.when(
                    hd % 2 == 0,
                    F.lit("\nUser-agent: gptbot\nDisallow: /\nAllow: /feed$\n"),
                ).otherwise(F.lit("")),
            ).alias("robots_txt"),
        )
        pm = (F.col("doc_id") % 4).cast("int")
        urls = docs.select(
            "doc_id",
            F.concat(
                F.format_string("https://h%d.example.org", hd),
                F.when(pm == 0, F.format_string("/private/x%d", F.col("doc_id")))
                .when(pm == 1, F.format_string("/private/ok%d/y", hd))
                .when(pm == 2, F.lit("/pub/z"))
                .otherwise(F.lit("/feed")),
            ).alias("url"),
        )
        return (
            robots_allowed(urls, robots_rules(robots), agent="gptbot")
            .select("doc_id", "crawl_allowed")
            .orderBy("doc_id")
        )

    q["td_robots"] = td_robots

    def txt_surt(spark, sf_dir):
        # SURT index keys (the CDX / Common-Crawl URL-index sort key):
        # www-strip, host-label reversal, query-param sort; the oracle
        # builds every expected key analytically from the generation
        # formula, so parse + reversal + sort parity is the differential
        from phenoqc_spark.operators.textstats import surt_key

        hostpool = ["www.news.example.com", "a.b.tracker.net", "en.wikipedia.org"]
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.lit("https://"),
                F.element_at(
                    F.array(*[F.lit(h) for h in hostpool]),
                    (F.col("doc_id") % 3 + 1).cast("int"),
                ),
                F.format_string("/p/%d", (F.col("doc_id") % 5)),
                F.when(F.col("doc_id") % 2 == 0, F.lit("?b=2&a=1")).otherwise(
                    F.lit("")
                ),
            ).alias("url"),
        )
        return surt_key(docs).select("doc_id", "surt").orderBy("doc_id")

    q["txt_surt"] = txt_surt

    def td_sitemap(spark, sf_dir):
        # sitemap.xml URL discovery: even hosts serve a <urlset> (2 url
        # entries, the second CDATA-wrapped with no lastmod), odd hosts a
        # <sitemapindex> (2 child pointers); the oracle rebuilds every
        # discovery record analytically, so block extraction, CDATA
        # stripping, optional-field NULLs and index detection are all in
        # the differential
        from phenoqc_spark.operators.textstats import sitemap_entries

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
        hd = (F.col("doc_id") % 100).cast("int")
        urlset = F.format_string(
            "<urlset><url><loc>https://h%d.example.org/p/0</loc>"
            "<lastmod>2024-01-%02d</lastmod><priority>0.5</priority></url>"
            "<url><loc><![CDATA[ https://h%d.example.org/p/1 ]]></loc></url>"
            "</urlset>",
            hd, (hd % 9 + 1), hd,
        )
        index = F.format_string(
            "<sitemapindex><sitemap><loc>https://h%d.example.org/s-a.xml</loc>"
            "</sitemap><sitemap><loc>https://h%d.example.org/s-b.xml</loc>"
            "</sitemap></sitemapindex>",
            hd, hd,
        )
        sm = docs.select(
            F.format_string("https://h%d.example.org/sitemap.xml", hd).alias(
                "sitemap_url"
            ),
            F.when(hd % 2 == 0, urlset).otherwise(index).alias("sitemap_xml"),
        )
        return (
            sitemap_entries(sm)
            .select(
                "sitemap_url",
                "loc",
                F.coalesce("lastmod", F.lit("none")).alias("lastmod"),
                F.coalesce("priority", F.lit(-1.0)).alias("priority"),
                "is_index",
            )
            .orderBy("sitemap_url", "loc")
        )

    q["td_sitemap"] = td_sitemap

    def v_triple_shapes(spark, sf_dir):
        # SHACL-lite shape validation over a deterministic triple set with
        # planted violations: objects of 'rel' must be e-CURIEs e00-e19
        # (doc_id*7+3 mod 45 lands 20-44 for some docs), subjects of
        # 'alt' must be s-prefixed (planted x-prefix rows break it)
        from phenoqc_spark.operators.triples import validate_triple_shapes

        docs = load_table(spark, sf_dir, "documents")
        trips = docs.select(
            F.when(F.col("doc_id") % 11 == 0, F.format_string("x%03d", F.col("doc_id") % 97))
            .otherwise(F.format_string("s%03d", F.col("doc_id") % 97))
            .alias("subj"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("rel")).otherwise(F.lit("alt")).alias("pred"),
            F.format_string("e%02d", ((F.col("doc_id") * 7 + 3) % 45)).alias("obj"),
        )
        rules = spark.createDataFrame(
            [
                ("rel", None, "^e[01][0-9]$"),
                ("alt", "^s[0-9]{3}$", None),
            ],
            "pred string, subj_regex string, obj_regex string",
        )
        return validate_triple_shapes(trips, rules).orderBy(
            "subj", "pred", "obj", "reason"
        )

    q["v_triple_shapes"] = v_triple_shapes

    def kg_random_walks(spark, sf_dir):
        # deterministic hash-driven random walks over the kg_pagerank
        # graph (DeepWalk corpus / ARROW reachability sketch); the oracle
        # unrolls all 3 steps in SQL — adjacency row_number indexing, the
        # md5 step choice, and the modulus all recomputed independently
        from phenoqc_spark.operators.canonicalize import random_walks

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        out = random_walks(
            doc_edges.unionByName(xref), walks_per_node=1, walk_length=3, seed=42
        )
        return out.orderBy("start", "walk", "step", "node")

    q["kg_random_walks"] = kg_random_walks

    def kg_skipgrams(spark, sf_dir):
        # DeepWalk second half: skip-gram (center, context, offset) pairs
        # within a ±2 window along the same deterministic walks; the
        # oracle reuses the unrolled walk CTE + a SQL self-join
        from phenoqc_spark.operators.canonicalize import (
            random_walks,
            walks_to_skipgrams,
        )

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        walks = random_walks(
            doc_edges.unionByName(xref), walks_per_node=1, walk_length=3, seed=42
        )
        return walks_to_skipgrams(walks, window=2).orderBy(
            "center", "context", "offset"
        )

    q["kg_skipgrams"] = kg_skipgrams

    def kg_node2vec(spark, sf_dir):
        # second-order biased walks (p=0.25 return-biased, q=4.0 BFS-ish)
        # over the kg_pagerank graph; oracle = the pinned pure-Python twin
        # golden (phenoqc_spark/n2v_golden.py, scripts/gen_n2v_golden.py)
        # which replicates the float ops bit-for-bit
        from phenoqc_spark.operators.canonicalize import node2vec_walks

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
        m = spark.createDataFrame(_PR_MAPPING, "idx int, tid string")
        doc_edges = (
            docs.select(
                F.format_string(
                    "https://example.org/doc/%08d#%d", F.col("doc_id"), F.col("doc_id")
                ).alias("src"),
                (F.col("doc_id") % 4).cast("int").alias("idx"),
            )
            .join(F.broadcast(m), "idx")
            .select("src", F.col("tid").alias("dst"))
        )
        xref = spark.createDataFrame(_PR_XREF, "src string, dst string")
        out = node2vec_walks(
            doc_edges.unionByName(xref),
            walks_per_node=1,
            walk_length=3,
            p=0.25,
            q=4.0,
            seed=42,
        )
        return out.orderBy("start", "walk", "step", "node")

    q["kg_node2vec"] = kg_node2vec

    def kg_merge_state(spark, sf_dir):
        # triple-store MERGE (upsert): two overlapping extraction batches
        # collapse to per-batch state then merge — matched (s,p,o) keys
        # combine (max confidence, min/max seen-batch, summed n_obs),
        # unmatched insert.  Oracle = one UNION ALL + GROUP BY in DuckDB,
        # which the associative combine must equal regardless of the
        # incremental merge order.
        from phenoqc_spark.operators.resume import merge_triple_state, triples_to_state

        docs = load_table(spark, sf_dir, "documents")

        def batch(pred):
            return docs.filter(pred).select(
                F.format_string("e%02d", (F.col("doc_id") % 9)).alias("subject"),
                F.lit("rel").alias("predicate"),
                F.format_string("e%02d", ((F.col("doc_id") * 7 + 3) % 11)).alias("object"),
                (((F.col("doc_id") % 7) + 1) / F.lit(10.0)).alias("confidence"),
            )

        b1 = batch(F.col("doc_id") < 300)
        b2 = batch((F.col("doc_id") >= 150) & (F.col("doc_id") < 450))
        state = merge_triple_state(triples_to_state(b1, 1), triples_to_state(b2, 2))
        return state.orderBy("subject", "predicate", "object")

    q["kg_merge_state"] = kg_merge_state

    def td_importance(spark, sf_dir):
        # DSIR-style importance weights: raw model = documents, target
        # model = the doc_id % 17 slice — both unigram models and the
        # per-doc log-weight sum recomputed exactly by the SQL oracle
        docs = load_table(spark, sf_dir, "documents")
        target = docs.filter(F.col("doc_id") % 17 == 0)
        return X.importance_weights(docs, target).orderBy("doc_id")

    q["td_importance"] = td_importance

    def td_pack_shards(spark, sf_dir):
        # token-budget shard packing: shard id = global ordered exclusive
        # prefix sum (two-phase distributed scan, no single-task window);
        # partitioning-invariant by construction, so the SQL window twin
        # recomputes it exactly
        docs = load_table(spark, sf_dir, "documents")
        return X.pack_token_shards(docs, budget=512).orderBy("doc_id")

    q["td_pack_shards"] = td_pack_shards

    def txt_url_canon(spark, sf_dir):
        # adversarial URL surfaces (case, www, default/explicit ports,
        # tracking params, fragments, trailing slashes) — the operator
        # runs the real parse_url cascade; the oracle formats the expected
        # canonical form analytically per branch
        docs = load_table(spark, sf_dir, "documents")
        h = (F.col("doc_id") % 37).cast("int")
        d = F.col("doc_id")
        url = (
            F.when(d % 6 == 0, F.format_string(
                "HTTP://WWW.Host%02d.EXAMPLE.org:80/Path/%d/?utm_source=x&b=2&a=1#f", h, d))
            .when(d % 6 == 1, F.format_string("https://HOST%02d.example.org:443/", h))
            .when(d % 6 == 2, F.format_string(
                "https://host%02d.example.org:8443/x?gclid=abc", h))
            .when(d % 6 == 3, F.format_string(
                "http://www.host%02d.example.org/y/?fbclid=1&Z=9", h))
            .when(d % 6 == 4, F.format_string("https://host%02d.example.org", h))
            .otherwise(F.format_string("http://host%02d.example.org/p?b=1&a=0", h))
        )
        return (
            X.canonicalize_urls(docs.select("doc_id", url.alias("url")))
            .select("doc_id", "url_canonical")
            .orderBy("doc_id")
        )

    q["txt_url_canon"] = txt_url_canon

    def td_curate(spark, sf_dir):
        # crawl-curation composition, one lazy plan: canonicalize URLs →
        # URL-level dedup (keep min doc_id per canonical form; the
        # doc_id ≥ 400 rows carry the SAME logical URL as doc_id % 400
        # but in a noisy form — case, www, trailing slash, utm param — so
        # the collapse only happens if canonicalization is correct) →
        # token-budget shard packing of the survivors
        docs = load_table(spark, sf_dir, "documents")
        k = F.col("doc_id") % 400
        url = F.when(
            F.col("doc_id") < 400,
            F.format_string("https://host%02d.example.org/p/%d", (k % 37).cast("int"), k),
        ).otherwise(
            F.format_string(
                "HTTPS://WWW.Host%02d.EXAMPLE.ORG/p/%d/?utm_source=x",
                (k % 37).cast("int"),
                k,
            )
        )
        canon = X.canonicalize_urls(
            docs.select("doc_id", "text", url.alias("url"))
        )
        kept = D.dedup_exact(canon, text_col="url_canonical", id_col="doc_id")
        return X.pack_token_shards(kept, budget=512).orderBy("doc_id")

    q["td_curate"] = td_curate

    def txt_chunks(spark, sf_dir):
        # context-window chunking: 32-token windows, 8-token overlap —
        # map-only slice+posexplode; oracle recomputes windows with
        # DuckDB list slicing
        docs = load_table(spark, sf_dir, "documents")
        return X.chunk_documents(docs, chunk_tokens=32, overlap=8).orderBy(
            "doc_id", "chunk_id"
        )

    q["txt_chunks"] = txt_chunks

    def kg_triangles(spark, sf_dir):
        # triangle counts over the same deterministic synthetic relation
        # graph as kg_degree_stats; oracle = SQL wedge/closing self-joins
        from phenoqc_spark.operators import canonicalize as C

        docs = load_table(spark, sf_dir, "documents")
        edges = docs.select(
            (F.col("doc_id") % 40).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 45).alias("dst"),
        )
        return C.graph_triangles(edges).orderBy("node")

    q["kg_triangles"] = kg_triangles

    def kg_clustering(spark, sf_dir):
        # local clustering coefficients (2T / d(d-1)) over the same
        # deterministic relation graph; oracle extends the kg_triangles
        # SQL with the per-node degree and the coefficient formula
        from phenoqc_spark.operators import canonicalize as C

        docs = load_table(spark, sf_dir, "documents")
        edges = docs.select(
            (F.col("doc_id") % 40).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 45).alias("dst"),
        )
        return C.clustering_coefficients(edges).orderBy("node")

    q["kg_clustering"] = kg_clustering

    def kg_kcore(spark, sf_dir):
        # k-core decomposition (distributed peeling) over the same
        # deterministic relation graph as kg_triangles/kg_clustering;
        # oracle = pinned sequential-peeling golden
        # (phenoqc_spark/kcore_golden.py, scripts/gen_kcore_golden.py) —
        # the k-core is unique, so the independent twin must match exactly
        from phenoqc_spark.operators.canonicalize import coreness

        docs = load_table(spark, sf_dir, "documents")
        edges = docs.select(
            (F.col("doc_id") % 40).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 45).alias("dst"),
        )
        return coreness(edges).orderBy("node")

    q["kg_kcore"] = kg_kcore

    def kg_bfs(spark, sf_dir):
        # unweighted shortest paths from seeds {0, 7} over the same
        # deterministic relation graph; oracle = a genuinely independent
        # DuckDB RECURSIVE CTE (set-semantics UNION bounds the state to
        # node×depth pairs; MIN(d) per node = BFS distance)
        from phenoqc_spark.operators.canonicalize import bfs_distances

        docs = load_table(spark, sf_dir, "documents")
        edges = docs.select(
            (F.col("doc_id") % 40).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 45).alias("dst"),
        )
        seeds = spark.createDataFrame([(0,), (7,)], "node long")
        return bfs_distances(edges, seeds).orderBy("node")

    q["kg_bfs"] = kg_bfs

    def _term_dag(docs):
        # deterministic 60-term multi-inheritance subsumption DAG derived
        # from the documents scan: term n has parent n div 2 (n ≥ 2) and,
        # for n % 4 == 0, a second parent n div 3 — parents are strictly
        # smaller, so the graph is acyclic with depth ~6
        nodes = docs.select((F.col("doc_id") % 60).alias("n")).distinct()
        e1 = nodes.filter(F.col("n") >= 2).select(
            F.col("n").alias("c"), F.expr("n div 2").alias("p")
        )
        e2 = nodes.filter((F.col("n") >= 3) & (F.col("n") % 4 == 0)).select(
            F.col("n").alias("c"), F.expr("n div 3").alias("p")
        )
        return e1.union(e2).select(
            F.format_string("T%02d", F.col("c")).alias("child"),
            F.format_string("T%02d", F.col("p")).alias("parent"),
        )

    def kg_ancestor_closure(spark, sf_dir):
        # transitive is_a closure with min-hop depth; oracle = DuckDB
        # recursive CTE (set-semantics UNION + MIN(depth) per pair)
        from phenoqc_spark.operators.canonicalize import ancestor_closure

        docs = load_table(spark, sf_dir, "documents")
        return ancestor_closure(_term_dag(docs)).orderBy("node", "ancestor")

    q["kg_ancestor_closure"] = kg_ancestor_closure

    def kg_term_rollup(spark, sf_dir):
        # HPO-style annotation rollup: each document's term counts toward
        # itself and every ancestor, DISTINCT on a coarse record key so
        # records annotated with two terms in one subtree count once
        from phenoqc_spark.operators.canonicalize import (
            ancestor_closure,
            rollup_counts,
        )

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        facts = docs.select(
            F.format_string("T%02d", F.col("doc_id") % 60).alias("term"),
            (F.col("doc_id") % 500).alias("rec"),
        )
        return rollup_counts(
            facts, closure, term_col="term", distinct_col="rec"
        ).orderBy("ancestor")

    q["kg_term_rollup"] = kg_term_rollup

    def kg_term_similarity(spark, sf_dir):
        # ancestor-set Jaccard over deterministic term pairs from the
        # same subsumption DAG (entity-linking near-miss grading)
        from phenoqc_spark.operators.canonicalize import (
            ancestor_closure,
            term_pair_similarity,
        )

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        a = (F.col("doc_id") % 60).alias("a")
        b = ((F.col("doc_id") * 11 + 5) % 60).alias("b")
        pairs = (
            docs.select(a, b)
            .filter(F.col("a") < F.col("b"))
            .distinct()
            .select(
                F.format_string("T%02d", F.col("a")).alias("term_a"),
                F.format_string("T%02d", F.col("b")).alias("term_b"),
            )
        )
        out = term_pair_similarity(pairs, closure)
        return out.select(
            "term_a",
            "term_b",
            "n_common",
            F.round("jaccard", 6).alias("jaccard"),
        ).orderBy("term_a", "term_b")

    q["kg_term_similarity"] = kg_term_similarity

    def _term_facts(docs):
        # deterministic annotation facts over the 60-term DAG: each doc
        # annotates one term; rec is a coarse record key
        return docs.select(
            F.format_string("T%02d", F.col("doc_id") % 60).alias("term"),
            (F.col("doc_id") % 500).alias("rec"),
        )

    def kg_term_ic(spark, sf_dir):
        # Resnik corpus information content: -ln(rollup_freq / total)
        # with DISTINCT record counting; root IC is exactly 0
        from phenoqc_spark.operators.canonicalize import ancestor_closure, term_ic

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        out = term_ic(_term_facts(docs), closure, distinct_col="rec")
        # + 0.0 folds IEEE -0.0 (the root's -ln(1.0)) to +0.0 so the
        # cross-engine value hash cannot split on repr(-0.0)
        return out.select(
            "term", "n", (F.round("ic", 6) + F.lit(0.0)).alias("ic")
        ).orderBy("term")

    q["kg_term_ic"] = kg_term_ic

    def kg_resnik(spark, sf_dir):
        # IC-based semantic similarity (resnik = IC(MICA), lin normalized)
        # over the same deterministic term pairs as kg_term_similarity
        from phenoqc_spark.operators.canonicalize import (
            ancestor_closure,
            resnik_lin_similarity,
            term_ic,
        )

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        ic = term_ic(_term_facts(docs), closure, distinct_col="rec")
        pairs = (
            docs.select(
                (F.col("doc_id") % 60).alias("a"),
                ((F.col("doc_id") * 11 + 5) % 60).alias("b"),
            )
            .filter(F.col("a") < F.col("b"))
            .distinct()
            .select(
                F.format_string("T%02d", F.col("a")).alias("term_a"),
                F.format_string("T%02d", F.col("b")).alias("term_b"),
            )
        )
        out = resnik_lin_similarity(pairs, ic, closure)
        return out.select(
            "term_a",
            "term_b",
            (F.round("ic_a", 6) + F.lit(0.0)).alias("ic_a"),
            (F.round("ic_b", 6) + F.lit(0.0)).alias("ic_b"),
            (F.round("resnik", 6) + F.lit(0.0)).alias("resnik"),
            (F.round("lin", 6) + F.lit(0.0)).alias("lin"),
        ).orderBy("term_a", "term_b")

    q["kg_resnik"] = kg_resnik

    def kg_phenomizer_bma(spark, sf_dir):
        # Phenomizer-style best-match-average entity similarity over
        # deterministic annotation sets (entity = doc_id % 40)
        from phenoqc_spark.operators.canonicalize import (
            ancestor_closure,
            bma_similarity,
            term_ic,
        )

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        ann = docs.select(
            (F.col("doc_id") % 40).alias("entity"),
            F.format_string("T%02d", F.col("doc_id") % 60).alias("term"),
        )
        ic = term_ic(ann.select("term"), closure)
        pairs = (
            docs.select(
                (F.col("doc_id") % 40).alias("entity_a"),
                ((F.col("doc_id") * 7 + 3) % 40).alias("entity_b"),
            )
            .filter(F.col("entity_a") < F.col("entity_b"))
            .distinct()
        )
        out = bma_similarity(pairs, ann, ic, closure)
        return out.select(
            "entity_a",
            "entity_b",
            (F.round("sim_ab", 6) + F.lit(0.0)).alias("sim_ab"),
            (F.round("sim_ba", 6) + F.lit(0.0)).alias("sim_ba"),
            (F.round("bma", 6) + F.lit(0.0)).alias("bma"),
        ).orderBy("entity_a", "entity_b")

    q["kg_phenomizer_bma"] = kg_phenomizer_bma

    def kg_soft_pr(spark, sf_dir):
        # ontology-aware linking scorecard: exact P/R + soft P/R where
        # near-misses earn their best per-key Lin similarity — produced
        # links are a deterministic corruption of the gold links (1/3
        # exact, the rest shifted terms, some keys one-sided)
        from phenoqc_spark.operators.canonicalize import (
            ancestor_closure,
            soft_link_pr,
            term_ic,
        )

        docs = load_table(spark, sf_dir, "documents")
        closure = ancestor_closure(_term_dag(docs))
        ic = term_ic(_term_facts(docs), closure, distinct_col="rec")
        gold = docs.filter(F.col("doc_id") % 10 < 8).select(
            F.col("doc_id").alias("url"),
            F.format_string("T%02d", F.col("doc_id") % 60).alias("term"),
        )
        produced = docs.filter(F.col("doc_id") % 10 > 0).select(
            F.col("doc_id").alias("url"),
            F.format_string(
                "T%02d",
                F.when(
                    F.col("doc_id") % 3 == 0, F.col("doc_id") % 60
                ).otherwise((F.col("doc_id") * 13 + 7) % 60),
            ).alias("term"),
        )
        out = soft_link_pr(produced, gold, ic, closure)
        return out.select(
            "n_produced",
            "n_gold",
            "n_exact",
            (F.round("precision_exact", 6) + F.lit(0.0)).alias("precision_exact"),
            (F.round("recall_exact", 6) + F.lit(0.0)).alias("recall_exact"),
            (F.round("soft_precision", 6) + F.lit(0.0)).alias("soft_precision"),
            (F.round("soft_recall", 6) + F.lit(0.0)).alias("soft_recall"),
        )

    q["kg_soft_pr"] = kg_soft_pr

    def kg_bgp(spark, sf_dir):
        # SPARQL-style basic graph pattern over materialized triples:
        # annotation + is_a triples, 3-pattern chain ending in a
        # constant (grandparent = T01) — constants pushed into scans,
        # natural joins on shared variables
        from phenoqc_spark.operators.triples import match_bgp

        docs = load_table(spark, sf_dir, "documents")
        ann = docs.select(
            F.format_string("d%04d", F.col("doc_id")).alias("subj"),
            F.lit("has_term").alias("pred"),
            F.format_string("T%02d", F.col("doc_id") % 60).alias("obj"),
        )
        isa = _term_dag(docs).select(
            F.col("child").alias("subj"),
            F.lit("is_a").alias("pred"),
            F.col("parent").alias("obj"),
        )
        out = match_bgp(
            ann.unionByName(isa),
            [("?d", "has_term", "?t"), ("?t", "is_a", "?p"), ("?p", "is_a", "T01")],
        )
        return out.orderBy("d", "t", "p")

    q["kg_bgp"] = kg_bgp

    def kg_ntriples(spark, sf_dir):
        # N-Triples serialization with literal objects (string-escape
        # path exercised on real document text)
        from phenoqc_spark.operators.triples import to_ntriples

        docs = load_table(spark, sf_dir, "documents")
        t = docs.select(
            F.format_string("doc/%d", F.col("doc_id")).alias("subj"),
            F.lit("has_text").alias("pred"),
            F.substring("text", 1, 40).alias("obj"),
        )
        return to_ntriples(t, obj_literal=True).orderBy("ntriple")

    q["kg_ntriples"] = kg_ntriples

    def kg_turtle(spark, sf_dir):
        # Turtle serialization with CURIE compression: term ids that land
        # e00-e44 compress under the declared e: namespace, doc subjects
        # stay full IRIs; the oracle rebuilds lines with the same
        # safe-local rule in SQL
        from phenoqc_spark.operators.triples import to_turtle

        docs = load_table(spark, sf_dir, "documents")
        t = docs.select(
            F.format_string("doc/%d", F.col("doc_id")).alias("subj"),
            F.lit("rel").alias("pred"),
            F.format_string("e%02d", ((F.col("doc_id") * 7 + 3) % 45)).alias("obj"),
        )
        return to_turtle(
            t, {"e": "http://example.org/e"}, base="http://example.org/"
        ).orderBy("line")

    q["kg_turtle"] = kg_turtle

    def kg_bgp_path(spark, sf_dir):
        # property-path BGP: ?t is_a+ T01 resolved through the
        # materialized ancestor closure (any-depth descendants)
        from phenoqc_spark.operators.canonicalize import ancestor_closure
        from phenoqc_spark.operators.triples import match_bgp

        docs = load_table(spark, sf_dir, "documents")
        ann = docs.select(
            F.format_string("d%04d", F.col("doc_id")).alias("subj"),
            F.lit("has_term").alias("pred"),
            F.format_string("T%02d", F.col("doc_id") % 60).alias("obj"),
        )
        closure = ancestor_closure(_term_dag(docs)).select("node", "ancestor")
        out = match_bgp(
            ann,
            [("?d", "has_term", "?t"), ("?t", "is_a+", "T01")],
            closures={"is_a+": closure},
        )
        return out.orderBy("d", "t")

    q["kg_bgp_path"] = kg_bgp_path

    def sim_hash_embed(spark, sf_dir):
        # feature-hashing text embedding (hashing trick) — DuckDB cannot
        # reproduce Spark's seeded xxhash64, so the oracle is the pinned
        # full-precision golden (scripts/gen_hash_embed_golden.py)
        from phenoqc_spark.operators import similarity as SIM

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
        return (
            SIM.hash_embedding(docs, dim=64, seed=42)
            .select("vec_id", F.posexplode("embedding").alias("idx", "value"))
            .select("vec_id", F.col("idx").cast("int").alias("idx"), F.round("value", 9).alias("value"))
            .orderBy("vec_id", "idx")
        )

    q["sim_hash_embed"] = sim_hash_embed

    # ---- r2-retired trio, resurrected so the local gate covers the exact
    # triples path / date-format / missing-flag operators again (their
    # driver rows were green in r1-r2; ADVICE r3 item 5) -------------------

    def v_format_date(spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "d",
            F.when(F.col("o_orderkey") % 20 == 0, F.lit("NOT_A_DATE")).otherwise(
                F.col("o_orderdate").cast("string")
            ),
        )
        return (
            V.format_violations(orders, "d", "date")
            .select("o_orderkey", "d")
            .orderBy("o_orderkey")
        )

    q["v_format_date"] = v_format_date

    def agg_missing_flag(spark, sf_dir):
        ev = _events_nulls(spark, sf_dir).select("event_id", "value")
        from phenoqc_spark.operators.validation import flag_missing

        return flag_missing(ev).agg(
            F.sum(F.col("MissingDataFlag").cast("long")).alias("n_flagged")
        )

    q["agg_missing_flag"] = agg_missing_flag
    return q


def _oracle_sql_r3() -> dict[str, str]:
    o: dict[str, str] = {}
    o["txt_repetition"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || text || chr(10) || 'tail line'
              ELSE text END AS text
  FROM documents
), l AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS ls,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS ws
  FROM d
), m AS (
  SELECT doc_id, text, ls, ws,
         list_sum([CASE WHEN list_position(ls, ls[i]) < i THEN 1 ELSE 0 END
                   FOR i IN range(1, len(ls) + 1)]) AS n_rep,
         list_sum([CASE WHEN list_position(ls, ls[i]) < i THEN length(ls[i]) ELSE 0 END
                   FOR i IN range(1, len(ls) + 1)]) AS rep_chars,
         CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(ws) END AS n_words,
         len(list_distinct(ws)) AS n_distinct,
         CASE WHEN len(ws) >= 2
              THEN [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]
              ELSE [] END AS bg
  FROM l
)
SELECT doc_id,
       CASE WHEN len(ls) > 0 THEN ROUND(CAST(n_rep AS DOUBLE) / len(ls), 6) ELSE 0.0 END AS dup_line_frac,
       CASE WHEN length(text) > 0 THEN ROUND(CAST(rep_chars AS DOUBLE) / length(text), 6) ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN n_words > 0 THEN ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) ELSE 0.0 END AS dup_word_frac,
       CASE WHEN length(text) > 0
            THEN ROUND(CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                 s -> len(list_filter(bg, x -> x = s)) * length(s))), 0) AS DOUBLE) / length(text), 6)
            ELSE 0.0 END AS top_bigram_char_frac
FROM m ORDER BY doc_id
"""

    o["dd_paragraph"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 2
              THEN 'SHARED HEADER NAV' || chr(10) || chr(10) || text || chr(10) || chr(10) || 'COPYRIGHT FOOTER'
              ELSE text END AS text
  FROM documents
), p AS (
  SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM d
), freq AS (
  SELECT md5(x) AS h
  FROM (SELECT doc_id, UNNEST(list_distinct(ps)) AS x FROM p)
  WHERE len(trim(x)) > 0
  GROUP BY md5(x) HAVING COUNT(*) > 5
), bad AS (SELECT COALESCE(list(h), []) AS hs FROM freq)
SELECT doc_id,
       md5(array_to_string(
         list_filter(ps, x -> len(trim(x)) = 0 OR NOT list_contains(bad.hs, md5(x))),
         chr(10) || chr(10))) AS clean_md5
FROM p, bad ORDER BY doc_id
"""

    o["txt_tfidf"] = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE length(token) > 0 GROUP BY 1, 2
), dfq AS (
  SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token
), n AS (SELECT COUNT(DISTINCT doc_id) AS N FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
         ROUND(tf.tf * (ln((n.N + 1.0) / (dfq.doc_freq + 1)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfq USING (token), n
), ranked AS (
  SELECT doc_id, token, tf, doc_freq, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq,
       tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""

    o["txt_hosts"] = """
WITH d AS (
  SELECT printf('https://host%02d.example.org/p/%d', CAST(doc_id % 37 AS INT), doc_id) AS url,
         CASE WHEN doc_id % 10 < 2 THEN 'dup bucket ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
), parsed AS (
  SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
         regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1) AS path,
         md5(text) AS h
  FROM d
), g AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
         ROUND(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 6) AS dup_rate
  FROM parsed GROUP BY host
), t AS (SELECT SUM(n_docs) AS total FROM g)
SELECT host, n_docs, n_paths, dup_rate,
       ROUND(CAST(n_docs AS DOUBLE) / t.total, 6) AS corpus_share
FROM g, t ORDER BY host
"""

    # sim_pq_adc: pinned PQ codebook (m=8 × ksub=16 × d=8) → encoding,
    # lookup tables, and ADC ranking all SQL-recomputable.  The half-norm
    # literals (cn) are computed by the same Python expression feeding the
    # Spark literals, so the argmax tie-break is bit-identical.
    from phenoqc_spark.pq_codebook import PQ_CODEBOOK_8x16x8 as _PQ

    _pq_rows = ",\n  ".join(
        f"({mi}, {j}, [{', '.join(repr(x) for x in c)}], {sum(x * x for x in c) / 2.0!r})"
        for mi, book in enumerate(_PQ)
        for j, c in enumerate(book)
    )
    o["sim_pq_adc"] = f"""
WITH cb(m, j, c, cn) AS (VALUES
  {_pq_rows}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
u AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv FROM e),
sub AS (
  SELECT u.vec_id, cb.m, cb.j,
         list_dot_product(uv[cb.m * 8 + 1 : cb.m * 8 + 8], cb.c) - cb.cn AS s
  FROM u, cb
),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY s DESC, j ASC) AS rn
    FROM sub
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id,
         list_transform(v, x -> x / (sqrt(list_dot_product(v, v)) + 1e-12)) AS qu
  FROM e WHERE vec_id < 5
),
tq AS (
  SELECT q.query_id, cb.m, cb.j,
         list_dot_product(qu[cb.m * 8 + 1 : cb.m * 8 + 8], cb.c) AS t
  FROM q, cb
),
adc AS (
  SELECT tq.query_id, codes.vec_id, ROUND(SUM(tq.t), 6) AS adc_score
  FROM codes JOIN tq ON codes.m = tq.m AND codes.code = tq.j
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, vec_id, adc_score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_score DESC, vec_id ASC) AS rank
  FROM adc
)
SELECT query_id, vec_id, adc_score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""

    o["td_mix_sample"] = """
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15)) AS BIGINT)
      / CAST(1152921504606846976 AS DOUBLE)
      < CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                    WHEN 'src2' THEN 1.0 ELSE 0.0 END
ORDER BY doc_id
"""

    o["td_classifier_filter"] = f"""
SELECT vec_id, label, ROUND(score, 6) AS score FROM (
  SELECT vec_id, label,
         1.0 / (1.0 + EXP(-(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             {_CLS_W_SQL}) + 0.05))) AS score
  FROM embeddings
) WHERE score >= 0.5 ORDER BY vec_id
"""

    o["txt_unigram_nll"] = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), tt AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
freq AS (SELECT token, COUNT(*) AS cnt FROM tt GROUP BY token),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM freq)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-ln((COALESCE(cnt, 0) + 1.0) / (tot.total + tot.vocab))), 6) AS mean_nll
FROM tt LEFT JOIN freq USING (token), tot
GROUP BY doc_id ORDER BY doc_id
"""

    o["kg_degree_stats"] = """
WITH t AS (
  SELECT printf('e%02d', CAST(doc_id % 40 AS INT)) AS subj,
         printf('e%02d', CAST((doc_id * 7 + 3) % 45 AS INT)) AS obj
  FROM documents
), od AS (SELECT subj AS entity, CAST(COUNT(*) AS BIGINT) AS out_degree FROM t GROUP BY subj),
idg AS (SELECT obj AS entity, CAST(COUNT(*) AS BIGINT) AS in_degree FROM t GROUP BY obj)
SELECT COALESCE(od.entity, idg.entity) AS entity,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree
FROM od FULL OUTER JOIN idg ON od.entity = idg.entity
ORDER BY entity
"""

    from phenoqc_spark.pagerank_golden import PAGERANK_400

    _pr_vals = ",\n  ".join(
        f"('{n}', CAST({r} AS DOUBLE))" for n, r in PAGERANK_400
    )
    o["kg_pagerank"] = (
        "SELECT * FROM (VALUES\n  "
        + _pr_vals
        + '\n) AS t(node, "rank") ORDER BY node'
    )

    from phenoqc_spark.ppr_golden import PPR_400

    _ppr_vals = ",\n  ".join(
        f"('{n}', CAST({r} AS DOUBLE))" for n, r in PPR_400
    )
    o["kg_ppr"] = (
        "SELECT * FROM (VALUES\n  "
        + _ppr_vals
        + '\n) AS t(node, "rank") ORDER BY node'
    )

    o["kg_cocitation"] = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
e0 AS (
  SELECT printf('p%d', doc_id) AS l, printf('t%d', doc_id % 20) AS r FROM d
  UNION ALL
  SELECT printf('p%d', doc_id), printf('t%d', (doc_id + 1) % 20) FROM d
  UNION ALL
  SELECT printf('p%d', doc_id), printf('t%d', doc_id % 7 + 100) FROM d
  UNION ALL
  SELECT printf('p%d', doc_id), 't999' FROM d WHERE doc_id % 2 = 0
), e AS (SELECT DISTINCT l, r FROM e0),
keep AS (SELECT r FROM e GROUP BY r HAVING count(*) <= 60),
ek AS (SELECT e.l, e.r FROM e JOIN keep USING (r))
SELECT x.l AS node_a, y.l AS node_b, count(*) AS weight
FROM ek x JOIN ek y ON x.r = y.r AND x.l < y.l
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY node_a, node_b
"""

    o["kg_redirects"] = """
WITH RECURSIVE m AS (
  SELECT printf('https://ex.org/p%d', doc_id) AS src,
         printf('https://ex.org/p%d', doc_id - 1) AS dst
  FROM documents WHERE doc_id < 2000 AND doc_id % 10 <> 0
  UNION ALL
  SELECT printf('https://ex.org/p%d', doc_id),
         printf('https://ex.org/p%d', (doc_id + 10) % 30)
  FROM documents WHERE doc_id IN (0, 10, 20)
), walk AS (
  SELECT src AS origin, dst AS cur, 1 AS hops FROM m
  UNION ALL
  SELECT w.origin, m.dst, w.hops + 1 FROM walk w JOIN m ON w.cur = m.src
  WHERE w.hops < 16
), term AS (
  SELECT origin, cur, hops FROM walk WHERE cur NOT IN (SELECT src FROM m)
)
SELECT s.src AS src, COALESCE(t.cur, '') AS final_url,
       CAST(COALESCE(t.hops, -1) AS BIGINT) AS hops,
       t.origin IS NULL AS unresolved
FROM (SELECT DISTINCT src FROM m) s LEFT JOIN term t ON t.origin = s.src
ORDER BY src
"""

    o["txt_html_text"] = """
SELECT doc_id,
       'Doc ' || CAST(doc_id % 7 AS VARCHAR) || ' ' || text ||
       ' & tail <' || CAST(doc_id % 5 AS VARCHAR) || '>' AS text
FROM documents WHERE doc_id < 3000 ORDER BY doc_id
"""

    o["kg_anchor_texts"] = """
WITH d AS (
  SELECT doc_id, (doc_id * 7 + 1) % 100 AS y FROM documents WHERE doc_id < 500
), links AS (
  SELECT printf('https://host%02d.example.org/dir/p%d.html', CAST(y % 23 AS INT), y) AS dst_url,
         'entity ' || CAST(doc_id % 4 AS VARCHAR) AS anchor
  FROM d
), pa AS (
  SELECT dst_url, anchor, count(*) AS n FROM links GROUP BY 1, 2
), ranked AS (
  SELECT dst_url, anchor, n,
         row_number() OVER (PARTITION BY dst_url ORDER BY n DESC, anchor ASC) AS rn
  FROM pa
), tot AS (
  SELECT dst_url, SUM(n) AS in_degree FROM pa GROUP BY 1
)
SELECT r.dst_url AS dst_url, CAST(t.in_degree AS BIGINT) AS in_degree,
       r.anchor AS top_anchor, CAST(r.n AS BIGINT) AS top_anchor_n
FROM ranked r JOIN tot t ON t.dst_url = r.dst_url
WHERE r.rn = 1 ORDER BY dst_url
"""

    o["kg_web_links"] = """
WITH d AS (
  SELECT doc_id,
         printf('https://host%02d.example.org/dir/p%d.html',
                CAST(doc_id % 23 AS INT), doc_id) AS src_url,
         (doc_id * 7 + 1) % 500 AS y,
         (doc_id * 3 + 2) % 500 AS z,
         doc_id % 97 AS w
  FROM documents WHERE doc_id < 500
)
SELECT src_url, dst_url, anchor FROM (
  SELECT src_url,
         printf('https://host%02d.example.org/dir/p%d.html', CAST(y % 23 AS INT), y) AS dst_url,
         'link ' || CAST(y AS VARCHAR) AS anchor
  FROM d
  UNION ALL
  SELECT src_url,
         printf('https://host%02d.example.org/root/p%d', CAST(doc_id % 23 AS INT), z),
         'root ' || CAST(z AS VARCHAR)
  FROM d
  UNION ALL
  SELECT src_url,
         printf('https://host%02d.example.org/dir/rel/q%d.html', CAST(doc_id % 23 AS INT), w),
         'rel ' || CAST(w AS VARCHAR)
  FROM d
  UNION ALL
  SELECT src_url, 'https://cdn.example.org/asset.js', 'cdn asset' FROM d
)
ORDER BY src_url, dst_url, anchor
"""

    o["kg_harmonic"] = """
WITH RECURSIVE es AS (
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS a,
         'n' || lpad(CAST((doc_id + 12) % 240 AS VARCHAR), 3, '0') AS b
  FROM documents WHERE doc_id < 240 AND doc_id % 40 <> 7
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 7 + 3) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 5 = 0
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 11 + 5) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 7 = 3
),
es2 AS (SELECT a, b FROM es WHERE a <> b),
-- explicit DISTINCT: under WITH RECURSIVE, DuckDB compiles a plain
-- UNION CTE without cross-branch dedup
ns AS (SELECT DISTINCT v FROM (SELECT a AS v FROM es2 UNION ALL SELECT b FROM es2)),
reach(src, dst, h) AS (
  SELECT v, v, 0 FROM ns
  UNION
  SELECT r.src, e.b, r.h + 1 FROM reach r JOIN es2 e ON e.a = r.dst WHERE r.h < 6
),
mh AS (SELECT src, dst, MIN(h) AS h FROM reach GROUP BY 1, 2),
-- per-node per-distance reacher counts (w -> ... -> v), self excluded
dc AS (
  SELECT dst AS node, h, count(*) AS cnt FROM mh WHERE h >= 1 GROUP BY 1, 2
),
hv AS (
  SELECT node, round(sum(cnt * 1.0 / h), 6) AS centrality,
         sum(cnt) AS n_reachers
  FROM dc GROUP BY node
)
SELECT ns.v AS node,
       COALESCE(hv.centrality, 0.0) AS centrality,
       CAST(COALESCE(hv.n_reachers, 0) AS BIGINT) AS n_reachers
FROM ns LEFT JOIN hv ON hv.node = ns.v
ORDER BY node
"""

    o["kg_hyperanf"] = """
WITH RECURSIVE es AS (
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS a,
         'n' || lpad(CAST((doc_id + 12) % 240 AS VARCHAR), 3, '0') AS b
  FROM documents WHERE doc_id < 240 AND doc_id % 40 <> 7
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 7 + 3) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 5 = 0
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 11 + 5) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 7 = 3
),
ns AS (SELECT a AS v FROM es UNION SELECT b FROM es),
reach(src, dst, h) AS (
  SELECT v, v, 0 FROM ns
  UNION
  SELECT r.src, e.b, r.h + 1 FROM reach r JOIN es e ON e.a = r.dst WHERE r.h < 6
),
mh AS (SELECT src, dst, MIN(h) AS h FROM reach GROUP BY 1, 2),
ts(hops) AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6)) t(h))
SELECT CAST(ts.hops AS INT) AS hops,
       (SELECT count(*) FROM mh WHERE mh.h <= ts.hops) AS n_pairs
FROM ts ORDER BY hops
"""

    o["txt_source_cardinality"] = """
SELECT source, count(DISTINCT md5(text)) AS n_distinct
FROM documents GROUP BY source ORDER BY source
"""

    from phenoqc_spark.bpe_golden import BPE_MERGES_30 as _BPE

    _bpe_vals = ",\n  ".join(f"({s}, '{a}', '{b}', {n})" for (s, a, b, n) in _BPE)
    o["txt_bpe_merges"] = (
        "SELECT CAST(step AS INT) AS step, left_sym, right_sym,\n"
        "       CAST(n AS BIGINT) AS n\n"
        "FROM (VALUES\n  " + _bpe_vals + "\n) AS t(step, left_sym, right_sym, n)\n"
        "ORDER BY step"
    )

    o["txt_cms_counts"] = """
WITH toks AS (
  SELECT source,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), cells AS (
  SELECT source, d.depth,
         CAST(('0x' || substr(md5(token || '|' || CAST(d.depth AS VARCHAR)), 1, 8)) AS BIGINT) % 1024 AS pos,
         COUNT(*) AS cnt
  FROM toks CROSS JOIN (VALUES (0),(1),(2)) d(depth)
  WHERE length(token) > 0
  GROUP BY 1, 2, 3
), probes AS (
  SELECT p.token, d.depth,
         CAST(('0x' || substr(md5(p.token || '|' || CAST(d.depth AS VARCHAR)), 1, 8)) AS BIGINT) % 1024 AS pos
  FROM (VALUES ('join'),('hash'),('customer'),('zzz_unseen')) p(token)
  CROSS JOIN (VALUES (0),(1),(2)) d(depth)
), grid AS (
  SELECT s.source, pr.token, pr.depth, pr.pos
  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN probes pr
)
SELECT g.source AS source, g.token AS token,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
FROM grid g LEFT JOIN cells c
  ON c.source = g.source AND c.depth = g.depth AND c.pos = g.pos
GROUP BY 1, 2 ORDER BY 1, 2
"""

    o["txt_heavy_tokens"] = """
WITH toks AS (
  SELECT source,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), cnts AS (
  SELECT source, token, COUNT(*) AS c FROM toks WHERE length(token) > 0 GROUP BY 1, 2
)
SELECT source, token, c AS cnt_lower, c AS cnt_upper
FROM cnts WHERE c >= 50 ORDER BY source, token
"""

    o["v_anomalies_mad"] = """
WITH m AS (SELECT median(value) AS med FROM events),
mm AS (
  SELECT (SELECT med FROM m) AS med,
         median(abs(value - (SELECT med FROM m))) AS mad
  FROM events
)
SELECT e.event_id, round(e.value, 6) AS value
FROM events e, mm
WHERE mm.mad IS NOT NULL AND mm.mad <> 0
  AND abs((e.value - mm.med) / (1.4826 * mm.mad)) > 3.5
ORDER BY e.event_id
"""

    o["v_winsorize"] = """
WITH q AS (
  SELECT quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
  FROM events
)
SELECT event_id,
       round(CASE WHEN value IS NULL THEN NULL
                  ELSE least(greatest(value, lo), hi) END, 6) AS value_w
FROM events, q ORDER BY event_id
"""

    o["agg_reliability"] = f"""
WITH s AS (
  SELECT 1.0 / (1.0 + EXP(-(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             {_CLS_W_SQL}) + 0.05))) AS score,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
)
SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin,
       count(*) AS n,
       round(avg(score), 6) AS mean_score,
       round(avg(y), 6) AS frac_pos
FROM s GROUP BY 1 ORDER BY bin
"""

    from phenoqc_spark.ktruss_golden import KTRUSS_120

    _kt_vals = ",\n  ".join(f"('{a}', '{b}')" for a, b in KTRUSS_120)
    o["kg_ktruss"] = (
        "SELECT * FROM (VALUES\n  "
        + _kt_vals
        + "\n) AS t(node_a, node_b) ORDER BY node_a, node_b"
    )

    from phenoqc_spark.sgns_golden import SGNS_AUC

    _sga_vals = ",\n  ".join(
        f"('{p_}', CAST({a} AS DOUBLE))" for p_, a in SGNS_AUC
    )
    o["kg_sgns_eval"] = (
        "SELECT * FROM (VALUES\n  "
        + _sga_vals
        + "\n) AS t(phase, auc) ORDER BY phase"
    )

    from phenoqc_spark.sgns_golden import SGNS_LOSSES

    _sg_vals = ",\n  ".join(
        f"(CAST({e} AS INT), CAST({l} AS DOUBLE))" for e, l in SGNS_LOSSES
    )
    o["kg_sgns_loss"] = (
        "SELECT * FROM (VALUES\n  "
        + _sg_vals
        + "\n) AS t(epoch, loss) ORDER BY epoch"
    )

    o["kg_link_predict"] = """
WITH es AS (
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS a,
         'n' || lpad(CAST((doc_id + 12) % 240 AS VARCHAR), 3, '0') AS b
  FROM documents WHERE doc_id < 240 AND doc_id % 40 <> 7
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 7 + 3) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 5 = 0
  UNION
  SELECT 'n' || lpad(CAST(doc_id AS VARCHAR), 3, '0'),
         'n' || lpad(CAST((doc_id * 11 + 5) % 240 AS VARCHAR), 3, '0')
  FROM documents WHERE doc_id < 240 AND doc_id % 7 = 3
),
sym AS (
  SELECT a, b FROM es WHERE a <> b
  UNION
  SELECT b, a FROM es WHERE a <> b
),
deg AS (SELECT a AS node, count(*) AS deg FROM sym GROUP BY a),
hub AS (SELECT s.a AS z, s.b AS n, d.deg AS zdeg FROM sym s JOIN deg d ON d.node = s.a),
pairs AS (
  SELECT l.n AS node_a, r.n AS node_b, count(*) AS common,
         sum(1.0 / ln(l.zdeg)) AS aa
  FROM hub l JOIN hub r ON l.z = r.z AND l.n < r.n
  GROUP BY 1, 2
  HAVING count(*) >= 1
)
SELECT p.node_a, p.node_b, p.common,
       round(p.common / (da.deg + db.deg - p.common), 6) AS jaccard,
       round(p.aa, 6) AS adamic_adar
FROM pairs p
JOIN deg da ON da.node = p.node_a
JOIN deg db ON db.node = p.node_b
ORDER BY p.node_a, p.node_b
"""

    o["agg_hist_quantiles"] = """
SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
       CAST(quantile_disc(user_id, 0.25) AS DOUBLE) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, CAST(0.5 AS DOUBLE),
       CAST(quantile_disc(user_id, 0.5) AS DOUBLE) FROM events GROUP BY event_type
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE),
       CAST(quantile_disc(user_id, 0.9) AS DOUBLE) FROM events GROUP BY event_type
ORDER BY event_type, q
"""

    o["txt_bm25"] = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), t2 AS (SELECT * FROM toks WHERE length(token) > 0),
per_doc AS (
  SELECT doc_id, count(*) AS dl,
         sum(CASE WHEN token = 'hash'   THEN 1 ELSE 0 END) AS tf0,
         sum(CASE WHEN token = 'merge'  THEN 1 ELSE 0 END) AS tf1,
         sum(CASE WHEN token = 'window' THEN 1 ELSE 0 END) AS tf2
  FROM t2 GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM per_doc
), scored AS (
  SELECT doc_id, round(
      ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
  6) AS score
  FROM per_doc, stats
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 15
"""

    from phenoqc_spark.spectral_golden import SPECTRAL_8

    _sp_vals = ",\n  ".join(
        f"(CAST({i} AS INT), CAST({s} AS DOUBLE))" for i, s in SPECTRAL_8
    )
    o["kg_spectral"] = (
        "SELECT * FROM (VALUES\n  "
        + _sp_vals
        + "\n) AS t(component, sigma) ORDER BY component"
    )

    from phenoqc_spark.kmeans_golden import KMEANS_500

    _km_vals = ",\n  ".join(
        f"(CAST({i} AS BIGINT), CAST({c} AS INT))" for i, c in KMEANS_500
    )
    o["emb_kmeans"] = (
        "SELECT * FROM (VALUES\n  "
        + _km_vals
        + "\n) AS t(vec_id, cluster) ORDER BY vec_id"
    )

    from phenoqc_spark.scc_golden import SCC_240

    _scc_vals = ",\n  ".join(f"('{n}', '{s}')" for n, s in SCC_240)
    o["kg_scc"] = (
        "SELECT * FROM (VALUES\n  "
        + _scc_vals
        + "\n) AS t(node, scc_id) ORDER BY node"
    )

    from phenoqc_spark.pagerank_golden import PAGERANK_W_400

    _prw_vals = ",\n  ".join(
        f"('{n}', CAST({r} AS DOUBLE))" for n, r in PAGERANK_W_400
    )
    o["kg_pagerank_weighted"] = (
        "SELECT * FROM (VALUES\n  "
        + _prw_vals
        + '\n) AS t(node, "rank") ORDER BY node'
    )

    from phenoqc_spark.hits_golden import HITS_400

    _hits_vals = ",\n  ".join(
        f"('{n}', CAST({hb} AS DOUBLE), CAST({au} AS DOUBLE))" for n, hb, au in HITS_400
    )
    o["kg_hits"] = (
        "SELECT * FROM (VALUES\n  "
        + _hits_vals
        + "\n) AS t(node, hub, authority) ORDER BY node"
    )

    from phenoqc_spark.lpa_golden import LPA_400

    _lpa_vals = ",\n  ".join(f"('{n}', '{l}')" for n, l in LPA_400)
    o["kg_communities"] = (
        "SELECT * FROM (VALUES\n  "
        + _lpa_vals
        + "\n) AS t(node, label) ORDER BY node"
    )

    _lpa_label_vals = ",\n  ".join(f"('{n}', '{l}')" for n, l in LPA_400)
    _mapping_vals = ", ".join(f"({i}, '{t}')" for i, t in [
        (1, "HP:0000822"), (1, "DOID:0050167"),
        (2, "HP:0002090"), (2, "DOID:9352"), (2, "HP:0001627"), (2, "DOID:1612"),
        (3, "HP:0000822"), (3, "DOID:1388"),
    ])
    _xref_vals = ", ".join(f"('{a}', '{b}')" for a, b in [
        ("HP:0000822", "DOID:0050167"),
        ("DOID:1612", "HP:0001627"),
        ("HP:0002090", "DOID:9352"),
        ("DOID:1388", "HP:0000822"),
    ])
    o["kg_modularity"] = f"""
WITH mapping(idx, tid) AS (VALUES {_mapping_vals}),
e0 AS (
  SELECT printf('https://example.org/doc/%08d#%d',
                CAST(doc_id AS INT), CAST(doc_id AS INT)) AS a,
         tid AS b
  FROM documents JOIN mapping ON CAST(doc_id % 4 AS INT) = idx
  WHERE doc_id < 400
  UNION ALL
  SELECT * FROM (VALUES {_xref_vals}) AS x(a, b)
),
sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM e0 WHERE a <> b
    UNION ALL
    SELECT b AS a, a AS b FROM e0 WHERE a <> b
  )
),
m2 AS (SELECT COUNT(*) AS m2 FROM sym),
labels(node, label) AS (VALUES {_lpa_label_vals}),
deg AS (SELECT a, COUNT(*) AS d FROM sym GROUP BY a),
per AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d) AS BIGINT) AS degree_sum
  FROM deg JOIN labels l ON deg.a = l.node GROUP BY l.label
),
intra AS (
  SELECT la.label, CAST(COUNT(*) / 2 AS BIGINT) AS intra_edges
  FROM sym JOIN labels la ON sym.a = la.node
           JOIN labels lb ON sym.b = lb.node
  WHERE la.label = lb.label GROUP BY la.label
)
SELECT per.label, n_nodes, degree_sum,
       COALESCE(intra_edges, 0) AS intra_edges,
       ROUND(COALESCE(intra_edges, 0) / (m2.m2 / 2.0)
             - (degree_sum / CAST(m2.m2 AS DOUBLE)) ^ 2, 6) AS contribution
FROM per LEFT JOIN intra ON per.label = intra.label CROSS JOIN m2
ORDER BY per.label
"""

    o["txt_pmi"] = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), toks2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
dfreq AS (SELECT token, COUNT(*) AS n FROM toks2 GROUP BY token),
n AS (SELECT COUNT(DISTINCT doc_id) AS N FROM documents),
pairs AS (
  SELECT x.token AS token_a, y.token AS token_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM toks2 x JOIN toks2 y ON x.doc_id = y.doc_id AND x.token < y.token
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT token_a, token_b,
       CAST(da.n AS BIGINT) AS n_a, CAST(db.n AS BIGINT) AS n_b, n_ab,
       ROUND(ln(n_ab * n.N / (CAST(da.n AS DOUBLE) * db.n)), 6) AS pmi
FROM pairs
JOIN dfreq da ON pairs.token_a = da.token
JOIN dfreq db ON pairs.token_b = db.token
CROSS JOIN n
ORDER BY token_a, token_b
"""

    o["kg_negative_samples"] = """
WITH pos AS (
  SELECT DISTINCT printf('e%02d', CAST(doc_id % 40 AS INT)) AS subj,
         'rel' AS pred,
         printf('e%02d', CAST((doc_id * 7 + 3) % 45 AS INT)) AS obj
  FROM documents
),
pool AS (
  SELECT obj AS ent,
         CAST(row_number() OVER (ORDER BY obj) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT obj FROM pos)
),
np AS (SELECT COUNT(*) AS n FROM pool),
cand AS (
  SELECT subj, pred, obj, i.sample_idx,
         CAST(('0x' || substr(md5(subj || '|' || pred || '|' || obj || '|'
                              || CAST(i.sample_idx AS VARCHAR) || '|42'), 1, 15))
              AS BIGINT) % np.n AS idx
  FROM pos CROSS JOIN (SELECT UNNEST([0, 1]) AS sample_idx) i CROSS JOIN np
),
neg AS (
  SELECT subj, pred, pool.ent AS neg_obj, CAST(sample_idx AS INT) AS sample_idx
  FROM cand JOIN pool USING (idx)
)
SELECT neg.subj, neg.pred, neg.neg_obj, neg.sample_idx
FROM neg ANTI JOIN pos
  ON neg.subj = pos.subj AND neg.pred = pos.pred AND neg.neg_obj = pos.obj
ORDER BY subj, pred, neg_obj, sample_idx
"""

    _z_terms = " + ".join(
        f"((({c} >> {b}) & 1) << {b * 2 + ci})"
        for b in range(16)
        for ci, c in enumerate(["x", "y"])
    )
    o["f_zvalue"] = f"""
WITH q AS (
  SELECT event_id,
         CAST(event_id % 65536 AS BIGINT) AS x,
         CAST(user_id % 65536 AS BIGINT) AS y
  FROM events
)
SELECT event_id, x, y, CAST({_z_terms} AS BIGINT) AS z
FROM q ORDER BY event_id
"""

    o["td_host_cap"] = """
WITH d AS (
  SELECT doc_id,
         printf('https://host%02d.example.org/p/%d',
                CAST(doc_id % 37 AS INT), CAST(doc_id AS INT)) AS url,
         printf('host%02d.example.org', CAST(doc_id % 37 AS INT)) AS host
  FROM documents
), r AS (
  SELECT doc_id, url,
         row_number() OVER (
           PARTITION BY host
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id
         ) AS rn
  FROM d
)
SELECT doc_id, url FROM r WHERE rn <= 10 ORDER BY doc_id
"""

    o["td_url_filter"] = """
WITH d AS (
  SELECT doc_id,
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN 'spam.example.com'      -- www. stripped by the engine
           WHEN 1 THEN 'ads.tracker.net'
           WHEN 2 THEN 'en.wikipedia.org'
           WHEN 3 THEN 'blog.example.org'
           ELSE 'files.archive.org' END AS host,
         printf('/p%d/%d', CAST(doc_id % 7 AS INT), CAST(doc_id AS INT)) AS path
  FROM documents
), f AS (
  SELECT doc_id,
         CASE WHEN host = 'spam.example.com' THEN 'host'
              WHEN host = 'tracker.net' OR host LIKE '%.tracker.net' THEN 'suffix'
              WHEN path LIKE '/p3/%' THEN 'path'
              ELSE NULL END AS block_reason
  FROM d
)
SELECT doc_id, block_reason IS NOT NULL AS blocked,
       COALESCE(block_reason, 'kept') AS block_reason
FROM f ORDER BY doc_id
"""

    o["td_robots"] = """
SELECT doc_id,
       CASE WHEN CAST(doc_id % 10 AS INT) % 2 = 0
            THEN doc_id % 4 = 3                     -- gptbot group: only /feed
            ELSE NOT (doc_id % 4 = 0) END AS crawl_allowed  -- * group: /private blocked,
                                                            -- /private/ok{d} allow wins
FROM documents ORDER BY doc_id
"""

    o["txt_surt"] = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT)
         WHEN 0 THEN 'com,example,news'
         WHEN 1 THEN 'net,tracker,b,a'
         ELSE 'org,wikipedia,en' END
       || ')' || printf('/p/%d', CAST(doc_id % 5 AS INT))
       || CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '' END AS surt
FROM documents ORDER BY doc_id
"""

    o["td_sitemap"] = """
WITH d AS (
  SELECT CAST(doc_id % 100 AS INT) AS hd FROM documents WHERE doc_id < 20
), e AS (
  SELECT printf('https://h%d.example.org/sitemap.xml', hd) AS sitemap_url,
         printf('https://h%d.example.org/p/0', hd) AS loc,
         printf('2024-01-%02d', hd % 9 + 1) AS lastmod,
         0.5 AS priority, FALSE AS is_index
  FROM d WHERE hd % 2 = 0
  UNION ALL
  SELECT printf('https://h%d.example.org/sitemap.xml', hd),
         printf('https://h%d.example.org/p/1', hd),
         'none', -1.0, FALSE
  FROM d WHERE hd % 2 = 0
  UNION ALL
  SELECT printf('https://h%d.example.org/sitemap.xml', hd),
         printf('https://h%d.example.org/s-a.xml', hd), 'none', -1.0, TRUE
  FROM d WHERE hd % 2 = 1
  UNION ALL
  SELECT printf('https://h%d.example.org/sitemap.xml', hd),
         printf('https://h%d.example.org/s-b.xml', hd), 'none', -1.0, TRUE
  FROM d WHERE hd % 2 = 1
)
SELECT sitemap_url, loc, lastmod, CAST(priority AS DOUBLE) AS priority, is_index
FROM e ORDER BY sitemap_url, loc
"""

    o["v_triple_shapes"] = """
WITH t AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN printf('x%03d', CAST(doc_id % 97 AS INT))
              ELSE printf('s%03d', CAST(doc_id % 97 AS INT)) END AS subj,
         CASE WHEN doc_id % 3 = 0 THEN 'rel' ELSE 'alt' END AS pred,
         printf('e%02d', CAST((doc_id * 7 + 3) % 45 AS INT)) AS obj
  FROM documents
),
r(pred, subj_regex, obj_regex) AS (
  VALUES ('rel', NULL, '^e[01][0-9]$'), ('alt', '^s[0-9]{3}$', NULL)
),
j AS (SELECT t.*, r.subj_regex, r.obj_regex FROM t JOIN r USING (pred))
SELECT subj, pred, obj, 'bad_subject' AS reason FROM j
WHERE subj_regex IS NOT NULL AND NOT regexp_matches(subj, subj_regex)
UNION ALL
SELECT subj, pred, obj, 'bad_object' FROM j
WHERE obj_regex IS NOT NULL AND NOT regexp_matches(obj, obj_regex)
ORDER BY subj, pred, obj, reason
"""

    _rw_steps = []
    for _step in (1, 2, 3):
        _prev = f"s{_step - 1}"
        _rw_steps.append(f"""
s{_step} AS (
  SELECT {_prev}.start, {_prev}.walk, adj.b AS node
  FROM {_prev}
  JOIN deg ON {_prev}.node = deg.a
  JOIN adj ON adj.a = {_prev}.node
   AND adj.idx = CAST(('0x' || substr(md5({_prev}.node || '|' || {_prev}.start
                 || '|' || CAST({_prev}.walk AS VARCHAR) || '|{_step}|42'),
                 1, 15)) AS BIGINT) % deg.deg
)""")
    _rw_with = f"""
WITH mapping(idx, tid) AS (VALUES {_mapping_vals}),
e0 AS (
  SELECT printf('https://example.org/doc/%08d#%d',
                CAST(doc_id AS INT), CAST(doc_id AS INT)) AS a,
         tid AS b
  FROM documents JOIN mapping ON CAST(doc_id % 4 AS INT) = idx
  WHERE doc_id < 400
  UNION ALL
  SELECT * FROM (VALUES {_xref_vals}) AS x(a, b)
),
sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM e0 WHERE a <> b
    UNION ALL
    SELECT b AS a, a AS b FROM e0 WHERE a <> b
  )
),
adj AS (
  SELECT a, b,
         CAST(row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS BIGINT) AS idx
  FROM sym
),
deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
s0 AS (SELECT DISTINCT a AS start, CAST(0 AS INT) AS walk, a AS node FROM sym),
{','.join(_rw_steps)},
w AS (
  SELECT start, walk, CAST(0 AS INT) AS step, node FROM s0
  UNION ALL SELECT start, walk, CAST(1 AS INT), node FROM s1
  UNION ALL SELECT start, walk, CAST(2 AS INT), node FROM s2
  UNION ALL SELECT start, walk, CAST(3 AS INT), node FROM s3
)"""
    o["kg_random_walks"] = (
        _rw_with
        + "\nSELECT start, walk, step, node FROM w ORDER BY start, walk, step, node\n"
    )
    o["kg_skipgrams"] = (
        _rw_with
        + """
SELECT a.node AS center, b.node AS context, CAST(b.step - a.step AS INT) AS "offset"
FROM w a JOIN w b ON a.start = b.start AND a.walk = b.walk
WHERE b.step <> a.step AND ABS(b.step - a.step) <= 2
ORDER BY center, context, "offset"
"""
    )

    from phenoqc_spark.n2v_golden import N2V_400

    _n2v_vals = ",\n  ".join(
        f"('{s}', {w}, {st}, '{n}')" for s, w, st, n in N2V_400
    )
    o["kg_node2vec"] = (
        "SELECT * FROM (VALUES\n  "
        + _n2v_vals
        + "\n) AS t(start, walk, step, node) ORDER BY start, walk, step, node"
    )

    o["kg_merge_state"] = """
WITH b AS (
  SELECT printf('e%02d', doc_id % 9) AS subject,
         'rel' AS predicate,
         printf('e%02d', (doc_id * 7 + 3) % 11) AS object,
         ((doc_id % 7) + 1) / 10.0 AS confidence,
         1 AS b
  FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT printf('e%02d', doc_id % 9),
         'rel',
         printf('e%02d', (doc_id * 7 + 3) % 11),
         ((doc_id % 7) + 1) / 10.0,
         2
  FROM documents WHERE doc_id >= 150 AND doc_id < 450
)
SELECT subject, predicate, object,
       MAX(confidence) AS confidence,
       CAST(MIN(b) AS INT) AS first_seen,
       CAST(MAX(b) AS INT) AS last_seen,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM b
GROUP BY subject, predicate, object
ORDER BY subject, predicate, object
"""
    return o


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the registered views)
# ---------------------------------------------------------------------------

def _all_oracle_sql() -> dict[str, str]:
    """Full oracle registry (one DuckDB-SQL twin per query in
    ``_all_queries``); split by ``_RECORDED`` into ``oracle_sql()`` /
    ``extra_oracle_sql()``."""
    o: dict[str, str] = {}

    from phenoqc_spark.pages import PHENO_POOLS as _PP

    _lens = {c: len(p) for c, p in _PP.items()}
    o["kg_triples_full"] = f"""
WITH m(col, idx, onto, tid) AS (VALUES
        {_KG_FULL_ORACLE_VALUES}),
d AS (
  SELECT doc_id,
         CAST(doc_id % {_lens['PrimaryPhenotype']} AS INT) AS i0,
         CAST((doc_id + 1) % {_lens['SecondaryPhenotype']} AS INT) AS i1,
         CAST((doc_id + 2) % {_lens['TertiaryPhenotype']} AS INT) AS i2,
         CAST((doc_id + 3) % {_lens['DiseaseCode']} AS INT) AS i3
  FROM documents
)
SELECT DISTINCT
  printf('https://example.org/doc/%08d', doc_id) || '#' || CAST(doc_id AS VARCHAR) AS subj,
  col || '->' || onto AS pred,
  tid AS obj
FROM d JOIN m
  ON (m.col = 'PrimaryPhenotype' AND m.idx = d.i0)
  OR (m.col = 'SecondaryPhenotype' AND m.idx = d.i1)
  OR (m.col = 'TertiaryPhenotype' AND m.idx = d.i2)
  OR (m.col = 'DiseaseCode' AND m.idx = d.i3)
ORDER BY subj, pred, obj
"""

    o["kg_triples_array"] = """
WITH m(idx, onto, tid) AS (VALUES
  (1, 'HPO', 'HP:0000822'), (1, 'DO', 'DOID:0050167'),
  (2, 'HPO', 'HP:0002090'), (2, 'DO', 'DOID:9352'),
  (2, 'HPO', 'HP:0001627'), (2, 'DO', 'DOID:1612'),
  (3, 'HPO', 'HP:0000822'), (3, 'DO', 'DOID:1388')),
d AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS idx FROM documents)
SELECT DISTINCT
  printf('https://example.org/doc/%08d', doc_id) || '#' || CAST(doc_id AS VARCHAR) AS subj,
  'ObservedFeatures->' || onto AS pred, tid AS obj
FROM d JOIN m ON m.idx = d.idx
ORDER BY subj, pred, obj
"""

    o["kg_mapping_stats"] = """
SELECT * FROM (VALUES
  ('DiseaseCode', 'DO',  CAST(6 AS BIGINT), CAST(6 AS BIGINT), 100.0),
  ('DiseaseCode', 'HPO', CAST(6 AS BIGINT), CAST(1 AS BIGINT), 16.67),
  ('DiseaseCode', 'MPO', CAST(6 AS BIGINT), CAST(1 AS BIGINT), 16.67),
  ('PrimaryPhenotype', 'DO',  CAST(7 AS BIGINT), CAST(6 AS BIGINT), 85.71),
  ('PrimaryPhenotype', 'HPO', CAST(7 AS BIGINT), CAST(7 AS BIGINT), 100.0),
  ('PrimaryPhenotype', 'MPO', CAST(7 AS BIGINT), CAST(0 AS BIGINT), 0.0)
) AS t("column", ontology, total_terms, mapped_terms, success_rate_pct)
"""

    o["kg_canonicalize_cc"] = """
WITH m AS (
  SELECT n_regionkey, MIN(n_nationkey) AS mn FROM nation GROUP BY n_regionkey
)
SELECT CAST(n.n_nationkey AS BIGINT) AS node, CAST(m.mn AS BIGINT) AS component
FROM nation n JOIN m ON n.n_regionkey = m.n_regionkey
UNION ALL
SELECT CAST(n_regionkey + 1000 AS BIGINT), CAST(mn AS BIGINT) FROM m
ORDER BY node
"""

    o["v_range_accuracy"] = """
SELECT l_orderkey, l_linenumber,
       'l_quantity' AS column,
       CAST(l_quantity AS VARCHAR) AS value,
       CAST(1 AS DOUBLE) AS minimum,
       CAST(45 AS DOUBLE) AS maximum
FROM lineitem
WHERE TRY_CAST(l_quantity AS DOUBLE) < 1 OR TRY_CAST(l_quantity AS DOUBLE) > 45
ORDER BY l_orderkey, l_linenumber
"""

    o["v_required_missing"] = """
SELECT event_id, user_id FROM events WHERE event_id % 10 = 0 ORDER BY event_id
"""

    o["v_referential_integrity"] = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IS NULL
   OR o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0)
ORDER BY o_orderkey
"""

    o["v_duplicates"] = """
SELECT s_suppkey, s_nationkey FROM (
  SELECT s_suppkey, s_nationkey, COUNT(*) OVER (PARTITION BY s_nationkey) AS n
  FROM supplier
) WHERE n > 1 ORDER BY s_suppkey
"""

    o["v_conflicts"] = """
SELECT user_id, event_type FROM events
WHERE user_id IN (
  SELECT user_id FROM events
  GROUP BY user_id
  HAVING COUNT(*) > 1
     AND COUNT(DISTINCT COALESCE(event_type, '<null>')) > 1
)
ORDER BY user_id, event_type
"""

    o["v_anomalies_zscore"] = """
WITH v AS (
  SELECT event_id,
         CASE WHEN event_id % 1000 = 0 THEN value * 50 ELSE value END AS value
  FROM events
), s AS (SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM v)
SELECT event_id, value FROM v, s
WHERE sd IS NOT NULL AND sd <> 0 AND ABS((value - mu) / sd) > 3
ORDER BY event_id
"""

    o["v_timeliness"] = """
SELECT event_id, 'lag_exceeded' AS issue FROM events
WHERE ts IS NOT NULL
  AND (epoch(TIMESTAMP '2024-01-25 00:00:00') - epoch(ts)) > 20 * 86400
UNION ALL
SELECT event_id, 'missing_or_invalid_date' FROM events WHERE ts IS NULL
ORDER BY event_id
"""

    o["v_missing_counts"] = """
SELECT * FROM (
  SELECT 'lang' AS "column", CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS missing_count FROM documents
  UNION ALL
  SELECT 'text', CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM documents
) WHERE missing_count > 0 ORDER BY "column"
"""

    o["v_schema_flag"] = """
SELECT event_id,
       (user_id IS NULL
        OR COALESCE((CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END) < 10.0, FALSE)) AS flag
FROM events ORDER BY event_id
"""

    o["agg_class_distribution"] = """
WITH c AS (
  SELECT CAST(label AS VARCHAR) AS label, COUNT(*) AS count
  FROM embeddings WHERE label IS NOT NULL GROUP BY 1
), t AS (SELECT SUM(count) AS total, MIN(count) AS mincnt FROM c)
SELECT c.label, c.count,
       ROUND(CAST(c.count AS DOUBLE) / t.total, 6) AS proportion,
       (c.count = t.mincnt) AS is_minority,
       (c.count = t.mincnt AND CAST(c.count AS DOUBLE) / t.total < 0.10) AS warning
FROM c, t ORDER BY c.label
"""

    o["agg_impute_mean"] = """
WITH v AS (
  SELECT event_id, CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value FROM events
)
SELECT event_id, ROUND(COALESCE(value, (SELECT AVG(value) FROM v)), 4) AS value_filled
FROM v ORDER BY event_id
"""

    o["agg_impute_median"] = """
WITH v AS (
  SELECT event_id, CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value FROM events
)
SELECT event_id, ROUND(COALESCE(value, (SELECT MEDIAN(value) FROM v)), 4) AS value_filled
FROM v ORDER BY event_id
"""

    o["agg_impute_mode"] = """
WITH v AS (
  SELECT event_id, CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS event_type FROM events
), m AS (
  SELECT event_type FROM v WHERE event_type IS NOT NULL
  GROUP BY event_type ORDER BY COUNT(*) DESC, event_type ASC LIMIT 1
)
SELECT event_id, COALESCE(v.event_type, (SELECT event_type FROM m)) AS event_type
FROM v ORDER BY event_id
"""

    o["agg_redundancy"] = """
SELECT * FROM (VALUES ('a', 'b', 'identical', 1.0))
AS t(column_1, column_2, metric, value)
"""

    o["agg_topk_terms"] = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT UNNEST(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
) GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
"""

    o["agg_window_running"] = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS running_value
FROM events WHERE user_id < 10 ORDER BY event_id
"""

    o["agg_time_window"] = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

    o["agg_sessionize"] = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""

    o["agg_asof_join"] = """
WITH r AS (
  SELECT user_id, ts, MAX_BY(value, event_id) AS asof_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
), l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.user_id, l.ts,
       COALESCE(r.ts, TIMESTAMP '1970-01-01') AS asof_ts,
       COALESCE(r.asof_value, -1.0) AS asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""

    o["agg_latest_event"] = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
"""

    o["agg_range_join"] = """
WITH e AS (
  SELECT event_id AS err_id, user_id, ts AS w_start,
         ts + INTERVAL 30 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT e.err_id, e.user_id, e.w_start,
       CAST(COUNT(c.ts) AS BIGINT) AS n_clicks
FROM e LEFT JOIN c
  ON c.user_id = e.user_id AND c.ts >= e.w_start AND c.ts <= e.w_end
GROUP BY e.err_id, e.user_id, e.w_start
ORDER BY e.err_id
"""

    o["agg_percentiles"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""

    o["u_snapshot_diff"] = """
WITH o AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
), n AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
), d AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text <> n.text THEN 'changed' END AS change
  FROM o FULL JOIN n ON o.doc_id = n.doc_id
)
SELECT doc_id, change FROM d WHERE change IS NOT NULL ORDER BY doc_id
"""

    o["agg_drift_psi"] = """
WITH b AS (
  SELECT event_type AS g,
         CAST(value >= 10 AS INT) + CAST(value >= 20 AS INT) + CAST(value >= 30 AS INT)
         + CAST(value >= 40 AS INT) + CAST(value >= 50 AS INT) + CAST(value >= 60 AS INT)
         + CAST(value >= 70 AS INT) + CAST(value >= 80 AS INT) + CAST(value >= 90 AS INT)
           AS bucket
  FROM events WHERE event_type IN ('click', 'error') AND value IS NOT NULL
), c AS (
  SELECT g, bucket, COUNT(*) AS n FROM b GROUP BY g, bucket
), t AS (
  SELECT g, SUM(n) AS tot FROM c GROUP BY g
), f AS (
  SELECT c.g, c.bucket, CAST(c.n AS DOUBLE) / t.tot AS fr, t.tot
  FROM c JOIN t ON c.g = t.g
), e AS (SELECT bucket, fr AS fe, tot AS te FROM f WHERE g = 'click'),
   a AS (SELECT bucket, fr AS fa, tot AS ta FROM f WHERE g = 'error'),
   j AS (
  SELECT GREATEST(COALESCE(e.fe, 0.0), 1e-6) AS fe,
         GREATEST(COALESCE(a.fa, 0.0), 1e-6) AS fa, e.te, a.ta
  FROM e FULL JOIN a ON e.bucket = a.bucket
)
SELECT ROUND(SUM((fa - fe) * LN(fa / fe)), 6) AS psi,
       MAX(te) AS n_expected, MAX(ta) AS n_actual
FROM j
"""

    o["agg_drift_panel"] = """
WITH base AS (
  SELECT value AS v, event_type AS g FROM events
  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
), per_val AS (
  SELECT v,
         SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS n2
  FROM base GROUP BY v
), tot AS (
  SELECT CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS t2,
         AVG(CASE WHEN g = 'click' THEN v END) AS m1,
         AVG(CASE WHEN g = 'error' THEN v END) AS m2,
         STDDEV_SAMP(CASE WHEN g = 'click' THEN v END) AS s1,
         STDDEV_SAMP(CASE WHEN g = 'error' THEN v END) AS s2
  FROM base
), cum AS (
  SELECT SUM(n1) OVER (ORDER BY v) AS c1,
         SUM(n2) OVER (ORDER BY v) AS c2
  FROM per_val
)
SELECT ROUND(MAX(ABS(CAST(c1 AS DOUBLE) / t1 - CAST(c2 AS DOUBLE) / t2)), 6) AS ks,
       ROUND((m1 - m2) / SQRT((s1 * s1 + s2 * s2) / 2.0), 6) AS smd,
       ROUND((s1 * s1) / (s2 * s2), 6) AS var_ratio,
       t1 AS n_expected, t2 AS n_actual
FROM cum CROSS JOIN tot
GROUP BY t1, t2, m1, m2, s1, s2
"""

    o["agg_pivot"] = """
SELECT user_id % 10 AS bucket,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY 1
"""

    o["agg_cube"] = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(user_id % 2 AS VARCHAR), '<all>') AS parity,
       CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY CUBE(event_type, user_id % 2)
ORDER BY 1, 2
"""

    o["agg_rollup"] = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(user_id % 2 AS VARCHAR), '<all>') AS parity,
       CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY ROLLUP(event_type, user_id % 2)
ORDER BY 1, 2
"""

    o["f_json_extract"] = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""

    o["v_cell_violations"] = """
WITH d AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderkey % 20 = 0 THEN 'NOT_A_DATE' ELSE CAST(o_orderdate AS VARCHAR) END AS dd
  FROM orders
)
SELECT o_orderkey, 'o_totalprice' AS "column", 'below_minimum' AS reason FROM d WHERE o_totalprice < 1000
UNION ALL
SELECT o_orderkey, 'o_totalprice', 'above_maximum' FROM d WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, 'd', 'bad_format_date' FROM d WHERE NOT regexp_matches(dd, '^\\d{4}-\\d{2}-\\d{2}$')
ORDER BY o_orderkey, "column", reason
"""

    o["q1_pricing"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

    o["q3_shipping"] = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""

    o["dd_exact_groups"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2 THEN 'dup bucket ' || CAST(doc_id % 5 AS VARCHAR) ELSE text END AS text
  FROM documents
)
SELECT md5(text) AS content_hash, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS keep_id
FROM d GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY content_hash
"""

    o["dd_exact_bloom"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3 THEN 'shared content ' || CAST(doc_id % 6 AS VARCHAR) ELSE text END AS text
  FROM documents
), state AS (
  SELECT DISTINCT md5(text) AS h FROM d WHERE doc_id % 7 < 2
), batch AS (
  SELECT * FROM d WHERE doc_id % 7 >= 2
), new AS (
  SELECT b.* FROM batch b WHERE md5(b.text) NOT IN (SELECT h FROM state)
), keep AS (
  SELECT md5(text) AS h2, MIN(doc_id) AS keep_id FROM new GROUP BY md5(text)
)
SELECT n.doc_id, n.text FROM new n
JOIN keep k ON md5(n.text) = k.h2 AND n.doc_id = k.keep_id
ORDER BY n.doc_id
"""

    o["dd_ngram_jaccard"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'alpha beta gamma delta epsilon zeta eta theta bucket ' || CAST(doc_id % 3 AS VARCHAR)
              WHEN doc_id % 10 = 1 THEN 'alpha beta gamma delta epsilon zeta eta theta variant ' || CAST(doc_id % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id < 60
), w AS (
  SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ws
  FROM d
), s AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS g
  FROM w WHERE len(ws) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5
ORDER BY doc_a, doc_b
"""

    o["dd_containment"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'alpha beta gamma delta epsilon zeta canon ' || CAST(doc_id % 3 AS VARCHAR)
              WHEN doc_id % 10 = 1 THEN text || ' alpha beta gamma delta epsilon zeta canon ' || CAST(doc_id % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id < 60
), w AS (
  SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ws
  FROM d
), s AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS g
  FROM w WHERE len(ws) >= 3
)
SELECT a.doc_id AS doc_src, b.doc_id AS doc_dst,
       ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g), 6) AS containment
FROM s a JOIN s b ON a.doc_id <> b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) >= 0.8
ORDER BY doc_src, doc_dst
"""

    o["dd_embedding_neardup"] = """
SELECT vec_id AS id_a, vec_id + 10000 AS id_b, 1.0 AS cosine
FROM embeddings WHERE vec_id < 100 ORDER BY id_a, id_b
"""

    o["sim_knn_bruteforce"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS cosine
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(cosine, 4) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""

    o["txt_tokens"] = """
WITH w AS (
  SELECT doc_id,
         CASE WHEN len(trim(text)) = 0 THEN []
              ELSE string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') END AS ws
  FROM documents
)
SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(list_sum([CAST(ceil(len(x) / 4.0) AS INT) FOR x IN ws]), 0) AS BIGINT) AS n_subword_est
FROM w ORDER BY doc_id
"""

    o["txt_langid"] = """
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS ws
  FROM documents
), h AS (
  SELECT doc_id,
    len(list_filter(ws, x -> list_contains(['the','and','of','to','in','is','that','it','for','with'], x))) AS h_en,
    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','von'], x))) AS h_de,
    len(list_filter(ws, x -> list_contains(['le','la','les','et','est','pas','une','pour','avec','dans'], x))) AS h_fr,
    len(list_filter(ws, x -> list_contains(['el','la','los','y','es','no','una','para','con','por'], x))) AS h_es
  FROM t
)
SELECT doc_id,
  CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
       WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es) THEN 'fr'
       WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es) THEN 'es'
       WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es) THEN 'en'
       ELSE 'de' END AS lang_pred
FROM h ORDER BY doc_id
"""

    o["txt_fingerprint"] = """
SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id
"""

    o["txt_source_stats"] = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END) AS BIGINT)
         AS total_tokens,
       ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) AS dup_rate,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       ROUND(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS short_doc_share
FROM documents GROUP BY source ORDER BY source
"""

    o["agg_profile"] = """
WITH p AS (
  SELECT 'event_id' AS "column", CAST(event_id AS DOUBLE) AS x, event_id IS NULL AS isn FROM events
  UNION ALL
  SELECT 'user_id', CAST(user_id AS DOUBLE), user_id IS NULL FROM events
  UNION ALL
  SELECT 'value', CAST(value AS DOUBLE), value IS NULL FROM events
)
SELECT "column",
       count(x) AS n,
       sum(CASE WHEN isn THEN 1 ELSE 0 END) AS n_null,
       round(min(x), 6) AS min,
       round(max(x), 6) AS max,
       round(avg(x), 6) AS mean,
       round(stddev_samp(x), 6) AS stddev,
       round(quantile_cont(x, 0.25), 6) AS p25,
       round(quantile_cont(x, 0.50), 6) AS p50,
       round(quantile_cont(x, 0.75), 6) AS p75,
       round(quantile_cont(x, 0.95), 6) AS p95
FROM p GROUP BY "column" ORDER BY "column"
"""

    o["agg_quality_scores"] = """
WITH v AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value
  FROM events
), a AS (
  SELECT COUNT(*) AS total,
         SUM(CASE WHEN value < 10.0 THEN 1 ELSE 0 END) AS viol,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS miss
  FROM v
)
SELECT ROUND(100.0 * (total - viol) / total, 2) AS schema_score,
       ROUND(100.0 * (1.0 - CAST(miss AS DOUBLE) / (total * 3)), 2) AS missing_score,
       ROUND(75.0, 2) AS mapping_score,
       ROUND((100.0 * (total - viol) / total
            + 100.0 * (1.0 - CAST(miss AS DOUBLE) / (total * 3))
            + 75.0) / 3.0, 2) AS overall_score
FROM a
"""

    o["agg_sample_reservoir"] = """
SELECT CAST(LEAST(1000, COUNT(*)) AS BIGINT) AS n_sampled FROM events
"""

    o["u_issue_union"] = """
WITH v AS (
  SELECT event_id,
         CASE WHEN event_id % 1000 = 0 THEN value * 50 ELSE value END AS value
  FROM events
), s AS (SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM v)
SELECT DISTINCT * FROM (
  SELECT event_id, 'required_missing' AS issue FROM events WHERE event_id % 10 = 0
  UNION ALL
  SELECT event_id, 'anomaly_zscore' FROM v, s
  WHERE sd IS NOT NULL AND sd <> 0 AND ABS((value - mu) / sd) > 3
) ORDER BY event_id, issue
"""

    o["v_format_multi"] = """
WITH d AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'user@example.com'
              WHEN o_orderkey % 3 = 1 THEN 'bad-email-' || CAST(o_orderkey AS VARCHAR)
              ELSE 'a@b.co' END AS email,
         CASE WHEN o_orderkey % 4 = 0 THEN 'HP:0000118'
              WHEN o_orderkey % 4 = 1 THEN 'hp_0000118'
              ELSE 'DOID:1612' END AS ident,
         CASE WHEN o_orderkey % 5 = 0 THEN '150%' ELSE '85%' END AS pct
  FROM orders
)
SELECT o_orderkey, 'email' AS "column", 'email' AS fmt FROM d
WHERE NOT regexp_matches(email, '^[^@]+@[^@]+\\.[^@]+$')
UNION ALL
SELECT o_orderkey, 'ident', 'identifier' FROM d
WHERE NOT regexp_matches(ident, '^[A-Z]+:\\d+$')
UNION ALL
SELECT o_orderkey, 'pct', 'percentage' FROM d
WHERE TRY_CAST(regexp_replace(pct, '%$', '') AS DOUBLE) NOT BETWEEN 0 AND 100
ORDER BY o_orderkey, "column"
"""

    o["f_hash_lineage"] = """
SELECT doc_id, md5(text) AS md5_hash, sha256(text) AS sha256_hash
FROM documents ORDER BY doc_id
"""

    o["kg_accuracy_gt"] = f"""
WITH m(gcol, idx, onto, tid) AS (VALUES
        {_KG_ORACLE_VALUES}),
g AS (
  SELECT gcol, idx, onto, tid,
         CASE WHEN gcol = 'PrimaryPhenotype' AND idx = 2 AND onto = 'HPO'
              THEN 'HP:9999999' ELSE tid END AS gt_id
  FROM m
),
d AS (
  SELECT doc_id, CAST(doc_id % 7 AS INT) AS pidx,
         CAST((doc_id + 3) % 7 AS INT) AS didx
  FROM documents
),
per AS (
  SELECT d.doc_id, g.gcol || '->' || g.onto AS pred, g.gt_id, g.tid
  FROM d JOIN g
    ON (g.gcol = 'PrimaryPhenotype' AND g.idx = d.pidx)
    OR (g.gcol = 'DiseaseCode' AND g.idx = d.didx)
)
SELECT pred, CAST(COUNT(*) AS BIGINT) AS total,
       CAST(SUM(CASE WHEN tid = gt_id THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       ROUND(100.0 * SUM(CASE WHEN tid = gt_id THEN 1 ELSE 0 END) / COUNT(*), 2) AS accuracy_pct
FROM per GROUP BY pred ORDER BY pred
"""

    o["kg_canonical_triples"] = f"""
WITH m(gcol, idx, onto, tid) AS (VALUES
        {_KG_ORACLE_VALUES}),
d AS (
  SELECT doc_id,
         CAST(doc_id % 7 AS INT) AS pidx,
         CAST((doc_id + 3) % 7 AS INT) AS didx
  FROM documents
)
SELECT DISTINCT
  printf('https://example.org/doc/%08d', doc_id) || '#' || CAST(doc_id AS VARCHAR) AS subj,
  gcol || '->' || onto AS pred,
  CASE tid WHEN 'DOID:0050167' THEN 'HP:0000822'
           WHEN 'DOID:1612' THEN 'HP:0001627'
           WHEN 'DOID:9352' THEN 'HP:0002090'
           ELSE tid END AS obj
FROM d JOIN m
  ON (m.gcol = 'PrimaryPhenotype' AND m.idx = d.pidx)
  OR (m.gcol = 'DiseaseCode' AND m.idx = d.didx)
ORDER BY subj, pred, obj
"""

    o["td_prep"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2 THEN 'dup bucket ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
), kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM d
  ) WHERE rn = 1
), base AS (
  SELECT doc_id, len(text) AS length,
         len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         CASE WHEN len(trim(lower(text))) = 0 THEN []
              ELSE string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') END AS ws
  FROM kept
), f AS (
  SELECT doc_id, length, n_punct, len(ws) AS n_words,
    len(list_filter(ws, x -> list_contains(['the','and','of','to','in','is','that','it','for','with'], x))) AS h_en,
    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','von'], x))) AS h_de,
    len(list_filter(ws, x -> list_contains(['le','la','les','et','est','pas','une','pour','avec','dans'], x))) AS h_fr,
    len(list_filter(ws, x -> list_contains(['el','la','los','y','es','no','una','para','con','por'], x))) AS h_es
  FROM base
), r AS (
  SELECT doc_id, n_words, h_en, h_de, h_fr, h_es,
         CASE WHEN length > 0 THEN CAST(n_punct AS DOUBLE) / length ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_words > 0 THEN CAST(h_en AS DOUBLE) / n_words ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_words > 0 THEN CAST(length - (n_words - 1) AS DOUBLE) / n_words ELSE 0.0 END AS mean_wlen
  FROM f
), s AS (
  SELECT doc_id, n_words,
         ROUND((CASE WHEN n_words BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN mean_wlen BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END), 2) AS quality_score,
         CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
              WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es) THEN 'fr'
              WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es) THEN 'es'
              WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es) THEN 'en'
              ELSE 'de' END AS lang_pred
  FROM r
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens, quality_score
FROM s WHERE lang_pred = 'en' AND quality_score >= 0.6
ORDER BY doc_id
"""

    o["mm_frame_plan"] = """
SELECT media_id, frame_ts_ms FROM (
  SELECT doc_id AS media_id,
         CAST((doc_id * 37) % 5000 + 1000 AS INT) AS duration_ms
  FROM documents
  WHERE doc_id % 3 = 2
), LATERAL (
  SELECT CAST(UNNEST(generate_series(0, duration_ms, 1000)) AS INT) AS frame_ts_ms
)
ORDER BY media_id, frame_ts_ms
"""

    # Exact all-pairs jaccard >= t.  Valid as the LSH query's oracle because
    # (a) candidates are exact-verified, so false positives are impossible,
    # and (b) on this deterministic corpus banded LSH recall is exactly 1.0
    # (verified at sf0.01 and sf0.1) -- so output == the exact pair set.
    o["dd_minhash_lsh"] = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2
              THEN 'near duplicate text bucket ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
), words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM docs
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS shingle
  FROM words, range(1, 100000) t(i) WHERE i < len(w)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
ORDER BY doc_a, doc_b
"""

    # sim_ann_lsh: the hyperplanes are deterministic (seed 42), so bucket
    # assignment and the exact-cosine re-rank are SQL-recomputable with the
    # planes inlined as literal DOUBLE lists (identical bit patterns to the
    # Spark literals - both sides come from the same Python floats).
    from phenoqc_spark.operators.similarity import _hyperplanes as _hp

    _plane_vals = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in pl)}])" for i, pl in enumerate(_hp(64, 12, 42))
    )
    o["sim_ann_lsh"] = f"""
WITH planes(i, p) AS (VALUES
  {_plane_vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
signs AS (
  SELECT e.vec_id, planes.i,
         CASE WHEN list_dot_product(e.v, planes.p) >= 0 THEN (1::BIGINT << planes.i) ELSE 0::BIGINT END AS bit
  FROM e, planes
),
b AS (
  SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket FROM signs GROUP BY vec_id
),
qp AS (
  SELECT b.vec_id AS query_id, xor(b.bucket, px.x) AS bucket
  FROM b, (SELECT 0::BIGINT AS x UNION ALL SELECT (1::BIGINT << t.i) FROM range(0, 12) t(i)) px
  WHERE b.vec_id < 5
),
cand AS (
  SELECT DISTINCT qp.query_id, cb.vec_id
  FROM qp JOIN b cb ON qp.bucket = cb.bucket
),
scored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(ev.v, eq.v)
           / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(eq.v, eq.v))) AS cosine
  FROM cand c JOIN e ev ON c.vec_id = ev.vec_id JOIN e eq ON c.query_id = eq.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""

    # sim_ann_ivf: pinned codebook → every stage SQL-recomputable (same
    # argmax/tie-break and probe ordering as the Spark plan).
    from phenoqc_spark.ivf_codebook import IVF_CODEBOOK_8x64 as _cb

    _cell_vals = ",\n  ".join(
        f"({j}, [{', '.join(repr(x) for x in c)}])" for j, c in enumerate(_cb)
    )
    o["txt_redact"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'), '\\+?\\d[\\d\\-\\s]{7,}\\d')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'), '\\+?\\d[\\d\\-\\s]{7,}\\d', '<PHONE>', 'g')) AS redacted_md5
FROM d ORDER BY doc_id
"""

    o["td_contamination"] = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] || ' ' || w[i + 4] || ' ' || w[i + 5] || ' ' || w[i + 6] || ' ' || w[i + 7] AS shingle
  FROM words, range(1, 100000) t(i) WHERE i + 7 <= len(w)
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < 100
)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM sh s JOIN bench b ON s.shingle = b.shingle
WHERE s.doc_id >= 100
GROUP BY s.doc_id ORDER BY s.doc_id
"""

    o["sim_ann_ivf"] = f"""
WITH cells(j, c) AS (VALUES
  {_cell_vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (
  SELECT e.vec_id, cells.j,
         list_dot_product(e.v, cells.c) / sqrt(list_dot_product(e.v, e.v)) AS dot
  FROM e, cells
),
cass AS (
  SELECT vec_id, j AS cid FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, j ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, j AS cid FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, j ASC) AS rn
    FROM d WHERE vec_id < 5
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, ca.vec_id FROM probes p JOIN cass ca ON p.cid = ca.cid
),
scored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(ev.v, eq.v)
           / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(eq.v, eq.v))) AS cosine
  FROM cand c JOIN e ev ON c.vec_id = ev.vec_id JOIN e eq ON c.query_id = eq.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""

    o["dd_near_dedup"] = """
WITH RECURSIVE docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2
              THEN 'near duplicate text bucket ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
), words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM docs
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS shingle
  FROM words, range(1, 100000) t(i) WHERE i < len(w)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs0 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), p AS (
  SELECT doc_a, doc_b
  FROM pairs0 JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE r.a <> s.b
), mins AS (
  SELECT b AS doc_id, MIN(a) AS m FROM reach GROUP BY b
)
SELECT d.doc_id FROM docs d LEFT JOIN mins USING (doc_id)
WHERE mins.m IS NULL OR mins.m > d.doc_id
ORDER BY d.doc_id
"""

    o["dd_near_dedup_best"] = """
WITH RECURSIVE docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2
              THEN 'near duplicate text bucket ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text,
         CAST((doc_id * 7) % 13 AS DOUBLE) AS q
  FROM documents
), words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM docs
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS shingle
  FROM words, range(1, 100000) t(i) WHERE i < len(w)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs0 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), p AS (
  SELECT doc_a, doc_b
  FROM pairs0 JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE r.a <> s.b
), mins AS (
  SELECT b AS doc_id, MIN(a) AS m FROM reach GROUP BY b
), comp AS (
  SELECT d.doc_id, LEAST(COALESCE(mins.m, d.doc_id), d.doc_id) AS c, d.q
  FROM docs d LEFT JOIN mins USING (doc_id)
), ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY c ORDER BY q DESC, doc_id) AS rn
  FROM comp
)
SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id
"""

    o["dd_span_winnow"] = """
WITH docs AS (
  SELECT doc_id,
         string_split_regex(trim(lower(
           CASE WHEN doc_id % 10 < 2
                THEN 'copied span sentence alpha beta gamma delta epsilon variant '
                     || CAST(doc_id % 5 AS VARCHAR) || ' tail marker '
                     || CAST(doc_id AS VARCHAR)
                ELSE text END)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 2, 15)) AS BIGINT) AS h
  FROM docs, range(1, 100000) t(i) WHERE i + 4 <= len(w)
), wins AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS L
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= L - 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY doc_a, doc_b
"""

    o["txt_dup_spans"] = """
WITH docs AS (
  SELECT doc_id,
         string_split_regex(trim(lower(
           CASE WHEN doc_id % 10 < 2
                THEN 'copied span sentence alpha beta gamma delta epsilon variant '
                     || CAST(doc_id % 5 AS VARCHAR) || ' tail marker '
                     || CAST(doc_id AS VARCHAR)
                ELSE text END)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 2, 15)) AS BIGINT) AS h
  FROM docs, range(1, 100000) t(i) WHERE i + 4 <= len(w)
), wins AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS L
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= L - 2
), freq AS (
  SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS df FROM fps
)
SELECT doc_id,
       COUNT(*) AS n_fingerprints,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
         AS dup_span_fraction
FROM freq GROUP BY doc_id ORDER BY doc_id
"""

    o["dd_simhash"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE doc_id < 100
), th AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 2, 15)) AS BIGINT) AS h FROM toks
), bits AS (
  SELECT doc_id, t.i AS i,
         SUM(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, range(0, 60) t(i) GROUP BY doc_id, t.i
), sh AS (
  SELECT doc_id,
         COALESCE(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END), 0) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY doc_a, doc_b
"""

    o["mm_features"] = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         sha256(text) AS h
  FROM documents
), v AS (
  SELECT media_id, kind,
         [(CAST(('0x' || substr(h, 1, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 5, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 9, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 13, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 17, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 21, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 25, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 29, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 33, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 37, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 41, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 45, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 49, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 53, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 57, 4)) AS INT) / 32767.5 - 1),
         (CAST(('0x' || substr(h, 61, 4)) AS INT) / 32767.5 - 1)] AS vals
  FROM m
)
SELECT media_id, kind,
       ROUND(vals[1] / sqrt(list_aggregate(list_transform(vals, x -> x * x), 'sum')), 6) AS f0
FROM v ORDER BY media_id
"""

    o["txt_quality"] = """
WITH base AS (
  SELECT doc_id, text, len(text) AS length,
         len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         CASE WHEN len(trim(lower(text))) = 0 THEN []
              ELSE string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') END AS ws
  FROM documents
), f AS (
  SELECT doc_id, length, n_punct, len(ws) AS n_words,
         len(list_filter(ws, x -> list_contains(['the','and','of','to','in','is','that','it','for','with'], x))) AS n_stop
  FROM base
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN length > 0 THEN CAST(n_punct AS DOUBLE) / length ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_words > 0 THEN CAST(length - (n_words - 1) AS DOUBLE) / n_words ELSE 0.0 END AS mean_wlen
  FROM f
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(mean_wlen, 6) AS mean_word_len,
       ROUND((CASE WHEN n_words BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN mean_wlen BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
           + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
           + (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END), 2) AS quality_score
FROM r ORDER BY doc_id
"""

    o["kg_triples_unicode"] = f"""
WITH m(col, idx, onto, tid) AS (VALUES
        {_KG_UNICODE_ORACLE_VALUES}),
d AS (
  SELECT doc_id,
         CAST(doc_id % 7 AS INT) AS pidx,
         CAST((doc_id + 3) % 7 AS INT) AS didx
  FROM documents
)
SELECT DISTINCT
  printf('https://example.org/doc/%08d', doc_id) || '#' || CAST(doc_id AS VARCHAR) AS subj,
  col || '->' || onto AS pred,
  tid AS obj
FROM d JOIN m
  ON (m.col = 'PrimaryPhenotype' AND m.idx = d.pidx)
  OR (m.col = 'DiseaseCode' AND m.idx = d.didx)
ORDER BY subj, pred, obj
"""

    o["kg_triples_exact"] = f"""
WITH m(col, idx, onto, tid) AS (VALUES
        {_KG_ORACLE_VALUES}),
d AS (
  SELECT doc_id,
         CAST(doc_id % 7 AS INT) AS pidx,
         CAST((doc_id + 3) % 7 AS INT) AS didx
  FROM documents
)
SELECT DISTINCT
  printf('https://example.org/doc/%08d', doc_id) || '#' || CAST(doc_id AS VARCHAR) AS subj,
  col || '->' || onto AS pred,
  tid AS obj
FROM d JOIN m
  ON (m.col = 'PrimaryPhenotype' AND m.idx = d.pidx)
  OR (m.col = 'DiseaseCode' AND m.idx = d.didx)
ORDER BY subj, pred, obj
"""

    o["v_format_date"] = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 20 = 0 THEN 'NOT_A_DATE' ELSE CAST(o_orderdate AS VARCHAR) END AS d
FROM orders
WHERE NOT regexp_matches(
  CASE WHEN o_orderkey % 20 = 0 THEN 'NOT_A_DATE' ELSE CAST(o_orderdate AS VARCHAR) END,
  '^\\d{4}-\\d{2}-\\d{2}$')
ORDER BY o_orderkey
"""

    o["agg_missing_flag"] = """
SELECT CAST(SUM(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged FROM events
"""

    # pinned numpy-twin imputation goldens: full-precision doubles emitted
    # by scripts/gen_impute_golden.py from the SAME impute_numpy kernels the
    # Spark queries run inside mapInPandas on a bit-identical input chunk
    # (_events_impute2), so repr round-trip makes the VALUES oracle exact
    from phenoqc_spark import impute_golden as _G

    def _impute_oracle(rows):
        vals = ",\n  ".join(f"({i}, {v!r}, {f!r})" for (i, v, f) in rows)
        return (
            "SELECT CAST(event_id AS BIGINT) AS event_id,\n"
            "       CAST(value_filled AS DOUBLE) AS value_filled,\n"
            "       CAST(feat_filled AS DOUBLE) AS feat_filled\n"
            "FROM (VALUES\n  " + vals + "\n) AS t(event_id, value_filled, feat_filled)\n"
            "ORDER BY event_id"
        )

    o["agg_impute_knn"] = _impute_oracle(_G.KNN_2000)
    o["agg_impute_mice"] = _impute_oracle(_G.MICE_2000)
    o["agg_impute_svd"] = _impute_oracle(_G.SVD_2000)

    o["td_importance"] = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), tt AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
rfreq AS (SELECT token, COUNT(*) AS cnt_r FROM tt GROUP BY token),
rtot AS (SELECT SUM(cnt_r) AS total_r, COUNT(*) AS vocab_r FROM rfreq),
tfreq AS (SELECT token, COUNT(*) AS cnt_t FROM tt WHERE doc_id % 17 = 0 GROUP BY token),
ttot AS (SELECT SUM(cnt_t) AS total_t, COUNT(*) AS vocab_t FROM tfreq)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(SUM(ln((COALESCE(cnt_t, 0) + 1.0) / (ttot.total_t + ttot.vocab_t))
               - ln((cnt_r + 1.0) / (rtot.total_r + rtot.vocab_r))), 6) AS log_weight
FROM tt LEFT JOIN rfreq USING (token) LEFT JOIN tfreq USING (token), rtot, ttot
GROUP BY doc_id ORDER BY doc_id
"""

    o["td_pack_shards"] = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
              ELSE len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) END AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS shard_id
FROM t ORDER BY doc_id
"""

    o["txt_url_canon"] = """
SELECT doc_id,
  CASE CAST(doc_id % 6 AS INT)
    WHEN 0 THEN printf('http://host%02d.example.org/Path/%d?a=1&b=2', CAST(doc_id % 37 AS INT), doc_id)
    WHEN 1 THEN printf('https://host%02d.example.org/', CAST(doc_id % 37 AS INT))
    WHEN 2 THEN printf('https://host%02d.example.org:8443/x', CAST(doc_id % 37 AS INT))
    WHEN 3 THEN printf('http://host%02d.example.org/y?Z=9', CAST(doc_id % 37 AS INT))
    WHEN 4 THEN printf('https://host%02d.example.org', CAST(doc_id % 37 AS INT))
    ELSE printf('http://host%02d.example.org/p?a=0&b=1', CAST(doc_id % 37 AS INT))
  END AS url_canonical
FROM documents ORDER BY doc_id
"""

    o["td_curate"] = r"""
WITH kept AS (
  -- canonical form of doc_id >= 400 equals that of doc_id % 400, so
  -- keep-min-per-canonical-url == doc_id < 400 on this fixture
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
              ELSE len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) END AS n_tokens
  FROM documents WHERE doc_id < 400
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS shard_id
FROM kept ORDER BY doc_id
"""

    o["txt_chunks"] = r"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
), st AS (
  SELECT doc_id, toks,
         UNNEST(range(0, greatest(0, len(toks) - 8 - 1) + 1, 24)) AS s
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(s / 24 AS BIGINT) AS chunk_id,
       CAST(least(32, len(toks) - s) AS BIGINT) AS n_tokens,
       array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text
FROM st ORDER BY doc_id, chunk_id
"""

    o["kg_triangles"] = """
WITH raw AS (
  SELECT doc_id % 40 AS a, (doc_id * 7 + 3) % 45 AS b FROM documents
  WHERE doc_id % 40 <> (doc_id * 7 + 3) % 45
), und AS (
  SELECT a, b FROM raw UNION SELECT b, a FROM raw
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e1.b = e2.a AND e1.a < e1.b AND e2.a < e2.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), per AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
), nodes AS (SELECT DISTINCT a AS node FROM und)
SELECT n.node, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM per GROUP BY node) c
  ON n.node = c.node
ORDER BY n.node
"""

    o["kg_clustering"] = """
WITH raw AS (
  SELECT doc_id % 40 AS a, (doc_id * 7 + 3) % 45 AS b FROM documents
  WHERE doc_id % 40 <> (doc_id * 7 + 3) % 45
), und AS (
  SELECT a, b FROM raw UNION SELECT b, a FROM raw
), deg AS (
  SELECT a AS node, COUNT(*) AS degree FROM und GROUP BY a
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e1.b = e2.a AND e1.a < e1.b AND e2.a < e2.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), per AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
), tc AS (SELECT node, COUNT(*) AS cnt FROM per GROUP BY node)
SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(tc.cnt, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree > 1
            THEN ROUND(2.0 * COALESCE(tc.cnt, 0) / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN tc ON d.node = tc.node
ORDER BY d.node
"""

    o["kg_bfs"] = """
WITH RECURSIVE und AS (
  SELECT a, b FROM (
    SELECT DISTINCT doc_id % 40 AS a, (doc_id * 7 + 3) % 45 AS b FROM documents
    WHERE doc_id % 40 <> (doc_id * 7 + 3) % 45
  ) UNION SELECT b, a FROM (
    SELECT DISTINCT doc_id % 40 AS a, (doc_id * 7 + 3) % 45 AS b FROM documents
    WHERE doc_id % 40 <> (doc_id * 7 + 3) % 45
  )
), reach(node, d) AS (
  SELECT CAST(x AS BIGINT), 0 FROM (VALUES (0), (7)) AS s(x)
  UNION
  SELECT u.b, r.d + 1 FROM reach r JOIN und u ON u.a = r.node WHERE r.d < 20
)
SELECT node, CAST(MIN(d) AS BIGINT) AS distance
FROM reach GROUP BY node ORDER BY node
"""

    _DAG_SQL = """nodes AS (SELECT DISTINCT doc_id % 60 AS n FROM documents),
edges AS (
  SELECT n AS c, n // 2 AS p FROM nodes WHERE n >= 2
  UNION
  SELECT n AS c, n // 3 AS p FROM nodes WHERE n >= 3 AND n % 4 = 0
)"""

    o["kg_ancestor_closure"] = f"""
WITH RECURSIVE {_DAG_SQL},
reach(node, ancestor, depth) AS (
  SELECT c, p, 1 FROM edges
  UNION
  SELECT r.node, e.p, r.depth + 1
  FROM reach r JOIN edges e ON r.ancestor = e.c WHERE r.depth < 30
)
SELECT printf('T%02d', node) AS node, printf('T%02d', ancestor) AS ancestor,
       CAST(MIN(depth) AS INTEGER) AS depth
FROM reach WHERE node <> ancestor GROUP BY 1, 2 ORDER BY 1, 2
"""

    o["kg_term_rollup"] = f"""
WITH RECURSIVE {_DAG_SQL},
reach(node, ancestor) AS (
  SELECT c, p FROM edges
  UNION
  SELECT r.node, e.p FROM reach r JOIN edges e ON r.ancestor = e.c
),
facts AS (SELECT doc_id % 60 AS term, doc_id % 500 AS rec FROM documents),
contrib AS (
  SELECT r.ancestor, f.rec FROM facts f JOIN reach r ON f.term = r.node
  UNION ALL
  SELECT f.term AS ancestor, f.rec FROM facts f
)
SELECT printf('T%02d', ancestor) AS ancestor,
       CAST(COUNT(DISTINCT rec) AS BIGINT) AS n
FROM contrib GROUP BY 1 ORDER BY 1
"""

    o["kg_term_similarity"] = f"""
WITH RECURSIVE {_DAG_SQL},
reach(node, ancestor) AS (
  SELECT c, p FROM edges
  UNION
  SELECT r.node, e.p FROM reach r JOIN edges e ON r.ancestor = e.c
),
fsets AS (
  SELECT node, ancestor FROM reach
  UNION
  SELECT n, n FROM nodes
),
sizes AS (SELECT node, COUNT(*) AS sz FROM fsets GROUP BY 1),
pairs AS (
  SELECT DISTINCT doc_id % 60 AS a, (doc_id * 11 + 5) % 60 AS b
  FROM documents WHERE doc_id % 60 < (doc_id * 11 + 5) % 60
),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS i
  FROM pairs p
  JOIN fsets x ON x.node = p.a
  JOIN fsets y ON y.node = p.b AND y.ancestor = x.ancestor
  GROUP BY 1, 2
)
SELECT printf('T%02d', p.a) AS term_a, printf('T%02d', p.b) AS term_b,
       CAST(COALESCE(i.i, 0) AS INT) AS n_common,
       ROUND(COALESCE(i.i, 0)::DOUBLE / (sa.sz + sb.sz - COALESCE(i.i, 0)), 6)
         AS jaccard
FROM pairs p
JOIN sizes sa ON sa.node = p.a
JOIN sizes sb ON sb.node = p.b
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
ORDER BY 1, 2
"""

    # shared rollup-IC scaffold (term = doc_id % 60, rec = doc_id % 500):
    # reach -> DISTINCT-rec rollup -> ic = -ln(n / N); + 0.0 everywhere a
    # root's -ln(1.0) could leak IEEE -0.0 into the value hash
    _IC_SQL = """reach(node, ancestor) AS (
  SELECT c, p FROM edges
  UNION
  SELECT r.node, e.p FROM reach r JOIN edges e ON r.ancestor = e.c
),
facts AS (SELECT doc_id % 60 AS term, doc_id % 500 AS rec FROM documents),
contrib AS (
  SELECT r.ancestor, f.rec FROM facts f JOIN reach r ON f.term = r.node
  UNION ALL
  SELECT f.term AS ancestor, f.rec FROM facts f
),
cnt AS (SELECT ancestor AS t, COUNT(DISTINCT rec) AS n FROM contrib GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT doc_id % 500)::DOUBLE AS nt FROM documents),
ic AS (SELECT t, n, -ln(n / nt) AS ic FROM cnt, tot)"""

    o["kg_term_ic"] = f"""
WITH RECURSIVE {_DAG_SQL},
{_IC_SQL}
SELECT printf('T%02d', t) AS term, CAST(n AS BIGINT) AS n,
       ROUND(ic, 6) + 0.0 AS ic
FROM ic ORDER BY term
"""

    o["kg_resnik"] = f"""
WITH RECURSIVE {_DAG_SQL},
{_IC_SQL},
aos AS (
  SELECT node, ancestor FROM reach
  UNION
  SELECT t, t FROM ic
),
aosic AS (SELECT a.node, a.ancestor, i.ic FROM aos a JOIN ic i ON i.t = a.ancestor),
pairs AS (
  SELECT DISTINCT doc_id % 60 AS a, (doc_id * 11 + 5) % 60 AS b
  FROM documents WHERE doc_id % 60 < (doc_id * 11 + 5) % 60
),
mica AS (
  SELECT p.a, p.b, MAX(x.ic) AS r
  FROM pairs p
  JOIN aosic x ON x.node = p.a
  JOIN aosic y ON y.node = p.b AND y.ancestor = x.ancestor
  GROUP BY 1, 2
)
SELECT printf('T%02d', p.a) AS term_a, printf('T%02d', p.b) AS term_b,
       ROUND(ia.ic, 6) + 0.0 AS ic_a, ROUND(ib.ic, 6) + 0.0 AS ic_b,
       ROUND(COALESCE(m.r, 0), 6) + 0.0 AS resnik,
       ROUND(CASE WHEN ia.ic + ib.ic > 0
                  THEN 2 * COALESCE(m.r, 0) / (ia.ic + ib.ic)
                  ELSE 0 END, 6) + 0.0 AS lin
FROM pairs p
JOIN ic ia ON ia.t = p.a
JOIN ic ib ON ib.t = p.b
LEFT JOIN mica m ON m.a = p.a AND m.b = p.b
ORDER BY 1, 2
"""

    o["kg_phenomizer_bma"] = f"""
WITH RECURSIVE {_DAG_SQL},
reach(node, ancestor) AS (
  SELECT c, p FROM edges
  UNION
  SELECT r.node, e.p FROM reach r JOIN edges e ON r.ancestor = e.c
),
ann AS (SELECT doc_id % 40 AS ent, doc_id % 60 AS term FROM documents),
contrib AS (
  SELECT r.ancestor AS t FROM ann a JOIN reach r ON a.term = r.node
  UNION ALL
  SELECT term AS t FROM ann
),
cnt AS (SELECT t, COUNT(*) AS n FROM contrib GROUP BY 1),
tot AS (SELECT COUNT(*)::DOUBLE AS nt FROM ann),
ic AS (SELECT t, -ln(n / nt) AS ic FROM cnt, tot),
aos AS (
  SELECT node, ancestor FROM reach
  UNION
  SELECT t, t FROM ic
),
aosic AS (SELECT a.node, a.ancestor, i.ic FROM aos a JOIN ic i ON i.t = a.ancestor),
epairs AS (
  SELECT DISTINCT doc_id % 40 AS ea, (doc_id * 7 + 3) % 40 AS eb
  FROM documents WHERE doc_id % 40 < (doc_id * 7 + 3) % 40
),
aset AS (SELECT DISTINCT ent, term FROM ann),
tp AS (
  SELECT p.ea, p.eb, a.term AS ta, b.term AS tb
  FROM epairs p JOIN aset a ON a.ent = p.ea JOIN aset b ON b.ent = p.eb
),
mica AS (
  SELECT t.ea, t.eb, t.ta, t.tb, MAX(x.ic) AS r
  FROM tp t
  JOIN aosic x ON x.node = t.ta
  JOIN aosic y ON y.node = t.tb AND y.ancestor = x.ancestor
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT t.ea, t.eb, t.ta, t.tb, COALESCE(m.r, 0) AS s
  FROM tp t LEFT JOIN mica m
    ON m.ea = t.ea AND m.eb = t.eb AND m.ta = t.ta AND m.tb = t.tb
),
besta AS (SELECT ea, eb, ta, MAX(s) AS bm FROM scored GROUP BY 1, 2, 3),
avga AS (SELECT ea, eb, AVG(bm) AS sim_ab FROM besta GROUP BY 1, 2),
bestb AS (SELECT ea, eb, tb, MAX(s) AS bm FROM scored GROUP BY 1, 2, 3),
avgb AS (SELECT ea, eb, AVG(bm) AS sim_ba FROM bestb GROUP BY 1, 2)
SELECT a.ea AS entity_a, a.eb AS entity_b,
       ROUND(a.sim_ab, 6) + 0.0 AS sim_ab,
       ROUND(b.sim_ba, 6) + 0.0 AS sim_ba,
       ROUND((a.sim_ab + b.sim_ba) / 2, 6) + 0.0 AS bma
FROM avga a JOIN avgb b ON a.ea = b.ea AND a.eb = b.eb
ORDER BY 1, 2
"""

    o["kg_soft_pr"] = f"""
WITH RECURSIVE {_DAG_SQL},
{_IC_SQL},
aos AS (
  SELECT node, ancestor FROM reach
  UNION
  SELECT t, t FROM ic
),
aosic AS (SELECT a.node, a.ancestor, i.ic FROM aos a JOIN ic i ON i.t = a.ancestor),
prod AS (
  SELECT DISTINCT doc_id AS k,
         CASE WHEN doc_id % 3 = 0 THEN doc_id % 60
              ELSE (doc_id * 13 + 7) % 60 END AS a
  FROM documents WHERE doc_id % 10 > 0
),
gold AS (
  SELECT DISTINCT doc_id AS k, doc_id % 60 AS b
  FROM documents WHERE doc_id % 10 < 8
),
candp AS (SELECT p.k, p.a, g.b FROM prod p LEFT JOIN gold g ON g.k = p.k),
candg AS (SELECT g.k, g.b, p.a FROM gold g LEFT JOIN prod p ON p.k = g.k),
tpairs AS (
  SELECT DISTINCT a, b FROM candp WHERE b IS NOT NULL
  UNION
  SELECT DISTINCT a, b FROM candg WHERE a IS NOT NULL
),
micap AS (
  SELECT t.a, t.b, MAX(x.ic) AS r
  FROM tpairs t
  JOIN aosic x ON x.node = t.a
  JOIN aosic y ON y.node = t.b AND y.ancestor = x.ancestor
  GROUP BY 1, 2
),
linp AS (
  SELECT t.a, t.b,
         CASE WHEN t.a = t.b THEN 1.0
              WHEN ia.ic IS NULL OR ib.ic IS NULL THEN NULL
              WHEN ia.ic + ib.ic > 0 THEN 2 * COALESCE(m.r, 0) / (ia.ic + ib.ic)
              ELSE 0 END AS lin
  FROM tpairs t
  LEFT JOIN ic ia ON ia.t = t.a
  LEFT JOIN ic ib ON ib.t = t.b
  LEFT JOIN micap m ON m.a = t.a AND m.b = t.b
),
bestp AS (
  SELECT c.k, c.a, COALESCE(MAX(l.lin), 0) AS m
  FROM candp c LEFT JOIN linp l ON l.a = c.a AND l.b = c.b
  GROUP BY 1, 2
),
bestg AS (
  SELECT c.k, c.b, COALESCE(MAX(l.lin), 0) AS m
  FROM candg c LEFT JOIN linp l ON l.a = c.a AND l.b = c.b
  GROUP BY 1, 2
),
exact AS (SELECT COUNT(*) AS n_exact FROM prod p JOIN gold g ON g.k = p.k AND g.b = p.a),
pm AS (SELECT COUNT(*) AS n_produced, AVG(m) AS sp FROM bestp),
gm AS (SELECT COUNT(*) AS n_gold, AVG(m) AS sr FROM bestg)
SELECT CAST(pm.n_produced AS BIGINT) AS n_produced,
       CAST(gm.n_gold AS BIGINT) AS n_gold,
       CAST(exact.n_exact AS BIGINT) AS n_exact,
       ROUND(exact.n_exact::DOUBLE / pm.n_produced, 6) + 0.0 AS precision_exact,
       ROUND(exact.n_exact::DOUBLE / gm.n_gold, 6) + 0.0 AS recall_exact,
       ROUND(pm.sp, 6) + 0.0 AS soft_precision,
       ROUND(gm.sr, 6) + 0.0 AS soft_recall
FROM pm, gm, exact
"""

    o["kg_bgp"] = """
WITH nodes AS (SELECT DISTINCT doc_id % 60 AS n FROM documents),
edges AS (
  SELECT n AS c, n // 2 AS p FROM nodes WHERE n >= 2
  UNION
  SELECT n AS c, n // 3 AS p FROM nodes WHERE n >= 3 AND n % 4 = 0
),
ann AS (
  SELECT printf('d%04d', doc_id) AS d, printf('T%02d', doc_id % 60) AS t
  FROM documents
),
isa AS (SELECT printf('T%02d', c) AS c, printf('T%02d', p) AS p FROM edges)
SELECT a.d, a.t, i.p
FROM ann a
JOIN isa i ON i.c = a.t
JOIN isa i2 ON i2.c = i.p AND i2.p = 'T01'
ORDER BY 1, 2, 3
"""

    o["kg_ntriples"] = """
SELECT '<http://example.org/doc/' || doc_id || '> <http://example.org/has_text> "'
       || replace(replace(replace(replace(replace(substr(text, 1, 40),
            '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'), chr(13), '\\r'), chr(9), '\\t')
       || '" .' AS ntriple
FROM documents ORDER BY ntriple
"""

    o["kg_turtle"] = """
SELECT '<http://example.org/doc/' || doc_id || '> <http://example.org/rel> e:'
       || printf('%02d', CAST((doc_id * 7 + 3) % 45 AS INT)) || ' .' AS line
FROM documents ORDER BY line
"""

    o["kg_bgp_path"] = f"""
WITH RECURSIVE {_DAG_SQL},
reach(node, ancestor) AS (
  SELECT c, p FROM edges
  UNION
  SELECT r.node, e.p FROM reach r JOIN edges e ON r.ancestor = e.c
),
ann AS (SELECT printf('d%04d', doc_id) AS d, doc_id % 60 AS t FROM documents)
SELECT a.d, printf('T%02d', a.t) AS t
FROM ann a JOIN reach r ON r.node = a.t AND r.ancestor = 1
ORDER BY 1, 2
"""

    from phenoqc_spark.kcore_golden import KCORE_45 as _KC

    _kc_vals = ",\n        ".join(f"({n}, {c})" for (n, c) in _KC)
    o["kg_kcore"] = (
        "SELECT CAST(node AS BIGINT) AS node, CAST(coreness AS BIGINT) AS coreness\n"
        f"FROM (VALUES\n        {_kc_vals}) AS t(node, coreness)\nORDER BY node"
    )

    from phenoqc_spark.hash_embed_golden import HASH_EMBED_5x64 as _HE

    _he_vals = ",\n  ".join(f"({v}, {i}, {round(x, 9)!r})" for (v, i, x) in _HE)
    o["sim_hash_embed"] = (
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(idx AS INT) AS idx,\n"
        "       CAST(value AS DOUBLE) AS value\n"
        "FROM (VALUES\n  " + _he_vals + "\n) AS t(vec_id, idx, value)\n"
        "ORDER BY vec_id, idx"
    )

    o.update(_oracle_sql_r3())
    return o


# ---------------------------------------------------------------------------
# the driver-facing split: ``_RECORDED`` is the rotation window
# ---------------------------------------------------------------------------

# The grading driver records at most 50 correctness entries, in insertion
# order.  The window ROTATES each round so every oracle-checked operator
# gets an authoritative driver row at least once; everything not listed
# here is still run through the IDENTICAL differential check by
# scripts/check_correctness.py.
#
# Round-5 rotation: the round-4 operator wave grew the registry to 134
# while the driver records 50 rows/round, leaving 69 queries that had
# never held an authoritative driver row.  This round records 50 of
# those 69 — the graph / ontology-semantics / SPARQL / walks / event-log
# / aggregation-idiom waves plus txt_bm25, txt_pmi, emb_kmeans and the
# td_curate flagship chain — and retires ALL 50 round-4 rows (each has
# 1-4 green driver rounds; their operators stay covered by the identical
# local gate in scripts/check_correctness.py, which runs recorded +
# extras the same way).
#
# Still never driver-recorded after this round (22 — record in round 6,
# then cycle back the long-retired r1-r4 names so no query goes two
# rounds unrecorded): td_importance, td_pack_shards, txt_url_canon,
# txt_chunks, sim_hash_embed, dd_exact_bloom, u_snapshot_diff,
# agg_drift_psi, agg_drift_panel, td_classifier_filter,
# dd_near_dedup_best, dd_span_winnow, txt_dup_spans, f_zvalue,
# td_host_cap, txt_source_cardinality, txt_heavy_tokens,
# v_anomalies_mad, v_winsorize, plus the round-5 additions kg_harmonic
# (HyperBall), txt_cms_counts (Count-Min state), kg_web_links
# (crawl-graph extraction), txt_bpe_merges (distributed BPE training),
# kg_anchor_texts (anchor aggregation), dd_containment (directed
# quote-detection containment).
_RECORDED = [
    # graph kit (iterative + combinatorial over the KG)
    "kg_pagerank",
    "kg_pagerank_weighted",
    "kg_ppr",
    "kg_hits",
    "kg_communities",
    "kg_modularity",
    "kg_triangles",
    "kg_clustering",
    "kg_kcore",
    "kg_ktruss",
    "kg_scc",
    "kg_bfs",
    "kg_hyperanf",
    "kg_spectral",
    "kg_link_predict",
    # ontology semantics
    "kg_ancestor_closure",
    "kg_term_rollup",
    "kg_term_ic",
    "kg_resnik",
    "kg_phenomizer_bma",
    "kg_soft_pr",
    "kg_term_similarity",
    # SPARQL surface / serializers / shapes / state
    "kg_bgp",
    "kg_bgp_path",
    "kg_ntriples",
    "kg_turtle",
    "v_triple_shapes",
    "kg_merge_state",
    # walks / embedding training
    "kg_random_walks",
    "kg_skipgrams",
    "kg_node2vec",
    "kg_negative_samples",
    "kg_sgns_loss",
    "kg_sgns_eval",
    # event-log kit
    "agg_sessionize",
    "agg_asof_join",
    "agg_range_join",
    "agg_latest_event",
    # aggregation idioms
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_cube",
    "agg_profile",
    "f_json_extract",
    "agg_hist_quantiles",
    "agg_reliability",
    # text analytics / training-data prep / clustering
    "txt_bm25",
    "txt_pmi",
    "td_curate",
    "emb_kmeans",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    allq = _all_queries()
    missing = [k for k in _RECORDED if k not in allq]
    assert not missing, f"_RECORDED names without a query: {missing}"
    return {k: allq[k] for k in _RECORDED}


def oracle_sql() -> dict[str, str]:
    allo = _all_oracle_sql()
    return {k: allo[k] for k in _RECORDED if k in allo}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries outside the driver's 50-entry record window this round —
    still oracle-checked by scripts/check_correctness.py with the same
    rows+schema+hash differential."""
    rec = set(_RECORDED)
    return {k: v for k, v in _all_queries().items() if k not in rec}


def extra_oracle_sql() -> dict[str, str]:
    rec = set(_RECORDED)
    return {k: v for k, v in _all_oracle_sql().items() if k not in rec}
