"""End-to-end acceptance: byte-identical extraction + triple P/R vs the
differential ground truth (FIXTURES.md §6; P ≥ 0.95 and R ≥ 0.95)."""

import pytest
from pyspark.sql import functions as F

from phenoqc_spark import pages as PG
from phenoqc_spark.pipeline import extract_records, run_pipeline


N = 600


def test_extract_text_byte_identical(spark):
    pages = PG.generate_pages(spark, 200, partitions=4)
    recs = extract_records(pages, lang="en")
    joined = pages.filter(F.col("lang") == "en").select("url", "text").join(
        recs.select("url", "extracted_text"), "url"
    )
    bad = joined.filter(F.col("text") != F.col("extracted_text")).count()
    assert bad == 0
    assert recs.count() > 0


def test_record_parse_roundtrip(spark):
    pages = PG.generate_pages(spark, 200, partitions=4)
    recs = extract_records(pages)
    row = recs.filter(F.col("Height_cm").isNotNull()).first()
    assert row.SampleID is not None
    assert 0 < row.Height_cm < 1000 or row.Height_cm == -999.0
    arr_row = recs.filter(F.size("ObservedFeatures") > 0).first()
    assert isinstance(arr_row.ObservedFeatures, list)


def test_triples_pr_vs_ground_truth(spark, resolver):
    pages = PG.generate_pages(spark, N, partitions=8)
    out = run_pipeline(spark, pages, resolver)
    produced = set(
        (r.subj, r.pred, r.obj) for r in out["triples"].select("subj", "pred", "obj").collect()
    )
    expected = set(
        (r.subj, r.pred, r.obj)
        for r in PG.ground_truth_triples(spark, N, resolver, partitions=8).collect()
    )
    assert expected, "ground truth must be non-empty"
    tp = len(produced & expected)
    precision = tp / len(produced) if produced else 0.0
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"
    # with a deterministic generator + differential oracle we expect exact parity
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision:.4f} R={recall:.4f}; diff={list(produced ^ expected)[:5]}"
    )


def test_mapping_stats_shape(spark, resolver):
    pages = PG.generate_pages(spark, 300, partitions=4)
    out = run_pipeline(spark, pages, resolver)
    stats = out["mapping_stats"].collect()
    assert {r.column for r in stats} >= {"PrimaryPhenotype", "DiseaseCode"}
    for r in stats:
        assert 0 <= r.success_rate_pct <= 100


def test_malformed_fields_coerce_not_crash(spark):
    """One malformed numeric field (or URL) in web text must coerce to
    NULL — reference pd.to_numeric(errors='coerce') semantics — not kill
    the job with an ANSI CAST_INVALID_INPUT."""
    html = (
        "<html><body><p>SampleID: S1\nHeight_cm: NOT_A_NUMBER\n"
        "PrimaryPhenotype: Asthma</p></body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("u1", None, html, "x", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    r = extract_records(pages).collect()[0]
    assert r["Height_cm"] is None
    assert r["SampleID"] == "S1" and r["PrimaryPhenotype"] == "Asthma"
