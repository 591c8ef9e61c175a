"""Reference-shaped API facades: DataValidator / ImputationEngine
(result-dict keys and semantics from the reference's library surface)."""

import pytest
from pyspark.sql import functions as F

from phenoqc_spark.api import DataValidator, ImputationEngine


@pytest.fixture(scope="module")
def clinical(spark):
    rows = [
        ("S001", 34, "M", "2021-01-01"),
        ("S001", 35, "M", "2021-01-02"),
        ("S002", -5, "F", "2021-02-30"),
        ("S003", None, "Unknown", None),
    ]
    return spark.createDataFrame(
        rows, "SampleID string, Age int, Gender string, VisitDate string"
    )


def test_run_all_validations(spark, clinical):
    schema = {
        "type": "object",
        "properties": {
            "SampleID": {"type": "string"},
            "Age": {"type": ["integer", "null"], "minimum": 0},
            "VisitDate": {"type": ["string", "null"], "format": "date"},
        },
        "required": ["SampleID"],
    }
    ref = spark.createDataFrame([("S001",), ("S002",)], "SampleID string")
    v = DataValidator(clinical, schema, ["SampleID"], ref, ["SampleID"])
    res = v.run_all_validations({"quality_metrics": ["accuracy", "traceability"]})
    assert res["Duplicate Records"].count() == 2
    assert res["Conflicting Records"].count() == 2
    assert res["Referential Integrity Issues"].count() == 1
    assert {r.reason for r in res["Cell Violations"].collect()} == {"below_minimum"}
    acc = res["Accuracy Issues"].collect()
    assert len(acc) == 1 and acc[0].value == "-5"
    issues = sorted(r.issue for r in res["Traceability Issues"].collect())
    assert issues == ["duplicate_identifier", "duplicate_identifier"]
    flags = {(r.SampleID, r.Age): r.SchemaViolationFlag for r in res["Format Validation"].collect()}
    assert flags[("S002", -5)] is True


def test_imputation_engine_mean(spark):
    df = spark.createDataFrame(
        [("S1", 120.0), ("S2", 85.0), ("S3", 95.0), ("S4", None)],
        "SampleID string, Measurement double",
    )
    eng = ImputationEngine({"strategy": "mean"})
    out = {r.SampleID: r.Measurement for r in eng.fit_transform(df).collect()}
    assert out["S4"] == 100.0
    assert eng.chosen_params["global"]["strategy"] == "mean"


def test_imputation_engine_per_column_and_exclude(spark):
    df = spark.createDataFrame(
        [(1.0, None, None), (3.0, 4.0, 5.0), (None, 6.0, 7.0)],
        "a double, b double, protected double",
    )
    eng = ImputationEngine(
        {"strategy": "mean", "per_column": {"b": {"strategy": "median"}}},
        exclude_columns=["protected"],
    )
    out = eng.fit_transform(df)
    assert out.filter(F.col("a").isNull() | F.col("b").isNull()).count() == 0
    assert out.filter(F.col("protected").isNull()).count() == 1  # untouched


def test_imputation_engine_tuning(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    rows = [(float(x), float(x) * 2 + rng.normal(0, 0.1)) for x in rng.normal(10, 2, 200)]
    rows += [(None, 5.0), (8.0, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    eng = ImputationEngine(
        {"strategy": "knn", "tuning": {"enable": True, "grid": {"n_neighbors": [2, 5]}}}
    )
    out = eng.fit_transform(df.coalesce(1))
    assert out.filter(F.col("a").isNull() | F.col("b").isNull()).count() == 0
    assert eng.tuning_summary and eng.tuning_summary["best"] is not None


def test_streaming_session_window(spark, tmp_path):
    """Stateful session-window aggregation with watermark over a file
    stream (state bounded by the watermark)."""
    import pyspark.sql.functions as F

    from phenoqc_spark.streaming.pipeline import sessionized_page_counts

    src = str(tmp_path / "pages_in")
    # two sessions per lang: a burst at 00:00-00:20 (gap 10m) and one at 02:00
    rows = []
    for i in range(20):
        rows.append((f"u{i}", f"2024-01-01 00:{i:02d}:00", "en"))
    rows.append(("ux", "2024-01-01 02:00:00", "en"))
    spark.createDataFrame(rows, "url string, ts_s string, lang string").withColumn(
        "warc_ts", F.col("ts_s").cast("timestamp")
    ).drop("ts_s").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionized_page_counts(stream, gap="10 minutes", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.session_start.isoformat(), r.n_pages)
        for r in spark.sql("select * from sessions").collect()
    }
    # the 00:00-00:19 burst fuses into one 20-page session (gap 10m);
    # the 02:00 singleton is its own session (emitted once watermark passes)
    assert ("2024-01-01T00:00:00", 20) in got


def test_streaming_watermark_window(spark, tmp_path):
    """Watermarked tumbling-window aggregation over a file stream —
    Structured Streaming coverage beyond foreachBatch."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "ev_in")
    spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 5}:10:00", float(i)) for i in range(50)],
        "event_id long, ts_s string, value double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; rerun complete-mode
    # batch equivalent for the value check
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert batch.count() == 5
    assert sum(r.cnt for r in batch.collect()) == 50


def test_curate_corpus_end_to_end(spark):
    """One-call curation: every stage active, per-stage accounting
    monotone, final chunks carry redacted text."""
    from phenoqc_spark.curation import curate_corpus

    sci = "the experiment shows results and the data is good for the model"
    rows = []
    for i in range(40):
        # duplicate URL variants per pair, duplicate text per triple
        url = f"https://www.Host{i % 20}.example.org/p/{i % 20}/?utm_source=z"
        text = f"{sci} version {i % 12} contact me mail{i % 12}@example.com"
        rows.append((i, url, text))
    rows.append((100, "https://clean.example.org/q", "short"))  # fails quality
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    # shares an 8-gram only with the "version 3" text variant
    bench = spark.createDataFrame(
        [(0, "good for the model version 3 contact me")], "doc_id long, text string"
    )
    out, report = curate_corpus(
        df,
        url_col="url",
        url_blocklist={"block_hosts": ["host7.example.org"]},
        exact_dedup=True,
        min_quality=0.6,
        languages=["en"],
        decontaminate_against=bench,
        redact_pii=True,
        chunk_tokens=6,
        chunk_overlap=2,
    )
    # stage accounting: monotone non-increasing until chunking
    order = [
        "input", "url_blocklist", "url_dedup", "exact_dedup",
        "quality_filter", "decontaminated",
    ]
    for a, b in zip(order, order[1:]):
        assert report[b] <= report[a], report
    assert report["url_blocklist"] == 39  # host7's two captures gated out
    assert report["url_dedup"] == 20  # 19 surviving canonical urls + clean one
    rows_out = out.collect()
    assert report["chunked"] == len(rows_out) > 0
    # emails were redacted before chunking
    assert all("@" not in r.chunk_text for r in rows_out)
    # lazy mode: no counts, same schema
    lazy, lazy_report = curate_corpus(
        df, url_col="url", min_quality=0.6, count_stages=False
    )
    assert all(v is None for v in lazy_report.values())
    assert lazy.count() > 0
    # near-dedup stage: a near-dup family collapses to one representative
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    nd = spark.createDataFrame(
        [
            (i, f"{base} family {i % 3} shared run of words "
             + ("" if i % 4 else f"changed{i}"))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    _, nd_rep = curate_corpus(
        nd, exact_dedup=True,
        near_dedup={"threshold": 0.7, "num_hashes": 32, "bands": 8},
    )
    assert nd_rep["near_dedup"] < nd_rep["exact_dedup"]
    # shard packing after chunking: every chunk row gains a shard_id
    flat = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    sh_out, sh_rep = curate_corpus(
        flat, exact_dedup=False, chunk_tokens=8, chunk_overlap=2, shard_budget=40
    )
    assert sh_rep["sharded"] == sh_rep["chunked"] == 90
    assert "shard_id" in sh_out.columns and "chunk_text" in sh_out.columns
    # classifier stage: model-based gate keeps exactly the positive-margin
    # docs (w = [1, -1], threshold 0.5 ⇔ dot > 0)
    emb = spark.createDataFrame(
        [(0, "keep a", [2.0, 1.0]), (1, "drop a", [1.0, 2.0]),
         (2, "keep b", [3.0, 0.0]), (3, "drop null", None)],
        "doc_id long, text string, embedding array<float>",
    )
    cls_out, cls_rep = curate_corpus(
        emb, exact_dedup=False,
        classifier={"weights": [1.0, -1.0], "threshold": 0.5},
    )
    assert cls_rep["classifier_filter"] == 2
    assert {r.doc_id for r in cls_out.collect()} == {0, 2}


def test_curation_report(spark, tmp_path):
    """Markdown funnel from the curate_corpus stage dict, plus the
    per-source roll-up; lazy (None) counts render as dashes."""
    from phenoqc_spark.curation import curate_corpus
    from phenoqc_spark.operators.textstats import corpus_source_stats
    from phenoqc_spark.report import generate_curation_report

    rows = [
        (i, f"src{i % 2}", f"the quick brown fox document number {i % 8} runs far")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    _, rep = curate_corpus(df, exact_dedup=True)
    stats = corpus_source_stats(df, source_col="source")
    md = generate_curation_report(rep, str(tmp_path / "cur.md"), source_stats=stats)
    assert "## Stage funnel" in md and "| input | 24 |" in md
    # exact dedup keeps the 8 distinct texts: a -16 drop on the funnel row
    assert "| exact_dedup | 8 | -16 | -66.67% |" in md
    assert "## Per-source stats" in md and "| src0 |" in md and "dup_rate" in md
    # headline dedup-rate section, derived from the funnel
    assert "## Dedup rates" in md
    assert "exact_dedup removed **16** of 24 docs (**66.67%** dup rate after input)" in md
    lazy_md = generate_curation_report(
        {"input": None, "exact_dedup": None}, str(tmp_path / "lazy.md")
    )
    assert "| input | — | — | — |" in lazy_md


def test_curate_corpus_latest_by(spark):
    """With latest_by, URL-level dedup keeps the NEWEST capture per
    canonical URL (CDX semantics), not the min-id survivor."""
    from datetime import datetime as dt

    from phenoqc_spark.curation import curate_corpus

    rows = [
        (1, "https://www.ex.org/a?utm_source=x", dt(2020, 1, 1), "old capture words"),
        (2, "https://ex.org/a", dt(2021, 6, 1), "new capture words"),
        (3, "https://ex.org/b", dt(2020, 3, 1), "only capture words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts timestamp, text string")
    out, report = curate_corpus(
        df, id_col="doc_id", url_col="url", latest_by="ts", exact_dedup=False
    )
    got = {r.url_canonical: (r.doc_id, r.text) for r in out.collect()}
    assert report["url_dedup"] == 2
    assert got["https://ex.org/a"] == (2, "new capture words")
    assert got["https://ex.org/b"] == (3, "only capture words")


def test_curate_corpus_max_per_host(spark):
    """max_per_host caps each canonical host's documents deterministically
    after URL dedup."""
    from phenoqc_spark.curation import curate_corpus
    from phenoqc_spark.operators.textstats import cap_per_host

    rows = [
        (i, f"https://h{i % 3}.example.org/p/{i}", f"doc {i} words here")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out, report = curate_corpus(
        df, url_col="url", max_per_host=4, exact_dedup=False
    )
    assert report["host_cap"] == 12  # 3 hosts x 4
    per_host = {}
    for r in out.collect():
        per_host.setdefault(r.url_canonical.split("/p/")[0], []).append(r.doc_id)
    assert all(len(v) == 4 for v in per_host.values())
    # deterministic and partitioning-invariant (same kept set standalone)
    direct = cap_per_host(
        df.repartition(5), 4, url_col="url", id_col="doc_id"
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in direct.collect()}
