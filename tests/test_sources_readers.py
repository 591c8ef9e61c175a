"""S1-S4 reader semantics (reference: src/phenoqc/input.py:4-103) and the
Spearman tier of A10 redundancy (reference: quality_metrics.py:72-144)."""

import json

from pyspark.sql import functions as F


def test_read_csv_na_tokens(spark, tmp_path):
    from phenoqc_spark.sources import read_csv

    p = tmp_path / "d.csv"
    p.write_text("SampleID,Phenotype,Age\n1,Asthma,30\n2,NA,41\n3,N/A,\n4, ,22\n")
    df = read_csv(spark, str(p))
    rows = {r["SampleID"]: r for r in df.collect()}
    # reference na_values: "", " ", "NA", "N/A" all become null
    assert rows[2]["Phenotype"] is None
    assert rows[3]["Phenotype"] is None
    assert rows[4]["Phenotype"] is None
    assert rows[1]["Phenotype"] == "Asthma"
    assert rows[3]["Age"] is None


def test_read_tsv(spark, tmp_path):
    from phenoqc_spark.sources import read_tsv

    p = tmp_path / "d.tsv"
    p.write_text("a\tb\nx\tNA\ny\t2\n")
    rows = {r["a"]: r["b"] for r in read_tsv(spark, str(p)).collect()}
    assert rows["x"] is None and rows["y"] == "2"


def test_read_json_flattens_nested(spark, tmp_path):
    from phenoqc_spark.sources import read_json

    p = tmp_path / "d.json"
    p.write_text(json.dumps([
        {"id": 1, "meta": {"lang": "en", "geo": {"cc": "US"}}, "tags": ["a", "b"]},
        {"id": 2, "meta": {"lang": "de", "geo": {"cc": "DE"}}, "tags": []},
    ]))
    df = read_json(spark, str(p))
    # pd.json_normalize twin: dotted columns, arrays intact
    assert set(df.columns) == {"id", "meta.lang", "meta.geo.cc", "tags"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["meta.geo.cc"] == "US"
    assert rows[2]["meta.lang"] == "de"
    assert rows[1]["tags"] == ["a", "b"]


def test_load_data_dispatch(spark, tmp_path):
    from phenoqc_spark.sources import load_data

    p = tmp_path / "d.csv"
    p.write_text("a,b\n1,2\n")
    assert load_data(spark, str(p)).count() == 1
    try:
        load_data(spark, str(tmp_path / "d.xlsx"))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_extract_zip_filters_and_reads(spark, tmp_path):
    import zipfile

    from phenoqc_spark.sources import load_data
    from phenoqc_spark.sources.readers import extract_zip

    zp = tmp_path / "in.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data/d.csv", "a,b\n1,NA\n2,x\n")
        zf.writestr("__MACOSX/junk", "ignore")
        zf.writestr("data/.DS_Store", "ignore")
    out_dir, err = extract_zip(str(zp), str(tmp_path / "out"))
    assert err is None
    import os

    assert not os.path.exists(os.path.join(out_dir, "__MACOSX"))
    df = load_data(spark, os.path.join(out_dir, "data", "d.csv"))
    rows = {r["a"]: r["b"] for r in df.collect()}
    assert rows[1] is None and rows[2] == "x"
    bad, err2 = extract_zip(str(tmp_path / "nope.zip"))
    assert bad is None and err2


def test_collect_input_files_dir_vs_zip_semantics(tmp_path):
    """Reference parity (cli.py:131-196): non-recursive plain directories
    scan TOP-LEVEL files only; non-recursive ZIPs get the walk quirk (top
    level + first subdirectory in sorted walk order); recursive walks all."""
    import os
    import zipfile

    from phenoqc_spark.sources.readers import collect_input_files

    d = tmp_path / "plain"
    for rel in ["top.csv", "a_sub/inner.csv", "b_sub/deep.csv"]:
        p = d / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("x,y\n1,2\n")
    # plain dir, non-recursive: top-level only (no subdirs at all)
    got = [os.path.basename(p) for p in collect_input_files([str(d)])]
    assert got == ["top.csv"]
    # plain dir, recursive: everything
    got_r = sorted(os.path.basename(p) for p in collect_input_files([str(d)], recursive=True))
    assert got_r == ["deep.csv", "inner.csv", "top.csv"]
    # ZIP, non-recursive: top level + the first subdirectory only
    zp = tmp_path / "arch.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("root.csv", "x\n1\n")
        zf.writestr("a_sub/inner.csv", "x\n1\n")
        zf.writestr("b_sub/deep.csv", "x\n1\n")
    got_z = sorted(os.path.basename(p) for p in collect_input_files([str(zp)]))
    assert got_z == ["inner.csv", "root.csv"]


def test_ontology_fetch_cache_retry_offline(tmp_path):
    from phenoqc_spark.ontology.fetch import fetch_ontology_with_cache

    calls = []

    def flaky(url):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("transient")
        return b"[Term]\nid: HP:1"

    sleeps = []
    # retry/backoff: succeeds on attempt 3 with 2^0, 2^1 sleeps
    p = fetch_ontology_with_cache(
        "HPO", "http://x/hp.obo", str(tmp_path), fetcher=flaky, sleep=sleeps.append
    )
    assert open(p, "rb").read() == b"[Term]\nid: HP:1"
    assert len(calls) == 3 and sleeps == [1.0, 2.0]

    # cache hit within TTL: no fetch
    p2 = fetch_ontology_with_cache(
        "HPO", "http://x/hp.obo", str(tmp_path), fetcher=flaky, sleep=sleeps.append
    )
    assert p2 == p and len(calls) == 3

    # offline + missing cache: fail fast
    try:
        fetch_ontology_with_cache(
            "DO", "http://x/do.obo", str(tmp_path), offline=True, fetcher=flaky
        )
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass

    # expired cache + offline: fail fast too
    import os

    os.utime(p, (1, 1))
    try:
        fetch_ontology_with_cache(
            "HPO", "http://x/hp.obo", str(tmp_path), offline=True, fetcher=flaky
        )
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass


def test_redundancy_spearman_monotonic_pair(spark):
    """x and exp(x) are perfectly rank-correlated but not linearly:
    spearman flags the pair at 0.98, pearson does not."""
    from phenoqc_spark.operators.quality import detect_redundancy

    rows = [(float(i), float(2.718281828 ** (i / 10.0)), float((i * 37) % 11)) for i in range(60)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    sp = detect_redundancy(df, threshold=0.98, method="spearman")
    got = {(r["column_1"], r["column_2"]): r["metric"] for r in sp.collect()}
    assert got.get(("x", "y")) == "correlation"
    assert ("x", "z") not in got
    pe = detect_redundancy(df, threshold=0.98, method="pearson")
    pe_pairs = {(r["column_1"], r["column_2"]) for r in pe.collect() if r["metric"] == "correlation"}
    assert ("x", "y") not in pe_pairs


def test_redundancy_spearman_ties_match_pandas(spark):
    """Average-rank tie handling must match pandas' spearman exactly."""
    import pandas as pd

    from phenoqc_spark.operators.quality import detect_redundancy

    pdf = pd.DataFrame(
        {"a": [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0], "b": [2.0, 3.0, 3.5, 4.0, 6.0, 6.0, 9.0]}
    )
    expected = pdf.corr(method="spearman").loc["a", "b"]
    got = detect_redundancy(
        spark.createDataFrame(pdf), threshold=0.5, method="spearman"
    ).collect()
    val = [r["value"] for r in got if r["metric"] == "correlation"]
    assert val and abs(val[0] - abs(expected)) < 1e-9


def test_ontology_diff(spark, tmp_path):
    """Release-to-release diff: added/removed terms, renames, and
    per-element synonym/xref/parent changes in long format."""
    from phenoqc_spark.ontology.obo import ontology_diff, parse_obo_terms

    v1 = tmp_path / "v1.obo"
    v1.write_text(
        "[Term]\nid: HP:1\nname: Alpha\nsynonym: \"old syn\" EXACT []\n"
        "xref: DOID:9\nis_a: HP:0\n\n"
        "[Term]\nid: HP:2\nname: Beta\n\n"
        "[Term]\nid: HP:3\nname: Gone\n"
    )
    v2 = tmp_path / "v2.obo"
    v2.write_text(
        "[Term]\nid: HP:1\nname: Alpha prime\nsynonym: \"new syn\" EXACT []\n"
        "xref: DOID:9\nis_a: HP:0\nis_a: HP:5\n\n"
        "[Term]\nid: HP:2\nname: Beta\n\n"
        "[Term]\nid: HP:4\nname: Fresh\n"
    )
    out = ontology_diff(
        spark, parse_obo_terms(str(v1)), parse_obo_terms(str(v2))
    ).collect()
    got = {(r.term_id, r.change, r.field, r.old, r.new) for r in out}
    assert ("HP:4", "added", "term", "-", "Fresh") in got
    assert ("HP:3", "removed", "term", "Gone", "-") in got
    assert ("HP:1", "renamed", "name", "Alpha", "Alpha prime") in got
    assert ("HP:1", "changed", "synonyms", "-", "new syn") in got
    assert ("HP:1", "changed", "synonyms", "old syn", "-") in got
    assert ("HP:1", "changed", "parents", "-", "HP:5") in got
    # unchanged term and unchanged xref produce no rows
    assert not [r for r in got if r[0] == "HP:2"]
    assert not [r for r in got if r[2] == "xrefs"]
