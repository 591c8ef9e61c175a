"""Validation-operator tests with the reference's golden fixtures
(reference: tests/test_validation.py — 4-row clinical frame: duplicated
S001 with conflicting Age, -5 Age integrity issue, 'Unknown' Gender)."""

import pytest
from pyspark.sql import functions as F

from phenoqc_spark.operators import validation as V


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


def test_duplicates(clinical):
    dups = V.duplicates(clinical, ["SampleID"]).collect()
    assert len(dups) == 2
    assert all(r.SampleID == "S001" for r in dups)


def test_conflicts(clinical):
    conf = V.conflicts(clinical, ["SampleID"]).collect()
    assert len(conf) == 2
    assert {r.Age for r in conf} == {34, 35}


def test_required_missing(clinical):
    miss = V.required_missing(clinical, ["SampleID", "Age"]).collect()
    assert len(miss) == 1 and miss[0].SampleID == "S003"


def test_range_violations(clinical):
    out = V.range_violations(
        clinical, {"Age": {"minimum": 0, "maximum": 120}}, ["SampleID"]
    ).collect()
    assert len(out) == 1
    assert out[0].SampleID == "S002" and out[0].value == "-5"


def test_format_date(clinical):
    bad = V.format_violations(clinical, "VisitDate", "date").collect()
    # regex-only check (reference validation.py:240-242): 2021-02-30 passes
    # the pattern; NULL passes; no violations in this frame
    assert len(bad) == 0
    strict = clinical.filter(
        ~V.format_valid(F.col("VisitDate"), "date")
        | (F.col("VisitDate").isNotNull() & F.expr("try_to_date(VisitDate)").isNull())
    )
    assert strict.count() == 1  # 2021-02-30 is not a real date


def test_referential_integrity(spark, clinical):
    ref = spark.createDataFrame([("S001",), ("S002",)], "SampleID string")
    issues = V.referential_integrity_issues(clinical, ref, "SampleID").collect()
    assert {r.SampleID for r in issues} == {"S003"}


def test_anomalies_zscore(spark):
    rows = [(float(i),) for i in range(1, 30)] + [(1000.0,)]
    df = spark.createDataFrame(rows, "x double")
    out = V.anomalies_zscore(df, ["x"]).collect()
    assert len(out) == 1 and out[0].x == 1000.0


def test_zero_variance_skipped(spark):
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "x double")
    assert V.anomalies_zscore(df, ["x"]).count() == 0


def test_missing_counts(spark):
    # reference fixture (tests/test_missing_data.py:10-22):
    # Age: 2 missing, Gender: 1, Measurement: 1
    rows = [
        ("S1", None, "M", 1.0),
        ("S2", 30, None, None),
        ("S3", None, "F", 3.0),
        ("S4", 40, "F", 4.0),
        ("S5", 50, "M", 5.0),
    ]
    df = spark.createDataFrame(rows, "SampleID string, Age int, Gender string, Measurement double")
    counts = {r.column: r.missing_count for r in V.missing_counts(df).collect()}
    assert counts == {"Age": 2, "Gender": 1, "Measurement": 1}


def test_flag_missing(spark):
    rows = [("S1", None), ("S2", 1.0)]
    df = spark.createDataFrame(rows, "SampleID string, x double")
    flagged = {r.SampleID: r.MissingDataFlag for r in V.flag_missing(df).collect()}
    assert flagged == {"S1": True, "S2": False}


def test_schema_violation_flag(spark, clinical):
    schema = {
        "type": "object",
        "properties": {
            "SampleID": {"type": "string"},
            "Age": {"type": ["integer", "null"], "minimum": 0},
            "Gender": {"type": ["string", "null"], "enum": ["M", "F", "Unknown", None]},
        },
        "required": ["SampleID"],
    }
    flagged = V.schema_violation_flag(clinical, schema)
    out = {r.SampleID + str(r.Age): r.SchemaViolationFlag for r in flagged.collect()}
    assert out["S002-5"] is True  # Age -5 < minimum
    assert out["S00134"] is False


def test_schema_flag_native_matches_jsonschema_udf(spark):
    """The compiled-native path must agree with the exact jsonschema UDF on
    every row; a semantically-inert extra keyword (description) forces the
    fallback, giving a differential oracle."""
    from phenoqc_spark.operators import validation as V

    rows = [
        (1, 5.0, "M", 30),
        (2, 3.5, "X", -1),     # enum violation, minimum violation
        (3, None, None, None),
        (4, 7.2, "F", 200),    # maximum violation
        (5, 6.0, "Unknown", 0),
    ]
    df = spark.createDataFrame(rows, "id long, score double, gender string, age int")
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "score": {"type": ["number", "null"], "minimum": 4.0},
            "gender": {"type": ["string", "null"], "enum": ["M", "F", "Unknown", None]},
            "age": {"type": ["integer", "null"], "minimum": 0, "maximum": 150},
        },
        "required": ["id"],
    }
    native = V._native_schema_flag(df, schema, list(schema["properties"]))
    assert native is not None  # this schema must take the native path
    got_native = {
        r.id: r.SchemaViolationFlag for r in V.schema_violation_flag(df, schema).collect()
    }
    fallback_schema = dict(schema)
    fallback_schema["properties"] = {
        **schema["properties"],
        "id": {"type": "integer", "description": "force udf"},
    }
    assert V._native_schema_flag(df, fallback_schema, list(schema["properties"])) is None
    got_udf = {
        r.id: r.SchemaViolationFlag
        for r in V.schema_violation_flag(df, fallback_schema).collect()
    }
    assert got_native == got_udf
    assert got_native == {1: False, 2: True, 3: False, 4: True, 5: False}

    # float column against integer type: zero-fraction passes, else fails
    df2 = spark.createDataFrame([(1, 2.0), (2, 2.5)], "id long, v double")
    s2 = {"type": "object", "properties": {"v": {"type": ["integer", "null"]}}}
    got = {r.id: r.SchemaViolationFlag for r in V.schema_violation_flag(df2, s2).collect()}
    assert got == {1: False, 2: True}

    # required column absent from the frame: every row flagged (both paths)
    s3 = {"type": "object", "properties": {"missing_col": {"type": "string"}}, "required": ["missing_col"]}
    got3 = {r.id: r.SchemaViolationFlag for r in V.schema_violation_flag(df2, s3).collect()}
    assert got3 == {1: True, 2: True}

    # required column present in the frame but excluded from the serialized
    # `columns` subset: key-absent in every serialized row, so BOTH paths
    # must flag every row (the native path checks required against the
    # serialized set, not df.columns)
    s4 = {
        "type": "object",
        "properties": {"id": {"type": "integer"}, "v": {"type": ["number", "null"]}},
        "required": ["id"],
    }
    native4 = {
        r.v: r.SchemaViolationFlag
        for r in V.schema_violation_flag(df2, s4, columns=["v"]).collect()
    }
    s4_udf = dict(s4)
    s4_udf["properties"] = {**s4["properties"], "v": {"type": ["number", "null"], "description": "force udf"}}
    udf4 = {
        r.v: r.SchemaViolationFlag
        for r in V.schema_violation_flag(df2, s4_udf, columns=["v"]).collect()
    }
    assert native4 == udf4 == {2.0: True, 2.5: True}


def test_anomalies_mad_robust_vs_zscore(spark):
    """A single extreme outlier inflates sigma enough to mask a moderate
    one from the z-score; median/MAD flags both.  MAD=0 columns are
    skipped."""
    from phenoqc_spark.operators.validation import anomalies_mad, anomalies_zscore

    vals = [10.0] * 20 + [11.0] * 20 + [30.0, 100000.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    z = {r.i for r in anomalies_zscore(df, ["v"], threshold=3.0).collect()}
    m = {r.i for r in anomalies_mad(df, ["v"], threshold=3.5).collect()}
    assert 41 in z and 40 not in z          # sigma self-masked the 30.0
    assert m == {40, 41}                     # robust stats catch both
    const = spark.createDataFrame([(i, 5.0) for i in range(10)], "i int, v double")
    assert anomalies_mad(const, ["v"]).count() == 0  # MAD = 0 -> skip


def test_winsorize_clips_and_preserves_nulls(spark):
    from pyspark.sql import functions as F

    from phenoqc_spark.operators.validation import winsorize

    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "i int, v double")
    out = {r.i: r.v for r in winsorize(df, ["v"], 0.1, 0.9, exact=True).collect()}
    # exact p10/p90 of 0..99 are 9.9 and 89.1 (linear interpolation;
    # float representation of 0.9*99 is 89.10000000000001)
    assert abs(out[0] - 9.9) < 1e-9 and abs(out[99] - 89.1) < 1e-9
    assert out[50] == 50.0 and out[100] is None
    # integer columns keep their dataType (no silent double widening from
    # the least/greatest-against-double-quantile expressions)
    idf = spark.createDataFrame([(i, i) for i in range(100)], "i int, v int")
    iout = winsorize(idf, ["v"], 0.1, 0.9, exact=True)
    assert iout.schema["v"].dataType == idf.schema["v"].dataType
    vals = {r.i: r.v for r in iout.collect()}
    assert isinstance(vals[50], int) and vals[50] == 50
    assert vals[0] == 9 and vals[99] == 89  # clipped bounds, int-truncated
