"""Validation operators (reference: src/phenoqc/validation.py) as native
DataFrame transformations.

The reference validates cell-by-cell in Python loops (validation.py:146-161)
and row-by-row against a compiled JSON schema (validation.py:62-109).  Here
every check that JSON-schema semantics allow is decomposed into Catalyst
predicates (whole-stage codegen, pushdown-friendly); only the full
row-level JSON-schema validation stays in an Arrow pandas UDF with a
per-executor compiled validator.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

# ---------------------------------------------------------------------------
# V5 — required fields
# ---------------------------------------------------------------------------

def required_missing(df: DataFrame, required: List[str]) -> DataFrame:
    """Rows with any required field NULL (reference: validation.py:321-327)."""
    cond = None
    for c in required:
        p = F.col(c).isNull()
        cond = p if cond is None else (cond | p)
    return df.filter(cond) if cond is not None else df.limit(0)


# ---------------------------------------------------------------------------
# V4 — schema min/max bounds → audit rows
# ---------------------------------------------------------------------------

def range_violations(
    df: DataFrame, properties: Dict[str, dict], row_id_cols: Optional[List[str]] = None
) -> DataFrame:
    """Long-format (row ids…, column, value, minimum, maximum) audit rows for
    values outside schema bounds (reference: quality_metrics.py:22-69).
    ``try_cast`` reproduces ``pd.to_numeric(errors='coerce')``.
    """
    id_cols = row_id_cols or []
    parts = []
    for col, rules in properties.items():
        if col not in df.columns:
            continue
        lo, hi = rules.get("minimum"), rules.get("maximum")
        if lo is None and hi is None:
            continue
        num = F.col(col).cast("string").try_cast("double")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (num < F.lit(float(lo)))
        if hi is not None:
            cond = cond | (num > F.lit(float(hi)))
        parts.append(
            df.filter(cond).select(
                *[F.col(c) for c in id_cols],
                F.lit(col).alias("column"),
                F.col(col).cast("string").alias("value"),
                F.lit(float(lo) if lo is not None else None).cast("double").alias("minimum"),
                F.lit(float(hi) if hi is not None else None).cast("double").alias("maximum"),
            )
        )
    if not parts:
        return df.limit(0).select(
            *[F.col(c) for c in id_cols],
            F.lit("").alias("column"),
            F.lit("").alias("value"),
            F.lit(None).cast("double").alias("minimum"),
            F.lit(None).cast("double").alias("maximum"),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# V3 — format predicates
# ---------------------------------------------------------------------------

FORMAT_PREDICATES = {
    # NULL passes every format (reference: validation.py:236-238)
    "date": lambda c: c.rlike(r"^\d{4}-\d{2}-\d{2}$"),
    "date-time": lambda c: F.try_to_timestamp(c).isNotNull(),
    "time": lambda c: c.rlike(r"^([01]\d|2[0-3]):([0-5]\d):([0-5]\d)"),
    "email": lambda c: c.rlike(r"^[^@]+@[^@]+\.[^@]+$"),
    "uri": lambda c: c.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/\s]+"),
    "uuid": lambda c: c.rlike(
        r"(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    ),
    "identifier": lambda c: c.rlike(r"^[A-Z]+:\d+$"),
    "percentage": lambda c: F.rtrim(F.regexp_replace(c, "%$", "")).try_cast("double").between(0, 100),
    "phone": lambda c: c.rlike(r"^\+?[\d\s-]{10,}$"),
}


def format_valid(col, fmt: str):
    """Boolean expression: does ``col`` satisfy JSON-schema ``format``?
    (reference: validation.py:232-277); NULL → valid."""
    pred = FORMAT_PREDICATES.get(fmt)
    if pred is None:
        return F.lit(True)
    c = col.cast("string")
    return F.when(col.isNull(), F.lit(True)).otherwise(pred(c))


def format_violations(df: DataFrame, column: str, fmt: str) -> DataFrame:
    return df.filter(~format_valid(F.col(column), fmt))


# ---------------------------------------------------------------------------
# V7 — referential integrity (left anti join)
# ---------------------------------------------------------------------------

def referential_integrity_issues(
    df: DataFrame, reference: DataFrame, column: str, ref_column: Optional[str] = None
) -> DataFrame:
    """Rows whose ``column`` value is absent from the reference dimension
    (reference: validation.py:342-360, ``~df[col].isin(ref[col])``).

    Broadcast left-anti join — the dimension is always the small side.
    NOTE pandas ``isin`` parity: NULL ∉ reference ⇒ NULL rows are issues.
    """
    ref_col = ref_column or column
    ref = reference.select(F.col(ref_col).alias(column)).distinct()
    non_null = df.filter(F.col(column).isNotNull()).join(
        F.broadcast(ref), column, "left_anti"
    )
    return non_null.unionByName(df.filter(F.col(column).isNull()))


# ---------------------------------------------------------------------------
# A3/A4 — duplicates & conflicts
# ---------------------------------------------------------------------------

def duplicates(df: DataFrame, unique_identifiers: List[str]) -> DataFrame:
    """All rows sharing an identifier tuple (reference: validation.py:283-289).
    Window count over the id partition — one shuffle, no self-join.
    """
    w = Window.partitionBy(*unique_identifiers)
    return (
        df.withColumn("_dup_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_dup_n") > 1)
        .drop("_dup_n")
    )


def conflicts(df: DataFrame, unique_identifiers: List[str]) -> DataFrame:
    """Duplicate groups whose non-id columns disagree (reference:
    validation.py:291-309).  pandas ``nunique(dropna=False)`` counts NULL as
    a distinct value, so NULLs are sentinel-coalesced before countDistinct.
    """
    non_id = [c for c in df.columns if c not in unique_identifiers]
    sentinel = "\u0000__null__"
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.countDistinct(F.coalesce(F.col(c).cast("string"), F.lit(sentinel))).alias(
            f"_nu_{i}"
        )
        for i, c in enumerate(non_id)
    ]
    grouped = df.groupBy(*unique_identifiers).agg(*aggs)
    any_conflict = None
    for i in range(len(non_id)):
        p = F.col(f"_nu_{i}") > 1
        any_conflict = p if any_conflict is None else (any_conflict | p)
    bad_keys = grouped.filter((F.col("_n") > 1) & any_conflict).select(*unique_identifiers)
    return df.join(bad_keys, unique_identifiers, "left_semi")


# ---------------------------------------------------------------------------
# A9 — z-score anomalies (two-pass, global statistics)
# ---------------------------------------------------------------------------

def anomalies_zscore(
    df: DataFrame, numeric_cols: List[str], threshold: float = 3.0
) -> DataFrame:
    """Rows where any |z| > 3 (reference: validation.py:366-384).

    pandas ``std()`` is ddof=1 ⇒ ``stddev_samp``.  Two passes: one partial
    aggregate for (μ, σ), then a codegen filter — the stats row is a
    broadcast-sized literal join, the fact side is never shuffled.
    """
    aggs = []
    for c in numeric_cols:
        aggs += [F.avg(c).alias(f"_mu_{c}"), F.stddev_samp(c).alias(f"_sd_{c}")]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    cond = None
    for c in numeric_cols:
        sd = F.col(f"_sd_{c}")
        z = (F.col(c) - F.col(f"_mu_{c}")) / sd
        p = sd.isNotNull() & (sd != 0) & (F.abs(z) > threshold)
        cond = p if cond is None else (cond | p)
    return joined.filter(cond).select(*df.columns)


def anomalies_mad(
    df: DataFrame, numeric_cols: List[str], threshold: float = 3.5
) -> DataFrame:
    """Rows where any robust z-score |x − median| / (1.4826·MAD) exceeds
    ``threshold`` — the median/MAD twin of :func:`anomalies_zscore`.

    The classical z-score is self-masking: the outliers being hunted
    inflate μ and σ, so a single extreme value can hide a cluster of
    moderate ones.  Median and MAD have a 50% breakdown point, making
    this the robust default (Iglewicz-Hoberg's 3.5 cut); 1.4826 scales
    MAD to σ under normality so thresholds stay comparable.

    Same two-pass shape as the z-score variant: one stats aggregate
    (exact ``median`` — reserve for profile-sized slices or swap
    ``percentile_approx`` at full-corpus scale), a broadcast join of the
    stats row, a codegen filter; columns with MAD = 0 are skipped like
    σ = 0 columns.  MAD is median(|x − median|), computed in the same
    aggregate pass via a median over the derived absolute deviation —
    two exact medians, one stats row.
    """
    med_aggs = [F.median(F.col(c)).alias(f"_med_{c}") for c in numeric_cols]
    meds = df.agg(*med_aggs)
    with_dev = df.crossJoin(F.broadcast(meds))
    mad_aggs = [
        F.median(F.abs(F.col(c) - F.col(f"_med_{c}"))).alias(f"_mad_{c}")
        for c in numeric_cols
    ]
    mads = with_dev.agg(
        *[F.first(f"_med_{c}").alias(f"_med_{c}") for c in numeric_cols], *mad_aggs
    )
    joined = df.crossJoin(F.broadcast(mads))
    cond = None
    for c in numeric_cols:
        mad = F.col(f"_mad_{c}")
        rz = (F.col(c) - F.col(f"_med_{c}")) / (F.lit(1.4826) * mad)
        p = mad.isNotNull() & (mad != 0) & (F.abs(rz) > threshold)
        cond = p if cond is None else (cond | p)
    return joined.filter(cond).select(*df.columns)


def winsorize(
    df: DataFrame,
    numeric_cols: List[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    exact: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Clip each column to its [lower_q, upper_q] quantiles — the
    outlier-taming companion to the anomaly REPORTS: where flagging
    feeds review, winsorizing feeds models that must not see a 10⁶×
    tail (the standard robust-preprocessing step the reference's
    z-score detection implies but never applies).

    One stats aggregate (``percentile_approx`` by default — the
    full-corpus path; ``exact=True`` interpolated percentiles for
    oracle-grade slices), broadcast back, per-column
    ``least(greatest(x, lo), hi)`` codegen; nulls pass through
    untouched.  Non-listed columns are untouched.
    """
    ps = F.array(F.lit(float(lower_q)), F.lit(float(upper_q)))
    aggs = []
    for c in numeric_cols:
        col = F.col(c).cast("double")
        pc = (
            F.percentile(col, ps)
            if exact
            else F.percentile_approx(col, ps, F.lit(approx_accuracy))
        )
        aggs.append(pc.alias(f"_q_{c}"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in numeric_cols:
        lo = F.col(f"_q_{c}")[0]
        hi = F.col(f"_q_{c}")[1]
        # cast the clipped value back to the column's ORIGINAL dataType —
        # least/greatest against double quantile bounds would otherwise
        # silently widen int columns, changing the output schema vs input
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.least(F.greatest(F.col(c), lo), hi).cast(df.schema[c].dataType),
            ).otherwise(F.col(c)),
        )
    return out.select(*df.columns)


# ---------------------------------------------------------------------------
# A1/A2 — missing data
# ---------------------------------------------------------------------------

def missing_counts(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """Per-column missing-cell counts (reference: missing_data.py:17-28),
    reported only for columns with >0 missing.  Single partial+final agg.
    """
    cols = columns or df.columns
    aggs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column"), F.col(c).alias("missing_count"))
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.missing_count")
    return stacked.filter(F.col("missing_count") > 0)


def flag_missing(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """Adds ``MissingDataFlag`` = any NULL in row (reference: missing_data.py:30-41)."""
    cols = columns or df.columns
    flag = None
    for c in cols:
        p = F.col(c).isNull()
        flag = p if flag is None else (flag | p)
    return df.withColumn("MissingDataFlag", flag if flag is not None else F.lit(False))


# ---------------------------------------------------------------------------
# V2/V3/V4 — cell-level validation audit (long format)
# ---------------------------------------------------------------------------

def cell_violations(
    df: DataFrame, schema: dict, row_id_cols: Optional[List[str]] = None
) -> DataFrame:
    """Long-format (row ids…, column, reason) audit of cell-level schema
    checks — the scale-friendly replacement for the reference's
    shape-preserving ``invalid_mask`` (validation.py:56,128-164): only
    violated cells are materialized (SURVEY.md §1.2).

    Covers per-column: min/max bounds (try_cast semantics), ``format``
    predicates, and string-typed date/date-time types.  All checks are
    native Catalyst predicates unioned into one plan.
    """
    id_cols = row_id_cols or []
    props = schema.get("properties", {})
    parts = []

    def audit(cond, col, reason):
        parts.append(
            df.filter(cond).select(
                *[F.col(c) for c in id_cols],
                F.lit(col).alias("column"),
                F.lit(reason).alias("reason"),
            )
        )

    for col, rules in props.items():
        if col not in df.columns:
            continue
        c = F.col(col)
        lo, hi = rules.get("minimum"), rules.get("maximum")
        num = c.cast("string").try_cast("double")
        if lo is not None:
            audit(num < float(lo), col, "below_minimum")
        if hi is not None:
            audit(num > float(hi), col, "above_maximum")
        fmt = rules.get("format")
        if fmt:
            audit(~format_valid(c, fmt), col, f"bad_format_{fmt}")
        t = rules.get("type")
        types = t if isinstance(t, list) else [t] if t else []
        if "date" in types:
            audit(
                c.isNotNull() & F.expr(f"try_to_date(`{col}`)").isNull(),
                col,
                "bad_type_date",
            )
        elif "date-time" in types:
            audit(
                c.isNotNull() & F.try_to_timestamp(c.cast("string")).isNull(),
                col,
                "bad_type_datetime",
            )
        elif types and "string" not in types and "null" in types:
            # numeric-typed nullable column parsed from text: unparseable
            if "number" in types or "integer" in types:
                audit(c.isNotNull() & num.isNull(), col, "bad_type_numeric")
    if not parts:
        return df.limit(0).select(
            *[F.col(c) for c in id_cols],
            F.lit("").alias("column"),
            F.lit("").alias("reason"),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# V1 — row-level JSON-schema validation (Arrow UDF, compiled once/executor)
# ---------------------------------------------------------------------------

_NATIVE_PROP_KEYWORDS = {"type", "minimum", "maximum", "enum"}
_NATIVE_TOP_KEYWORDS = {"type", "properties", "required"}


def _spark_json_tag(dt) -> Optional[str]:
    """JSON type family a Spark column serializes to (None = unsupported
    for the native path)."""
    n = dt.typeName()
    if n in ("byte", "short", "integer", "long"):
        return "int"
    if n in ("float", "double") or n.startswith("decimal"):
        return "float"
    if n in ("string", "date", "timestamp", "timestamp_ntz"):
        return "string"
    if n == "boolean":
        return "boolean"
    return None


def _native_schema_flag(df: DataFrame, schema: dict, cols: List[str]):
    """Compile the schema into one JVM boolean expression, or return None
    when a keyword outside the native set is present (caller falls back to
    the exact jsonschema UDF).  Draft-7 semantics: ``type`` lists,
    ``integer`` admits zero-fraction floats, ``minimum``/``maximum`` apply
    to numbers only, ``enum`` admits null iff None is enumerated,
    ``required`` only fires when the column is absent entirely (serialized
    rows always carry present-but-null keys)."""
    if set(schema) - _NATIVE_TOP_KEYWORDS or schema.get("type", "object") != "object":
        return None
    props = schema.get("properties", {})
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    # required is checked against the SERIALIZED column set (``cols``), not
    # df.columns: the UDF fallback serializes only ``cols``, so a required
    # property excluded by a caller-passed ``columns`` subset is key-absent
    # in every row — both paths must agree on that (it is a violation).
    for req in schema.get("required", []):
        if req not in cols:
            return F.lit(True)  # key absent from every serialized row
    violation = F.lit(False)
    for name in cols:
        sub = props.get(name)
        if not isinstance(sub, dict) or set(sub) - _NATIVE_PROP_KEYWORDS:
            return None
        tag = _spark_json_tag(dtypes[name])
        if tag is None:
            return None
        c = F.col(name)
        types = sub.get("type")
        allowed = [types] if isinstance(types, str) else list(types or [])
        checks = []  # each: violation condition for NON-NULL values
        if allowed:
            if tag == "int":
                ok = "integer" in allowed or "number" in allowed
                type_bad = F.lit(not ok)
            elif tag == "float":
                if "number" in allowed:
                    type_bad = F.lit(False)
                elif "integer" in allowed:
                    type_bad = ~(c == F.floor(c))
                else:
                    type_bad = F.lit(True)
            elif tag == "string":
                type_bad = F.lit("string" not in allowed)
            else:  # boolean
                type_bad = F.lit("boolean" not in allowed)
            checks.append(type_bad)
        if "enum" in sub:
            enum = sub["enum"]
            if tag in ("int", "float"):
                compat = [e for e in enum if isinstance(e, (int, float)) and not isinstance(e, bool)]
            elif tag == "string":
                compat = [e for e in enum if isinstance(e, str)]
            else:
                compat = [e for e in enum if isinstance(e, bool)]
            checks.append(~c.isin(compat) if compat else F.lit(True))
        if tag in ("int", "float"):
            if "minimum" in sub:
                checks.append(c < F.lit(sub["minimum"]))
            if "maximum" in sub:
                checks.append(c > F.lit(sub["maximum"]))
        nonnull_bad = F.lit(False)
        for chk in checks:
            nonnull_bad = nonnull_bad | chk
        null_bad = F.lit(False)
        if allowed and "null" not in allowed:
            null_bad = F.lit(True)
        if "enum" in sub and None not in sub["enum"]:
            null_bad = F.lit(True)
        prop_bad = F.when(c.isNull(), null_bad).otherwise(nonnull_bad)
        violation = violation | prop_bad
    return violation


def schema_violation_flag(df: DataFrame, schema: dict, columns: Optional[List[str]] = None) -> DataFrame:
    """Adds ``SchemaViolationFlag`` per row (reference: validation.py:62-109).

    Schemas built from the common keyword set (object with per-property
    ``type``/``minimum``/``maximum``/``enum`` + ``required``) compile to a
    single JVM boolean expression — zero Python in the hot path, the
    Spark-first analogue of the reference's fastjsonschema pre-compilation
    (validation.py:53).  Any other keyword falls back to the exact path:
    rows serialized JVM-side with ``to_json(struct(*))`` and validated in
    Arrow batches by a jsonschema Draft-7 validator compiled once per
    executor.
    """
    import json

    cols = columns or [c for c in df.columns if c in schema.get("properties", {})]
    native = _native_schema_flag(df, schema, cols)
    if native is not None:
        return df.withColumn("SchemaViolationFlag", native)
    schema_json = json.dumps(schema)

    @pandas_udf(BooleanType())
    def _violates(rows: pd.Series) -> pd.Series:
        import json as _json

        import jsonschema

        validator = _compiled_validator(schema_json)
        out = []
        for raw in rows:
            try:
                rec = _json.loads(raw) if raw else {}
                validator.validate(rec)
                out.append(False)
            except jsonschema.ValidationError:
                out.append(True)
            except Exception:
                out.append(True)
        return pd.Series(out)

    # keep NULL fields in the JSON so "required present but null" matches the
    # reference's dict semantics (None value present, not key-absent)
    row_json = F.to_json(
        F.struct(*[F.col(c) for c in cols]), {"ignoreNullFields": "false"}
    )
    return df.withColumn("SchemaViolationFlag", _violates(row_json))


_VALIDATOR_CACHE: dict = {}


def _compiled_validator(schema_json: str):
    v = _VALIDATOR_CACHE.get(schema_json)
    if v is None:
        import json

        import jsonschema

        schema = json.loads(schema_json)
        v = jsonschema.Draft7Validator(
            schema, format_checker=jsonschema.FormatChecker()
        )
        _VALIDATOR_CACHE[schema_json] = v
    return v
