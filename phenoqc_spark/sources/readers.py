"""File-format readers with the reference's load semantics (SURVEY §2.1
S1–S4; reference: src/phenoqc/input.py:4-103, batch_processing.py:204-217).

The reference reads CSV/TSV in 10k-row pandas chunks with
``na_values=["", " ", "NA", "N/A"]`` and reads JSON whole-file through
``pd.json_normalize``.  Here a chunk ≙ a partition (Spark splits files by
``spark.sql.files.maxPartitionBytes``); NA-token replacement is a codegen
``CASE`` per string column; json_normalize ≙ recursive struct flattening
with dotted names.  Everything stays JVM-side.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

# reference: input.py:10 (same list for CSV and TSV)
NA_VALUES = ["", " ", "NA", "N/A"]


def _null_na_tokens(df: DataFrame) -> DataFrame:
    """Replace the reference's NA tokens with real nulls in string cols."""
    out = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.dataType.typeName() == "string":
            c = F.when(c.isin(NA_VALUES), None).otherwise(c).alias(f.name)
        out.append(c)
    return df.select(*out)


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    schema: Optional[StructType] = None,
    infer: bool = True,
) -> DataFrame:
    """S1/S2: header CSV/TSV scan with the reference's NA tokens.

    Spark's ``nullValue`` option takes a single token, so the multi-token
    NA list is applied as a post-scan projection (whole-stage codegen; the
    extra CASE does not block predicate pushdown on non-string columns).
    """
    reader = spark.read.option("header", True).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return _null_na_tokens(reader.csv(path))


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_csv(spark, path, sep="\t", **kw)


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """``pd.json_normalize`` twin (reference: input.py:68): recursively
    flatten struct columns into dotted top-level columns.  Arrays are left
    intact (the reference keeps list cells as objects too)."""
    while True:
        struct_fields = [
            f.name for f in df.schema.fields if f.dataType.typeName() == "struct"
        ]
        if not struct_fields:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in struct_fields:
                for sub in f.dataType.fields:  # type: ignore[union-attr]
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}")
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def read_json(
    spark: SparkSession, path: str, multiline: bool = True, flatten: bool = True
) -> DataFrame:
    """S3: whole-file JSON (array of records or one object per line) →
    flattened frame.  ``multiline=True`` matches the reference's
    ``json.load`` of a whole document (input.py:43-79)."""
    df = spark.read.option("multiLine", multiline).json(path)
    return flatten_structs(df) if flatten else df


def load_data(spark: SparkSession, path: str, **kw) -> DataFrame:
    """S4 dispatch-by-extension (reference: input.py:81-103)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return read_csv(spark, path, **kw)
    if ext in (".tsv", ".txt"):
        return read_tsv(spark, path, **kw)
    if ext == ".json":
        return read_json(spark, path, **kw)
    if ext == ".parquet":
        return spark.read.parquet(path)
    raise ValueError(f"Unsupported file extension: {ext!r} (csv/tsv/json/parquet)")
