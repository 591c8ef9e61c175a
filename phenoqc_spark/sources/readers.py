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


def extract_zip(zip_path: str, extract_to: Optional[str] = None):
    """S5: ZIP extraction with the reference's member filtering
    (reference: src/phenoqc/utils/zip_utils.py:4-27 — skips __MACOSX/,
    ._* and .DS_Store entries).  Driver-side; returns
    (extraction_dir, error_or_None) exactly like the reference."""
    import tempfile
    import zipfile

    if extract_to is None:
        extract_to = tempfile.mkdtemp(prefix="phenoqc_spark_zip_")
    try:
        with zipfile.ZipFile(zip_path, "r") as zf:
            members = [
                f
                for f in zf.namelist()
                if not f.startswith("__MACOSX/")
                and not f.startswith("._")
                and not f.endswith(".DS_Store")
            ]
            zf.extractall(path=extract_to, members=members)
        return extract_to, None
    except zipfile.BadZipFile:
        return None, f"The file '{zip_path}' is not a valid ZIP archive."
    except Exception as e:  # noqa: BLE001 — reference returns the message
        return None, f"An error occurred during ZIP extraction of '{zip_path}': {e}"


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


def collect_input_files(paths, recursive: bool = False):
    """Collect all supported data files (.csv/.tsv/.json) from files,
    directories, and ZIP archives (reference: cli.py:131-196).

    ZIPs extract to a temp dir; ``recursive`` walks nested directories.
    Non-recursive semantics mirror the reference exactly (cli.py:131-196):
    plain directories scan TOP-LEVEL files only (the ``os.listdir``
    branch, cli.py:190-196); extracted ZIPs get the reference's walk
    quirk — top level plus the first subdirectory in walk order
    (cli.py:163-172; walk order pinned by sorting for determinism).
    The walk is consumed lazily (``dirs`` sorted in place), never the
    whole tree when a break applies.  Returns absolute paths in
    discovery order."""
    import os

    exts = {".csv", ".tsv", ".json"}
    out = []

    def scan_dir(d, zip_quirk):
        if not recursive and not zip_quirk:
            for fn in sorted(os.listdir(d)):
                p = os.path.join(d, fn)
                if os.path.isfile(p) and os.path.splitext(fn)[1].lower() in exts:
                    out.append(os.path.abspath(p))
            return
        for idx, (root, dirs, files) in enumerate(os.walk(d)):
            dirs.sort()
            for fn in sorted(files):
                if os.path.splitext(fn)[1].lower() in exts:
                    out.append(os.path.join(root, fn))
            if not recursive and idx >= 1:
                break

    for p in paths:
        if os.path.isfile(p):
            ext = os.path.splitext(p)[1].lower()
            if ext == ".zip":
                extracted, err = extract_zip(p)
                if err is None:
                    scan_dir(extracted, zip_quirk=True)
            elif ext in exts:
                out.append(os.path.abspath(p))
        elif os.path.isdir(p):
            scan_dir(p, zip_quirk=False)
    return out
