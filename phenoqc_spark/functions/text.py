"""Arrow pandas UDFs for page-level text processing.

All per-row Python in the engine is vectorized through Arrow batches
(BASELINE.json input_hint: "no per-row Python") — these are Series→Series
pandas UDFs, JVM↔Python transfer is columnar.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

HTML_PREFIX = b"<html><body><p>"
HTML_SUFFIX = b"</p></body></html>"


def _extract_one(b) -> str | None:
    if b is None:
        return None
    if b.startswith(HTML_PREFIX) and b.endswith(HTML_SUFFIX):
        return b[len(HTML_PREFIX) : -len(HTML_SUFFIX)].decode("utf-8")
    # Generic fallback: deterministic tag-strip (still byte-stable per input).
    import re

    return re.sub(rb"<[^>]*>", b"", b).decode("utf-8", errors="replace")


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Deterministic, byte-identical text extraction per url.

    The per-row invariant (BASELINE.md): for synthetic pages the html is
    exactly ``<html><body><p>`` + utf-8(text) + ``</p></body></html>``, so
    extraction is the exact inverse.  This replaces the reference's
    chunked CSV/JSON readers (reference: src/phenoqc/input.py:4-79) as the
    record-acquisition step.

    The conforming-wrapper path is fully vectorized: one ``.str.decode``
    over the batch, then C-level startswith/endswith/slice on the decoded
    strings (the wrapper is pure ASCII, so character slicing equals byte
    slicing and the result is byte-identical to the bytes-level inverse).
    Only non-conforming rows fall back to the per-row regex tag-strip.
    """
    decoded = html.str.decode("utf-8", "replace")
    prefix, suffix = HTML_PREFIX.decode(), HTML_SUFFIX.decode()
    mask = (decoded.str.startswith(prefix) & decoded.str.endswith(suffix)).fillna(False)
    out = pd.Series([None] * len(html), index=html.index, dtype=object)
    if mask.any():
        out[mask] = decoded[mask].str.slice(len(prefix), -len(suffix))
    slow = ~mask & html.notna()
    if slow.any():
        out[slow] = html[slow].map(_extract_one)
    return out


@pandas_udf(StringType())
def normalize_terms(terms: pd.Series) -> pd.Series:
    """Vectorized NFKC normalization (reference: src/phenoqc/mapping.py:99-109)."""
    from phenoqc_spark.ontology.normalize import normalize_series

    return normalize_series(terms)


def parse_records(df, text_col: str = "text"):
    """Parse ``key: value`` line records embedded in page text — fully
    JVM-side (``str_to_map``), no Python.

    Returns the input DataFrame plus a ``rec`` map column; empty values
    become NULL downstream via ``nullif``.
    """
    return df.withColumn("rec", F.expr(f"str_to_map({text_col}, '\n', ': ')"))


def record_field(name: str):
    """NULL-safe accessor for a parsed record field."""
    return F.nullif(F.col("rec").getItem(name), F.lit(""))
