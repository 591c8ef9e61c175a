"""Text normalization with exact parity to the reference's
``OntologyMapper._normalize_text`` (reference: src/phenoqc/mapping.py:99-109).

Order of operations is semantically significant (the reference strips
brackets *after* collapsing whitespace, then re-collapses), so this module
is the single source of truth — the driver-side resolver, the Arrow pandas
UDFs, and the tests all import from here.
"""

from __future__ import annotations

import re
import unicodedata

_ZERO_WIDTH = "​"
_RE_NLTAB = re.compile(r"[\n\t]")
_RE_WS = re.compile(r"\s+")
_RE_BRACKETS = re.compile(r"[()\[\]{}]")


def normalize_text(text) -> str:
    """NFKC → lower → strip → zero-width→space → newline/tab→space →
    collapse ws → brackets→space → collapse ws → strip.

    Accepts any value (the reference str()-coerces non-strings); None → "".
    """
    if text is None:
        return ""
    t = unicodedata.normalize("NFKC", str(text)).lower().strip()
    t = t.replace(_ZERO_WIDTH, " ")
    t = _RE_NLTAB.sub(" ", t)
    t = _RE_WS.sub(" ", t)
    t = _RE_BRACKETS.sub(" ", t)
    t = _RE_WS.sub(" ", t).strip()
    return t


def normalize_series(series):
    """Vectorized normalization over a pandas string Series (Arrow UDF hot
    path) — C-level ``.str`` chains, byte-equivalent to ``normalize_text``
    (asserted in tests/test_mapper.py::test_normalize_series_parity)."""
    r = series.str.normalize("NFKC").str.lower().str.strip()
    r = r.str.replace(_ZERO_WIDTH, " ", regex=False)
    r = r.str.replace(r"[\n\t]", " ", regex=True)
    r = r.str.replace(r"\s+", " ", regex=True)
    r = r.str.replace(r"[()\[\]{}]", " ", regex=True)
    r = r.str.replace(r"\s+", " ", regex=True).str.strip()
    return r
