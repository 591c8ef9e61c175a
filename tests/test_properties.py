"""Property-based tests (hypothesis) over the pure resolver kernels —
no SparkSession needed, so these run in milliseconds.

Targets: vectorized/scalar normalization agreement, LCS fallback vs the
reference DP definition, fuzzy extract_one contract, imputation
unknown-strategy warning parity."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from phenoqc_spark.ontology.fuzzy import extract_one, wratio
from phenoqc_spark.ontology.normalize import normalize_series, normalize_text

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
letters = st.text(alphabet=st.sampled_from("abcdefghij"), min_size=1, max_size=8)
word_st = st.builds(" ".join, st.lists(letters, min_size=1, max_size=3))


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_normalize_series_matches_scalar(s):
    out = normalize_series(pd.Series([s], dtype="object")).iloc[0]
    assert out == normalize_text(s)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


def _lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(prev[j + 1], cur[-1]))
        prev = cur
    return prev[-1]


@settings(max_examples=100, deadline=None)
@given(st.lists(text_st, min_size=0, max_size=12), st.integers(min_value=1, max_value=3))
def test_pdf_writer_structure_holds_for_any_content(texts, n_pages):
    """The hand-rolled PDF 1.4 writer (pdfgen.py) must emit structurally
    valid output for ANY text content: header/EOF framing, startxref
    pointing at the xref table, every xref offset pointing at its 'N 0
    obj' header, and parenthesis/backslash-safe literal strings."""
    from phenoqc_spark.pdfgen import PdfCanvas

    c = PdfCanvas()
    for p in range(n_pages - 1):
        c.new_page()
    for i, s in enumerate(texts):
        c.text(50, 50 + 14 * (i % 40), s, size=9)
        c.rect(40, 40 + (i % 5), 10 + i, 4)
    data = c.build()
    assert data.startswith(b"%PDF-1.4") and data.rstrip().endswith(b"%%EOF")
    xref_at = int(data.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip())
    assert data[xref_at : xref_at + 4] == b"xref"
    body = data[xref_at:].split(b"trailer")[0].decode()
    entries = body.splitlines()[2:]
    for i, line in enumerate(entries):
        if line.endswith("n "):
            off = int(line.split()[0])
            assert data[off:].startswith(f"{i} 0 obj".encode()), (i, off)
    # stream lengths are exact: /Length N matches the bytes between
    # stream\n and \nendstream for every content stream
    import re as _re

    for m in _re.finditer(rb"<< /Length (\d+) >>\nstream\n", data):
        n = int(m.group(1))
        start = m.end()
        assert data[start + n : start + n + 10] == b"\nendstream"


@settings(max_examples=200, deadline=None)
@given(word_st, word_st)
def test_wratio_bounds_and_identity(a, b):
    s = wratio(a, b)
    assert 0.0 <= s <= 100.0
    assert wratio(a, a) == 100.0
    # symmetry of the composed scorer
    assert abs(wratio(a, b) - wratio(b, a)) < 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(word_st, min_size=1, max_size=8, unique=True))
def test_extract_one_self_retrieval(keys):
    # querying with an existing key must return that key at score 100
    term = keys[0]
    got = extract_one(term, keys, score_cutoff=80.0)
    assert got is not None
    key, score = got[0], got[1]
    assert score == 100.0
    # insertion-order tie-break: the first key scoring 100 wins
    first_100 = next(k for k in keys if wratio(term, k) == 100.0)
    assert key == first_100


@settings(max_examples=150, deadline=None)
@given(word_st, st.lists(word_st, min_size=1, max_size=6))
def test_extract_one_cutoff_contract(term, keys):
    cutoff = 80.0
    got = extract_one(term, keys, score_cutoff=cutoff)
    best = max(wratio(term, k) for k in keys)
    if got is None:
        assert best < cutoff
    else:
        assert got[1] >= cutoff and abs(got[1] - best) < 1e-9


@settings(max_examples=400, deadline=None)
@given(word_st, word_st)
def test_wratio_bag_upper_bound_is_sound(a, b):
    # the character-bag prune bound must dominate the true score —
    # otherwise extract_one's prune could skip the real best key
    from phenoqc_spark.ontology.fuzzy import _str_stats, _wratio_upper_bound

    assert wratio(a, b) <= _wratio_upper_bound(_str_stats(a), _str_stats(b)) + 1e-9


@settings(max_examples=200, deadline=None)
@given(word_st, st.lists(word_st, min_size=1, max_size=8), st.sampled_from([0.0, 50.0, 80.0, 95.0]))
def test_extract_one_prune_is_behavior_identical(term, keys, cutoff):
    # key_stats enables the bag-bound prune; result must be bit-identical
    from phenoqc_spark.ontology.fuzzy import build_key_stats

    keys = tuple(keys)
    assert extract_one(term, keys, cutoff) == extract_one(
        term, keys, cutoff, key_stats=build_key_stats(keys)
    )


@settings(max_examples=150, deadline=None)
@given(word_st, st.lists(st.one_of(word_st, st.just("")), min_size=1, max_size=8), st.sampled_from([0.0, 50.0, 80.0, 95.0]))
def test_key_index_vector_bound_matches_scalar(term, keys, cutoff):
    # the numpy-batched bound must equal the scalar bound per key (so the
    # vectorized prune inherits the scalar soundness proof), and the
    # pruned extract_one must be bit-identical to the unpruned one
    from phenoqc_spark.ontology.fuzzy import (
        _str_stats,
        _wratio_upper_bound,
        build_key_index,
    )

    keys = tuple(keys)
    ki = build_key_index(keys)
    vb = ki.bounds(_str_stats(term))
    for i, k in enumerate(keys):
        if not k:
            assert vb[i] == -1.0
        else:
            assert abs(vb[i] - _wratio_upper_bound(_str_stats(term), _str_stats(k))) < 1e-9
    assert extract_one(term, keys, cutoff) == extract_one(term, keys, cutoff, key_stats=ki)


def test_impute_unknown_strategy_warns(spark):
    import warnings

    from phenoqc_spark.operators.imputation import impute

    df = spark.createDataFrame(
        [(1, None), (2, 5.0)], "id long, v double"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = impute(df, "not_a_strategy")
        rows = {r.id: r.v for r in out.collect()}
    assert any("unknown imputation strategy" in str(x.message) for x in w)
    # data unchanged (reference: warn + no-op)
    assert rows[1] is None and rows[2] == 5.0
