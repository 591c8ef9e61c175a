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
