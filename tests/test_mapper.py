"""Golden-anchor tests for the term-resolution cascade.

Every expected value is taken verbatim from the reference's own unit tests
(reference: tests/test_mapping.py) — see FIXTURES.md §4.
"""

import pytest

from phenoqc_spark.ontology import TermResolver, fuzzy, normalize_text
from phenoqc_spark.fixtures import fixture_config


def test_normalize_parity():
    assert normalize_text("  High\n blood\tpressure (HP:0000822)  ") == (
        "high blood pressure hp:0000822"
    )
    assert normalize_text("( HP:0000822 )") == "hp:0000822"
    assert normalize_text(None) == ""
    assert normalize_text(12345) == "12345"
    assert normalize_text("A​B") == "a b"


def test_normalize_series_parity():
    import pandas as pd

    from phenoqc_spark.ontology.normalize import normalize_series

    samples = [
        "  High\n blood\tpressure (HP:0000822)  ",
        "( HP:0000822 )",
        "A​B",
        "weird   [brackets] {x}",
        "UPPER case",
        "",
        "ﬁligrane",  # NFKC ligature
    ]
    vec = normalize_series(pd.Series(samples)).tolist()
    assert vec == [normalize_text(s) for s in samples]


def test_lcs_against_dp():
    import random

    def dp_lcs(a, b):
        m, n = len(a), len(b)
        prev = [0] * (n + 1)
        for i in range(1, m + 1):
            cur = [0] * (n + 1)
            for j in range(1, n + 1):
                cur[j] = prev[j - 1] + 1 if a[i - 1] == b[j - 1] else max(prev[j], cur[j - 1])
            prev = cur
        return prev[n]

    rng = random.Random(42)
    alphabet = "abcde "
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
        assert fuzzy.lcs_length(a, b) == dp_lcs(a, b), (a, b)
    # long strings exercise the multi-word bit-parallel path
    a = "hypertension " * 10
    b = "hypertention " * 10
    assert fuzzy.lcs_length(a, b) == dp_lcs(a, b)


def test_exact_and_synonym(resolver):
    r = resolver.map_term("Hypertension")
    assert r["HPO"] == "HP:0000822"
    assert r["DO"] == "DOID:0050167"
    r = resolver.map_term("High blood pressure")
    assert r["HPO"] == "HP:0000822"
    assert r["DO"] == "DOID:0050167"


def test_fuzzy_positive(resolver):
    r = resolver.map_term("Hypertention")
    assert r["HPO"] == "HP:0000822"
    assert r["DO"] == "DOID:0050167"


def test_fuzzy_negative(resolver):
    r = resolver.map_term("Xyzzypopple")
    assert all(v is None for v in r.values())


def test_fuzzy_threshold_lowered(onto_dir):
    cfg = fixture_config(onto_dir, fuzzy_threshold=65)
    resolver = TermResolver.from_config(cfg)
    assert resolver.map_term("diabeties")["DO"] == "DOID:1612"


def test_id_variants(resolver):
    assert resolver.map_term("HP:0000822")["HPO"] == "HP:0000822"
    assert resolver.map_term("hp_0000822")["HPO"] == "HP:0000822"
    assert resolver.map_term("( HP:0000822 )")["HPO"] == "HP:0000822"
    assert resolver.map_term("doid:1612")["DO"] == "DOID:1612"
    assert resolver.map_term("DO 1612")["DO"] == "DOID:1612"


def test_normalization_and_noise(resolver):
    res = resolver.map_term("  High\n blood\tpressure (HP:0000822)  ")
    assert res["HPO"] == "HP:0000822"
    assert res["DO"] == "DOID:0050167"


def test_alt_id_and_xref(resolver):
    assert resolver.map_term("HP:0999999")["HPO"] == "HP:0000822"
    assert resolver.map_term("ICD10CM:E11")["DO"] == "DOID:1612"


def test_non_string_inputs(resolver):
    assert all(v is None for v in resolver.map_term(None).values())
    assert all(v is None for v in resolver.map_term(12345).values())


def test_custom_mappings_precedence(onto_dir):
    cfg = fixture_config(onto_dir)
    resolver = TermResolver.from_config(cfg, {"CompletelyUnknownTerm": "HP:0999001"})
    r = resolver.map_term("CompletelyUnknownTerm")
    assert r == {"HPO": "HP:0999001", "DO": "HP:0999001", "MPO": "HP:0999001"}


def test_mpo(resolver):
    assert resolver.map_term("Obesity")["MPO"] == "MP:0001943"
    assert resolver.map_term("Obesity")["DO"] == "DOID:9351"
