"""Deterministic ontology fixtures (FIXTURES.md §3).

Mini-OBO content mirrors the reference's own unit-test fixtures
(reference: tests/test_mapping.py:18-72) plus the MPO terms, small enough
to hand-verify and rich enough to exercise every resolution tier
(exact / synonym / id / alt_id / xref / fuzzy / prefix fallback).

The HPO fixture additionally carries an ``is_a`` hierarchy (leaf terms →
category terms → HP:0000118) feeding the subsumption-rollup path.  The
category [Term] blocks are id-only, but ids ARE surface-dict keys in the
reference (``terms_to_map = [term_name] + synonyms + [id_key] + ...``,
reference mapping.py:259) and therefore legitimate fuzzy-tier candidates:
``mp:0001943`` WRatio-matches the category key ``hp:0001939`` at exactly
80.0 (the default cutoff), so the full-cascade goldens include that
cross-ontology id match — regenerate them via scripts/gen_full_expected.py
whenever these fixtures change.
"""

from __future__ import annotations

import os
from typing import Dict

HPO_OBO = """format-version: 1.2
data-version: releases/2021-02-01
ontology: Human Phenotype Ontology

[Term]
id: HP:0000822
name: Hypertension
synonym: "High blood pressure" EXACT []
alt_id: HP:0999999
is_a: HP:0011025 ! Abnormal cardiovascular system physiology

[Term]
id: HP:0001627
name: Diabetes
synonym: "Sugar diabetes" EXACT []
is_a: HP:0001939 ! Abnormality of metabolism/homeostasis

[Term]
id: HP:0002090
name: Asthma
synonym: "Reactive airway disease" EXACT []
is_a: HP:0002086 ! Abnormality of the respiratory system

[Term]
id: HP:0011025
is_a: HP:0000118 ! Phenotypic abnormality

[Term]
id: HP:0001939
is_a: HP:0000118 ! Phenotypic abnormality

[Term]
id: HP:0002086
is_a: HP:0000118 ! Phenotypic abnormality
"""

DO_OBO = """format-version: 1.2
data-version: releases/2021-02-01
ontology: Disease Ontology

[Term]
id: DOID:0050167
name: Hypertension
synonym: "High blood pressure" EXACT []

[Term]
id: DOID:1612
name: Diabetes Mellitus
synonym: "Sugar diabetes" EXACT []
synonym: "Diabetes" EXACT []
xref: ICD10CM:E11

[Term]
id: DOID:9352
name: Asthma
synonym: "Reactive airway disease" EXACT []

[Term]
id: DOID:9351
name: Obesity
synonym: "Fatty syndrome" EXACT []

[Term]
id: DOID:1388
name: Anemia
synonym: "Lack of red blood cells" EXACT []
"""

MPO_OBO = """format-version: 1.2
ontology: Mammalian Phenotype Ontology

[Term]
id: MP:0001943
name: Obesity

[Term]
id: MP:0001902
name: Abnormal behavior
"""

CUSTOM_MAPPINGS = {"CompletelyUnknownTerm": "HP:0999001"}


def write_ontology_fixtures(dirpath: str) -> Dict[str, str]:
    """Write the mini-OBO files, return {ontology_id: path}.

    Rewrites a cached file whenever its content differs from the current
    fixture source: a create-if-missing cache silently pins resolver
    behavior to whatever fixture version first populated the directory
    (a stale /tmp cache once masked an id-key fuzzy match for a whole
    round), so staleness is compared away instead of trusted.
    """
    os.makedirs(dirpath, exist_ok=True)
    paths = {}
    for onto, content in (("HPO", HPO_OBO), ("DO", DO_OBO), ("MPO", MPO_OBO)):
        p = os.path.join(dirpath, f"{onto}.obo")
        existing = None
        if os.path.exists(p):
            with open(p, "r", encoding="utf-8") as fh:
                existing = fh.read()
        if existing != content:
            with open(p, "w", encoding="utf-8") as fh:
                fh.write(content)
        paths[onto] = p
    return paths


def fixture_config(dirpath: str, fuzzy_threshold: int = 80) -> dict:
    """Reference-shaped config dict over the fixture ontologies."""
    paths = write_ontology_fixtures(dirpath)
    return {
        "ontologies": {
            onto: {"name": onto, "file": path, "source": "local", "format": "obo"}
            for onto, path in paths.items()
        },
        "default_ontologies": ["HPO", "DO", "MPO"],
        "fuzzy_threshold": fuzzy_threshold,
    }
