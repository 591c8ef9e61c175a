"""Ontology suggestion heuristics, parity with the reference GUI helper
(reference: src/phenoqc/utils/ontology_utils.py:4-80).

Spark-first recast: the reference analyzes up to 100 unique values of a
pandas Series; here the sample comes from a distributed
``distinct().limit(n)`` over the column — one small job whose output is
bounded regardless of corpus size — and the heuristic itself runs on the
driver over that bounded sample, exactly as the reference does.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# column-name pattern → candidate ontologies (reference:
# utils/ontology_utils.py:26-36)
NAME_PATTERNS = {
    "phenotype": ["HPO", "MPO"],
    "disease": ["DO", "MONDO"],
    "symptom": ["HPO"],
    "diagnosis": ["DO", "ICD"],
    "clinical": ["HPO"],
    "pathology": ["DO"],
    "genetic": ["GO"],
    "molecular": ["GO"],
    "anatomy": ["UBERON"],
}

# ontology-ID regexes (reference: utils/ontology_utils.py:46-52)
ID_PATTERNS = {
    "HPO": r"HP:[0-9]{7}",
    "DO": r"DOID:[0-9]+",
    "MPO": r"MP:[0-9]{7}",
    "GO": r"GO:[0-9]{7}",
    "MONDO": r"MONDO:[0-9]{7}",
}

# term-indicator substrings (reference: utils/ontology_utils.py:60-64)
TERM_INDICATORS = {
    "HPO": ["abnormal", "phenotype", "clinical", "syndrome"],
    "DO": ["disease", "disorder", "syndrome", "condition"],
    "MPO": ["abnormal", "phenotype", "mutant"],
}


def suggest_ontologies(
    df: DataFrame,
    column: str,
    available_ontologies: dict,
    sample_n: int = 100,
) -> list:
    """Suggest ontology ids for ``column`` from (1) column-name patterns,
    (2) a bounded distinct-value sample scanned for ID regexes and term
    indicators, (3) a string-type default (HPO/DO) when nothing matched.
    Returns the sorted intersection with ``available_ontologies`` —
    reference-identical decision logic over a distributed sample."""
    suggestions: set[str] = set()
    col_lower = column.lower()
    for pattern, onts in NAME_PATTERNS.items():
        if pattern in col_lower:
            suggestions.update(o for o in onts if o in available_ontologies)

    field = df.schema[column]
    is_stringy = field.dataType.typeName() in ("string", "varchar", "char")
    sample = [
        r[0]
        for r in df.select(F.col(column).cast("string"))
        .filter(F.col(column).isNotNull())
        .distinct()
        .limit(sample_n)
        .collect()
    ]
    for value in sample:
        for ont, pattern in ID_PATTERNS.items():
            if ont in available_ontologies and re.search(pattern, value):
                suggestions.add(ont)
        value_lower = value.lower()
        for ont, indicators in TERM_INDICATORS.items():
            if ont in available_ontologies and any(
                ind in value_lower for ind in indicators
            ):
                suggestions.add(ont)

    if is_stringy and not suggestions:
        suggestions.update(o for o in ("HPO", "DO") if o in available_ontologies)

    return sorted(o for o in suggestions if o in available_ontologies)
