"""phenoqc_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
PhenoQC reference (jorgeMFS/PhenoQC), re-expressed Spark-first.

Layers
------
- ``ontology``   : OBO parsing, normalization, fuzzy WRatio cascade (broadcast dims)
- ``functions``  : Arrow pandas UDFs (extract_text, linking, text analytics)
- ``operators``  : validation, missing-data, imputation, quality metrics,
                   dedup, similarity, triples, canonicalization
- ``pipeline``   : pages → triples end-to-end DAG with audit metrics + resume
- ``pages``      : deterministic synthetic Common-Crawl-style pages generator
"""

from .session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
