"""Entity-linking over *distinct* terms (the engine's J1 join).

Scale design (SURVEY.md §2.3/§4.2): resolution cost is paid once per
distinct normalized surface form — mirroring the reference's per-chunk
``dropna().unique()`` (reference: src/phenoqc/batch_processing.py:594) but
globally.  The ontology dictionaries ride a Spark broadcast variable
(never shuffled); the resolved vocabulary joins back to the fact side as a
broadcast hash join, so the 100 TB fact table is never shuffled for
linking.  Hub-term skew therefore collapses map-side in the partial
aggregate of ``distinct`` and never reaches a skewed shuffle join.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame


LINK_SCHEMA = (
    "term_norm string, ontology string, term_id string, tier string, score double"
)


def link_distinct_terms(
    distinct_terms: DataFrame,
    resolver_bc,
    ontologies: List[str] | None = None,
) -> DataFrame:
    """distinct (term_norm) → long (term_norm, ontology, term_id, tier, score).

    Unmapped (term, ontology) pairs are emitted with NULL term_id so
    mapping-rate metrics (reference: batch_processing.py:778-790) can be
    computed from the same output.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolver = resolver_bc.value
        targets = ontologies or resolver.default_ontologies
        for pdf in batches:
            terms = pdf["term_norm"].tolist()
            out_term, out_onto, out_id, out_tier, out_score = [], [], [], [], []
            for t in terms:
                detailed = resolver.map_term_cached(t)
                for onto in targets:
                    res = detailed.get(onto)
                    out_term.append(t)
                    out_onto.append(onto)
                    if res is None:
                        out_id.append(None)
                        out_tier.append(None)
                        out_score.append(None)
                    else:
                        out_id.append(res[0])
                        out_tier.append(res[1])
                        out_score.append(res[2])
            yield pd.DataFrame(
                {
                    "term_norm": out_term,
                    "ontology": out_onto,
                    "term_id": out_id,
                    "tier": out_tier,
                    "score": out_score,
                }
            )

    return distinct_terms.select("term_norm").mapInPandas(gen, LINK_SCHEMA)


def link_terms_inline(
    terms: DataFrame,
    resolver_bc,
    ontologies=None,
    normalize: bool = False,
    drop_input_cols: tuple = (),
) -> DataFrame:
    """Single-pass linking: resolve per batch with a per-executor memo cache.

    The vocab-distinct + broadcast-join plan reads the expensive upstream
    (extract + parse + normalize) twice — once for the vocabulary branch,
    once for the fact branch.  This operator fuses linking into the fact
    pass: each Arrow batch resolves its terms through
    ``TermResolver.map_term_cached`` (per-executor memo), which is exactly
    the reference's per-chunk ``unique()`` contract
    (batch_processing.py:594) — hub terms hit the cache, the fact side is
    read once and never shuffled.  Prefer this when the vocabulary is
    dictionary-bounded; use the vocab path when terms are unbounded and the
    upstream is cheap to re-scan (e.g. a materialized staging table).

    Input: (…, term_norm); output: input columns + (ontology, term_id,
    tier, score), matched rows only.  ``drop_input_cols`` names input
    columns to OMIT from the yielded frame (guide §4: every column
    crossing the Python→JVM boundary costs Arrow transfer; the pipeline
    drops the raw ``term`` once ``term_norm`` replaces it downstream —
    measured 2.35 → 2.15 s on the 1M-page linked stage).
    """
    drop = set(drop_input_cols)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in terms.schema.fields
        if f.name not in drop
    )
    in_cols = [f.name for f in terms.schema.fields if f.name not in drop]
    if normalize:
        # normalization fused here (one fewer chained Python stage on the
        # fact path: JVM parse → this single Arrow hop)
        out_fields += ", term_norm string"
        in_cols = in_cols + ["term_norm"]
    schema = f"{out_fields}, ontology string, term_id string, tier string, score double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from phenoqc_spark.ontology.normalize import normalize_series

        resolver = resolver_bc.value
        targets = ontologies or resolver.default_ontologies
        for pdf in batches:
            if normalize:
                # normalize batch-UNIQUE surface forms and map back (term
                # columns are Zipfian; the 7-pass regex chain was running
                # over every row — measured 4.04 -> 3.45 s on the 1M-page
                # linked stage).  NaN terms map to NaN, exactly as the
                # full-column normalize produced.
                uniq_terms = pdf["term"].dropna().unique()
                norm_map = pd.Series(
                    normalize_series(pd.Series(uniq_terms, dtype=object)).values,
                    index=uniq_terms,
                )
                pdf = pdf.assign(term_norm=pdf["term"].map(norm_map))
            # resolve once per batch-unique term (memoized across batches),
            # then fan out with a C-level pandas merge — no per-row Python
            uniq = pdf["term_norm"].dropna().unique()
            link_rows = []
            for t in uniq:
                if not t:
                    continue
                detailed = resolver.map_term_cached(t)
                for onto in targets:
                    res = detailed.get(onto)
                    if res is not None:
                        link_rows.append((t, onto, res[0], res[1], res[2]))
            links_pdf = pd.DataFrame(
                link_rows, columns=["term_norm", "ontology", "term_id", "tier", "score"]
            )
            out = pdf.merge(links_pdf, on="term_norm", how="inner")
            yield out[in_cols + ["ontology", "term_id", "tier", "score"]]

    return terms.mapInPandas(gen, schema)
