"""Structured-Streaming variant of the triple factory.

The reference is a batch pipeline (its "streaming" is pandas chunk
iteration — SURVEY.md §2.11), and linking is stateless map-side work, so
the same extract→parse→link composition runs unchanged as a streaming
query: ``readStream`` over a pages source → per-micro-batch linking with
the broadcast resolver → ``writeStream`` (append).

Because the vocabulary ``distinct`` is a global aggregate, the streaming
path links per micro-batch via ``foreachBatch`` — each batch's distinct
terms are resolved against the broadcast dictionaries exactly like the
reference's per-chunk ``unique()`` (batch_processing.py:594).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import triples as T
from ..pipeline import extract_records


def stream_triples(
    spark: SparkSession,
    pages_stream: DataFrame,
    resolver,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """pages readStream → triples parquet appends with checkpointing.

    Returns the StreamingQuery.  ``trigger_once`` processes all available
    input then stops (the batch-equivalent semantics used in tests).
    """
    resolver_bc = spark.sparkContext.broadcast(resolver)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        records = extract_records(batch_df)
        terms = T.terms_long(records)
        links = T.resolve_vocab(terms, resolver_bc)
        trip = T.triples(T.link_terms(terms, links))
        trip.write.mode("append").parquet(output_path)

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
