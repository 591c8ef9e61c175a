from .pipeline import (
    sessionized_page_counts,
    stream_dedup_docs,
    stream_source_counters,
    stream_triples,
)

__all__ = [
    "sessionized_page_counts",
    "stream_dedup_docs",
    "stream_source_counters",
    "stream_triples",
]
