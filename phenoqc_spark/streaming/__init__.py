from .pipeline import stream_triples

__all__ = ["stream_triples"]
