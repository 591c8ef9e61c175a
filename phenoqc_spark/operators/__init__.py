from . import triples

__all__ = ["triples"]
