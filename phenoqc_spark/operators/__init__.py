from . import (
    canonicalize,
    dedup,
    imputation,
    multimodal,
    quality,
    resume,
    similarity,
    textstats,
    triples,
    validation,
)

__all__ = [
    "canonicalize",
    "dedup",
    "imputation",
    "multimodal",
    "quality",
    "resume",
    "similarity",
    "textstats",
    "triples",
    "validation",
]
