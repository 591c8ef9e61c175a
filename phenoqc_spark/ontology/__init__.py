from .normalize import normalize_text, normalize_series
from .obo import (
    build_alt_to_primary,
    build_sameas_edges,
    build_term_dict,
    parse_obo_terms,
)
from .mapper import PREFIX_ALIASES, TermResolver
from . import fuzzy

__all__ = [
    "normalize_text",
    "normalize_series",
    "build_term_dict",
    "build_alt_to_primary",
    "build_sameas_edges",
    "parse_obo_terms",
    "TermResolver",
    "PREFIX_ALIASES",
    "fuzzy",
]
