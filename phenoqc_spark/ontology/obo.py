"""Minimal OBO parser producing the reference's term dictionary shape.

The reference parses ontologies with pronto and builds, per ontology, a flat
``{normalized-surface-form -> primary term id}`` dict whose keys are, per
term and *in this order*: name, synonyms, the id itself (lowercased),
alt_ids, xrefs raw, xref suffix-after-colon (reference:
src/phenoqc/mapping.py:203-271).  It additionally scans the OBO text for
``alt_id -> primary id`` (uppercased keys) into a separate map
(mapping.py:294-313) and augments the main dict with normalized alt_ids
(mapping.py:273-292).

pronto is not available in this runtime, so we parse the (public, simple)
OBO line format directly.  Key **insertion order is preserved** because the
fuzzy tier's tie-breaking depends on it (SURVEY.md §7.4).

Only the OBO stanza tags the reference consumes are handled: ``id``,
``name``, ``synonym``, ``alt_id``, ``xref``.  OWL/JSON sources raise
NotImplementedError (pronto-only in the reference; out of sandbox scope).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .normalize import normalize_text

_SYNONYM_RE = re.compile(r'^synonym:\s*"(.*)"')


def parse_obo_terms(path: str) -> List[dict]:
    """Parse an OBO file into a list of term dicts (document order)."""
    terms: List[dict] = []
    cur: dict | None = None
    with open(path, "r", encoding="utf-8") as fh:
        in_term = False
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line.startswith("["):
                if cur is not None:
                    terms.append(cur)
                    cur = None
                in_term = line == "[Term]"
                if in_term:
                    cur = {"id": None, "name": None, "synonyms": [], "alt_ids": [], "xrefs": []}
                continue
            if not in_term or cur is None:
                continue
            if line.startswith("id:"):
                cur["id"] = line.split(":", 1)[1].strip()
            elif line.startswith("name:"):
                cur["name"] = line.split(":", 1)[1].strip()
            elif line.startswith("synonym:"):
                m = _SYNONYM_RE.match(line)
                if m:
                    cur["synonyms"].append(m.group(1))
            elif line.startswith("alt_id:"):
                cur["alt_ids"].append(line.split(":", 1)[1].strip())
            elif line.startswith("xref:"):
                cur["xrefs"].append(line.split(":", 1)[1].strip())
    if cur is not None:
        terms.append(cur)
    return terms


def build_term_dict(path: str, file_format: str | None = "obo") -> Dict[str, str]:
    """Surface-form -> primary id dict, reference key order preserved.

    Mirrors mapping.py:214-271: keys are lowercased/stripped name, synonym
    descriptions, the id, alt_ids, xrefs (raw + suffix after first colon);
    then the OBO alt_id scan adds normalized alt_ids.
    """
    fmt = (file_format or "").lower()
    if not fmt and path.lower().endswith(".obo"):
        fmt = "obo"
    if fmt not in ("", "obo"):
        raise NotImplementedError(
            f"ontology format '{file_format}' needs pronto (unavailable); use OBO"
        )
    mapping: Dict[str, str] = {}
    for term in parse_obo_terms(path):
        term_id = term["id"]
        if not term_id:
            continue
        keys = [(term["name"] or "").lower().strip()]
        keys += [s.lower().strip() for s in term["synonyms"]]
        keys.append(term_id.lower().strip())
        keys += [a.lower().strip() for a in term["alt_ids"]]
        raw_xrefs = [x.lower().strip() for x in term["xrefs"]]
        keys += raw_xrefs
        for rx in raw_xrefs:
            parts = rx.split(":", 1)
            if len(parts) == 2 and parts[1]:
                keys.append(parts[1])
        for k in keys:
            if k:
                mapping[k] = term_id
    # reference fallback scan (mapping.py:273-292): normalized alt_id -> id
    for term in parse_obo_terms(path):
        if term["id"]:
            for alt in term["alt_ids"]:
                mapping[normalize_text(alt)] = term["id"]
    return mapping


def build_alt_to_primary(path: str) -> Dict[str, str]:
    """Uppercased ``alt_id -> primary id`` map (mapping.py:294-313)."""
    out: Dict[str, str] = {}
    for term in parse_obo_terms(path):
        if term["id"]:
            for alt in term["alt_ids"]:
                out[alt.upper()] = term["id"]
    return out


def build_sameas_edges(path: str, ontology_id: str) -> List[Tuple[str, str, str]]:
    """(alt_or_xref, primary_id, kind) edges for graph canonicalization.

    This is the engine-side generalization (SURVEY.md §2.9 G3): alt_id and
    xref identities become same-as edges consumed by the connected-components
    canonicalizer.
    """
    edges: List[Tuple[str, str, str]] = []
    for term in parse_obo_terms(path):
        tid = term["id"]
        if not tid:
            continue
        for alt in term["alt_ids"]:
            edges.append((alt.upper(), tid, "alt_id"))
        for x in term["xrefs"]:
            edges.append((x.upper(), tid, "xref"))
    return edges
