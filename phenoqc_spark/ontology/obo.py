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
OBO line format directly, and obographs JSON (the format HPO/MONDO publish
as ``hp.json``/``mondo.json``) with a pure-Python reader.  Key **insertion
order is preserved** because the fuzzy tier's tie-breaking depends on it
(SURVEY.md §7.4).

Only the term fields the reference consumes are handled — ``id``, ``name``,
``synonym``, ``alt_id``, ``xref`` — plus ``is_a`` parents (engine-side
extra feeding the subsumption-closure operator) (OBO) and their obographs twins (``lbl``,
``meta.synonyms[].val``, ``meta.basicPropertyValues`` with the
``hasAlternativeId`` predicate, ``meta.xrefs[].val``) and OWL RDF/XML
(``rdfs:label``, ``oboInOwl:has*Synonym`` / ``hasAlternativeId`` /
``hasDbXref``).
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
                    cur = {
                    "id": None, "name": None, "synonyms": [],
                    "alt_ids": [], "xrefs": [], "parents": [],
                }
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
            elif line.startswith("is_a:"):
                # "is_a: HP:0000118 ! Phenotypic abnormality" — id before '!'
                parent = line.split(":", 1)[1].split("!", 1)[0].strip()
                if parent:
                    cur["parents"].append(parent)
    if cur is not None:
        terms.append(cur)
    return terms


def _curie(iri: str) -> str:
    """obographs node id (IRI or CURIE) → CURIE: tail after the last '/' or
    '#', first '_' → ':' (``.../obo/HP_0000822`` → ``HP:0000822``)."""
    tail = iri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return tail.replace("_", ":", 1) if "_" in tail and ":" not in tail else tail


def parse_obojson_terms(path: str) -> List[dict]:
    """Parse an obographs JSON file into the same term-dict list shape as
    :func:`parse_obo_terms` (document order preserved).

    Node selection mirrors pronto's ``terms()``: CLASS nodes only (nodes
    without a ``type`` are kept — older exports omit it)."""
    import json

    with open(path, "r", encoding="utf-8") as fh:
        doc = json.load(fh)
    terms: List[dict] = []
    for graph in doc.get("graphs", []):
        # obographs encodes subsumption as graph-level edges with
        # pred "is_a" (the hp.json/mondo.json convention)
        isa: Dict[str, List[str]] = {}
        for edge in graph.get("edges", []):
            if edge.get("pred") == "is_a" and edge.get("sub") and edge.get("obj"):
                isa.setdefault(_curie(edge["sub"]), []).append(_curie(edge["obj"]))
        for node in graph.get("nodes", []):
            if node.get("type") not in (None, "CLASS"):
                continue
            nid = node.get("id")
            if not nid:
                continue
            meta = node.get("meta") or {}
            alt_ids = [
                bpv.get("val", "")
                for bpv in meta.get("basicPropertyValues", [])
                if str(bpv.get("pred", "")).endswith("hasAlternativeId")
            ]
            terms.append(
                {
                    "id": _curie(nid),
                    "name": node.get("lbl"),
                    "synonyms": [s.get("val", "") for s in meta.get("synonyms", [])],
                    "alt_ids": [a for a in alt_ids if a],
                    "xrefs": [x.get("val", "") for x in meta.get("xrefs", []) if x.get("val")],
                    "parents": isa.get(_curie(nid), []),
                }
            )
    return terms


_OWL_NS = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "oboInOwl": "http://www.geneontology.org/formats/oboInOwl#",
}


def parse_owl_terms(path: str) -> List[dict]:
    """Parse an OWL RDF/XML ontology (the format HPO/DO publish as
    ``hp.owl``) into the same term-dict list shape as
    :func:`parse_obo_terms`, document order preserved.

    Consumes only the annotation properties the reference reads through
    pronto: ``rdfs:label`` (name), ``oboInOwl:has*Synonym``,
    ``oboInOwl:hasAlternativeId``, ``oboInOwl:hasDbXref``.  Streaming
    ``iterparse`` with element eviction keeps memory flat on multi-hundred-
    MB ontologies (a driver-side concern — executors receive the built
    dicts via broadcast)."""
    import xml.etree.ElementTree as ET

    cls_tag = f"{{{_OWL_NS['owl']}}}Class"
    about_attr = f"{{{_OWL_NS['rdf']}}}about"
    label_tag = f"{{{_OWL_NS['rdfs']}}}label"
    syn_tags = {
        f"{{{_OWL_NS['oboInOwl']}}}has{k}Synonym"
        for k in ("Exact", "Related", "Narrow", "Broad")
    }
    alt_tag = f"{{{_OWL_NS['oboInOwl']}}}hasAlternativeId"
    xref_tag = f"{{{_OWL_NS['oboInOwl']}}}hasDbXref"
    subclass_tag = f"{{{_OWL_NS['rdfs']}}}subClassOf"
    resource_attr = f"{{{_OWL_NS['rdf']}}}resource"

    terms: List[dict] = []
    for event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag != cls_tag:
            continue
        iri = elem.get(about_attr)
        if iri:
            term = {
                "id": _curie(iri), "name": None, "synonyms": [],
                "alt_ids": [], "xrefs": [], "parents": [],
            }
            for child in elem:
                if child.tag == subclass_tag:
                    # named superclass only (rdf:resource); anonymous
                    # owl:Restriction subclass axioms are not is_a edges
                    parent_iri = child.get(resource_attr)
                    if parent_iri:
                        term["parents"].append(_curie(parent_iri))
                    continue
                txt = (child.text or "").strip()
                if not txt:
                    continue
                if child.tag == label_tag and term["name"] is None:
                    term["name"] = txt
                elif child.tag in syn_tags:
                    term["synonyms"].append(txt)
                elif child.tag == alt_tag:
                    term["alt_ids"].append(txt)
                elif child.tag == xref_tag:
                    term["xrefs"].append(txt)
            terms.append(term)
        elem.clear()  # evict subtree: flat memory on huge ontologies
    return terms


def _parse_terms(path: str, file_format: str | None = None) -> List[dict]:
    """Dispatch OBO / obographs-JSON / OWL parsing by declared format,
    falling back to the file extension."""
    fmt = (file_format or "").lower()
    if not fmt:
        low = path.lower()
        fmt = "json" if low.endswith(".json") else "owl" if low.endswith(".owl") else "obo"
    if fmt == "obo":
        return parse_obo_terms(path)
    if fmt == "json":
        return parse_obojson_terms(path)
    if fmt == "owl":
        return parse_owl_terms(path)
    raise NotImplementedError(
        f"unknown ontology format '{file_format}'; use OBO, obographs JSON, or OWL RDF/XML"
    )


def build_term_dict(path: str, file_format: str | None = "obo") -> Dict[str, str]:
    """Surface-form -> primary id dict, reference key order preserved.

    Mirrors mapping.py:214-271: keys are lowercased/stripped name, synonym
    descriptions, the id, alt_ids, xrefs (raw + suffix after first colon);
    then the OBO alt_id scan adds normalized alt_ids.
    """
    parsed = _parse_terms(path, file_format)
    mapping: Dict[str, str] = {}
    for term in parsed:
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
    # reference fallback scan (mapping.py:273-292): normalized alt_id -> id.
    # The reference runs this for OBO text only; applied to obographs alt
    # ids too (same keys — CURIE alt ids normalize to their lowercase form
    # already present above, so this is a no-op for typical JSON exports).
    for term in parsed:
        if term["id"]:
            for alt in term["alt_ids"]:
                mapping[normalize_text(alt)] = term["id"]
    return mapping


def build_alt_to_primary(path: str, file_format: str | None = None) -> Dict[str, str]:
    """Uppercased ``alt_id -> primary id`` map (mapping.py:294-313).

    Generalized over the reference: its ``_scan_alt_map_obo`` scans the
    file as OBO text and therefore yields {} for a JSON source; here the
    obographs ``hasAlternativeId`` entries feed the same map."""
    out: Dict[str, str] = {}
    for term in _parse_terms(path, file_format):
        if term["id"]:
            for alt in term["alt_ids"]:
                out[alt.upper()] = term["id"]
    return out


def build_sameas_edges(
    path: str, ontology_id: str, file_format: str | None = None
) -> List[Tuple[str, str, str]]:
    """(alt_or_xref, primary_id, kind) edges for graph canonicalization.

    This is the engine-side generalization (SURVEY.md §2.9 G3): alt_id and
    xref identities become same-as edges consumed by the connected-components
    canonicalizer.
    """
    edges: List[Tuple[str, str, str]] = []
    for term in _parse_terms(path, file_format):
        tid = term["id"]
        if not tid:
            continue
        for alt in term["alt_ids"]:
            edges.append((alt.upper(), tid, "alt_id"))
        for x in term["xrefs"]:
            edges.append((x.upper(), tid, "xref"))
    return edges


def build_isa_edges(
    path: str, file_format: str | None = None
) -> List[Tuple[str, str]]:
    """(child_id, parent_id) subsumption edges from the ontology's
    ``is_a`` hierarchy — OBO ``is_a:`` lines, obographs graph-level
    ``is_a`` edges, OWL named ``rdfs:subClassOf`` (anonymous restriction
    superclasses excluded).

    Feeds :func:`phenoqc_spark.operators.canonicalize.ancestor_closure`
    for subsumption rollups.  The reference reads ontologies only as flat
    surface-form dicts (mapping.py:203-271 — no hierarchy use), so this
    is an engine-side generalization: term-level QC counts rolled up to
    ancestor phenotype categories, the standard HPO reporting view."""
    edges: List[Tuple[str, str]] = []
    for term in _parse_terms(path, file_format):
        if term["id"]:
            for parent in term.get("parents", []):
                edges.append((term["id"], parent))
    return edges


def ontology_diff(spark, old_terms: List[dict], new_terms: List[dict]):
    """Release-to-release ontology diff as a DataFrame of change rows
    (term_id, change, field, old, new) — the operational answer to "what
    did this month's HPO release change under my mappings?" (the fetcher
    refreshes cached ontologies on a 30-day TTL, so version drift is a
    standing fact of a long-running pipeline; reference downloads the
    same artifacts in utils/ontology_utils.py without any drift report).

    Change kinds: ``added`` / ``removed`` (term level, field ``term``),
    ``renamed`` (field ``name``), ``synonyms`` / ``alt_ids`` / ``xrefs``
    / ``parents`` with one row PER added(+)/removed(-) element (old="-",
    new=value or vice versa) — long format so downstream impact joins
    (e.g. which changed terms appear in the current triple store) are
    plain equi-joins on term_id.

    The term lists are parsed ontology dicts (bounded dimension data —
    HPO ≈ 19k terms), so the diff itself is driver-side set arithmetic
    like every other ontology build step; the RESULT is a DataFrame for
    distributed impact analysis.  Deterministic output order
    (term_id, change, field, new).
    """
    old_by = {t["id"]: t for t in old_terms if t.get("id")}
    new_by = {t["id"]: t for t in new_terms if t.get("id")}
    rows: List[tuple] = []
    for tid in new_by.keys() - old_by.keys():
        rows.append((tid, "added", "term", "-", new_by[tid].get("name") or "-"))
    for tid in old_by.keys() - new_by.keys():
        rows.append((tid, "removed", "term", old_by[tid].get("name") or "-", "-"))
    for tid in new_by.keys() & old_by.keys():
        o, n = old_by[tid], new_by[tid]
        if (o.get("name") or "") != (n.get("name") or ""):
            rows.append((tid, "renamed", "name", o.get("name") or "-", n.get("name") or "-"))
        for field in ("synonyms", "alt_ids", "xrefs", "parents"):
            olds = set(o.get(field) or [])
            news = set(n.get(field) or [])
            for v in sorted(news - olds):
                rows.append((tid, "changed", field, "-", v))
            for v in sorted(olds - news):
                rows.append((tid, "changed", field, v, "-"))
    rows.sort()
    return spark.createDataFrame(
        rows, "term_id string, change string, field string, old string, new string"
    )
