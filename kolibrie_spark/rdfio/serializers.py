"""Serializers: N-Triples-star, N-Quads, Turtle-star, RDF/XML
(reference sparql_database.rs:457-628).

The store keeps terms lexically (no type tags — the reference's dictionary
does the same), so serialization re-derives term kinds heuristically:
``_:`` prefix = blank node, ``qt:`` prefix = quoted triple (expanded
recursively), a URI-scheme shape = IRI, anything else = literal. Round-trip
(parse → serialize → parse) preserves the quad set for data produced by our
parsers.
"""

from __future__ import annotations

import re
from xml.sax.saxutils import escape as xml_escape

from kolibrie_spark.schema import QT_PREFIX

_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S*$")


def _is_iri(term: str) -> bool:
    if term.startswith("_:") or term.startswith(QT_PREFIX):
        return False
    return bool(_IRI_RE.match(term)) and " " not in term


# raw control chars and the exotic line separators (\x1c-\x1e, NEL,
# U+2028/29) are LEGAL inside N-Triples literals, but Python's
# str.splitlines() — and many line-oriented consumers — split on them;
# emit them as \uXXXX so serialized output survives any line-based reader
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x85\u2028\u2029]")


def _escape_literal(value: str) -> str:
    out = value.replace("\\", "\\\\").replace('"', '\\"')
    out = out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    return _CTRL_RE.sub(lambda m: f"\\u{ord(m.group()):04X}", out)


_LANG_RE = re.compile(r"^(.*)@([A-Za-z][A-Za-z0-9\-]*)$", re.S)


def term_to_text(term: str, quoted_map: dict[str, tuple[str, str, str]]) -> str:
    """Lexical store term → serialized token."""
    if term.startswith(QT_PREFIX) and term in quoted_map:
        s, p, o = quoted_map[term]
        return (
            f"<< {term_to_text(s, quoted_map)} {term_to_text(p, quoted_map)} "
            f"{term_to_text(o, quoted_map)} >>"
        )
    if term.startswith("_:"):
        return term
    if _is_iri(term):
        return f"<{term}>"
    m = _LANG_RE.match(term)
    if m and not m.group(1).endswith("\\"):
        return f'"{_escape_literal(m.group(1))}"@{m.group(2)}'
    return f'"{_escape_literal(term)}"'


def _quoted_map(quoted_rows) -> dict[str, tuple[str, str, str]]:
    return {qid: (s, p, o) for (qid, s, p, o) in quoted_rows}


def serialize_ntriples(triples, quoted_rows=()) -> str:
    qm = _quoted_map(quoted_rows)
    lines = [
        f"{term_to_text(s, qm)} {term_to_text(p, qm)} {term_to_text(o, qm)} ."
        for (s, p, o) in triples
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def serialize_nquads(quads, quoted_rows=()) -> str:
    qm = _quoted_map(quoted_rows)
    lines = []
    for (s, p, o, g) in quads:
        base = f"{term_to_text(s, qm)} {term_to_text(p, qm)} {term_to_text(o, qm)}"
        if g is not None:
            base += f" {term_to_text(g, qm)}"
        lines.append(base + " .")
    return "\n".join(lines) + ("\n" if lines else "")


def serialize_turtle(triples, quoted_rows=(), prefixes: dict[str, str] | None = None) -> str:
    """Groups by subject with ';' predicate continuation (the reference's
    grouped Turtle shape, sparql_database.rs:560-628)."""
    qm = _quoted_map(quoted_rows)
    out = []
    for pfx, iri in (prefixes or {}).items():
        out.append(f"@prefix {pfx}: <{iri}> .")
    by_subject: dict[str, list[tuple[str, str]]] = {}
    order: list[str] = []
    for (s, p, o) in triples:
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append((p, o))
    for s in order:
        parts = [
            f"{term_to_text(p, qm)} {term_to_text(o, qm)}" for (p, o) in by_subject[s]
        ]
        out.append(f"{term_to_text(s, qm)} " + " ;\n    ".join(parts) + " .")
    return "\n".join(out) + ("\n" if out else "")


# longest IRI suffix that is a valid XML NCName (letter/underscore start,
# then word chars plus '.' and '-') — the property ELEMENT name
_NCNAME_SUFFIX = re.compile(r"[^\W\d][\w.\-]*\Z")


def _split_predicate(p: str) -> tuple[str, str]:
    """(namespace, local) for a predicate IRI.  A '#'/'/' split alone can
    yield a digit-leading local name ('…/0'), which is not a legal XML
    element name — the emitted document would be malformed.  RDF/XML
    simply cannot express such predicates (a real writer like rdflib
    raises too), so raise a clear error instead of writing invalid XML."""
    m = _NCNAME_SUFFIX.search(p)
    if m and m.start() > 0:
        return p[: m.start()], m.group()
    if m:  # the whole term is a bare name — give it a synthetic namespace
        return "urn:p:", p
    raise ValueError(
        f"predicate {p!r} has no XML-NCName suffix and cannot be "
        "serialized as RDF/XML; use ntriples/turtle for this graph"
    )


# XML 1.0 Char excludes C0 controls other than TAB/LF/CR, the
# noncharacters U+FFFE/U+FFFF, and surrogate code points (which only occur
# unpaired in Python str) — a document containing any of them raw OR as
# charrefs is malformed, so there is no legal way to round-trip such a
# term through RDF/XML at all (ADVICE r8: the C0-only pattern let
# ￾/￿/surrogates through)
_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff\ufffe\uffff]"
)


def _check_xml_chars(value: str, what: str) -> str:
    m = _XML_ILLEGAL.search(value)
    if m:
        raise ValueError(
            f"{what} contains XML-1.0-illegal character "
            f"{m.group()!r} and cannot be serialized as RDF/XML; "
            "use ntriples/turtle for this graph"
        )
    return value


def _xml_text(value: str) -> str:
    _check_xml_chars(value, "literal")
    # &#13;: XML line-end normalization folds a raw \r to \n on parse
    # (XML 1.0 §2.11)
    return xml_escape(value, {chr(13): "&#13;"})


def _xml_attr(value: str, what: str) -> str:
    """Attribute values (rdf:about/rdf:resource IRIs, xmlns namespaces) go
    through the same XML-1.0 character screen as element text (ADVICE r8:
    they previously serialized illegal characters silently)."""
    _check_xml_chars(value, what)
    return xml_escape(value, {chr(34): "&quot;"})


def serialize_rdfxml(triples, quoted_rows=()) -> str:
    """rdf:Description subset (IRI objects → rdf:resource, literals → text).
    Quoted-triple terms are not representable in this subset and are
    serialized as their surrogate ids (the reference's RDF/XML writer skips
    RDF-star too)."""
    by_subject: dict[str, list[tuple[str, str]]] = {}
    order: list[str] = []
    for (s, p, o) in triples:
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append((p, o))
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">',
    ]
    for s in order:
        lines.append(f'  <rdf:Description rdf:about="{_xml_attr(s, "subject IRI")}">')
        for i, (p, o) in enumerate(by_subject[s]):
            ns, local = _split_predicate(p)
            if _is_iri(o):
                lines.append(
                    f'    <x{i}:{local} xmlns:x{i}="{_xml_attr(ns, "predicate namespace")}" '
                    f'rdf:resource="{_xml_attr(o, "object IRI")}"/>'
                )
            else:
                lines.append(
                    f'    <x{i}:{local} xmlns:x{i}="{_xml_attr(ns, "predicate namespace")}">'
                    f'{_xml_text(o)}</x{i}:{local}>'
                )
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines) + "\n"
