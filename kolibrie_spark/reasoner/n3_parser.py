"""N3-logic rule parser (reference datalog/src/parser_n3_logic.rs):
``@prefix`` declarations plus rules of the form

    { ?x :parent ?y . ?y :parent ?z . } => { ?x :grandparent ?z . } .

Extensions the reference's combined grammar supports (parser.rs:286-292):
``NOT { ... }`` atoms inside the premise (negation-as-failure) and
``FILTER(?v op value)`` conditions.
"""

from __future__ import annotations

import re

from kolibrie_spark.reasoner.rule import FilterCondition, Rule
from kolibrie_spark.schema import RDF_TYPE
from kolibrie_spark.sparql.ast import Iri, Lit, TriplePattern, Var

_PREFIX_RE = re.compile(
    r"@prefix\s+([A-Za-z_][\w\-]*)?:\s*<([^<>\s]*)>\s*\.", re.IGNORECASE
)
_RULE_RE = re.compile(r"\{(.*?)\}\s*=>\s*\{(.*?)\}\s*\.", re.S)
_NOT_RE = re.compile(r"NOT\s*\{(.*?)\}", re.S)
_FILTER_RE = re.compile(r"FILTER\s*\(\s*\?(\w+)\s*(=|!=|<=|>=|<|>)\s*([^)]+?)\s*\)")
# whole FILTER(...) clause (no nested parens) and one comparison inside it
_FILTER_CLAUSE_RE = re.compile(r"FILTER\s*\(([^()]*)\)", re.I)
_CMP_RE = re.compile(r"\?(\w+)\s*(!=|<=|>=|=|<|>)\s*(.+?)\s*$")


def parse_filter_clauses(src: str):
    """Extract every ``FILTER (...)`` clause from a rule body, supporting
    the reference grammar's ``&&`` (separate conjunctive conditions) and
    ``||`` (one disjunction group, FilterCondition.or_group) combinators
    — parser.rs:3430-3480 lowers the same shapes.  Mixing && and || inside
    one FILTER raises (the reference's lowering silently drops such
    filters; rejecting loudly is safer).  Returns (filters, body-without-
    filter-clauses)."""
    from kolibrie_spark.reasoner.rule import FilterCondition

    filters: list[FilterCondition] = []
    group = 0

    def one(body: str, or_group: int | None) -> None:
        m = _CMP_RE.match(body.strip())
        if m is None:
            raise ValueError(f"unsupported FILTER condition: {body!r}")
        filters.append(
            FilterCondition(
                m.group(1), m.group(2), m.group(3).strip().strip('"'), or_group
            )
        )

    def grab(m: "re.Match") -> str:
        nonlocal group
        body = m.group(1)
        if "||" in body and "&&" in body:
            raise ValueError(f"mixed &&/|| in one FILTER is not supported: {body!r}")
        if "||" in body:
            group += 1
            for part in body.split("||"):
                one(part, group)
        else:
            for part in body.split("&&"):
                one(part, None)
        return " "

    stripped = _FILTER_CLAUSE_RE.sub(grab, src)
    return filters, stripped
# Term tokens plus a '.' statement terminator. PNAME locals and bare names
# may contain *internal* dots (the normal RDF case, e.g. <http://ex.org/p>
# or ex:v1.2) but never end with one, so a trailing '.' always lexes as the
# statement terminator rather than part of the term.
_TERM_RE = re.compile(
    r"""\?(?P<var>\w+)
      | <(?P<iri>[^<>\s]*)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"
      | (?P<pname>(?:[A-Za-z_][\w\-]*)?:[\w\-/%#]*(?:\.[\w\-/%#]+)*)
      | (?P<name>[A-Za-z_]\w*(?:\.\w+)*)
      | (?P<num>[+-]?\d+(?:\.\d+)?)
      | (?P<dot>\.)
      | (?P<semi>;)
      | (?P<comma>,)
    """,
    re.VERBOSE,
)


def _term_of(m: "re.Match", prefixes: dict[str, str]):
    if m.group("var") is not None:
        return Var(m.group("var"))
    if m.group("iri") is not None:
        return Iri(m.group("iri"))
    if m.group("lit") is not None:
        return Lit(m.group("lit"))
    if m.group("pname") is not None:
        pname = m.group("pname")
        pfx, _, local = pname.partition(":")
        if pfx in prefixes:
            return Iri(prefixes[pfx] + local)
        # undeclared prefix: keep the prefixed name verbatim, as the
        # reference's expand_prefix does (parser_n3_logic.rs:206-221)
        return Iri(pname)
    if m.group("name") is not None:
        return Iri(RDF_TYPE) if m.group("name") == "a" else Iri(m.group("name"))
    return Lit(m.group("num"))


def _parse_patterns(body: str, prefixes: dict[str, str]) -> list[TriplePattern]:
    """Tokenize the body; '.' is a statement terminator only between terms
    (IRIs/pnames/decimals keep their internal dots).  Turtle predicate
    lists are supported as the reference's rule grammar accepts them in
    CONSTRUCT/WHERE templates (examples/.../multiple_conclusions.rs:58-64):
    ';' keeps the subject, ',' keeps subject and predicate."""
    pats: list[TriplePattern] = []
    terms: list = []
    kept = 0  # how many of the current terms came from a ';'/',' keep

    def flush(keep: int) -> None:
        nonlocal kept
        if not terms and keep == 0:
            return  # stray terminator (e.g. trailing '.' after a ';' list)
        if len(terms) == kept == 1:
            # nothing added since a ';' keep: trailing ';' before '.'
            # ('ex:s ex:p ex:o ; .') and doubled ';;' are legal Turtle —
            # the lone kept-subject is a leftover of the predicate-list
            # keep, not a malformed statement
            if keep == 0:
                del terms[:]
                kept = 0
            return
        if len(terms) != 3:
            raise ValueError(
                f"bad N3 statement (need 3 terms, got {len(terms)}): {body!r}"
            )
        pats.append(TriplePattern(*terms))
        del terms[keep:]
        kept = keep

    for m in _TERM_RE.finditer(body):
        if m.group("dot") is not None:
            flush(0)
        elif m.group("semi") is not None:
            flush(1)  # next: predicate object
        elif m.group("comma") is not None:
            flush(2)  # next: object
        else:
            terms.append(_term_of(m, prefixes))
    if len(terms) > 1 or (terms and kept == 0):
        flush(0)
    elif len(terms) == 1:  # lone kept-subject after '... ;' at end-of-body
        del terms[:]
    return pats


def parse_n3_rules(text: str) -> list[Rule]:
    prefixes = {m.group(1) or "": m.group(2) for m in _PREFIX_RE.finditer(text)}
    body = _PREFIX_RE.sub("", text)
    rules = []
    for m in _RULE_RE.finditer(body):
        premise_src, conclusion_src = m.group(1), m.group(2)
        negs: list[TriplePattern] = []

        def grab_not(nm, _negs=negs, _prefixes=prefixes):
            _negs.extend(_parse_patterns(nm.group(1), _prefixes))
            return " "

        premise_src = _NOT_RE.sub(grab_not, premise_src)
        filters, premise_src = parse_filter_clauses(premise_src)
        rules.append(
            Rule(
                premise=_parse_patterns(premise_src, prefixes),
                conclusion=_parse_patterns(conclusion_src, prefixes),
                negative_premise=negs,
                filters=filters,
            )
        )
    return rules
