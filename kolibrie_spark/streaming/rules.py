"""Streaming (RSP) rules — the reference's second RULE form:

    RULE :Name :-
    RSTREAM|ISTREAM|DSTREAM
    FROM NAMED WINDOW <w> ON <stream> [SLIDING n SLIDE m REPORT ... TICK ...]
    CONSTRUCT { template triples }
    WHERE { window patterns }

(reference parser.rs:3098-3199 RSP path; examples
kolibrie/examples/sparql_syntax/combination/combination_stream.rs).

The rule lowers to the equivalent RSP-QL registration — the WHERE group
wrapped in ``WINDOW <w> { ... }`` — and a consumer that instantiates the
CONSTRUCT template per emitted binding and inserts the derived triples
into the engine's store (continuous materialization). The returned
RSPEngine is fed with ``add_to_stream`` exactly like REGISTER queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from kolibrie_spark.sparql.ast import Iri, Lit, TriplePattern, Var

_PREFIX_RE = re.compile(r"PREFIX\s+([A-Za-z_][\w\-]*)?:\s*<([^<>\s]*)>", re.I)
_STREAM_OPS = ("RSTREAM", "ISTREAM", "DSTREAM")


@dataclass
class StreamingRule:
    name: str
    operator: str
    register_text: str  # the lowered RSP-QL registration
    template: list[TriplePattern] = field(default_factory=list)


def _balanced_block(text: str, start: int) -> tuple[str, int]:
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i], i + 1
    raise ValueError("unbalanced { } in streaming rule")


def parse_streaming_rule(text: str) -> StreamingRule:
    prefixes = {m.group(1) or "": m.group(2) for m in _PREFIX_RE.finditer(text)}
    header = "\n".join(
        line for line in text.splitlines() if line.strip().upper().startswith("PREFIX")
    )
    m = re.search(r"RULE\s+(\S+)\s*:-\s*", text, re.I)
    if m is None:
        raise ValueError("expected RULE :Name :- ...")
    name = m.group(1).lstrip(":")
    rest = text[m.end():]
    om = re.match(r"\s*(RSTREAM|ISTREAM|DSTREAM)\b", rest, re.I)
    operator = om.group(1).upper() if om else "RSTREAM"
    if om:
        rest = rest[om.end():]
    cm = re.search(r"\bCONSTRUCT\s*(\{)", rest, re.I)
    if cm is None:
        raise ValueError("streaming rule needs CONSTRUCT { ... }")
    window_clause = rest[: cm.start()].strip()
    construct_src, after = _balanced_block(rest, cm.start(1))
    wm = re.search(r"\bWHERE\s*(\{)", rest[after:], re.I)
    if wm is None:
        raise ValueError("streaming rule needs WHERE { ... }")
    where_src, _ = _balanced_block(rest[after:], after + wm.start(1) - after)

    # the window IRI names the WINDOW block in the lowered registration
    wim = re.search(r"FROM\s+NAMED\s+WINDOW\s+(<[^>]*>|\S+)", window_clause, re.I)
    if wim is None:
        raise ValueError("streaming rule needs FROM NAMED WINDOW <w> ON <stream> [...]")
    wiri = wim.group(1)

    from kolibrie_spark.reasoner.n3_parser import _parse_patterns

    template = _parse_patterns(construct_src, prefixes)
    register_text = (
        f"{header}\nREGISTER {operator} <urn:rule:{name}> AS SELECT * "
        f"{window_clause} "
        f"WHERE {{ WINDOW {wiri} {{ {where_src} }} }}"
    )
    return StreamingRule(
        name=name, operator=operator, register_text=register_text, template=template
    )


def _instantiate(template: list[TriplePattern], binding: dict) -> list[tuple]:
    out = []
    for pat in template:
        row = []
        for term in (pat.s, pat.p, pat.o):
            if isinstance(term, Var):
                if term.name not in binding:
                    row = None
                    break
                row.append(binding[term.name])
            elif isinstance(term, (Iri, Lit)):
                row.append(term.value)
            else:
                row = None
                break
        if row is not None:
            out.append(tuple(row))
    return out


def register_streaming_rule(engine, text: str, consumer=None, **kw):
    """Parse + register a streaming rule on a SparqlEngine: returns the
    live RSPEngine; every emission instantiates the CONSTRUCT template and
    inserts the derived triples into the engine's store (plus forwarding
    the raw binding to an optional user consumer)."""
    from kolibrie_spark.streaming.engine import RSPEngine

    rule = parse_streaming_rule(text)

    def on_row(row):
        binding = dict(row)
        derived = _instantiate(rule.template, binding)
        if derived:
            engine.add_triples(derived)
        if consumer is not None:
            consumer(row)

    return RSPEngine(
        engine.spark,
        rule.register_text,
        static_store=engine.store,
        consumer=on_row,
        **kw,
    )
