"""DOT-language export of a Reasoner's facts and rules (reference
datalog/src/reasoning/to_dot.rs:1-115).

Output shape matches the reference: a ``digraph`` whose nodes are every
subject/object term (``<id> [label="<term>"]``), one box node pair per
rule (``Rule{i}_premise`` / ``Rule{i}_conclusion`` listing the patterns),
then one labelled edge per fact and one ``premise -> conclusion`` edge
per rule.

Divergence (documented): the reference numbers nodes by dictionary-encode
order, which depends on triple insertion order; the facts DataFrame has
no insertion order, so ids here are assigned over the sorted distinct
terms — deterministic for a given fact set. Visualization collects the
facts to the driver by design; it is a small-graph debugging surface,
not a scale path.
"""

from __future__ import annotations

from kolibrie_spark.sparql.ast import Iri, Lit, QuotedTriple, TriplePattern, Var


def _term_str(term) -> str:
    """Pattern term rendering (to_dot.rs:14-25)."""
    if isinstance(term, Var):
        return term.name
    if isinstance(term, (Iri, Lit)):
        return term.value
    if isinstance(term, (QuotedTriple, TriplePattern)):
        return f"<< {_term_str(term.s)} {_term_str(term.p)} {_term_str(term.o)} >>"
    return str(term)


def _patterns_str(patterns: list[TriplePattern]) -> str:
    """``(s, p, o)`` per line (to_dot.rs:27-41)."""
    return "\n".join(
        f"({_term_str(p.s)}, {_term_str(p.p)}, {_term_str(p.o)})" for p in patterns
    )


def to_dot(reasoner) -> str:
    """Renders the reasoner as DOT (to_dot.rs:100-114): node declarations,
    rule boxes, a blank line, fact edges, rule premise→conclusion edges."""
    facts = sorted(tuple(r) for r in reasoner.facts.collect())

    terms = sorted({t[0] for t in facts} | {t[2] for t in facts})
    ids = {term: i for i, term in enumerate(terms)}

    out = ["digraph {"]
    for term in terms:
        out.append(f'{ids[term]} [label="{term}"]')
    for i, rule in enumerate(reasoner.rules):
        out.append(f'Rule{i}_premise [label="{_patterns_str(rule.premise)}", shape=box]')
        out.append(
            f'Rule{i}_conclusion [label="{_patterns_str(rule.conclusion)}", shape=box]'
        )
    out.append("")
    for s, p, o in facts:
        out.append(f'{ids[s]} -> {ids[o]} [label="{p}"]')
    for i in range(len(reasoner.rules)):
        out.append(f"Rule{i}_premise -> Rule{i}_conclusion")
    out.append("}")
    return "\n".join(out)
