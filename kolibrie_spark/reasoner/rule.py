"""Rule model (reference shared/src/rule.rs:14-60).

Terms reuse the SPARQL AST (Var / Iri / Lit); a pattern is a TriplePattern.
``negative_premise`` holds NOT atoms for single-stratum negation-as-failure;
rule safety requires every negated variable to be positively bound
(rule.rs:39-57).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kolibrie_spark.sparql.ast import Term, TriplePattern, Var


@dataclass
class FilterCondition:
    variable: str
    operator: str  # = != < <= > >=
    value: str
    # Disjunction-group id: conditions sharing a non-None or_group came from
    # one ``FILTER (a || b || ...)`` and are OR'ed together; None means a
    # plain conjunct.  The reference lowers OR branches to "OR:"-prefixed
    # operators (parser.rs:3444-3476) that its datalog evaluator then skips
    # entirely (rules.rs:133-163, no OR: arm) — we evaluate the disjunction
    # with the SPARQL numeric-else-lexical semantics instead.
    or_group: int | None = None


@dataclass
class Rule:
    premise: list[TriplePattern]
    conclusion: list[TriplePattern]
    negative_premise: list[TriplePattern] = field(default_factory=list)
    filters: list[FilterCondition] = field(default_factory=list)
    # optional PROB(...) annotation (reasoner.hybrid.ProbAnnotation);
    # reference CombinedRule carries the same (shared/src/query.rs:292-299)
    prob: object | None = None


def pattern_variables(pat: TriplePattern):
    for t in (pat.s, pat.p, pat.o):
        if isinstance(t, Var):
            yield t.name


def check_rule_safety(rule: Rule) -> None:
    """Raises ValueError on the first unsafe negated variable."""
    bound = {v for p in rule.premise for v in pattern_variables(p)}
    for pat in rule.negative_premise:
        for var in pattern_variables(pat):
            if var not in bound:
                raise ValueError(
                    f"unsafe negation: variable '{var}' in NOT body is not "
                    "bound by any positive premise"
                )
