"""Hierarchical multi-level reasoner parity tests.

Ports the reference examples verbatim:
- examples/sparql_syntax/knowledge_graph/hierarchy_reasoning.rs
  (socrates/plato mortality + soul hypothesis);
- examples/sparql_syntax/knowledge_graph/hierarchy_reasoning_advanced.rs
  (six base facts, three deductive rules, two abductive hypotheses, one
  meta-rule, certainty analysis).
Semantics under test: datalog/src/reasoning_experimental.rs:17-306.
"""

from __future__ import annotations

import pytest

from kolibrie_spark.reasoner.hierarchy import (
    LEVEL_CERTAINTY,
    HierarchicalRule,
    ReasoningHierarchy,
    ReasoningLevel,
    apply_rule_single_pass,
)
from kolibrie_spark.reasoner.rule import Rule
from kolibrie_spark.sparql.ast import Iri, TriplePattern, Var


def v(n):
    return Var(n)


def c(x):
    return Iri(x)


def tp(s, p, o):
    return TriplePattern(s, p, o)


def rule(premise, conclusion):
    return Rule(premise=premise, conclusion=conclusion)


def test_hierarchy_reasoning_example(spark):
    """examples/sparql_syntax/knowledge_graph/hierarchy_reasoning.rs:
    base facts + deductive mortality rule + abductive cross-level
    soul-hypothesis rule (deps [Deductive] only)."""
    h = ReasoningHierarchy(spark)
    h.add_fact_at_level(ReasoningLevel.BASE, "socrates", "is_a", "man")
    h.add_fact_at_level(ReasoningLevel.BASE, "plato", "is_a", "man")

    mortality = rule([tp(v("x"), c("is_a"), c("man"))], [tp(v("x"), c("is"), c("mortal"))])
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, mortality, priority=1)

    hypothesis = HierarchicalRule(
        rule=rule([tp(v("x"), c("is"), c("mortal"))], [tp(v("x"), c("might_have"), c("soul"))]),
        level=ReasoningLevel.ABDUCTIVE,
        priority=1,
        dependencies=[ReasoningLevel.DEDUCTIVE],
    )
    h.add_cross_level_rule(hypothesis)

    inferred = h.infer_collected()
    assert inferred[ReasoningLevel.DEDUCTIVE] == [
        ("plato", "is", "mortal"),
        ("socrates", "is", "mortal"),
    ]
    assert inferred[ReasoningLevel.ABDUCTIVE] == [
        ("plato", "might_have", "soul"),
        ("socrates", "might_have", "soul"),
    ]
    assert inferred[ReasoningLevel.BASE] == []
    assert inferred[ReasoningLevel.META_REASONING] == []


@pytest.fixture()
def advanced(spark):
    """The advanced example's full setup
    (hierarchy_reasoning_advanced.rs:23-63)."""
    h = ReasoningHierarchy(spark)
    for s, p, o in [
        ("socrates", "is_a", "human"),
        ("plato", "is_a", "human"),
        ("aristotle", "is_a", "human"),
        ("fluffy", "is_a", "cat"),
        ("socrates", "teaches", "plato"),
        ("plato", "teaches", "aristotle"),
    ]:
        h.add_fact_at_level(ReasoningLevel.BASE, s, p, o)

    mortality = rule(
        [tp(v("x"), c("is_a"), c("human"))], [tp(v("x"), c("is_a"), c("mortal"))]
    )
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, mortality, 1)
    transitivity = rule(
        [tp(v("x"), c("teaches"), v("y")), tp(v("y"), c("teaches"), v("z"))],
        [tp(v("x"), c("influences"), v("z"))],
    )
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, transitivity, 2)
    wisdom = rule([tp(v("x"), c("teaches"), v("y"))], [tp(v("x"), c("is_a"), c("wise"))])
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, wisdom, 3)

    soul = HierarchicalRule(
        rule=rule(
            [tp(v("x"), c("is_a"), c("wise")), tp(v("x"), c("is_a"), c("mortal"))],
            [tp(v("x"), c("might_have"), c("soul"))],
        ),
        level=ReasoningLevel.ABDUCTIVE,
        priority=1,
        dependencies=[ReasoningLevel.BASE, ReasoningLevel.DEDUCTIVE],
    )
    h.add_cross_level_rule(soul)
    memory = HierarchicalRule(
        rule=rule(
            [tp(v("x"), c("influences"), v("y"))],
            [tp(v("x"), c("might_be"), c("remembered"))],
        ),
        level=ReasoningLevel.ABDUCTIVE,
        priority=2,
        dependencies=[ReasoningLevel.BASE, ReasoningLevel.DEDUCTIVE],
    )
    h.add_cross_level_rule(memory)
    significance = HierarchicalRule(
        rule=rule(
            [
                tp(v("x"), c("might_have"), c("soul")),
                tp(v("x"), c("might_be"), c("remembered")),
            ],
            [tp(v("x"), c("is_a"), c("significant_figure"))],
        ),
        level=ReasoningLevel.META_REASONING,
        priority=1,
        dependencies=[
            ReasoningLevel.BASE,
            ReasoningLevel.DEDUCTIVE,
            ReasoningLevel.ABDUCTIVE,
        ],
    )
    h.add_cross_level_rule(significance)
    h.hierarchical_inference()
    return h


def test_advanced_levels(advanced):
    """Results-by-level of hierarchy_reasoning_advanced.rs step 6."""
    ded = [t for _, t in advanced.query_hierarchy(ReasoningLevel.DEDUCTIVE)]
    assert ded == [
        ("aristotle", "is_a", "mortal"),
        ("plato", "is_a", "mortal"),
        ("plato", "is_a", "wise"),
        ("socrates", "influences", "aristotle"),
        ("socrates", "is_a", "mortal"),
        ("socrates", "is_a", "wise"),
    ]
    abd = [t for _, t in advanced.query_hierarchy(ReasoningLevel.ABDUCTIVE)]
    assert abd == [
        ("plato", "might_have", "soul"),
        ("socrates", "might_be", "remembered"),
        ("socrates", "might_have", "soul"),
    ]
    meta = [t for _, t in advanced.query_hierarchy(ReasoningLevel.META_REASONING)]
    assert meta == [("socrates", "is_a", "significant_figure")]


def test_advanced_queries_and_certainty(advanced):
    """Step 7 queries ('who is mortal', 'significant figures') and step
    8 certainty mapping 1.0/0.9/0.6/0.4."""
    mortal = advanced.query_hierarchy(None, None, "is_a", "mortal")
    assert [(int(lvl), t[0]) for lvl, t in mortal] == [
        (1, "aristotle"),
        (1, "plato"),
        (1, "socrates"),
    ]
    sig = advanced.query_hierarchy(None, None, "is_a", "significant_figure")
    assert [(int(lvl), t[0]) for lvl, t in sig] == [(3, "socrates")]

    assert advanced.get_fact_certainty(("socrates", "teaches", "plato")) == 1.0
    assert advanced.get_fact_certainty(("socrates", "is_a", "mortal")) == 0.9
    assert advanced.get_fact_certainty(("plato", "might_have", "soul")) == 0.6
    assert advanced.get_fact_certainty(("socrates", "is_a", "significant_figure")) == 0.4
    assert advanced.get_fact_certainty(("fluffy", "is_a", "mortal")) == 0.0


def test_facts_with_certainty_dataframe(advanced):
    """Distributed certainty analysis: one row per fact, lowest level
    wins, certainty from LEVEL_CERTAINTY."""
    df = advanced.facts_with_certainty()
    rows = {(r.s, r.p, r.o): (r.level_no, r.certainty) for r in df.collect()}
    assert rows[("socrates", "teaches", "plato")] == (0, 1.0)
    assert rows[("aristotle", "is_a", "mortal")] == (1, 0.9)
    assert rows[("socrates", "might_be", "remembered")] == (2, 0.6)
    assert rows[("socrates", "is_a", "significant_figure")] == (3, 0.4)
    assert len(rows) == 6 + 6 + 3 + 1


def test_single_pass_distinct_fact_guard(spark):
    """A two-premise rule must bind two DISTINCT facts
    (reasoning_experimental.rs:185): knows(x,y) ∧ knows(y,x) → mutual
    must NOT fire on a self-loop's single fact, but must fire on a
    genuine symmetric pair."""
    facts = spark.createDataFrame(
        [("a", "knows", "a"), ("b", "knows", "d"), ("d", "knows", "b")],
        "s string, p string, o string",
    )
    r = rule(
        [tp(v("x"), c("knows"), v("y")), tp(v("y"), c("knows"), v("x"))],
        [tp(v("x"), c("mutual"), v("y"))],
    )
    got = sorted(tuple(x) for x in apply_rule_single_pass(facts, r).collect())
    assert got == [("b", "mutual", "d"), ("d", "mutual", "b")]


def test_single_pass_unsupported_arity_warns(spark):
    """Premise length >2 yields None with a warning
    (reasoning_experimental.rs:202-204)."""
    facts = spark.createDataFrame([("a", "p", "b")], "s string, p string, o string")
    r = rule(
        [tp(v("x"), c("p"), v("y"))] * 3,
        [tp(v("x"), c("q"), v("y"))],
    )
    with pytest.warns(UserWarning, match="premise length"):
        assert apply_rule_single_pass(facts, r) is None


def test_rule_order_within_level_feeds_later_rules(spark):
    """Cross-level rules apply in insertion order, re-collecting
    dependency facts before each rule, so an earlier rule's conclusions
    feed a later rule at the same level (rs:129-156)."""
    h = ReasoningHierarchy(spark)
    h.add_fact_at_level(ReasoningLevel.BASE, "x", "p", "y")
    first = rule([tp(v("a"), c("p"), v("b"))], [tp(v("a"), c("q"), v("b"))])
    second = rule([tp(v("a"), c("q"), v("b"))], [tp(v("a"), c("r"), v("b"))])
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, first, 1)
    h.add_rule_at_level(ReasoningLevel.DEDUCTIVE, second, 2)
    h.hierarchical_inference()
    ded = [t for _, t in advanced_facts(h, ReasoningLevel.DEDUCTIVE)]
    assert ("x", "q", "y") in ded and ("x", "r", "y") in ded


def advanced_facts(h, level):
    return h.query_hierarchy(level)


def test_to_dot_renders_nodes_rules_edges(spark):
    """DOT export (reference datalog/src/reasoning/to_dot.rs): node per
    subject/object term, a box pair per rule, labelled fact edges, and a
    premise->conclusion edge per rule."""
    from kolibrie_spark.reasoner import Reasoner, to_dot

    r = Reasoner(spark)
    r.add_triples([("alice", "parent", "bob"), ("bob", "parent", "carol")])
    r.add_rule(
        rule(
            [tp(v("X"), c("parent"), v("Y")), tp(v("Y"), c("parent"), v("Z"))],
            [tp(v("X"), c("grandparent"), v("Z"))],
        )
    )
    dot = to_dot(r)
    assert dot.startswith("digraph {") and dot.endswith("}")
    assert '0 [label="alice"]' in dot
    assert '1 [label="bob"]' in dot
    assert '2 [label="carol"]' in dot
    assert '0 -> 1 [label="parent"]' in dot
    assert '1 -> 2 [label="parent"]' in dot
    assert 'Rule0_premise [label="(X, parent, Y)\n(Y, parent, Z)", shape=box]' in dot
    assert 'Rule0_conclusion [label="(X, grandparent, Z)", shape=box]' in dot
    assert "Rule0_premise -> Rule0_conclusion" in dot


def test_same_triple_at_two_levels_binds_both_premises(spark):
    """ADVICE r7: the reference concatenates per-level fact lists, so the
    SAME triple held at two dependency levels occupies two indices and
    the i != j guard lets a 2-premise rule bind it twice.  The level-
    tagged union reproduces that: knows(a,a) present at Base AND
    Deductive fires knows(x,y) ∧ knows(y,x) → mutual, while the same
    triple at one level alone still must not."""
    h = ReasoningHierarchy(spark)
    h.add_fact_at_level(ReasoningLevel.BASE, "a", "knows", "a")
    h.add_fact_at_level(ReasoningLevel.DEDUCTIVE, "a", "knows", "a")
    h.add_cross_level_rule(
        HierarchicalRule(
            rule=rule(
                [tp(v("x"), c("knows"), v("y")), tp(v("y"), c("knows"), v("x"))],
                [tp(v("x"), c("mutual"), v("y"))],
            ),
            level=ReasoningLevel.META_REASONING,
            dependencies=[ReasoningLevel.BASE, ReasoningLevel.DEDUCTIVE],
        )
    )
    inferred = h.infer_collected()
    assert inferred[ReasoningLevel.META_REASONING] == [("a", "mutual", "a")]

    # control: one level only -> single index, the guard blocks the bind
    h2 = ReasoningHierarchy(spark)
    h2.add_fact_at_level(ReasoningLevel.BASE, "a", "knows", "a")
    h2.add_cross_level_rule(
        HierarchicalRule(
            rule=rule(
                [tp(v("x"), c("knows"), v("y")), tp(v("y"), c("knows"), v("x"))],
                [tp(v("x"), c("mutual"), v("y"))],
            ),
            level=ReasoningLevel.META_REASONING,
            dependencies=[ReasoningLevel.BASE, ReasoningLevel.DEDUCTIVE],
        )
    )
    assert h2.infer_collected()[ReasoningLevel.META_REASONING] == []


def test_inlevel_fixpoint_skip_paths(spark):
    """r12 empty-seed skip: the in-level fixpoint must still run when a
    level's facts were ASSIGNED directly (a transformed frame, not the
    pristine seed and not a LocalRelation), and must stay a no-op — via
    the take(1) fallback — when the assigned frame is filtered to empty
    at runtime in a way the optimizer cannot prove."""
    from pyspark.sql import functions as F

    closure = rule([tp(v("x"), c("p"), v("y"))], [tp(v("x"), c("q"), v("y"))])

    # (a) directly-assigned non-empty transformed facts: fixpoint fires
    h = ReasoningHierarchy(spark)
    src = spark.createDataFrame(
        [("a", "p", "b"), ("zz", "skip", "zz")], "s string, p string, o string"
    )
    h.levels[ReasoningLevel.BASE].facts = src.filter(F.col("p") != "skip")
    h.levels[ReasoningLevel.BASE].add_rule(closure)
    inferred = h.infer_collected()
    assert ("a", "q", "b") in inferred[ReasoningLevel.BASE]

    # (b) runtime-empty (filter no optimizer can fold): no inference, no error
    h2 = ReasoningHierarchy(spark)
    h2.levels[ReasoningLevel.BASE].facts = src.filter(F.length("s") > 10)
    h2.levels[ReasoningLevel.BASE].add_rule(closure)
    assert h2.infer_collected()[ReasoningLevel.BASE] == []

    # (c) never-seeded level with a rule: skipped entirely, still correct
    h3 = ReasoningHierarchy(spark)
    h3.levels[ReasoningLevel.DEDUCTIVE].add_rule(closure)
    assert h3.infer_collected()[ReasoningLevel.DEDUCTIVE] == []
