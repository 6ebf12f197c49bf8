"""Port of kolibrie/examples/sparql_syntax/knowledge_graph/
knowledge_graph_test_scenarios.rs — the three scripted Reasoner scenarios
(cycle + transitivity + symmetry; a rule chain over one instance; the
transitivity chain benchmark), with exact inferred-fact counts, plus a
cross-check of scenario 3 against the path-doubling closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from kolibrie_spark.reasoner import Reasoner, Rule, transitive_closure
from kolibrie_spark.sparql.ast import Iri, TriplePattern, Var

LIKES = Iri("likes")
TRANSITIVITY = Rule(
    premise=[
        TriplePattern(Var("x"), LIKES, Var("y")),
        TriplePattern(Var("y"), LIKES, Var("z")),
    ],
    conclusion=[TriplePattern(Var("x"), LIKES, Var("z"))],
)
SYMMETRY = Rule(
    premise=[TriplePattern(Var("x"), LIKES, Var("y"))],
    conclusion=[TriplePattern(Var("y"), LIKES, Var("x"))],
)


def test_scenario1_cycle_transitivity_symmetry(spark):
    """test1 (knowledge_graph_test_scenarios.rs:18-103): a 5-person likes
    cycle under transitivity + symmetry saturates to the complete relation
    — person0 likes all 5 people (including itself via the cycle)."""
    r = Reasoner(spark)
    r.add_triples(
        [(f"person{i}", "likes", f"person{(i + 1) % 5}") for i in range(5)]
    )
    r.add_rule(TRANSITIVITY)
    r.add_rule(SYMMETRY)
    out = r.materialize()
    assert out.count() == 25  # complete 5x5 relation
    liked_by_0 = {
        row.o for row in out.filter(F.col("s") == "person0").select("o").collect()
    }
    assert liked_by_0 == {f"person{i}" for i in range(5)}


def test_scenario2_rule_chain_over_one_instance(spark):
    """test2 (knowledge_graph_test_scenarios.rs:105-169): five rules
    type(X, Class_i) → type(X, Class_{i+1}) over one instance of Class0
    derive exactly the five next classes."""
    r = Reasoner(spark)
    r.add_triples([("myInstance", "type", "Class0")])
    for i in range(5):
        r.add_rule(
            Rule(
                premise=[TriplePattern(Var("x"), Iri("type"), Iri(f"Class{i}"))],
                conclusion=[
                    TriplePattern(Var("x"), Iri("type"), Iri(f"Class{i + 1}"))
                ],
            )
        )
    out = r.materialize()
    types = {row.o for row in out.select("o").collect()}
    assert types == {f"Class{i}" for i in range(6)}


def test_scenario3_transitivity_chain_counts(spark):
    """transitivity_benchmark (knowledge_graph_test_scenarios.rs:171-223):
    an N-link likes chain closes to N·(N+1)/2 pairs; the semi-naive rule
    fixpoint and the path-doubling closure must agree exactly."""
    n = 12
    chain = [(f"person{i}", "likes", f"person{i + 1}") for i in range(n)]
    r = Reasoner(spark)
    r.add_triples(chain)
    r.add_rule(TRANSITIVITY)
    out = r.materialize(max_iter=n + 2)
    assert out.count() == n * (n + 1) // 2

    edges = spark.createDataFrame(chain, ["s", "p", "o"]).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    closure = transitive_closure(edges)
    assert closure.count() == n * (n + 1) // 2
    fix = {(row.s, row.o) for row in out.collect()}
    dbl = {(row.src, row.dst) for row in closure.collect()}
    assert fix == dbl
