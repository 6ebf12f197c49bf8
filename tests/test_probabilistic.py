"""Probabilistic layer: lineage, exact WMC, certified top-k lower bounds
(reference hybrid.rs / hybrid_materialisation.rs scenarios)."""

import pytest

from kolibrie_spark.reasoner.probabilistic import HybridEvaluator, union_probability
from kolibrie_spark.reasoner.rule import Rule
from kolibrie_spark.sparql.ast import Iri, TriplePattern, Var


def V(n):
    return Var(n)


def I(v):  # noqa: E743
    return Iri(v)


def P(s, p, o):
    return TriplePattern(s, p, o)


TRANS = Rule(
    premise=[P(V("x"), I("rel"), V("y")), P(V("y"), I("rel"), V("z"))],
    conclusion=[P(V("x"), I("rel"), V("z"))],
)


def test_single_chain_product():
    ev = HybridEvaluator(
        seeds={("A", "rel", "B"): 0.8, ("B", "rel", "C"): 0.7}, rules=[TRANS]
    )
    ev.materialize()
    assert ev.probability(("A", "rel", "C")) == pytest.approx(0.56)


def test_diamond_exact_handles_shared_seeds():
    """A->B->D and A->C->D share no seeds: exact = inclusion-exclusion,
    matching the reference's noisy-OR for independent paths."""
    seeds = {
        ("A", "rel", "B"): 0.6,
        ("A", "rel", "C"): 0.9,
        ("B", "rel", "D"): 0.8,
        ("C", "rel", "D"): 0.5,
    }
    ev = HybridEvaluator(seeds, [TRANS])
    ev.materialize()
    # P(p1 ∨ p2) with independent paths = 0.48 + 0.45 - 0.48*0.45 = 0.714
    assert ev.probability(("A", "rel", "D")) == pytest.approx(0.714)


def test_correlated_paths_not_double_counted():
    """Two derivations sharing a seed: exact WMC must NOT treat them as
    independent (this is what separates WMC from noisy-OR)."""
    seeds = {
        ("A", "rel", "B"): 0.5,
        ("B", "rel", "C"): 1.0,
        ("B", "rel", "D"): 1.0,
        ("C", "rel", "E"): 1.0,
        # A->B->C->E and A->B->(D)->... both pass through A->B
    }
    rules = [TRANS]
    ev = HybridEvaluator(seeds, rules)
    ev.materialize()
    # A rel E derivable via (A->B, B->C, C->E) in two associativity orders;
    # all derivations share the 0.5 seed => probability exactly 0.5
    assert ev.probability(("A", "rel", "E")) == pytest.approx(0.5)


def test_topk_lower_bound_converges():
    seeds = {
        ("A", "rel", "B"): 0.6,
        ("A", "rel", "C"): 0.9,
        ("B", "rel", "D"): 0.8,
        ("C", "rel", "D"): 0.5,
    }
    ev = HybridEvaluator(seeds, [TRANS])
    ev.materialize()
    exact = ev.probability(("A", "rel", "D"))
    k1 = ev.topk_lower_bound(("A", "rel", "D"), k=1)
    k2 = ev.topk_lower_bound(("A", "rel", "D"), k=2)
    assert k1 == pytest.approx(0.48)  # best single path
    assert k1 <= k2 <= exact + 1e-12
    assert k2 == pytest.approx(exact)  # both paths covered


def test_deterministic_facts_are_certain():
    ev = HybridEvaluator(
        seeds={("A", "rel", "B"): 0.8},
        rules=[TRANS],
        deterministic_facts={("B", "rel", "C")},
    )
    ev.materialize()
    assert ev.probability(("B", "rel", "C")) == 1.0
    assert ev.probability(("A", "rel", "C")) == pytest.approx(0.8)


def test_union_probability_enumeration_cap():
    paths = [frozenset({(f"s{i}", "p", "o")}) for i in range(30)]
    seeds = {(f"s{i}", "p", "o"): 0.5 for i in range(30)}
    with pytest.raises(ValueError, match="capped at 25"):
        union_probability(paths, seeds)


def test_absent_fact_probability_zero():
    ev = HybridEvaluator(seeds={("A", "rel", "B"): 0.8}, rules=[TRANS])
    ev.materialize()
    assert ev.probability(("X", "rel", "Y")) == 0.0


def test_engine_hybrid_integration(engine):
    """Seeds on the engine + rules -> probabilities through the facade."""
    engine.add_prob_seed("A", "rel", "B", 0.8)
    engine.add_prob_seed("B", "rel", "C", 0.7)
    engine.add_triples([("C", "rel", "D")])  # deterministic link
    engine.rules.append(TRANS)
    ev = engine.hybrid_evaluator()
    assert ev.probability(("A", "rel", "C")) == pytest.approx(0.56)
    # chain through a certain fact: p(A rel D) = p(A rel C) * 1.0
    assert ev.probability(("A", "rel", "D")) == pytest.approx(0.56)
