"""Port of kolibrie/examples/sparql_syntax/knowledge_graph/
combined_rules_example.rs (social trust network) and datalog_example.rs
(parent/ancestor): interleaved classical and provenance inference —
classical round 1 (connected closure), AddMult-semiring provenance round
(indirectTrust, strongBond), classical round 2 over the provenance
outputs (trustCommunity) — with exact fact counts and tag values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kolibrie_spark.reasoner import Reasoner, Rule
from kolibrie_spark.reasoner.fixpoint import ADD_MULT, TAGGED_SCHEMA
from kolibrie_spark.sparql.ast import Iri, TriplePattern, Var


def V(n):
    return Var(n)


def I(v):  # noqa: E743
    return Iri(v)


def P(s, p, o):
    return TriplePattern(s, p, o)


def two_hop(pred_in: str, pred_out: str) -> Rule:
    return Rule(
        premise=[P(V("x"), I(pred_in), V("y")), P(V("y"), I(pred_in), V("z"))],
        conclusion=[P(V("x"), I(pred_out), V("z"))],
    )


KNOWS = [
    ("Alice", "knows", "Bob"),
    ("Alice", "knows", "Charlie"),
    ("Bob", "knows", "Diana"),
    ("Bob", "knows", "Eve"),
    ("Charlie", "knows", "Frank"),
    ("Diana", "knows", "Eve"),
    ("Eve", "knows", "Frank"),
    ("Frank", "knows", "Alice"),
]
TRUSTS = [
    ("Alice", "trusts", "Bob", 0.90),
    ("Alice", "trusts", "Charlie", 0.70),
    ("Bob", "trusts", "Diana", 0.80),
    ("Bob", "trusts", "Eve", 0.60),
    ("Charlie", "trusts", "Frank", 0.75),
    ("Diana", "trusts", "Eve", 0.85),
    ("Eve", "trusts", "Frank", 0.65),
]


def test_datalog_example_ancestor(spark):
    """datalog_example.rs: parent chain + (parent→ancestor, parent∘ancestor
    →ancestor); ancestors of David are exactly the three uphill people."""
    r = Reasoner(spark)
    r.add_triples(
        [("Alice", "parent", "Bob"), ("Bob", "parent", "Charlie"),
         ("Charlie", "parent", "David")]
    )
    r.add_rule(
        Rule(premise=[P(V("x"), I("parent"), V("y"))],
             conclusion=[P(V("x"), I("ancestor"), V("y"))])
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("parent"), V("y")),
                     P(V("y"), I("ancestor"), V("z"))],
            conclusion=[P(V("x"), I("ancestor"), V("z"))],
        )
    )
    out = r.materialize()
    anc = {
        row.s
        for row in out.filter(
            (F.col("p") == "ancestor") & (F.col("o") == "David")
        ).collect()
    }
    assert anc == {"Alice", "Bob", "Charlie"}


def test_combined_rules_social_trust(spark):
    # --- Stage 2: classical round 1 — knows two-hop + connected closure
    r = Reasoner(spark)
    r.add_triples(KNOWS)
    r.add_rule(two_hop("knows", "connected"))
    r.add_rule(two_hop("connected", "connected"))
    out1 = r.materialize()
    connected = {
        (row.s, row.o)
        for row in out1.filter(F.col("p") == "connected").collect()
    }
    # the knows cycle closes `connected` to the complete 6x6 relation
    people = {"Alice", "Bob", "Charlie", "Diana", "Eve", "Frank"}
    assert connected == {(a, b) for a in people for b in people}

    # --- Stage 3: provenance round (AddMult ⊗ multiply / ⊕ clamped add):
    # certain facts carry tag 1.0, trusts carry their probabilities
    certain = [(s, p, o, 1.0) for (s, p, o) in KNOWS] + [
        (s, "connected", o, 1.0) for (s, o) in connected
    ]
    tagged = spark.createDataFrame(certain + list(TRUSTS), TAGGED_SCHEMA)
    rp = Reasoner(spark)
    rp.add_rule(two_hop("trusts", "indirectTrust"))  # rule 4
    rp.add_rule(  # rule 5: connected(X,Z) ∧ trusts(X,Z) → strongBond(X,Z)
        Rule(
            premise=[P(V("x"), I("connected"), V("z")),
                     P(V("x"), I("trusts"), V("z"))],
            conclusion=[P(V("x"), I("strongBond"), V("z"))],
        )
    )
    out2 = rp.materialize_with_provenance(tagged, ADD_MULT)
    indirect = {
        (row.s, row.o): row.tag
        for row in out2.filter(F.col("p") == "indirectTrust").collect()
    }
    assert indirect == pytest.approx(
        {
            ("Alice", "Diana"): 0.90 * 0.80,
            ("Alice", "Eve"): 0.90 * 0.60,
            ("Alice", "Frank"): 0.70 * 0.75,
            ("Bob", "Eve"): 0.80 * 0.85,
            ("Bob", "Frank"): 0.60 * 0.65,
            ("Diana", "Frank"): 0.85 * 0.65,
        }
    )
    strong = {
        (row.s, row.o): row.tag
        for row in out2.filter(F.col("p") == "strongBond").collect()
    }
    # connected is complete, so every trusts edge becomes a strongBond at
    # its own probability (1.0 ⊗ p)
    assert strong == pytest.approx(
        {(s, o): t for (s, _, o, t) in TRUSTS}
    )

    # --- Stage 4: classical round 2 over the provenance outputs
    r2 = Reasoner(spark)
    r2.add_triples([(s, "strongBond", o) for (s, o) in strong])
    r2.add_rule(two_hop("strongBond", "trustCommunity"))
    out3 = r2.materialize()
    community = {
        (row.s, row.o)
        for row in out3.filter(F.col("p") == "trustCommunity").collect()
    }
    assert community == {
        ("Alice", "Diana"),
        ("Alice", "Eve"),
        ("Alice", "Frank"),
        ("Bob", "Eve"),
        ("Bob", "Frank"),
        ("Diana", "Frank"),
    }
