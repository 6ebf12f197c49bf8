"""Reasoner — ports datalog/tests/reasoning_tests.rs scenarios: forward
chaining fixpoints, negation, provenance semirings, backward chaining."""

import pytest

from kolibrie_spark.reasoner import Reasoner, Rule, parse_n3_rules
from kolibrie_spark.reasoner.fixpoint import ADD_MULT, MIN_MAX, TAGGED_SCHEMA
from kolibrie_spark.reasoner.rule import FilterCondition, check_rule_safety
from kolibrie_spark.sparql.ast import Iri, TriplePattern, Var


def V(n):
    return Var(n)


def I(v):  # noqa: E743
    return Iri(v)


def P(s, p, o):
    return TriplePattern(s, p, o)


@pytest.fixture()
def reasoner(spark):
    return Reasoner(spark)


def test_fc_2hop_transitive(reasoner):
    """fc_2hop_transitive: parent chain + transitive ancestor rule."""
    reasoner.add_triples(
        [("A", "parent", "B"), ("B", "parent", "C"), ("C", "parent", "D")]
    )
    reasoner.add_rule(
        Rule(
            premise=[P(V("x"), I("parent"), V("y"))],
            conclusion=[P(V("x"), I("ancestor"), V("y"))],
        )
    )
    reasoner.add_rule(
        Rule(
            premise=[P(V("x"), I("ancestor"), V("y")), P(V("y"), I("ancestor"), V("z"))],
            conclusion=[P(V("x"), I("ancestor"), V("z"))],
        )
    )
    reasoner.materialize()
    assert reasoner.infer("A", "ancestor", "D")  # 3-hop closure
    assert reasoner.infer("A", "ancestor", "B")
    assert not reasoner.infer("D", "ancestor", "A")  # fc_no_spurious


def test_fc_join_sibling(reasoner):
    """fc_join_sibling: two premises joined on the parent variable."""
    reasoner.add_triples(
        [("B", "parent", "A"), ("C", "parent", "A"), ("D", "parent", "X")]
    )
    reasoner.add_rule(
        Rule(
            premise=[P(V("c1"), I("parent"), V("p")), P(V("c2"), I("parent"), V("p"))],
            conclusion=[P(V("c1"), I("sibling"), V("c2"))],
        )
    )
    reasoner.materialize()
    assert reasoner.infer("B", "sibling", "C")
    assert reasoner.infer("B", "sibling", "B")  # reflexive (no ?c1 != ?c2 filter)
    assert not reasoner.infer("B", "sibling", "D")


def test_fc_filter_condition(reasoner):
    """Overheating-style rule with a numeric filter (reference
    examples/sparql_syntax/combination/combination.rs:51-60)."""
    reasoner.add_triples(
        [("s1", "temp", "85"), ("s2", "temp", "40"), ("s3", "temp", "95")]
    )
    reasoner.add_rule(
        Rule(
            premise=[P(V("s"), I("temp"), V("t"))],
            filters=[FilterCondition("t", ">", "80")],
            conclusion=[P(V("s"), I("status"), I("overheating"))],
        )
    )
    reasoner.materialize()
    assert reasoner.infer("s1", "status", "overheating")
    assert reasoner.infer("s3", "status", "overheating")
    assert not reasoner.infer("s2", "status", "overheating")


def test_negation_as_failure(reasoner):
    reasoner.add_triples(
        [("A", "person", "t"), ("B", "person", "t"), ("B", "banned", "t")]
    )
    reasoner.add_rule(
        Rule(
            premise=[P(V("x"), I("person"), I("t"))],
            negative_premise=[P(V("x"), I("banned"), I("t"))],
            conclusion=[P(V("x"), I("allowed"), I("t"))],
        )
    )
    reasoner.materialize()
    assert reasoner.infer("A", "allowed", "t")
    assert not reasoner.infer("B", "allowed", "t")


def test_unsafe_negation_rejected():
    with pytest.raises(ValueError, match="unsafe negation"):
        check_rule_safety(
            Rule(
                premise=[P(V("x"), I("p"), V("y"))],
                negative_premise=[P(V("z"), I("q"), V("x"))],
                conclusion=[P(V("x"), I("r"), V("y"))],
            )
        )


def test_naive_equals_semi_naive(spark):
    facts = [("A", "parent", "B"), ("B", "parent", "C"), ("C", "parent", "D")]
    rules = [
        Rule(
            premise=[P(V("x"), I("parent"), V("y"))],
            conclusion=[P(V("x"), I("anc"), V("y"))],
        ),
        Rule(
            premise=[P(V("x"), I("anc"), V("y")), P(V("y"), I("anc"), V("z"))],
            conclusion=[P(V("x"), I("anc"), V("z"))],
        ),
    ]
    r1, r2 = Reasoner(spark), Reasoner(spark)
    for r in (r1, r2):
        r.add_triples(facts)
        for rule in rules:
            r.add_rule(rule)
    naive = {tuple(x) for x in r1.materialize_naive().collect()}
    semi = {tuple(x) for x in r2.materialize().collect()}
    assert naive == semi and len(naive) == 9  # 3 base + 6 ancestor


def test_prov_addmult_combination(spark):
    """prov_transitive_addmult_combination: 0.8 * 0.7 = 0.56."""
    r = Reasoner(spark)
    tagged = spark.createDataFrame(
        [("A", "related", "B", 0.8), ("B", "related", "C", 0.7)], TAGGED_SCHEMA
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("related"), V("y")), P(V("y"), I("related"), V("z"))],
            conclusion=[P(V("x"), I("related"), V("z"))],
        )
    )
    out = r.materialize_with_provenance(tagged, ADD_MULT)
    tag = {(x.s, x.o): x.tag for x in out.collect()}
    assert tag[("A", "C")] == pytest.approx(0.56, abs=1e-6)


def test_prov_addmult_multiple_paths(spark):
    """prov_addmult_multiple_paths: noisy-OR(0.48, 0.45) ≈ 0.714."""
    r = Reasoner(spark)
    tagged = spark.createDataFrame(
        [
            ("A", "related", "B", 0.6),
            ("A", "related", "C", 0.9),
            ("B", "related", "D", 0.8),
            ("C", "related", "D", 0.5),
        ],
        TAGGED_SCHEMA,
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("related"), V("y")), P(V("y"), I("related"), V("z"))],
            conclusion=[P(V("x"), I("related"), V("z"))],
        )
    )
    out = r.materialize_with_provenance(tagged, ADD_MULT)
    tag = {(x.s, x.o): x.tag for x in out.collect()}
    assert tag[("A", "D")] == pytest.approx(0.714, abs=1e-6)


def test_prov_minmax(spark):
    """prov_minmax_conjunction + multiple_paths: ⊗=min, ⊕=max."""
    r = Reasoner(spark)
    tagged = spark.createDataFrame(
        [
            ("A", "related", "B", 0.6),
            ("A", "related", "C", 0.9),
            ("B", "related", "D", 0.8),
            ("C", "related", "D", 0.5),
        ],
        TAGGED_SCHEMA,
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("related"), V("y")), P(V("y"), I("related"), V("z"))],
            conclusion=[P(V("x"), I("related"), V("z"))],
        )
    )
    out = r.materialize_with_provenance(tagged, MIN_MAX)
    tag = {(x.s, x.o): x.tag for x in out.collect()}
    assert tag[("A", "D")] == pytest.approx(0.6, abs=1e-6)


def test_constraints_detect_contradiction(spark):
    """professor ∧ student → violation (python/examples/contradictions.py)."""
    r = Reasoner(spark)
    r.add_triples(
        [
            ("alice", "role", "professor"),
            ("alice", "role", "student"),
            ("bob", "role", "student"),
        ]
    )
    r.add_constraint(
        Rule(
            premise=[
                P(V("x"), I("role"), I("professor")),
                P(V("x"), I("role"), I("student")),
            ],
            conclusion=[P(V("x"), I("violates"), I("role-exclusivity"))],
        )
    )
    v = r.check_constraints().collect()
    assert [(x.s, x.o) for x in v] == [("alice", "role-exclusivity")]


def test_backward_chaining(spark):
    """bc_2hop_transitive: goal-directed ancestor resolution."""
    r = Reasoner(spark)
    r.add_triples([("A", "parent", "B"), ("B", "parent", "C")])
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("parent"), V("y"))],
            conclusion=[P(V("x"), I("anc"), V("y"))],
        )
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("parent"), V("y")), P(V("y"), I("anc"), V("z"))],
            conclusion=[P(V("x"), I("anc"), V("z"))],
        )
    )
    results = r.backward_chain(P(I("A"), I("anc"), V("who")))
    assert {b["who"] for b in results} == {"B", "C"}
    # bc_no_spurious_negative
    assert r.backward_chain(P(I("C"), I("anc"), V("who"))) == []


def test_n3_rules_parse_and_run(spark):
    rules = parse_n3_rules(
        """
        @prefix fam: <http://family/> .
        { ?x fam:parent ?y . ?y fam:parent ?z . } => { ?x fam:grandparent ?z . } .
        { ?x fam:parent ?y . NOT { ?x fam:dead "true" . } } => { ?x fam:guardian ?y . } .
        """
    )
    assert len(rules) == 2
    assert rules[1].negative_premise
    r = Reasoner(spark)
    r.add_triples(
        [
            ("A", "http://family/parent", "B"),
            ("B", "http://family/parent", "C"),
            ("A", "http://family/dead", "true"),
        ]
    )
    for rule in rules:
        r.add_rule(rule)
    r.materialize()
    assert r.infer("A", "http://family/grandparent", "C")
    assert r.infer("B", "http://family/guardian", "C")
    assert not r.infer("A", "http://family/guardian", "B")  # dead => no guardian


def test_n3_rules_undeclared_prefix_kept_verbatim():
    """An undeclared prefix is NOT expanded to the empty namespace — the
    prefixed name survives verbatim, matching the reference's
    expand_prefix fallback (parser_n3_logic.rs:206-221)."""
    rules = parse_n3_rules(
        """
        @prefix ex: <http://ex.org/> .
        { ?x ssn:observes ?y . } => { ?x ex:sees ?y . } .
        """
    )
    assert len(rules) == 1
    assert rules[0].premise[0].p == I("ssn:observes")  # verbatim, not "observes"
    assert rules[0].conclusion[0].p == I("http://ex.org/sees")


def test_engine_rule_grammar_and_materialize(engine):
    """RULE :- CONSTRUCT/WHERE registration through the engine facade."""
    engine.add_triples(
        [("ex:a", "ex:parent", "ex:b"), ("ex:b", "ex:parent", "ex:c")]
    )
    engine.register_rule(
        "RULE :Grandparent :- CONSTRUCT { ?x <ex:grandparent> ?z } "
        "WHERE { ?x <ex:parent> ?y . ?y <ex:parent> ?z }"
    )
    added = engine.materialize()
    assert added == 1
    assert engine.execute(
        "SELECT ?z WHERE { <ex:a> <ex:grandparent> ?z }"
    ) == [["ex:c"]]
    # idempotent re-materialization
    assert engine.materialize() == 0


def test_prov_addmult_certain_path_saturates(spark):
    """A derivation tagged 1.0 must saturate noisy-OR to exactly 1.0 —
    log(1-1.0) is NULL and sum() skips NULLs, which silently dropped the
    certain derivation before the saturation guard (ADVICE r1)."""
    r = Reasoner(spark)
    tagged = spark.createDataFrame(
        [
            ("A", "related", "B", 1.0),
            ("B", "related", "D", 1.0),  # certain path: 1.0 ⊗ 1.0
            ("A", "related", "C", 0.9),
            ("C", "related", "D", 0.5),  # second path: 0.45
        ],
        TAGGED_SCHEMA,
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("related"), V("y")), P(V("y"), I("related"), V("z"))],
            conclusion=[P(V("x"), I("related"), V("z"))],
        )
    )
    out = r.materialize_with_provenance(tagged, ADD_MULT)
    tag = {(x.s, x.o): x.tag for x in out.collect()}
    assert tag[("A", "D")] == 1.0  # not NULL, not 0.45


def test_n3_rules_dotted_iris_and_decimals(spark):
    """IRIs with dots (the normal RDF case) and decimal literals must not be
    split mid-term by the statement terminator (ADVICE r1)."""
    rules = parse_n3_rules(
        """
        @prefix ex: <http://ex.org/> .
        { ?x <http://ex.org/parent> ?y . ?y ex:parent ?z . } => { ?x ex:grandparent ?z . } .
        { ?x ex:score 1.5 . } => { ?x ex:high "yes" . } .
        """
    )
    assert len(rules) == 2
    assert len(rules[0].premise) == 2 and len(rules[0].conclusion) == 1
    r = Reasoner(spark)
    r.add_triples(
        [
            ("A", "http://ex.org/parent", "B"),
            ("B", "http://ex.org/parent", "C"),
            ("A", "http://ex.org/score", "1.5"),
        ]
    )
    for rule in rules:
        r.add_rule(rule)
    r.materialize()
    assert r.infer("A", "http://ex.org/grandparent", "C")
    assert r.infer("A", "http://ex.org/high", "yes")


def test_query_abox_bound_positions(spark):
    r = Reasoner(spark)
    r.add_triples([("A", "p", "B"), ("A", "q", "C"), ("B", "p", "C")])
    assert r.query_abox(s="A") == [("A", "p", "B"), ("A", "q", "C")]
    assert r.query_abox(p="p") == [("A", "p", "B"), ("B", "p", "C")]
    assert r.query_abox(s="A", p="p", o="B") == [("A", "p", "B")]
    assert r.query_abox(o="missing") == []


def test_query_with_repairs_iar_semantics(spark):
    """IAR: only answers that survive EVERY minimal repair (reference
    reasoning/repairs.rs). professor ∧ student conflict on X: neither role
    fact survives all repairs; Y's single role does."""
    r = Reasoner(spark)
    r.add_triples(
        [
            ("X", "role", "professor"),
            ("X", "role", "student"),
            ("Y", "role", "professor"),
        ]
    )
    r.add_constraint(
        Rule(
            premise=[
                P(V("x"), I("role"), I("professor")),
                P(V("x"), I("role"), I("student")),
            ],
            conclusion=[P(V("x"), I("violates"), I("exclusivity"))],
        )
    )
    got = r.query_with_repairs(P(V("who"), I("role"), I("professor")))
    assert got == [{"who": "Y"}]
    # consistent store: plain query behavior
    r2 = Reasoner(spark)
    r2.add_triples([("Y", "role", "professor")])
    assert r2.query_with_repairs(P(V("who"), I("role"), I("professor"))) == [
        {"who": "Y"}
    ]


def test_builder_subject_predicate_filters(engine):
    engine.add_triples(
        [
            ("urn:a1", "urn:name", "x"),
            ("urn:b2", "urn:name", "y"),
            ("urn:a1", "other:tag", "z"),
        ]
    )
    mk = engine.builder
    assert mk().with_subject_starting("urn:a").with_predicate_like("name").count() == 1
    assert mk().with_subject_ending("2").count() == 1
    assert mk().with_predicate_starting("other").count() == 1
    assert mk().with_subject_like("a1").count() == 2
    assert mk().with_predicate_ending("tag").count() == 1


def test_materialize_with_repairs_skips_violating_derivations(spark):
    """semi_naive_with_repairs.rs scenario: an inconsistent base is
    repaired first; derived facts that would re-introduce a violation are
    refused while safe derivations proceed."""
    r = Reasoner(spark)
    r.add_triples(
        [
            ("X", "teaches", "algebra"),
            ("X", "role", "student"),
            ("Y", "teaches", "logic"),
        ]
    )
    r.add_rule(
        Rule(
            premise=[P(V("x"), I("teaches"), V("c"))],
            conclusion=[P(V("x"), I("role"), I("professor"))],
        )
    )
    r.add_constraint(
        Rule(
            premise=[
                P(V("x"), I("role"), I("professor")),
                P(V("x"), I("role"), I("student")),
            ],
            conclusion=[P(V("x"), I("violates"), I("exclusivity"))],
        )
    )
    out = {tuple(row) for row in r.materialize_with_repairs().collect()}
    assert ("Y", "role", "professor") in out  # safe derivation lands
    assert ("X", "role", "professor") not in out  # would violate → refused
    assert r.check_constraints().isEmpty()


def test_materialize_with_repairs_repairs_inconsistent_base(spark):
    r = Reasoner(spark)
    r.add_triples(
        [
            ("X", "role", "professor"),
            ("X", "role", "student"),
            ("X", "employed", "yes"),
        ]
    )
    r.add_constraint(
        Rule(
            premise=[
                P(V("x"), I("role"), I("professor")),
                P(V("x"), I("role"), I("student")),
            ],
            conclusion=[P(V("x"), I("violates"), I("exclusivity"))],
        )
    )
    out = {tuple(row) for row in r.materialize_with_repairs().collect()}
    # one of the two conflicting roles was removed (largest repair = 1
    # removal), the unrelated fact survives
    assert ("X", "employed", "yes") in out
    assert sum(1 for f in out if f[1] == "role") == 1
    assert r.check_constraints().isEmpty()


def test_premise_edge_cases_const_varpred_repeated(reasoner):
    """Ports the reference's 0.2.0 rule-premise bug fixes (changes.txt
    111-113): a constant subject/object premise must NOT match every
    same-predicate triple; a variable-predicate premise must derive; a
    repeated-variable premise rel(V, V) must only match s == o."""
    reasoner.add_triples(
        [
            ("a", "knows", "b"),
            ("b", "knows", "b"),
            ("c", "likes", "c"),
            ("a", "likes", "b"),
        ]
    )
    # 111: constant subject
    reasoner.add_rule(
        Rule(
            premise=[P(I("a"), I("knows"), V("y"))],
            conclusion=[P(V("y"), I("knownByA"), I("a"))],
        )
    )
    # 112: variable predicate
    reasoner.add_rule(
        Rule(
            premise=[P(I("a"), V("p"), V("y"))],
            conclusion=[P(I("a"), I("relatedTo"), V("y"))],
        )
    )
    # 113: repeated variable
    reasoner.add_rule(
        Rule(
            premise=[P(V("x"), I("knows"), V("x"))],
            conclusion=[P(V("x"), I("selfKnown"), V("x"))],
        )
    )
    facts = reasoner.materialize()
    got = {(r.s, r.p, r.o) for r in facts.collect()}
    assert {(s, p, o) for (s, p, o) in got if p == "knownByA"} == {("b", "knownByA", "a")}
    assert {(s, p, o) for (s, p, o) in got if p == "relatedTo"} == {
        ("a", "relatedTo", "b")  # via knows AND likes: one fact
    }
    assert {(s, p, o) for (s, p, o) in got if p == "selfKnown"} == {("b", "selfKnown", "b")}


def test_rule_filter_conjunction_and_disjunction(spark):
    """FILTER (a && b) = separate conjuncts; FILTER (a || b) = one
    disjunction group — SPARQL semantics (the reference lowers OR to
    'OR:'-prefixed conditions its datalog evaluator then skips,
    parser.rs:3444-3476 / rules.rs:133-163; we evaluate them)."""
    rules = parse_n3_rules(
        """
        { ?x ex:speed ?s . ?x ex:count ?c . FILTER(?s < 20 && ?c > 100) }
          => { ?x ex:congested "yes" . } .
        { ?x ex:weather ?w . FILTER(?w = "rain" || ?w = "fog") }
          => { ?x ex:badWeather "yes" . } .
        """
    )
    assert [f.or_group for f in rules[0].filters] == [None, None]
    g = rules[1].filters[0].or_group
    assert g is not None and [f.or_group for f in rules[1].filters] == [g, g]

    r = Reasoner(spark)
    r.add_triples(
        [
            ("roadA", "ex:speed", "15"), ("roadA", "ex:count", "200"),
            ("roadB", "ex:speed", "15"), ("roadB", "ex:count", "50"),
            ("roadC", "ex:speed", "45"), ("roadC", "ex:count", "200"),
            ("roadA", "ex:weather", "rain"),
            ("roadB", "ex:weather", "clear"),
            ("roadC", "ex:weather", "fog"),
        ]
    )
    for rule in rules:
        r.add_rule(rule)
    r.materialize()
    assert r.infer("roadA", "ex:congested", "yes")
    assert not r.infer("roadB", "ex:congested", "yes")  # count fails
    assert not r.infer("roadC", "ex:congested", "yes")  # speed fails
    assert r.infer("roadA", "ex:badWeather", "yes")
    assert not r.infer("roadB", "ex:badWeather", "yes")
    assert r.infer("roadC", "ex:badWeather", "yes")


def test_n3_trailing_semicolon_before_dot():
    """ADVICE r7: 'ex:s ex:p ex:o ; .' is legal Turtle — the lone
    kept-subject left by the trailing ';' is dropped, not an error;
    doubled ';;' likewise. Both mid-body and at end-of-body."""
    rules = parse_n3_rules(
        "@prefix ex: <http://ex.org/> .\n"
        "{ ?x ex:p ?y ; . ?y ex:q ?z ;; ex:r ?w ; } => { ?x ex:s ?z ; . } ."
    )
    assert len(rules) == 1
    pats = rules[0].premise
    assert [p.p.value for p in pats] == [
        "http://ex.org/p",
        "http://ex.org/q",
        "http://ex.org/r",
    ]
    assert len(rules[0].conclusion) == 1


def test_n3_lone_term_still_rejected():
    """A genuinely malformed single-term statement (no ';' keep) still
    raises."""
    import pytest

    with pytest.raises(ValueError, match="need 3 terms"):
        parse_n3_rules(
            "@prefix ex: <http://ex.org/> .\n"
            "{ ex:orphan . ?x ex:p ?y } => { ?x ex:q ?y } ."
        )
