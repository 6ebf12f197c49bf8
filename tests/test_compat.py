"""Reference Python-bindings compatibility layer: the four scripts under
/root/reference/python/examples must run against kolibrie_spark.compat
with `import kolibrie` swapped for the compat module (the stated goal —
a reference user can switch engines and run what they run today)."""

import sys

import pytest


@pytest.fixture()
def kolibrie(spark):
    import kolibrie_spark.compat as compat

    sys.modules.setdefault("kolibrie", compat)
    yield compat


def test_kolibrie_usage_example(kolibrie, spark):
    """python/examples/kolibrie_usage.py body."""
    db = kolibrie.SparqlDatabase(spark)
    db.add_triple("http://example.org/Alice", "http://example.org/knows", "http://example.org/Bob")
    db.add_triple("http://example.org/Bob", "http://example.org/knows", "http://example.org/Carol")
    db.add_triple("http://example.org/Alice", "http://example.org/likes", "http://example.org/IceCream")
    qb = db.query().with_subject("http://example.org/Alice").distinct().limit(20)
    triples = qb.get_decoded_triples()
    assert sorted(triples) == [
        ("http://example.org/Alice", "http://example.org/knows", "http://example.org/Bob"),
        ("http://example.org/Alice", "http://example.org/likes", "http://example.org/IceCream"),
    ]
    assert set(qb.get_subjects()) == {"http://example.org/Alice"}
    assert sorted(qb.get_predicates()) == [
        "http://example.org/knows", "http://example.org/likes",
    ]
    assert qb.count() == 2
    assert set(qb.group_by_predicate()) == {
        "http://example.org/knows", "http://example.org/likes",
    }


def test_knowledge_graph_example(kolibrie, spark):
    """python/examples/test_kg.py body: integer-interned constants via
    encode_term, two-premise rule, inferred grandparent."""
    graph = kolibrie.KnowledgeGraph(spark)
    graph.add_abox_triple("Alice", "hasParent", "Bob")
    graph.add_abox_triple("Bob", "hasParent", "Charlie")
    hp = graph.encode_term("hasParent")
    hg = graph.encode_term("hasGrandparent")
    assert graph.query_abox() == [
        ("Alice", "hasParent", "Bob"), ("Bob", "hasParent", "Charlie"),
    ]
    rule = kolibrie.Rule(
        premise=[
            kolibrie.TriplePattern(
                kolibrie.Term.Variable("X"), kolibrie.Term.Constant(hp),
                kolibrie.Term.Variable("Y"),
            ),
            kolibrie.TriplePattern(
                kolibrie.Term.Variable("Y"), kolibrie.Term.Constant(hp),
                kolibrie.Term.Variable("Z"),
            ),
        ],
        filters=[],
        conclusion=[
            kolibrie.TriplePattern(
                kolibrie.Term.Variable("X"), kolibrie.Term.Constant(hg),
                kolibrie.Term.Variable("Z"),
            )
        ],
    )
    graph.add_rule(rule)
    assert graph.infer_new_facts() == [("Alice", "hasGrandparent", "Charlie")]


def test_contradictions_example(kolibrie, spark):
    """python/examples/contradictions.py body: constraint violation means
    no isA binding holds under IAR (every repair drops one of the two)."""
    kg = kolibrie.KnowledgeGraph(spark)
    kg.add_abox_triple("john", "isA", "professor")
    kg.add_abox_triple("john", "isA", "student")
    kg.add_abox_triple("john", "teaches", "math101")
    T, V, C = kolibrie.TriplePattern, kolibrie.Term.Variable, kolibrie.Term.Constant
    kg.add_constraint(
        kolibrie.Rule(
            premise=[
                T(subject=V("X"), predicate=C(kg.encode_term("isA")),
                  object=C(kg.encode_term("professor"))),
                T(subject=V("X"), predicate=C(kg.encode_term("isA")),
                  object=C(kg.encode_term("student"))),
            ],
            filters=[],
            conclusion=[T(subject=C(0), predicate=C(0), object=C(0))],
        )
    )
    assert kg.query_with_repairs(
        T(subject=V("S"), predicate=C(kg.encode_term("isA")), object=V("O"))
    ) == []
    # an uncontested fact survives every repair
    got = kg.query_with_repairs(
        T(subject=V("S"), predicate=C(kg.encode_term("teaches")), object=V("O"))
    )
    assert [(b["S"], b["O"]) for b in got] == [("john", "math101")]


def test_windowing_example(kolibrie, spark):
    """python/examples/test_windowing.py body: fluent streaming builder
    with RSTREAM and a predicate filter."""
    db = kolibrie.SparqlDatabase(spark)
    sq = (
        db.query().window(10, 2).with_predicate("knows")
        .with_stream_operator(kolibrie.StreamOperator.RSTREAM).as_stream()
    )
    sq.add_stream_triple("Alice", "knows", "Bob", 1)
    sq.add_stream_triple("Bob", "knows", "Charlie", 2)
    sq.add_stream_triple("Alice", "likes", "Pizza", 3)
    results = sq.get_stream_results()
    assert results, "at least one window fired"
    for batch in results:
        assert all(p == "knows" for (_, p, _) in batch)  # filter applied
    sq.stop_stream()  # flush remaining windows
    assert len(sq.get_all_stream_results()) >= len(results)
    sq.clear_stream_results()
    assert sq.get_stream_results() == []


def test_streaming_config_accessors(kolibrie, spark):
    """ADVICE r6 / py_query_builder.rs:408-439: reference scripts read
    the streaming config back off the query object — is_streaming,
    get_window_config, get_stream_operator, get_report_strategies,
    get_periodic_periods, get_tick_strategy — and the Tick enum is part
    of the module surface with the reference's member spelling."""
    db = kolibrie.SparqlDatabase(spark)
    sq = (
        db.query()
        .window(10, 2)
        .with_report_strategy("OnWindowClose")
        .with_report_strategy("periodic", 4)
        .with_tick_strategy(kolibrie.Tick.TimeDriven)
        .with_stream_operator(kolibrie.StreamOperator.ISTREAM)
        .as_stream()
    )
    assert sq.is_streaming() is True
    assert sq.get_window_config() == (10, 2)
    assert sq.get_stream_operator() == "ISTREAM"
    assert sq.get_report_strategies() == ["OnWindowClose", "Periodic"]
    assert sq.get_periodic_periods() == [4]
    assert sq.get_tick_strategy() is kolibrie.Tick.TimeDriven

    # subject filters exist on the fluent builder (exact / like /
    # starting / ending), reference py_query_builder.rs:59-136
    qb = db.query()
    for m in (
        "with_subject", "with_subject_like", "with_subject_starting",
        "with_subject_ending", "with_predicate_like", "with_object_ending",
    ):
        qb = getattr(qb, m)("x")
