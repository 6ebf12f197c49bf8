"""Fluent QueryBuilder — ports querybuilder_test.rs / python examples."""


def seed(engine):
    engine.add_triples(
        [
            ("ex:alice", "ex:age", "25"),
            ("ex:alice", "ex:name", "Alice"),
            ("ex:bob", "ex:age", "17"),
            ("ex:bob", "ex:name", "Bob"),
            ("ex:carol", "ex:age", "31"),
            ("ex:carol", "ex:city", "Paris"),
        ]
    )
    return engine


def test_with_filters(engine):
    b = seed(engine).builder()
    got = b.with_predicate("ex:age").filter("o", ">", "20").get_results()
    assert sorted(got) == [("ex:alice", "ex:age", "25"), ("ex:carol", "ex:age", "31")]


def test_object_like_starting_ending(engine):
    e = seed(engine)
    assert e.builder().with_object_like("lic").get_results() == [
        ("ex:alice", "ex:name", "Alice")
    ]
    assert e.builder().with_object_starting("Par").get_results() == [
        ("ex:carol", "ex:city", "Paris")
    ]
    assert e.builder().with_object_ending("ob").get_results() == [
        ("ex:bob", "ex:name", "Bob")
    ]


def test_join_order_limit_offset(engine):
    e = seed(engine)
    named = e.builder().with_predicate("ex:name")
    ages = e.builder().with_predicate("ex:age").join_on_subject(named)
    got = ages.order_by("o", ascending=False).limit(1).get_results()
    assert got == [("ex:alice", "ex:age", "25")]  # carol has no name
    got2 = (
        e.builder().with_predicate("ex:age").order_by("o").offset(1).limit(1).get_results()
    )
    assert got2 == [("ex:alice", "ex:age", "25")]  # numeric order: 17,25,31


def test_distinct_and_count(engine):
    e = seed(engine)
    assert e.builder().with_predicate("ex:age").count() == 3
    assert e.builder().with_predicate("ex:age").distinct().count() == 3


def test_streaming_builder_rstream(engine):
    sb = (
        engine.builder()
        .with_predicate("p")
        .filter("o", ">", "10")
        .window(3, 1)
        .as_stream()
    )
    sb.add_stream_triple("a", "p", "5", 1)
    sb.add_stream_triple("b", "p", "20", 2)
    sb.add_stream_triple("c", "p", "30", 3)
    sb.add_stream_triple("d", "q", "99", 4)
    sb.add_stream_triple("e", "p", "40", 5)
    fires = sb.get_stream_results()
    assert fires  # windows fired with filtered content
    flat = {t for batch in fires for t in batch}
    assert ("a", "p", "5") not in flat       # filtered: 5 <= 10
    assert ("d", "q", "99") not in flat      # filtered: wrong predicate
    assert ("b", "p", "20") in flat


def test_streaming_builder_istream(engine):
    sb = (
        engine.builder()
        .with_predicate("p")
        .window(3, 1)
        .with_stream_operator("ISTREAM")
        .as_stream()
    )
    for i, name in enumerate(["A", "B", "C", "D"], start=1):
        sb.add_stream_triple(name, "p", str(i), i)
    fires = sb.get_stream_results()
    # ISTREAM: each triple emitted exactly once across firings
    flat = [t for batch in fires for t in batch]
    assert len(flat) == len(set(flat))


def test_asc_desc_direction_and_periodic_report(spark):
    from kolibrie_spark.builder import QueryBuilder
    from kolibrie_spark.store import QuadStore

    """py_query_builder.rs:578-611: asc()/desc() set a builder-wide sort
    direction applied to the recorded sort key at execution;
    with_periodic_report(n) is the periodic strategy plus its period."""
    store = QuadStore(spark)
    store.add_quads(
        [
            ("a", "p", "1", None),
            ("b", "p", "10", None),
            ("c", "p", "2", None),
        ]
    )
    qb = QueryBuilder(store).with_predicate("p").order_by("o")
    assert [t[2] for t in qb.get_results()] == ["1", "2", "10"]
    # desc() flips the same recorded key; numeric-else-lexical order holds
    assert [t[2] for t in qb.desc().get_results()] == ["10", "2", "1"]
    assert [t[2] for t in qb.asc().get_results()] == ["1", "2", "10"]

    sq = (
        QueryBuilder(store)
        .with_predicate("p")
        .window(10, 5)
        .with_periodic_report(3)
        .as_stream()
    )
    assert "periodic" in [s.lower() for s in sq.get_report_strategies()]
    assert sq.get_periodic_periods() == [3]
