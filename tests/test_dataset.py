"""Named graph / dataset semantics — ports named_graph_test.rs,
sparql_graph_test.rs and sparql_dataset_regressions_test.rs scenarios."""

from tests.conftest import rows


def seed(engine):
    engine.add_triples(
        [
            ("ex:a", "ex:p", "1"),               # default graph
            ("ex:a", "ex:p", "2", "ex:g1"),
            ("ex:b", "ex:p", "3", "ex:g1"),
            ("ex:a", "ex:p", "2", "ex:g2"),      # duplicated across graphs
            ("ex:c", "ex:q", "4", "ex:g2"),
        ]
    )
    engine.store.register_graphs(["ex:empty"])   # empty graph with identity
    return engine


def test_default_graph_excludes_named(engine):
    e = seed(engine)
    assert e.execute("SELECT ?o WHERE { ?s <ex:p> ?o }") == [["1"]]


def test_graph_fixed(engine):
    e = seed(engine)
    got = rows(e.query("SELECT ?s ?o WHERE { GRAPH <ex:g1> { ?s <ex:p> ?o } }"))
    assert got == [("ex:a", "2"), ("ex:b", "3")]


def test_graph_variable_binds_graph(engine):
    e = seed(engine)
    got = rows(e.query("SELECT ?g ?s WHERE { GRAPH ?g { ?s <ex:p> ?o } }"))
    assert got == [("ex:g1", "ex:a"), ("ex:g1", "ex:b"), ("ex:g2", "ex:a")]


def test_graph_variable_includes_empty_graphs(engine):
    e = seed(engine)
    got = rows(e.query("SELECT ?g WHERE { GRAPH ?g { } }"))
    assert ("ex:empty",) in got
    assert ("ex:g1",) in got and ("ex:g2",) in got


def test_from_merge_dedup(engine):
    # the same triple in two FROM graphs appears once (RDF merge)
    e = seed(engine)
    got = e.execute("SELECT ?s ?o FROM <ex:g1> FROM <ex:g2> WHERE { ?s <ex:p> ?o }")
    assert sorted(got) == [["ex:a", "2"], ["ex:b", "3"]]


def test_from_named_restricts_graph(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?g ?s FROM NAMED <ex:g2> WHERE { GRAPH ?g { ?s ?p ?o } }"
        )
    )
    assert got == [("ex:g2", "ex:a"), ("ex:g2", "ex:c")]


def test_from_named_alone_empties_default(engine):
    e = seed(engine)
    got = e.execute("SELECT ?s FROM NAMED <ex:g1> WHERE { ?s <ex:p> ?o }")
    assert got == []


def test_graph_join_across_named_and_default(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?s ?d ?n WHERE { ?s <ex:p> ?d . GRAPH <ex:g1> { ?s <ex:p> ?n } }"
        )
    )
    assert got == [("ex:a", "1", "2")]
