"""SPARQL Update — the six forms (reference execute_query.rs:523-884)."""

from tests.conftest import rows


def test_insert_data_and_delete_data(engine):
    engine.update('INSERT DATA { <ex:a> <ex:p> "1" . GRAPH <ex:g> { <ex:a> <ex:p> "2" } }')
    assert engine.execute("SELECT ?o WHERE { ?s <ex:p> ?o }") == [["1"]]
    assert engine.execute("SELECT ?o WHERE { GRAPH <ex:g> { ?s <ex:p> ?o } }") == [["2"]]
    engine.update('DELETE DATA { <ex:a> <ex:p> "1" }')
    assert engine.execute("SELECT ?o WHERE { ?s <ex:p> ?o }") == []


def test_insert_data_is_set_semantics(engine):
    engine.update('INSERT DATA { <ex:a> <ex:p> "1" }')
    engine.update('INSERT DATA { <ex:a> <ex:p> "1" }')
    assert engine.execute("SELECT ?o WHERE { ?s <ex:p> ?o }") == [["1"]]


def test_insert_where(engine):
    engine.add_triples([("ex:a", "ex:age", "25"), ("ex:b", "ex:age", "15")])
    engine.update(
        'INSERT { ?s <ex:adult> "yes" } WHERE { ?s <ex:age> ?a . FILTER(?a >= 18) }'
    )
    assert engine.execute("SELECT ?s WHERE { ?s <ex:adult> ?o }") == [["ex:a"]]


def test_delete_where_patterns_as_template(engine):
    engine.add_triples(
        [("ex:a", "ex:p", "1"), ("ex:b", "ex:p", "2"), ("ex:a", "ex:q", "3")]
    )
    engine.update("DELETE WHERE { ?s <ex:p> ?o }")
    got = rows(engine.query("SELECT ?s ?p ?o WHERE { ?s ?p ?o }"))
    assert got == [("ex:a", "ex:q", "3")]


def test_delete_insert_where(engine):
    engine.add_triples([("ex:a", "ex:status", "old"), ("ex:b", "ex:status", "keep")])
    engine.update(
        'DELETE { ?s <ex:status> "old" } INSERT { ?s <ex:status> "new" } '
        'WHERE { ?s <ex:status> "old" }'
    )
    got = rows(engine.query("SELECT ?s ?o WHERE { ?s <ex:status> ?o }"))
    assert got == [("ex:a", "new"), ("ex:b", "keep")]


def test_where_evaluated_pre_mutation(engine):
    # inserting triples matching the WHERE must not feed back into it
    engine.add_triples([("ex:a", "ex:n", "1")])
    engine.update("INSERT { ?s <ex:n> ?o } WHERE { ?s <ex:n> ?o }")  # no-op (set)
    engine.update('INSERT { <ex:b> <ex:n> "1" } WHERE { ?s <ex:n> "1" }')
    got = rows(engine.query("SELECT ?s WHERE { ?s <ex:n> ?o }"))
    assert got == [("ex:a",), ("ex:b",)]


def test_blank_node_allocation_per_solution(engine):
    engine.add_triples([("ex:a", "ex:p", "1"), ("ex:b", "ex:p", "2")])
    engine.update(
        "INSERT { ?s <ex:linked> _:x . _:x <ex:val> ?o } WHERE { ?s <ex:p> ?o }"
    )
    # each solution gets its own blank node, shared within the solution
    got = engine.query(
        "SELECT ?s ?o WHERE { ?s <ex:linked> ?bn . ?bn <ex:val> ?o }"
    )
    assert rows(got) == [("ex:a", "1"), ("ex:b", "2")]
    # two distinct blank nodes exist
    bns = engine.execute("SELECT DISTINCT ?bn WHERE { ?s <ex:linked> ?bn }")
    assert len(bns) == 2


def test_update_summary_counts_actual_changes(engine):
    """execute_query.rs:868-884: the summary counts quads that actually
    changed — re-inserting an existing quad or deleting a missing one
    counts zero; DELETE/INSERT WHERE counts both sides."""
    from kolibrie_spark.sparql.parser import parse_query
    from kolibrie_spark.sparql.update import execute_update

    store = engine.store

    def run(text):
        return execute_update(store, parse_query(text).update, with_summary=True)

    s = run('INSERT DATA { <ex:a> <ex:n> "1" . <ex:b> <ex:n> "2" }')
    assert (s.inserted_quads, s.deleted_quads) == (2, 0)
    # duplicate within the block and vs the store: set semantics
    s = run('INSERT DATA { <ex:a> <ex:n> "1" . <ex:a> <ex:n> "1" }')
    assert (s.inserted_quads, s.deleted_quads) == (0, 0)
    s = run('DELETE DATA { <ex:a> <ex:n> "1" . <ex:zz> <ex:n> "9" }')
    assert (s.inserted_quads, s.deleted_quads) == (0, 1)
    s = run(
        'DELETE { ?s <ex:n> ?o } INSERT { ?s <ex:renamed> ?o } '
        "WHERE { ?s <ex:n> ?o }"
    )
    assert (s.inserted_quads, s.deleted_quads) == (1, 1)
    # engine.handle_update formats the same numbers
    assert (
        engine.handle_update('DELETE DATA { <ex:b> <ex:renamed> "2" }')
        == "Update Successful (inserted 0, deleted 1)"
    )
    assert engine.handle_update("NOT AN UPDATE") == "Update Failed"


def test_handle_update_runtime_failure_keeps_plaintext_contract(engine, monkeypatch):
    """ADVICE r7: the reference answers 'Update Failed' for ANY failed
    update (sparql_database.rs:2047-2063) — a runtime Spark error during
    execution must not escape as an exception from handle_update."""
    import kolibrie_spark.engine as engine_mod

    def _boom(*a, **k):
        raise RuntimeError("executor lost")  # stand-in for Py4JJavaError

    monkeypatch.setattr(engine_mod, "execute_update", _boom)
    assert (
        engine.handle_update('INSERT DATA { <ex:s> <ex:p> "1" }')
        == "Update Failed"
    )


def test_handle_update_falls_through_to_alias_after_runtime_failure(
    engine, monkeypatch
):
    """ADVICE r8: the reference tries the compat-alias executor after a
    FAILED standard update (sparql_database.rs:2059-2062) — handle_update
    must not return 'Update Failed' before giving the alias a shot."""
    import kolibrie_spark.engine as engine_mod

    def _boom(*a, **k):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(engine_mod, "execute_update", _boom)
    called = []
    monkeypatch.setattr(
        type(engine), "_update_data_alias", lambda self, t: called.append(t) or True
    )
    assert (
        engine.handle_update('INSERT DATA { <ex:s> <ex:p> "1" }')
        == "Update Successful"
    )
    assert called  # the alias executor was reached after the failure


def test_handle_update_alias_runtime_failure_keeps_contract(engine, monkeypatch):
    """A runtime error inside the alias executor itself must keep the
    plain-text contract, not escape as an exception."""

    def _boom(self, t):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(type(engine), "_update_data_alias", _boom)
    assert engine.handle_update("NOT AN UPDATE") == "Update Failed"
