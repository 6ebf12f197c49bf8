"""Property-based differential tests (hypothesis): randomized small graphs
and queries, the Spark engine checked against an in-process reference
evaluator and against DuckDB for filters — the testing layer SURVEY §5 adds
beyond the reference's hand-written expectations."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import rows

SUBJECTS = ["ex:a", "ex:b", "ex:c", "ex:d"]
PREDICATES = ["ex:p", "ex:q"]
OBJECTS = ["1", "2", "10", "x", "-3.5"]

triples_st = st.lists(
    st.tuples(
        st.sampled_from(SUBJECTS), st.sampled_from(PREDICATES), st.sampled_from(OBJECTS)
    ),
    min_size=0,
    max_size=12,
    unique=True,
)


def naive_bgp(triples, patterns):
    """Reference-in-miniature: nested-loop binding join (the reference's
    actual execution strategy, engine.rs:376-395)."""
    out = [{}]
    for (ps, pp, po) in patterns:
        nxt = []
        for b in out:
            for (s, p, o) in triples:
                b2 = dict(b)
                ok = True
                for term, val in ((ps, s), (pp, p), (po, o)):
                    if term.startswith("?"):
                        if b2.get(term, val) != val:
                            ok = False
                            break
                        b2[term] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b2)
        out = nxt
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=triples_st)
def test_two_pattern_join_matches_naive(spark, data):
    from kolibrie_spark import SparqlEngine

    e = SparqlEngine(spark)
    if data:
        e.add_triples(data)
    got = rows(e.query("SELECT ?x ?y ?z WHERE { ?x <ex:p> ?y . ?x <ex:q> ?z }"))
    want = sorted(
        (b["?x"], b["?y"], b["?z"])
        for b in naive_bgp(data, [("?x", "ex:p", "?y"), ("?x", "ex:q", "?z")])
    )
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=triples_st,
    op=st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
    threshold=st.sampled_from(["0", "1.5", "2", "10"]),
)
def test_filter_matches_duckdb_try_numeric(spark, data, op, threshold):
    """The try-numeric comparison shim against DuckDB's TRY_CAST."""
    from kolibrie_spark import SparqlEngine

    e = SparqlEngine(spark)
    if data:
        e.add_triples(data)
    got = rows(e.query(f"SELECT ?s ?o WHERE {{ ?s <ex:p> ?o . FILTER(?o {op} {threshold}) }}"))

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR, p VARCHAR, o VARCHAR)")
    if data:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", list(data))
    sql_op = "<>" if op == "!=" else op
    if op in ("=", "!="):
        cond = f"o {sql_op} '{threshold}'" if op == "=" else f"o <> '{threshold}'"
    else:
        cond = (
            f"TRY_CAST(o AS DOUBLE) IS NOT NULL AND "
            f"TRY_CAST(o AS DOUBLE) {sql_op} {threshold}"
        )
    want = sorted(
        tuple(r) for r in con.execute(
            f"SELECT s, o FROM t WHERE p = 'ex:p' AND {cond}"
        ).fetchall()
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=triples_st)
def test_union_is_multiset_concat(spark, data):
    from kolibrie_spark import SparqlEngine

    e = SparqlEngine(spark)
    if data:
        e.add_triples(data)
    both = e.execute(
        "SELECT ?s WHERE { { ?s <ex:p> ?o } UNION { ?s <ex:q> ?o } }"
    )
    p_only = e.execute("SELECT ?s WHERE { ?s <ex:p> ?o }")
    q_only = e.execute("SELECT ?s WHERE { ?s <ex:q> ?o }")
    assert sorted(map(tuple, both)) == sorted(map(tuple, p_only + q_only))


def test_engine_facade_stats_and_sniffing(engine):
    engine.add_triples([("ex:a", "ex:p", "1"), ("ex:a", "ex:q", "2", "g1")])
    s = engine.stats()
    assert s["quads"] == 2 and s["subjects"] == 1 and s["named_graphs"] == 1
    assert engine.has_windowing_operations(
        "REGISTER RSTREAM <o> AS SELECT * FROM NAMED WINDOW :w ON :s [RANGE 2] "
        "WHERE { WINDOW :w { ?a ?b ?c } }"
    )
    assert not engine.has_windowing_operations("SELECT ?s WHERE { ?s ?p ?o }")
    rsp = engine.execute_query(
        "REGISTER RSTREAM <o> AS SELECT * FROM NAMED WINDOW :w ON :s [RANGE 2] "
        "WHERE { WINDOW :w { ?a <p> ?c } }"
    )
    from kolibrie_spark.streaming.engine import RSPEngine

    assert isinstance(rsp, RSPEngine)


def seed_chain(engine):
    engine.add_triples(
        [
            ("urn:a", "urn:next", "urn:b"),
            ("urn:b", "urn:next", "urn:c"),
            ("urn:c", "urn:next", "urn:d"),
            ("urn:x", "urn:next", "urn:y"),
        ]
    )
    return engine


def test_path_star_includes_start(engine):
    e = seed_chain(engine)
    got = sorted(v[0] for v in e.execute("SELECT ?x WHERE { <urn:b> <urn:next>* ?x }"))
    assert got == ["urn:b", "urn:c", "urn:d"]  # zero-length + closure


def test_path_star_inverse_direction(engine):
    e = seed_chain(engine)
    got = sorted(v[0] for v in e.execute("SELECT ?x WHERE { ?x <urn:next>* <urn:c> }"))
    assert got == ["urn:a", "urn:b", "urn:c"]


def test_path_star_ground_both(engine):
    e = seed_chain(engine)

    def ask(q):
        return e.execute(f'SELECT ?g WHERE {{ {q} . BIND("y" AS ?g) }}') == [["y"]]

    assert ask("<urn:a> <urn:next>* <urn:d>")
    assert ask("<urn:a> <urn:next>* <urn:a>")  # zero-length self-match
    assert not ask("<urn:a> <urn:next>* <urn:y>")


def test_path_opt_zero_or_one(engine):
    e = seed_chain(engine)
    got = sorted(v[0] for v in e.execute("SELECT ?x WHERE { <urn:b> <urn:next>? ?x }"))
    assert got == ["urn:b", "urn:c"]  # self + direct successor only
    got2 = sorted(v[0] for v in e.execute("SELECT ?x WHERE { ?x <urn:next>? <urn:b> }"))
    assert got2 == ["urn:a", "urn:b"]


def test_path_star_var_var_rejected(engine):
    import pytest as _pytest

    from kolibrie_spark.sparql.compiler import CompileError

    e = seed_chain(engine)
    with _pytest.raises(CompileError, match="ground endpoint"):
        e.execute("SELECT ?x ?y WHERE { ?x <urn:next>* ?y }")
