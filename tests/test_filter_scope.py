"""Port of the reference's FILTER scope and dataset-storage test files.

kolibrie/tests/sparql_filter_scope_test.rs: a FILTER applies to its whole
group regardless of textual position (SPARQL §18.2.2.2 collects filters
after the group's patterns) — before the triple, before the BIND that
creates the tested variable, inside a GRAPH child, and before the GRAPH
block whose child binds the variable; plus an arithmetic filter whose
expression contains a mid-expression comment.

kolibrie/tests/dataset_storage_test.rs: a database union preserves the
COMPLETE dataset — default-graph triples from both sides, named graphs
including EMPTY ones, and quoted-triple subjects in named-graph quads.
"""

from kolibrie_spark import SparqlEngine
from kolibrie_spark.store import QuadStore


def _scoped_engine(spark) -> SparqlEngine:
    e = SparqlEngine(spark)
    e.update(
        """INSERT DATA {
            <urn:default-keep> <urn:p> "keep" .
            <urn:default-drop> <urn:p> "drop" .
            GRAPH <urn:g1> { <urn:named-keep> <urn:p> "keep" }
            GRAPH <urn:g2> { <urn:named-drop> <urn:p> "drop" }
        }"""
    )
    return e


def test_filter_before_triple_sees_the_whole_group(spark):
    e = _scoped_engine(spark)
    got = e.execute('SELECT ?s WHERE { FILTER (?value = "keep") ?s <urn:p> ?value . }')
    assert got == [["urn:default-keep"]]


def test_filter_before_bind_sees_later_binding(spark):
    e = _scoped_engine(spark)
    got = e.execute(
        'SELECT ?s ?label WHERE { FILTER (?label = "keep-ok") '
        '?s <urn:p> ?value . BIND(CONCAT(?value, "-ok") AS ?label) }'
    )
    assert got == [["urn:default-keep", "keep-ok"]]


def test_graph_local_filter_stays_in_nested_scope(spark):
    e = _scoped_engine(spark)
    got = e.execute(
        'SELECT ?g ?s WHERE { GRAPH ?g { FILTER (?value = "keep") '
        "?s <urn:p> ?value . } }"
    )
    assert got == [["urn:g1", "urn:named-keep"]]


def test_outer_filter_before_graph_sees_child_bindings(spark):
    e = _scoped_engine(spark)
    got = e.execute(
        'SELECT ?g ?s WHERE { FILTER (?value = "keep") '
        "GRAPH ?g { ?s <urn:p> ?value . } }"
    )
    assert got == [["urn:g1", "urn:named-keep"]]


def test_arithmetic_filter_with_comment_before_triple(spark):
    e = SparqlEngine(spark)
    e.update('INSERT DATA { <urn:two> <urn:number> "2" . <urn:one> <urn:number> "1" }')
    got = e.execute(
        "SELECT ?s WHERE { FILTER (?number # arithmetic comments are whitespace\n"
        "    + 1 > 2) ?s <urn:number> ?number . }"
    )
    assert got == [["urn:two"]]


def test_store_union_preserves_complete_dataset(spark):
    """dataset_storage_test.rs:34-99 — the reference's union re-encodes
    two dictionaries with colliding ids; string terms make that a plain
    distinct union here, but the PRESERVATION contract is identical."""
    from kolibrie_spark.rdfstar import qt_id

    def side(tag: str) -> QuadStore:
        st = QuadStore(spark)
        st.add_quads([(f"urn:{tag}-default", "urn:p", "urn:o", None)])
        qid = qt_id(f"urn:{tag}-s", f"urn:{tag}-p", f"urn:{tag}-o")
        st.add_quoted([(qid, f"urn:{tag}-s", f"urn:{tag}-p", f"urn:{tag}-o")])
        st.add_quads([(qid, "urn:asserted-by", f"urn:{tag}-source", f"urn:{tag}-graph")])
        st.register_graphs([f"urn:{tag}-empty"])
        return st

    merged = side("left").union(side("right"))

    default_subjects = {
        r.s for r in merged.quads.filter("g IS NULL").select("s").collect()
    }
    assert default_subjects == {"urn:left-default", "urn:right-default"}

    graph_names = {r[0] for r in merged.named_graph_names().collect()}
    assert graph_names == {
        "urn:left-empty",
        "urn:left-graph",
        "urn:right-empty",
        "urn:right-graph",
    }

    # quoted-triple subjects in named-graph quads resolve through the
    # surrogate table on both sides of the union
    e = SparqlEngine(spark, merged)
    got = e.execute(
        "SELECT ?s ?p ?o WHERE { GRAPH ?g { << ?s ?p ?o >> <urn:asserted-by> ?src } }"
    )
    assert sorted(got) == [
        ["urn:left-s", "urn:left-p", "urn:left-o"],
        ["urn:right-s", "urn:right-p", "urn:right-o"],
    ]
