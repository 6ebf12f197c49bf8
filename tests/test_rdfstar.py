"""RDF-star — ports rdf_star_test.rs scenarios: quoted triples in data and
patterns, TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE builtins, nesting."""

from tests.conftest import rows


def test_annotation_roundtrip(engine):
    engine.update('INSERT DATA { << <ex:alice> <ex:age> "25" >> <ex:certainty> "0.9" }')
    got = engine.execute(
        'SELECT ?c WHERE { << <ex:alice> <ex:age> "25" >> <ex:certainty> ?c }'
    )
    assert got == [["0.9"]]


def test_quoted_pattern_with_variables(engine):
    engine.update(
        'INSERT DATA { << <ex:alice> <ex:age> "25" >> <ex:cert> "0.9" . '
        '<< <ex:bob> <ex:age> "17" >> <ex:cert> "0.5" }'
    )
    got = rows(
        engine.query("SELECT ?s ?a ?c WHERE { << ?s <ex:age> ?a >> <ex:cert> ?c }")
    )
    assert got == [("ex:alice", "25", "0.9"), ("ex:bob", "17", "0.5")]


def test_triple_builtin_constructs_matching_id(engine):
    engine.update('INSERT DATA { << <ex:a> <ex:p> "1" >> <ex:cert> "0.7" }')
    got = engine.execute(
        "SELECT ?c WHERE { ?t <ex:cert> ?c . "
        '?s2 <ex:cert> ?c2 . FILTER(?c = "0.7") '
        'BIND(TRIPLE(<ex:a>, <ex:p>, "1") AS ?t2) FILTER(?t = ?t2) }'
    )
    assert [r[0] for r in got] == ["0.7"]


def test_subject_predicate_object_istriple(engine):
    engine.update('INSERT DATA { << <ex:a> <ex:p> "1" >> <ex:cert> "0.7" . <ex:plain> <ex:cert> "1.0" }')
    got = rows(
        engine.query(
            "SELECT ?s ?p ?o WHERE { ?t <ex:cert> ?c . FILTER(isTRIPLE(?t)) "
            "BIND(SUBJECT(?t) AS ?s) BIND(PREDICATE(?t) AS ?p) BIND(OBJECT(?t) AS ?o) }"
        )
    )
    assert got == [("ex:a", "ex:p", "1")]


def test_not_istriple_excludes_quoted(engine):
    engine.update('INSERT DATA { << <ex:a> <ex:p> "1" >> <ex:cert> "0.7" . <ex:plain> <ex:cert> "1.0" }')
    got = engine.execute(
        "SELECT ?t WHERE { ?t <ex:cert> ?c . FILTER(!isTRIPLE(?t)) }"
    )
    assert got == [["ex:plain"]]


def test_nested_quoted_triples(engine):
    engine.update(
        'INSERT DATA { << << <ex:a> <ex:p> "1" >> <ex:says> <ex:bob> >> <ex:meta> "m" }'
    )
    got = rows(
        engine.query(
            "SELECT ?inner_s ?who WHERE "
            '{ << << ?inner_s <ex:p> "1" >> <ex:says> ?who >> <ex:meta> "m" }'
        )
    )
    assert got == [("ex:a", "ex:bob")]


def test_same_quoted_triple_same_id(engine):
    engine.update('INSERT DATA { << <ex:a> <ex:p> "1" >> <ex:c1> "x" }')
    engine.update('INSERT DATA { << <ex:a> <ex:p> "1" >> <ex:c2> "y" }')
    got = engine.execute(
        "SELECT ?t WHERE { ?t <ex:c1> ?x . ?t <ex:c2> ?y }"
    )
    assert len(got) == 1  # both annotations attach to the same surrogate id
