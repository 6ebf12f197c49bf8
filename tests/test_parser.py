"""Grammar acceptance/rejection — ports the reference's parser_test.rs
scenarios (45 tests of accepted/rejected SPARQL forms) to our fragment."""

import pytest

from kolibrie_spark.sparql import ast
from kolibrie_spark.sparql.parser import ParseError, parse_query


def test_select_basic():
    q = parse_query("SELECT ?s WHERE { ?s ?p ?o }")
    assert [v.name for v in q.select.select] == ["s"]
    assert len(q.select.where.elements) == 1


def test_prefix_resolution():
    q = parse_query(
        "PREFIX ex: <http://example.org/> SELECT ?s WHERE { ?s ex:age ?a }"
    )
    pat = q.select.where.elements[0]
    assert pat.p == ast.Iri("http://example.org/age")


def test_unknown_prefix_rejected():
    with pytest.raises(ParseError):
        parse_query("SELECT ?s WHERE { ?s ex:age ?a }")


def test_dollar_variables_equivalent():
    q = parse_query("SELECT $s WHERE { $s $p $o }")
    assert q.select.select[0] == ast.Var("s")


def test_comments_are_whitespace():
    q = parse_query(
        "SELECT ?s # projection\nWHERE { ?s ?p ?o . # a pattern\n }"
    )
    assert q.select.select[0] == ast.Var("s")


def test_semicolon_and_comma_continuation():
    q = parse_query(
        'SELECT * WHERE { <ex:a> <ex:p> "1", "2" ; <ex:q> "3" . }'
    )
    pats = [e for e in q.select.where.elements if isinstance(e, ast.TriplePattern)]
    assert len(pats) == 3
    assert {p.p.value for p in pats} == {"ex:p", "ex:q"}
    assert all(p.s == ast.Iri("ex:a") for p in pats)


def test_a_is_rdf_type():
    q = parse_query("SELECT ?s WHERE { ?s a <ex:T> }")
    assert q.select.where.elements[0].p.value.endswith("#type")


def test_literal_forms():
    q = parse_query(
        "SELECT * WHERE { ?s ?p \"plain\" . ?s ?p 'single' . "
        '?s ?p "tagged"@en . ?s ?p "typed"^^<http://www.w3.org/2001/XMLSchema#int> . '
        '?s ?p "esc\\"aped" . ?s ?p 42 . ?s ?p 2.5 }'
    )
    objs = [e.o.value for e in q.select.where.elements]
    # datatype stripped, lang kept as value@lang, escapes decoded
    assert objs == ["plain", "single", "tagged@en", "typed", 'esc"aped', "42", "2.5"]


def test_unicode_escapes():
    q = parse_query('SELECT * WHERE { ?s ?p "\\u0041\\U00000042" }')
    assert q.select.where.elements[0].o.value == "AB"


def test_aggregates_parsed():
    q = parse_query(
        "SELECT ?g (SUM(?x) AS ?sx) (COUNT(?x) AS ?c) WHERE { ?s ?p ?x } GROUP BY ?g"
    )
    aggs = [i for i in q.select.select if isinstance(i, ast.Aggregate)]
    assert [(a.func, a.alias) for a in aggs] == [("SUM", "sx"), ("COUNT", "c")]


def test_bare_aggregate_default_alias():
    q = parse_query("SELECT SUM(?x) WHERE { ?s ?p ?x }")
    assert q.select.select[0].alias == "x"


def test_order_limit_offset():
    q = parse_query(
        "SELECT ?s WHERE { ?s ?p ?o } ORDER BY DESC(?o) ?s LIMIT 5 OFFSET 2"
    )
    assert q.select.order_by == [(ast.Var("o"), False), (ast.Var("s"), True)]
    assert q.select.limit == 5 and q.select.offset == 2


def test_filter_expression_tree():
    q = parse_query(
        "SELECT ?s WHERE { ?s ?p ?o . FILTER(?o > 1 && (?o < 5 || !(?o = 3))) }"
    )
    f = [e for e in q.select.where.elements if isinstance(e, ast.Filter)][0]
    assert isinstance(f.expr, ast.And)


def test_filter_arithmetic_precedence():
    q = parse_query("SELECT ?s WHERE { ?s ?p ?o . FILTER(?o + 2 * 3 = 7) }")
    f = [e for e in q.select.where.elements if isinstance(e, ast.Filter)][0]
    assert isinstance(f.expr.left, ast.Arith) and f.expr.left.op == "+"
    assert f.expr.left.right.op == "*"


def test_union_chain():
    q = parse_query("SELECT ?s WHERE { { ?s <p> <a> } UNION { ?s <p> <b> } UNION { ?s <p> <c> } }")
    u = q.select.where.elements[0]
    assert isinstance(u, ast.UnionBlock) and len(u.branches) == 3


def test_graph_forms():
    q = parse_query(
        "SELECT ?s WHERE { GRAPH <ex:g> { ?s ?p ?o } GRAPH ?g { ?s ?p ?o } }"
    )
    blocks = q.select.where.elements
    assert isinstance(blocks[0].graph, ast.Iri)
    assert isinstance(blocks[1].graph, ast.Var)


def test_values_forms():
    q = parse_query(
        'SELECT ?s WHERE { VALUES ?x { "1" "2" } VALUES (?a ?b) { ("x" UNDEF) } }'
    )
    v1, v2 = q.select.where.elements
    assert len(v1.rows) == 2
    assert v2.rows[0][1] is None


def test_subselect():
    q = parse_query(
        "SELECT ?s WHERE { { SELECT ?s WHERE { ?s ?p ?o } LIMIT 3 } ?s <p> ?v }"
    )
    assert isinstance(q.select.where.elements[0], ast.SubSelect)
    assert q.select.where.elements[0].query.limit == 3


def test_quoted_triple_pattern():
    q = parse_query('SELECT ?c WHERE { << ?s <p> "1" >> <cert> ?c }')
    pat = q.select.where.elements[0]
    assert isinstance(pat.s, ast.QuotedTriple)


def test_from_clauses():
    q = parse_query(
        "SELECT ?s FROM <g1> FROM NAMED <g2> WHERE { ?s ?p ?o }"
    )
    assert q.select.from_graphs == ["g1"] and q.select.from_named == ["g2"]


def test_update_forms_parse():
    assert parse_query('INSERT DATA { <a> <b> "c" }').update is not None
    assert parse_query('DELETE DATA { <a> <b> "c" }').update is not None
    assert parse_query("DELETE WHERE { ?s <b> ?o }").update is not None
    assert parse_query('INSERT { ?s <d> "x" } WHERE { ?s <b> ?o }').update is not None
    assert parse_query("DELETE { ?s <b> ?o } WHERE { ?s <b> ?o }").update is not None
    m = parse_query(
        'DELETE { ?s <b> ?o } INSERT { ?s <c> ?o } WHERE { ?s <b> ?o }'
    ).update
    assert m.delete_template and m.insert_template


def test_insert_data_graph_block():
    u = parse_query('INSERT DATA { GRAPH <g> { <a> <b> "c" } }').update
    assert u.quads[0][3] == "g"


def test_rejects_garbage():
    for bad in [
        "SELEC ?s WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p }",
        "SELECT WHERE { ?s ?p ?o }",
        "SELECT ?s { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o",
    ]:
        with pytest.raises(ParseError):
            parse_query(bad)


def test_optional_minus_exists_parse():
    from kolibrie_spark.sparql import ast

    q = parse_query(
        "SELECT ?n WHERE { ?x <ex:n> ?n . OPTIONAL { ?x <ex:p> ?p } "
        "MINUS { ?x <ex:q> ?q } FILTER NOT EXISTS { ?x <ex:r> ?r } }"
    ).select
    kinds = [type(el).__name__ for el in q.where.elements]
    assert kinds == ["TriplePattern", "OptionalBlock", "MinusBlock", "Filter"]
    f = q.where.elements[3]
    assert isinstance(f.expr, ast.Exists) and f.expr.negated


def test_path_star_and_opt_parse():
    from kolibrie_spark.sparql.ast import PathOpt, PathPattern, PathStar
    from kolibrie_spark.sparql.parser import parse_query

    q = parse_query("SELECT ?x WHERE { <urn:a> <urn:p>* ?x }")
    el = q.select.where.elements[0]
    assert isinstance(el, PathPattern) and isinstance(el.path, PathStar)
    q2 = parse_query("SELECT ?x WHERE { ?x <urn:p>? <urn:b> }")
    assert isinstance(q2.select.where.elements[0].path, PathOpt)
