"""SELECT semantics — ports the reference's sparql_unified_test.rs
composition scenarios and integration_test.rs round trips."""

from tests.conftest import rows


def seed(engine):
    engine.add_triples(
        [
            ("ex:alice", "ex:age", "25"),
            ("ex:alice", "ex:name", "Alice"),
            ("ex:alice", "ex:city", "Ghent"),
            ("ex:bob", "ex:age", "17"),
            ("ex:bob", "ex:name", "Bob"),
            ("ex:bob", "ex:city", "Ghent"),
            ("ex:carol", "ex:age", "31"),
            ("ex:carol", "ex:name", "Carol"),
            ("ex:carol", "ex:city", "Paris"),
        ]
    )
    return engine


def test_bgp_join_filter_order_limit(engine):
    e = seed(engine)
    assert e.execute(
        "SELECT ?n ?a WHERE { ?s <ex:age> ?a . ?s <ex:name> ?n . FILTER(?a > 20) } "
        "ORDER BY DESC(?a) LIMIT 1"
    ) == [["Carol", "31"]]


def test_star_join_three_patterns(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?n ?a ?c WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a . ?s <ex:city> ?c }"
        )
    )
    assert got == [
        ("Alice", "25", "Ghent"),
        ("Bob", "17", "Ghent"),
        ("Carol", "31", "Paris"),
    ]


def test_multiset_no_implicit_distinct(engine):
    e = seed(engine)
    # two people share a city: joining on city gives a bag with repeats
    got = e.execute("SELECT ?c WHERE { ?s <ex:city> ?c }")
    assert sorted(v[0] for v in got) == ["Ghent", "Ghent", "Paris"]
    got = e.execute("SELECT DISTINCT ?c WHERE { ?s <ex:city> ?c }")
    assert sorted(v[0] for v in got) == ["Ghent", "Paris"]


def test_union_heterogeneous_columns(engine):
    e = seed(engine)
    # branches binding different vars: missing vars project as ""
    got = rows(
        e.query(
            "SELECT ?n ?a WHERE { { ?s <ex:name> ?n } UNION { ?s <ex:age> ?a } }"
        )
    )
    assert ("Alice", "") in got and ("", "25") in got
    assert len(got) == 6


def test_values_single_and_undef(engine):
    e = seed(engine)
    got = rows(
        e.query(
            'SELECT ?n WHERE { ?s <ex:name> ?n . VALUES ?n { "Alice" "Bob" } }'
        )
    )
    assert got == [("Alice",), ("Bob",)]
    got = rows(
        e.query(
            "SELECT ?n ?t WHERE { ?s <ex:name> ?n . "
            'VALUES (?n ?t) { ("Alice" "first") (UNDEF "all") } }'
        )
    )
    assert got == [
        ("Alice", "all"),
        ("Alice", "first"),
        ("Bob", "all"),
        ("Carol", "all"),
    ]


def test_bind_concat_and_udf(engine):
    e = seed(engine)
    e.register_udf("exclaim", lambda s: s + "!")
    got = rows(
        e.query(
            "SELECT ?x WHERE { ?s <ex:name> ?n . "
            'BIND(CONCAT(?n, "-", "x") AS ?c) BIND(exclaim(?c) AS ?x) }'
        )
    )
    assert got == [("Alice-x!",), ("Bob-x!",), ("Carol-x!",)]


def test_group_aggregates(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?c (SUM(?a) AS ?sum) (AVG(?a) AS ?avg) (MIN(?a) AS ?mn) "
            "(MAX(?a) AS ?mx) (COUNT(?a) AS ?n) WHERE "
            "{ ?s <ex:city> ?c . ?s <ex:age> ?a } GROUP BY ?c"
        )
    )
    assert got == [
        ("Ghent", "42.0", "21.0", "17.0", "25.0", "2"),
        ("Paris", "31.0", "31.0", "31.0", "31.0", "1"),
    ]


def test_aggregate_skips_non_numeric(engine):
    e = seed(engine)
    e.add_triples([("ex:dave", "ex:age", "unknown"), ("ex:dave", "ex:city", "Ghent")])
    got = rows(
        e.query(
            "SELECT ?c (SUM(?a) AS ?sum) (COUNT(?a) AS ?n) "
            "WHERE { ?s <ex:city> ?c . ?s <ex:age> ?a } GROUP BY ?c"
        )
    )
    # Dave's non-numeric age is skipped by SUM but counted by COUNT
    assert ("Ghent", "42.0", "3") in got


def test_order_by_numeric_then_lexical(engine):
    e = seed(engine)
    e.add_triples([("ex:x", "ex:age", "9")])
    got = e.execute("SELECT ?a WHERE { ?s <ex:age> ?a } ORDER BY ?a")
    assert [r[0] for r in got] == ["9", "17", "25", "31"]  # numeric, not lexical


def test_filter_scoped_to_group(engine):
    e = seed(engine)
    # filter inside a nested group sees only that group's bindings: ?a is
    # unbound inside, so the comparison is false and the branch is empty
    got = e.execute(
        "SELECT ?n WHERE { ?s <ex:name> ?n . { ?s <ex:city> ?c . FILTER(?a > 0) } }"
    )
    assert got == []
    # same filter at outer scope sees ?a
    got = e.execute(
        "SELECT ?n WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a . "
        "{ ?s <ex:city> ?c } FILTER(?a > 20) }"
    )
    assert sorted(r[0] for r in got) == ["Alice", "Carol"]


def test_subquery_modifiers(engine):
    # ports sparql_subquery_modifiers_test.rs: DISTINCT/ORDER/LIMIT inside
    e = seed(engine)
    got = e.execute(
        "SELECT ?n WHERE { { SELECT DISTINCT ?s WHERE { ?s <ex:city> ?c } } "
        "?s <ex:name> ?n } ORDER BY ?n LIMIT 2"
    )
    assert got == [["Alice"], ["Bob"]]


def test_division_by_zero_is_false(engine):
    e = seed(engine)
    got = e.execute(
        "SELECT ?n WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a . FILTER(?a / 0 > 0) }"
    )
    assert got == []


def test_try_numeric_comparison_false_for_strings(engine):
    e = seed(engine)
    got = e.execute(
        "SELECT ?n WHERE { ?s <ex:name> ?n . FILTER(?n > 0) }"
    )
    assert got == []
    # equality is string equality
    got = e.execute('SELECT ?n WHERE { ?s <ex:name> ?n . FILTER(?n = "Alice") }')
    assert got == [["Alice"]]


# --- OPTIONAL / MINUS / EXISTS (Spark-first extensions; the reference's
# grammar has none of these — SURVEY §2.3/§2.8)
def seed_opt(engine):
    engine.add_triples(
        [
            ("ex:alice", "ex:name", "Alice"),
            ("ex:bob", "ex:name", "Bob"),
            ("ex:carol", "ex:name", "Carol"),
            ("ex:alice", "ex:age", "25"),
            ("ex:bob", "ex:age", "17"),
            ("ex:alice", "ex:pet", "cat"),
        ]
    )
    return engine


def test_optional_keeps_unmatched_left(engine):
    e = seed_opt(engine)
    got = sorted(e.execute(
        "SELECT ?n ?p WHERE { ?x <ex:name> ?n . OPTIONAL { ?x <ex:pet> ?p } }"
    ))
    assert got == [["Alice", "cat"], ["Bob", ""], ["Carol", ""]]


def test_optional_filter_scoped_inside(engine):
    e = seed_opt(engine)
    got = sorted(e.execute(
        "SELECT ?n ?a WHERE { ?x <ex:name> ?n . "
        "OPTIONAL { ?x <ex:age> ?a . FILTER(?a > 20) } }"
    ))
    assert got == [["Alice", "25"], ["Bob", ""], ["Carol", ""]]


def test_minus_removes_compatible(engine):
    e = seed_opt(engine)
    got = sorted(e.execute(
        "SELECT ?n WHERE { ?x <ex:name> ?n . MINUS { ?x <ex:pet> ?p } }"
    ))
    assert got == [["Bob"], ["Carol"]]


def test_minus_disjoint_domains_removes_nothing(engine):
    e = seed_opt(engine)
    got = e.execute(
        "SELECT ?n WHERE { ?x <ex:name> ?n . MINUS { ?y <ex:pet> ?p } }"
    )
    assert len(got) == 3  # no shared vars => MINUS is a no-op


def test_filter_exists_and_not_exists(engine):
    e = seed_opt(engine)
    assert sorted(e.execute(
        "SELECT ?n WHERE { ?x <ex:name> ?n . FILTER EXISTS { ?x <ex:age> ?a } }"
    )) == [["Alice"], ["Bob"]]
    assert e.execute(
        "SELECT ?n WHERE { ?x <ex:name> ?n . FILTER NOT EXISTS { ?x <ex:age> ?a } }"
    ) == [["Carol"]]


def test_optional_with_values_undef_left(engine):
    e = seed_opt(engine)
    # UNDEF on the left side of OPTIONAL takes the null-wildcard path
    got = sorted(e.execute(
        "SELECT ?n ?p WHERE { VALUES (?x ?n) { (<ex:alice> \"A\") (UNDEF \"Z\") } "
        "OPTIONAL { ?x <ex:pet> ?p } }"
    ))
    assert got == [["A", "cat"], ["Z", "cat"]]


# --- property paths (Spark-first extension; reference grammar has none)
def seed_path(engine):
    engine.add_triples(
        [
            ("ex:a", "ex:knows", "ex:b"),
            ("ex:b", "ex:knows", "ex:c"),
            ("ex:c", "ex:knows", "ex:d"),
            ("ex:a", "ex:name", "A"),
            ("ex:b", "ex:name", "B"),
            ("ex:c", "ex:name", "C"),
            ("ex:d", "ex:name", "D"),
        ]
    )
    return engine


def test_path_sequence_and_alternative(engine):
    e = seed_path(engine)
    assert e.execute(
        "SELECT ?n WHERE { <ex:a> (<ex:knows>/<ex:name>) ?n }"
    ) == [["B"]]
    assert sorted(e.execute(
        "SELECT ?v WHERE { <ex:b> (<ex:knows>|<ex:name>) ?v }"
    )) == [["B"], ["ex:c"]]


def test_path_inverse(engine):
    e = seed_path(engine)
    assert e.execute("SELECT ?x WHERE { <ex:b> ^<ex:knows> ?x }") == [["ex:a"]]


def test_path_plus_ground_start_bfs(engine):
    e = seed_path(engine)
    assert sorted(e.execute("SELECT ?x WHERE { <ex:a> <ex:knows>+ ?x }")) == [
        ["ex:b"], ["ex:c"], ["ex:d"],
    ]
    # ground object end => BFS over inverse edges
    assert sorted(e.execute("SELECT ?x WHERE { ?x <ex:knows>+ <ex:d> }")) == [
        ["ex:a"], ["ex:b"], ["ex:c"],
    ]


def test_path_plus_var_var_closure(engine):
    e = seed_path(engine)
    got = sorted(e.execute("SELECT ?x ?y WHERE { ?x <ex:knows>+ ?y }"))
    assert len(got) == 6  # all ordered reachable pairs of the 4-chain
    assert ["ex:a", "ex:d"] in got


def test_path_combo_closure_then_sequence(engine):
    e = seed_path(engine)
    assert sorted(e.execute(
        "SELECT ?n WHERE { <ex:a> (<ex:knows>+/<ex:name>) ?n }"
    )) == [["B"], ["C"], ["D"]]
    assert sorted(e.execute(
        "SELECT ?n WHERE { <ex:d> (^<ex:knows>)+/<ex:name> ?n }"
    )) == [["A"], ["B"], ["C"]]


def test_path_zero_length_needs_ground_endpoint(engine):
    """Round 2: * and ? parse and run with a ground endpoint (seeded BFS
    plus the start term); the var-var zero-length form stays rejected."""
    import pytest

    from kolibrie_spark.sparql.compiler import CompileError

    engine.add_triples([("ex:a", "ex:knows", "ex:b")])
    got = sorted(v[0] for v in engine.execute(
        "SELECT ?x WHERE { <ex:a> <ex:knows>* ?x }"
    ))
    assert got == ["ex:a", "ex:b"]
    with pytest.raises(CompileError, match="ground endpoint"):
        engine.execute("SELECT ?x ?y WHERE { ?x <ex:knows>* ?y }")


def test_distinct_order_by_projected(engine):
    """DISTINCT dedups first, then sorts on the projected key (ADVICE r1:
    sorting before dropDuplicates silently lost the ordering)."""
    e = seed(engine)
    got = e.execute(
        "SELECT DISTINCT ?c WHERE { ?s <ex:city> ?c } ORDER BY DESC(?c)"
    )
    assert got == [["Paris"], ["Ghent"]]


def test_distinct_order_by_non_projected_rejected(engine):
    import pytest

    from kolibrie_spark.sparql.compiler import CompileError

    e = seed(engine)
    with pytest.raises(CompileError):
        e.execute("SELECT DISTINCT ?c WHERE { ?s <ex:city> ?c . ?s <ex:age> ?a } ORDER BY ?a")


# ---------------------------------------------------------------------------
# SPARQL 1.1 extensions beyond the reference grammar (round-3 session 4):
# HAVING, GROUP_CONCAT/SAMPLE, string/numeric/functional builtins
# ---------------------------------------------------------------------------


def test_having_filters_groups(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?c (COUNT(?s) AS ?n) WHERE { ?s <ex:city> ?c } "
            "GROUP BY ?c HAVING (COUNT(?s) > 1)"
        )
    )
    assert got == [("Ghent", "2")]


def test_having_uses_hidden_aggregate(engine):
    e = seed(engine)
    # SUM(?a) not projected: compiles as a hidden column, dropped after
    got = rows(
        e.query(
            "SELECT ?c WHERE { ?s <ex:city> ?c . ?s <ex:age> ?a } "
            "GROUP BY ?c HAVING (SUM(?a) < 40)"
        )
    )
    assert got == [("Paris",)]


def test_group_concat_sorted_and_sample_min(engine):
    e = seed(engine)
    got = rows(
        e.query(
            'SELECT ?c (GROUP_CONCAT(?n; SEPARATOR=",") AS ?ns) '
            "(SAMPLE(?n) AS ?one) WHERE "
            "{ ?s <ex:city> ?c . ?s <ex:name> ?n } GROUP BY ?c"
        )
    )
    assert got == [("Ghent", "Alice,Bob", "Alice"), ("Paris", "Carol", "Carol")]


def test_string_builtins_in_bind_and_filter(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?u ?l ?r WHERE { ?s <ex:name> ?n . "
            'FILTER(STRLEN(?n) = 5 && CONTAINS(?n, "li") '
            '&& STRSTARTS(?n, "A") && STRENDS(?n, "e") '
            '&& REGEX(?n, "^ali", "i")) '
            "BIND(UCASE(?n) AS ?u) BIND(LCASE(SUBSTR(?n, 1, 2)) AS ?l) "
            'BIND(REPLACE(?n, "ice", "ce") AS ?r) }'
        )
    )
    assert got == [("ALICE", "al", "Alce")]


def test_if_bound_coalesce_and_numeric_builtins(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "SELECT ?n ?grp ?x WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a . "
            "OPTIONAL { ?s <ex:missing> ?m } "
            'BIND(IF(?a > 20, "adult", "minor") AS ?grp) '
            'BIND(COALESCE(?m, "none") AS ?x) '
            "FILTER(FLOOR(?a / 10) >= 1 && CEIL(?a / 10) <= 4 "
            "&& ABS(0 - ?a) = ?a && ROUND(?a + 0.4) = ?a) }"
        )
    )
    assert got == [
        ("Alice", "adult", "none"),
        ("Bob", "minor", "none"),
        ("Carol", "adult", "none"),
    ]


def test_bound_distinguishes_optional_misses(engine):
    e = seed(engine)
    e.add_triples([("ex:alice", "ex:email", "a@x.org")])
    got = rows(
        e.query(
            "SELECT ?n WHERE { ?s <ex:name> ?n . "
            "OPTIONAL { ?s <ex:email> ?m } FILTER(!BOUND(?m)) }"
        )
    )
    assert got == [("Bob",), ("Carol",)]


def test_construct_builds_graph(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "CONSTRUCT { ?s <ex:adult> ?n } WHERE "
            "{ ?s <ex:name> ?n . ?s <ex:age> ?a . FILTER(?a > 20) }"
        )
    )
    assert got == [
        ("ex:alice", "ex:adult", "Alice", ""),
        ("ex:carol", "ex:adult", "Carol", ""),
    ]


def test_construct_skips_unbound_components(engine):
    e = seed(engine)
    got = rows(
        e.query(
            "CONSTRUCT { ?s <ex:mail> ?m } WHERE "
            "{ ?s <ex:name> ?n . OPTIONAL { ?s <ex:email> ?m } }"
        )
    )
    assert got == []  # no emails seeded: every instantiation incomplete


def test_ask_and_describe(engine):
    e = seed(engine)
    assert e.execute("ASK { ?s <ex:age> ?a . FILTER(?a > 30) }") == [["True"]]
    assert e.execute("ASK { ?s <ex:age> ?a . FILTER(?a > 99) }") == [["False"]]
    got = rows(e.query("DESCRIBE <ex:bob>"))
    assert got == [
        ("ex:bob", "ex:age", "17"),
        ("ex:bob", "ex:city", "Ghent"),
        ("ex:bob", "ex:name", "Bob"),
    ]


def test_select_expression_projection(engine):
    e = seed(engine)
    got = rows(
        e.query("SELECT ?n (?a + 1 AS ?next) WHERE { ?s <ex:age> ?a . ?s <ex:name> ?n }")
    )
    assert got == [("Alice", "26.0"), ("Bob", "18.0"), ("Carol", "32.0")]
    got = rows(
        e.query(
            "SELECT ?c (SUM(?a) / COUNT(?a) AS ?mean) WHERE "
            "{ ?s <ex:age> ?a . ?s <ex:city> ?c } GROUP BY ?c"
        )
    )
    assert got == [("Ghent", "21.0"), ("Paris", "31.0")]


def test_order_by_expression_keys(engine):
    e = seed(engine)
    # execute() preserves row order (rows() sorts, so don't use it here)
    got = e.execute(
        "SELECT ?n WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a } "
        "ORDER BY DESC(?a * 2) ASC(STRLEN(?n))"
    )
    assert got == [["Carol"], ["Alice"], ["Bob"]]
    # numeric-else-lexical still holds for bare-variable keys
    assert e.execute(
        "SELECT ?n ?a WHERE { ?s <ex:name> ?n . ?s <ex:age> ?a } "
        "ORDER BY ASC(?a) LIMIT 1"
    ) == [["Bob", "17"]]


def test_datetime_builtins(engine):
    e = seed(engine)
    e.add_triples([
        ("ex:e1", "ex:when", "1997-03-05 12:34:56"),
        ("ex:e2", "ex:when", "1998-07-01 01:02:03"),
        ("ex:e3", "ex:when", "not-a-date"),
    ])
    got = rows(
        e.query(
            "SELECT ?s (MONTH(?d) AS ?m) (HOURS(?d) AS ?h) WHERE "
            "{ ?s <ex:when> ?d . FILTER(YEAR(?d) = 1997 && DAY(?d) = 5 "
            "&& MINUTES(?d) = 34 && SECONDS(?d) = 56) }"
        )
    )
    assert got == [("ex:e1", "3", "12")]


def test_trailing_values_joins_after_group_by(engine):
    """SPARQL §18.2.4.5 (ADVICE r6): a query-level VALUES joins AFTER
    aggregation — it filters/extends the GROUPED solutions, it must not
    multiply the rows being grouped."""
    e = seed(engine)
    # city counts: Ghent 2, Paris 1. Trailing VALUES restricts the
    # grouped output to Ghent; pre-aggregation folding would have joined
    # first (1 city match) and still count 2 — the distinguishing case
    # is a VALUES row that matches NO group:
    got = e.execute(
        "SELECT ?c (COUNT(?s) AS ?n) WHERE { ?s <ex:city> ?c } GROUP BY ?c "
        'VALUES ?c { "Ghent" "Atlantis" }'
    )
    assert got == [["Ghent", "2"]] or got == [["Ghent", 2]]

    # a VALUES var NOT in the aggregate output cross-extends the grouped
    # rows (compatible-mapping join with disjoint domains)
    got = sorted(
        e.execute(
            "SELECT ?c ?tag (COUNT(?s) AS ?n) WHERE { ?s <ex:city> ?c } "
            'GROUP BY ?c VALUES ?tag { "t1" "t2" }'
        )
    )
    assert [g[0] for g in got] == ["Ghent", "Ghent", "Paris", "Paris"]
    assert {g[1] for g in got} == {"t1", "t2"}
    assert all(str(g[2]) in {"1", "2"} for g in got)

    # non-aggregate trailing VALUES keeps its join-into-pattern result
    got = rows(
        e.query(
            'SELECT ?n WHERE { ?s <ex:name> ?n } VALUES ?n { "Alice" "Bob" }'
        )
    )
    assert sorted(got) == [("Alice",), ("Bob",)]


def test_negated_property_set(engine):
    """SPARQL 1.1 §9.1 PathNegatedPropertySet: !iri, !(a|b), !^iri, and
    mixed !(a|^b) — forward edges exclude the forward set, ^-members
    exclude on the REVERSED edges, results union."""
    e = seed(engine)
    # everything about alice except her age
    got = sorted(
        rows(e.query("SELECT ?v WHERE { <ex:alice> !<ex:age> ?v }"))
    )
    assert got == [("Alice",), ("Ghent",)]
    # exclude two predicates
    got = rows(e.query("SELECT ?v WHERE { <ex:alice> !(<ex:age>|<ex:city>) ?v }"))
    assert got == [("Alice",)]
    # inverse-only NPS: s !^p o matches when (o, q, s) exists with
    # q != p — so FROM the literal "Ghent" it reaches whoever points a
    # non-name edge AT Ghent (alice and bob via ex:city); the forward
    # reading ?x !^name "Ghent" is empty (nothing has subject "Ghent")
    got = rows(e.query('SELECT ?x WHERE { ?x !^<ex:name> "Ghent" }'))
    assert got == []
    got = sorted(
        rows(e.query('SELECT ?x WHERE { "Ghent" !^<ex:name> ?x }'))
    )
    assert got == [("ex:alice",), ("ex:bob",)]
    # mixed: forward non-age edges from alice UNION reversed non-name
    # edges arriving at alice (there are none: nothing points at alice)
    got = sorted(
        rows(e.query("SELECT ?v WHERE { <ex:alice> !(<ex:age>|^<ex:name>) ?v }"))
    )
    assert got == [("Alice",), ("Ghent",)]
    # NPS inside a sequence path still compiles through the edge algebra
    got = sorted(
        rows(
            e.query(
                "SELECT ?n WHERE { ?s <ex:city> ?c . ?s !(<ex:age>|<ex:city>) ?n }"
            )
        )
    )
    assert got == [("Alice",), ("Bob",), ("Carol",)]
