"""Acceptance tests porting the reference's example programs verbatim
(kolibrie/examples/sparql_syntax/*): the RDF/XML payloads and SPARQL
query strings are copied as-is; expected rows follow from the data.
Note the aggregate examples' legacy single-token ``GROUPBY`` tail is
REJECTED by the reference's current parser (parser_test.rs:1069 asserts
``parse_group_by("GROUPBY ?s").is_err()``), so the ported aggregate
queries drop it — and a test pins that we reject it too."""

import pytest

from kolibrie_spark import SparqlEngine
from kolibrie_spark.rdfio import parse_into
from kolibrie_spark.store import QuadStore


def _engine(spark, xml: str) -> SparqlEngine:
    store = QuadStore(spark)
    parse_into(store, xml, fmt="rdfxml")
    return SparqlEngine(spark, store)


def test_advanced_sparql_example(spark):
    """examples/sparql_syntax/advanced_sparql/advanced.rs."""
    xml = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:ex="http://example.org/">
  <rdf:Description rdf:about="http://example.org/peter">
    <rdf:type rdf:resource="http://example.org/Person"/>
    <ex:worksAt rdf:resource="http://example.org/kulak"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/charlotte">
    <rdf:type rdf:resource="http://example.org/Person"/>
    <ex:worksAt rdf:resource="http://example.org/ughent"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/kulak">
    <ex:located rdf:resource="http://example.org/kortrijk"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/ughent">
    <ex:located rdf:resource="http://example.org/ghent"/>
  </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    q = (
        "PREFIX ex: <http://example.org/> SELECT ?person ?location ?city "
        "WHERE {?person ex:worksAt ?location . ?location ex:located ?city}"
    )
    got = sorted(tuple(r) for r in e.execute(q))
    assert got == [
        ("http://example.org/charlotte", "http://example.org/ughent", "http://example.org/ghent"),
        ("http://example.org/peter", "http://example.org/kulak", "http://example.org/kortrijk"),
    ]


def test_nested_query_example(spark):
    """examples/sparql_syntax/nested_query/nested_query.rs."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        xmlns:ex="http://example.org/">
    <rdf:Description rdf:about="http://example.org/person/Alice">
        <ex:name>Alice</ex:name>
        <ex:knows rdf:resource="http://example.org/person/Bob"/>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org/person/Bob">
        <ex:name>Bob</ex:name>
        <ex:knows rdf:resource="http://example.org/person/Charlie"/>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org/person/Charlie">
        <ex:name>Charlie</ex:name>
    </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    q = """
    PREFIX ex: <http://example.org/>
    SELECT ?friendName
    WHERE {
        ?person ex:name "Alice" .
        ?person ex:knows ?friend
        {
            SELECT ?friend ?friendName
            WHERE {
                ?friend ex:name ?friendName .
            }
        }
    }"""
    assert [tuple(r) for r in e.execute(q)] == [("Bob",)]


def test_values_keyword_example(spark):
    """examples/sparql_syntax/values_keyword/values.rs."""
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xmlns:ex="http://example.org/">
    <rdf:Description rdf:about="http://example.org/person1">
        <ex:worksAt rdf:resource="http://example.org/companyA"/>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org/person2">
        <ex:worksAt rdf:resource="http://example.org/companyB"/>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org/person3">
        <ex:worksAt rdf:resource="http://example.org/companyC"/>
    </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    q = (
        "PREFIX ex: <http://example.org/> SELECT ?person ?company "
        "WHERE {?person ex:worksAt ?company} "
        "VALUES ?company { ex:companyA ex:companyB }"
    )
    got = sorted(tuple(r) for r in e.execute(q))
    assert got == [
        ("http://example.org/person1", "http://example.org/companyA"),
        ("http://example.org/person2", "http://example.org/companyB"),
    ]


def test_concat_example(spark):
    """examples/sparql_syntax/concat/concat.rs."""
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:foaf="http://xmlns.com/foaf/0.1/">
  <rdf:Description rdf:about="_:a">
    <foaf:givenName>John</foaf:givenName>
    <foaf:surname>Doe</foaf:surname>
  </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT ?name
    WHERE {
        ?P foaf:givenName ?G .
        ?P foaf:surname ?S
        BIND(CONCAT(?G, " ", ?S) AS ?name)
    }"""
    assert [tuple(r) for r in e.execute(q)] == [("John Doe",)]


def test_aggregate_example_and_legacy_groupby_rejected(spark):
    """examples/sparql_syntax/aggregate_function/avg.rs — the aggregate
    itself; the legacy 'GROUPBY' tail must be rejected exactly like the
    reference's current parser (parser_test.rs:1069)."""
    from kolibrie_spark.sparql.parser import ParseError

    store = QuadStore(spark)
    store.add_quads(
        [
            ("e1", "https://data.cityofchicago.org/resource/xzkq-xp2w/annual_salary", "100000", None),
            ("e2", "https://data.cityofchicago.org/resource/xzkq-xp2w/annual_salary", "50000", None),
        ]
    )
    e = SparqlEngine(spark, store)
    q = (
        "PREFIX ds: <https://data.cityofchicago.org/resource/xzkq-xp2w/> "
        "SELECT AVG(?salary) AS ?average_salary "
        "WHERE { ?employee ds:annual_salary ?salary }"
    )
    got = [tuple(r) for r in e.execute(q)]
    assert len(got) == 1 and float(got[0][0]) == 75000.0
    with pytest.raises(ParseError):
        e.execute(q + " GROUPBY ?average_salary")


def test_udf_example(spark):
    """examples/sparql_syntax/user_defined_function: register a
    string-vararg UDF and call it from BIND."""
    store = QuadStore(spark)
    store.add_quads(
        [("http://example.com/s1", "http://example.com/predicate", "value1", None)]
    )
    e = SparqlEngine(spark, store)
    e.register_udf("concatValues", lambda *args: "".join(args))
    q = """
    PREFIX ex: <http://example.com/>
    SELECT ?subject ?result
    WHERE {
      ?subject ex:predicate ?object
      BIND(concatValues(?object, "suffix") AS ?result)
    }"""
    assert [tuple(r) for r in e.execute(q)] == [
        ("http://example.com/s1", "value1suffix")
    ]


def test_insert_where_example(spark):
    """examples/sparql_syntax/insert: INSERT ... WHERE over RDF/XML data
    (the reference's template shorthand without the DELETE clause)."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/">
  <rdf:Description rdf:about="http://example.org/JohnDoe">
    <ex:age>30</ex:age>
  </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    e.update(
        'PREFIX ex: <http://example.org/> '
        'PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> '
        'INSERT {<http://example.org/JohnDoe> ex:occupation "Software Developer"} '
        'WHERE {<http://example.org/JohnDoe> ex:age "30"}'
    )
    got = [
        tuple(r)
        for r in e.execute(
            "PREFIX ex: <http://example.org/> SELECT ?o "
            "WHERE {<http://example.org/JohnDoe> ex:occupation ?o}"
        )
    ]
    assert got == [("Software Developer",)]


def test_filter_examples(spark):
    """examples/sparql_syntax/filter: equality, || disjunction, numeric
    comparison, and arithmetic-in-FILTER forms."""
    store = QuadStore(spark)
    ds = "https://data.cityofchicago.org/resource/xzkq-xp2w/"
    store.add_quads(
        [
            ("e1", f"{ds}annual_salary", "100000", None),
            ("e2", f"{ds}annual_salary", "50000", None),
            ("e3", f"{ds}annual_salary", "75500", None),
        ]
    )
    e = SparqlEngine(spark, store)
    q1 = (
        f"PREFIX ds: <{ds}> SELECT ?employee ?salary "
        "WHERE {?employee ds:annual_salary ?salary FILTER(?salary > 75000)}"
    )
    assert sorted(tuple(r) for r in e.execute(q1)) == [
        ("e1", "100000"), ("e3", "75500"),
    ]
    q2 = (
        f"PREFIX ds: <{ds}> SELECT ?employee ?salary "
        "WHERE { ?employee ds:annual_salary ?salary "
        "FILTER(?salary > (75000 + 1000)) }"
    )
    assert sorted(tuple(r) for r in e.execute(q2)) == [("e1", "100000")]

    store2 = QuadStore(spark)
    v = "http://example.org/vocab#"
    store2.add_quads(
        [
            ("ev1", f"{v}name", "SparkSummit", None),
            ("ev1", f"{v}type", "Technical", None),
            ("ev1", f"{v}attendees", "500", None),
            ("ev2", f"{v}name", "ArtFair", None),
            ("ev2", f"{v}type", "Cultural", None),
            ("ev2", f"{v}attendees", "120", None),
        ]
    )
    e2 = SparqlEngine(spark, store2)
    q3 = f"""
    PREFIX ex: <{v}>
    SELECT ?name ?type ?attendees
    WHERE {{
        ?event ex:name ?name .
        ?event ex:type ?type .
        ?event ex:attendees ?attendees .
        FILTER (?type = "Technical" || ?type = "Academic")
    }}"""
    assert [tuple(r) for r in e2.execute(q3)] == [("SparkSummit", "Technical", "500")]


def test_simple_join_example(spark):
    """examples/sparql_syntax/simple_join: dc:title/dc:creator join with
    an equality FILTER."""
    store = QuadStore(spark)
    dc = "http://purl.org/dc/elements/1.1/"
    store.add_quads(
        [
            ("b1", f"{dc}title", "Pride and Prejudice", None),
            ("b1", f"{dc}creator", "Jane Austen", None),
            ("b2", f"{dc}title", "Moby Dick", None),
            ("b2", f"{dc}creator", "Herman Melville", None),
        ]
    )
    e = SparqlEngine(spark, store)
    q = f"""
    PREFIX dc: <{dc}>
    SELECT ?title ?author
    WHERE {{
      ?book dc:title ?title .
      ?book dc:creator ?author
      FILTER (?author = "Jane Austen")
    }}"""
    assert [tuple(r) for r in e.execute(q)] == [("Pride and Prejudice", "Jane Austen")]


_EMPLOYEE_XML = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:foaf="http://xmlns.com/foaf/0.1/" xmlns:ds="https://data.cityofchicago.org/resource/xzkq-xp2w/">
<rdf:Description rdf:about="http://example.org/employee1">
        <foaf:name>http://example.org/employee1</foaf:name>
        <foaf:title>Developer</foaf:title>
        <foaf:workplaceHomepage>Company Name</foaf:workplaceHomepage>
        <ds:full_or_part_time>F</ds:full_or_part_time>
        <ds:salary_or_hourly>SALARY</ds:salary_or_hourly>
        <ds:annual_salary>73681</ds:annual_salary>
    </rdf:Description>
<rdf:Description rdf:about="http://example.org/employee2">
        <foaf:name>http://example.org/employee2</foaf:name>
        <foaf:title>Developer</foaf:title>
        <foaf:workplaceHomepage>Company Name</foaf:workplaceHomepage>
        <ds:full_or_part_time>F</ds:full_or_part_time>
        <ds:salary_or_hourly>SALARY</ds:salary_or_hourly>
        <ds:annual_salary>83504</ds:annual_salary>
    </rdf:Description>
<rdf:Description rdf:about="http://example.org/employee3">
        <foaf:name>http://example.org/employee3</foaf:name>
        <foaf:title>Developer</foaf:title>
        <foaf:workplaceHomepage>Company Name</foaf:workplaceHomepage>
        <ds:full_or_part_time>F</ds:full_or_part_time>
        <ds:salary_or_hourly>SALARY</ds:salary_or_hourly>
        <ds:annual_salary>90065</ds:annual_salary>
    </rdf:Description>
<rdf:Description rdf:about="http://example.org/employee4">
        <foaf:name>http://example.org/employee4</foaf:name>
        <foaf:title>Manager</foaf:title>
        <foaf:workplaceHomepage>Company Name</foaf:workplaceHomepage>
        <ds:full_or_part_time>F</ds:full_or_part_time>
        <ds:salary_or_hourly>SALARY</ds:salary_or_hourly>
        <ds:annual_salary>67751</ds:annual_salary>
    </rdf:Description>
</rdf:RDF>"""


def test_select_semicolon_example(spark):
    """examples/sparql_syntax/select_semicolon: predicate-object lists
    (`;`) in the WHERE clause."""
    xml = """<rdf:RDF
    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xmlns:ex="http://example.org/">
<rdf:Description rdf:about="http://example.org/John">
    <ex:name>John</ex:name>
    <ex:age>42</ex:age>
    <ex:knows rdf:resource="http://example.org/Alice"/>
</rdf:Description>
<rdf:Description rdf:about="http://example.org/Alice">
    <ex:name>Alice</ex:name>
    <ex:age>30</ex:age>
</rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "PREFIX ex: <http://example.org/> SELECT ?person ?name ?age "
            "WHERE { ?person ex:name ?name ; ex:age ?age }"
        )
    )
    assert got == [
        ("http://example.org/Alice", "Alice", "30"),
        ("http://example.org/John", "John", "42"),
    ]


def test_select_all_example(spark):
    """examples/sparql_syntax/select_all: SELECT * projects every
    in-scope variable of the six-pattern star join."""
    e = _engine(spark, _EMPLOYEE_XML)
    q = (
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
        "PREFIX ds: <https://data.cityofchicago.org/resource/xzkq-xp2w/> "
        "SELECT * WHERE {?employee foaf:name ?name . ?employee foaf:title ?title . "
        "?employee foaf:workplaceHomepage ?workplaceHomepage . "
        "?employee ds:full_or_part_time ?full_or_part_time . "
        "?employee ds:salary_or_hourly ?salary_or_hourly . "
        "?employee ds:annual_salary ?salary}"
    )
    df = e.query(q)
    # SELECT * projects the in-scope vars (sorted column order)
    assert sorted(df.columns) == [
        "employee", "full_or_part_time", "name", "salary",
        "salary_or_hourly", "title", "workplaceHomepage",
    ]
    rows_ = {tuple(r[c] for c in sorted(df.columns)) for r in df.collect()}
    assert len(rows_) == 4
    assert (
        "http://example.org/employee4", "F", "http://example.org/employee4",
        "67751", "SALARY", "Manager", "Company Name",
    ) in rows_


def test_simple_select_example(spark):
    """examples/sparql_syntax/simple_select: single-pattern projection
    over the synthetic employee data."""
    e = _engine(spark, _EMPLOYEE_XML)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "PREFIX ds: <https://data.cityofchicago.org/resource/xzkq-xp2w/> "
            "SELECT ?employee ?salary WHERE {?employee ds:annual_salary ?salary}"
        )
    )
    assert got == [
        ("http://example.org/employee1", "73681"),
        ("http://example.org/employee2", "83504"),
        ("http://example.org/employee3", "90065"),
        ("http://example.org/employee4", "67751"),
    ]


def test_from_file_example(spark, tmp_path):
    """examples/sparql_syntax/from_file: load the RDF/XML from disk
    (the reference reads ../datasets/synthetic_data_employee_100K.rdf —
    same shape, file-backed here), then the two-pattern join."""
    f = tmp_path / "employees.rdf"
    f.write_text('<?xml version="1.0" encoding="UTF-8"?>\n' + _EMPLOYEE_XML)
    from kolibrie_spark.rdfio import load_into
    from kolibrie_spark.store import QuadStore

    store = QuadStore(spark)
    n = load_into(store, str(f))
    assert n == 24  # 4 employees x 6 properties
    e = SparqlEngine(spark, store)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "PREFIX ds: <https://data.cityofchicago.org/resource/xzkq-xp2w/> "
            "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
            "SELECT ?employee ?workplaceHomepage ?salary WHERE { "
            "?employee foaf:workplaceHomepage ?workplaceHomepage . "
            "?employee ds:annual_salary ?salary }"
        )
    )
    assert len(got) == 4 and got[0] == (
        "http://example.org/employee1", "Company Name", "73681",
    )


def test_n3_data_example(spark):
    """examples/sparql_syntax/n3_data: N3 payload verbatim (prefixed
    names, `;` lists, typed literals, comments), then the name/salary
    join. Typed literals store lexically cleaned (datatype stripped)."""
    n3 = """
        @prefix ex: <http://example.org/>.
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#>.
        @prefix currency: <http://purl.org/commerce#>.

        ex:john ex:name "John Smith" ;
                ex:hasFriend ex:jane ;
                ex:hasJob ex:softwareEngineer ;
                ex:annualSalary "75000"^^xsd:integer ;
                ex:salaryCurrency currency:USD.

        ex:jane 
        ex:name "Jane Doe" ; # Changed to singular "Jane" for consistency, adjust as needed
        ex:hasJob ex:doctor ;
        ex:annualSalary "95000"^^xsd:integer ;
        ex:salaryCurrency currency:USD.

        ex:softwareEngineer 
        ex:jobTitle "Software Engineer".

        ex:doctor 
        ex:jobTitle "Doctor/Physician".
    """
    store = QuadStore(spark)
    parse_into(store, n3, fmt="n3")
    e = SparqlEngine(spark, store)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "PREFIX ex: <http://example.org/> "
            "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
            "SELECT ?name ?salary WHERE { ?person ex:name ?name . "
            "?person ex:annualSalary ?salary }"
        )
    )
    assert got == [("Jane Doe", "95000"), ("John Smith", "75000")]


def test_automate_policy_example(spark):
    """examples/policy/automate_policy.rs: the RSP-QL registration
    (RANGE 10 STEP 5, RSTREAM, match-all pattern) over 20 ticks of
    n-triples events — windows fire on close with the window's triples
    as bindings."""
    from kolibrie_spark.streaming.engine import RSPEngine

    rsp_query = """
        PREFIX ex: <http://example.org/>

        REGISTER RSTREAM <http://example.org/out> AS
        SELECT ?s ?p ?o
        FROM NAMED WINDOW :policyWindow ON :policyStream [RANGE 10 STEP 5]
        WHERE {
            WINDOW :policyWindow {
                ?s ?p ?o .
            }
        }
    """
    collected = []
    eng = RSPEngine(spark, rsp_query, consumer=collected.append)
    for counter in range(1, 21):
        eng.add_to_stream(
            "policyStream",
            (
                f"http://example.org/subject{counter}",
                f"http://example.org/predicate{counter}",
                f"http://example.org/object{counter}",
            ),
            counter,
        )
    # the consumer receives one (var, value) pair-list per solution row,
    # the reference's Vec<(String, String)> shape; windows [0,10) and
    # [5,15) close within the 20-tick run
    assert collected, "no window fired"
    rows_ = [dict(pairs) for pairs in collected]
    assert all(set(r) == {"s", "p", "o"} for r in rows_)
    subj_ticks = sorted(
        int(r["s"].rsplit("subject", 1)[1]) for r in rows_
    )
    assert subj_ticks[0] == 1  # the first window's content was emitted
    # RSTREAM emits each window's rows; every emitted tick is < 20 and
    # every row is a subject/predicate/object of the same counter
    assert all(
        r["p"].endswith(f"predicate{t}") and r["o"].endswith(f"object{t}")
        for r, t in ((r, int(r["s"].rsplit("subject", 1)[1])) for r in rows_)
    )


def test_advanced_join_example(spark):
    """examples/sparql_syntax/advanced_join: a three-pattern join where
    two patterns share the ?location key (one FK hop + a star leg)."""
    xml = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/">
  <rdf:Description rdf:about="http://example.org/peter">
    <ex:worksAt rdf:resource="http://example.org/kulak"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/kulak">
    <ex:located rdf:resource="http://example.org/kortrijk"/>
    <ex:zipcode>8050</ex:zipcode>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/charlotte">
    <ex:worksAt rdf:resource="http://example.org/ughent"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/ughent">
    <ex:located rdf:resource="http://example.org/ghent"/>
    <ex:zipcode>9000</ex:zipcode>
  </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?person ?location ?city ?zipcode WHERE {"
            "?person ex:worksAt ?location . ?location ex:located ?city . "
            "?location ex:zipcode ?zipcode}"
        )
    )
    assert got == [
        ("http://example.org/charlotte", "http://example.org/ughent",
         "http://example.org/ghent", "9000"),
        ("http://example.org/peter", "http://example.org/kulak",
         "http://example.org/kortrijk", "8050"),
    ]


def test_n_triples_data_example(spark):
    """examples/sparql_syntax/n_triples_data: N-Triples payload verbatim
    (typed literals clean to their lexical form), friend-name join."""
    nt = """
<http://example.org/john> <http://example.org/hasFriend> <http://example.org/jane> .
<http://example.org/jane> <http://example.org/name> "Jane Doe" .
<http://example.org/john> <http://example.org/name> "John Smith" .
<http://example.org/jane> <http://example.org/age> "25"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://example.org/john> <http://example.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""
    store = QuadStore(spark)
    parse_into(store, nt, fmt="ntriples")
    e = SparqlEngine(spark, store)
    got = e.execute(
        "PREFIX ex: <http://example.org/> SELECT ?name WHERE { "
        "?person ex:hasFriend ?friend . ?friend ex:name ?name }"
    )
    assert got == [["Jane Doe"]]


def test_turtle_example_builder_filter(spark):
    """examples/turtle/turtle_example.rs: Turtle load + fluent builder
    with a predicate filter and a numeric object filter (the reference's
    filter closure `object.parse::<i32>() > 5000` is the builder's
    declarative filter here — Catalyst pushes it to the scan)."""
    turtle = """
        <http://example.org/employee1> <http://example.org/name> "Alice" .
        <http://example.org/employee1> <http://example.org/jobTitle> "Engineer" .
        <http://example.org/employee1> <http://example.org/salary> "6000" .

        <http://example.org/employee2> <http://example.org/name> "Bob" .
        <http://example.org/employee2> <http://example.org/jobTitle> "Designer" .
        <http://example.org/employee2> <http://example.org/salary> "4500" .

        <http://example.org/employee3> <http://example.org/name> "Charlie" .
        <http://example.org/employee3> <http://example.org/jobTitle> "Manager" .
        <http://example.org/employee3> <http://example.org/salary> "7000" .
    """
    import kolibrie_spark.compat as kolibrie

    db = kolibrie.SparqlDatabase(spark)
    db.parse_turtle(turtle)
    got = sorted(
        db.query()
        .with_predicate("http://example.org/salary")
        .filter("o", ">", "5000")
        .get_results()
    )
    assert got == [
        ("http://example.org/employee1", "http://example.org/salary", "6000"),
        ("http://example.org/employee3", "http://example.org/salary", "7000"),
    ]


def test_volcano_optimizer_example_equivalent(spark):
    """examples/sparql_syntax/volcano_optimizer/volcano.rs: the logical
    plan scan(?person foaf:name ?name) JOIN scan(?person foaf:age ?age)
    that the reference's Volcano/Streamertail optimizer reorders — here
    the same plan is declared as SPARQL and Catalyst does the
    reordering; results match the reference's executed physical plan."""
    store = QuadStore(spark)
    store.add_quads(
        [
            ("http://example.org/alice", "foaf:name", "Alice", None),
            ("http://example.org/bob", "foaf:name", "Bob", None),
            ("http://example.org/alice", "foaf:age", "30", None),
            ("http://example.org/bob", "foaf:age", "25", None),
        ]
    )
    e = SparqlEngine(spark, store)
    got = sorted(
        tuple(r)
        for r in e.execute(
            "SELECT ?person ?name ?age WHERE { "
            "?person <foaf:name> ?name . ?person <foaf:age> ?age }"
        )
    )
    assert got == [
        ("http://example.org/alice", "Alice", "30"),
        ("http://example.org/bob", "Bob", "25"),
    ]


def test_multiple_conclusions_example(spark):
    """examples/sparql_syntax/combination/multiple_conclusions.rs: one
    RULE whose CONSTRUCT template is a four-triple ';' predicate list
    (overheatingAlert / status / timestamp / requiresAction), fired for
    readings with temperature > 80, then a SELECT joining the derived
    alert facts back to every reading of the alerted rooms."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org#"
         xmlns:alert="http://example.org/alerts#">
  <rdf:Description rdf:about="http://example.org#Room101">
    <ex:temperature>75</ex:temperature>
    <ex:room>Room101</ex:room>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org#Sensor1">
    <ex:room>Room101</ex:room>
    <ex:temperature>90</ex:temperature>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org#Room102">
    <ex:temperature>35</ex:temperature>
    <ex:room>Room102</ex:room>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org#Sensor2">
    <ex:room>Room102</ex:room>
    <ex:temperature>70</ex:temperature>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org#Room103">
    <ex:temperature>45</ex:temperature>
    <ex:room>Room103</ex:room>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org#Sensor3">
    <ex:room>Room103</ex:room>
    <ex:temperature>190</ex:temperature>
  </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    e.register_rule(
        """PREFIX ex: <http://example.org#>
PREFIX alert: <http://example.org/alerts#>
RULE :OverheatingAlert :-
  CONSTRUCT {
      ?room ex:overheatingAlert true ;
            alert:status "Critical" ;
            alert:timestamp "2025-04-19T13:49:18Z" ;
            alert:requiresAction true .
  }
  WHERE {
      ?reading ex:room ?room ;
               ex:temperature ?temp .
      FILTER (?temp > 80)
  }"""
    )
    e.materialize()
    got = sorted(
        tuple(r)
        for r in e.execute(
            """PREFIX ex: <http://example.org#>
PREFIX alert: <http://example.org/alerts#>
SELECT ?room ?temp ?status ?timestamp ?action
WHERE {
  ?room ex:overheatingAlert true .
  ?room alert:status ?status .
  ?room alert:timestamp ?timestamp .
  ?room alert:requiresAction ?action .
  ?reading ex:room ?room .
  ?reading ex:temperature ?temp .
}"""
        )
    )
    ts = "2025-04-19T13:49:18Z"
    assert got == [
        ("Room101", "75", "Critical", ts, "true"),
        ("Room101", "90", "Critical", ts, "true"),
        ("Room103", "190", "Critical", ts, "true"),
        ("Room103", "45", "Critical", ts, "true"),
    ]


def test_n3_data_advanced_example(spark):
    """examples/sparql_syntax/n3_data/n3_data_advanced.rs: N3 data with
    ';' predicate lists, '#' comments, typed literals (datatype stripped)
    and multi-line subjects; SELECT joins name with annualSalary."""
    n3 = """
        @prefix ex: <http://example.org/>.
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#>.
        @prefix currency: <http://purl.org/commerce#>.

        ex:john ex:name "John Smith" ;
                ex:hasFriend ex:jane ;
                ex:hasJob ex:softwareEngineer ;
                ex:annualSalary "75000"^^xsd:integer ;
                ex:salaryCurrency currency:USD.

        ex:jane 
        ex:name "Jane Doe" ; # Changed to singular "Jane" for consistency, adjust as needed
        ex:hasJob ex:doctor ;
        ex:annualSalary "95000"^^xsd:integer ;
        ex:salaryCurrency currency:USD.

        ex:softwareEngineer 
        ex:jobTitle "Software Engineer".

        ex:doctor 
        ex:jobTitle "Doctor/Physician".
    """
    store = QuadStore(spark)
    parse_into(store, n3, fmt="n3")
    e = SparqlEngine(spark, store)
    got = sorted(
        tuple(r)
        for r in e.execute(
            """PREFIX ex: <http://example.org/>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

    SELECT ?name ?salary
    WHERE {
        ?person ex:name ?name .
        ?person ex:annualSalary ?salary
    }"""
        )
    )
    assert got == [("Jane Doe", "95000"), ("John Smith", "75000")]


def test_repro_sensor_path_benchmark_query(spark):
    """examples/sparql_syntax/n_triples_data/repro_sensor_path_benchmark.rs:
    the TrainBenchmark repro query verbatim — a 13-pattern BGP (5-hop
    connectsTo path whose six segments are all monitored by the SAME
    sensor, all typed Segment).  The reference reads a 100 MB .nt dump not
    shipped with the repo, so the data is a synthetic TrainBenchmark shape
    with a computable answer: per sensor an 8-segment monitored chain
    (3 six-segment windows each), chains joined across sensors so the
    same-sensor constraint has decoys to reject."""
    tb = "http://www.semanticweb.org/ontologies/2015/trainbenchmark#"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    n_sensors, chain = 20, 8
    quads = []
    for s in range(n_sensors):
        sensor = f"{tb}sensor{s}"
        quads.append((sensor, f"{rdf}type", f"{tb}Sensor", None))
        for i in range(chain):
            seg = f"{tb}seg_{s}_{i}"
            quads.append((seg, f"{rdf}type", f"{tb}Segment", None))
            quads.append((seg, f"{tb}monitoredBy", sensor, None))
            if i + 1 < chain:
                quads.append((seg, f"{tb}connectsTo", f"{tb}seg_{s}_{i + 1}", None))
        if s + 1 < n_sensors:  # cross-sensor decoy link
            quads.append(
                (f"{tb}seg_{s}_{chain - 1}", f"{tb}connectsTo", f"{tb}seg_{s + 1}_0", None)
            )
    store = QuadStore(spark)
    store.add_quads(quads)
    e = SparqlEngine(spark, store)
    rows = e.execute(
        """
PREFIX base: <http://www.semanticweb.org/ontologies/2015/trainbenchmark#>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
SELECT ?sensor ?segment1 ?segment2 ?segment3 ?segment4 ?segment5 ?segment6 WHERE {
    ?segment1 base:connectsTo ?segment2 .
    ?segment2 base:connectsTo ?segment3 .
    ?segment3 base:connectsTo ?segment4 .
    ?segment4 base:connectsTo ?segment5 .
    ?segment5 base:connectsTo ?segment6 .
    ?sensor rdf:type base:Sensor .
    ?segment1 base:monitoredBy ?sensor .
    ?segment2 base:monitoredBy ?sensor .
    ?segment3 base:monitoredBy ?sensor .
    ?segment4 base:monitoredBy ?sensor .
    ?segment5 base:monitoredBy ?sensor .
    ?segment6 base:monitoredBy ?sensor .
    ?segment1 rdf:type base:Segment .
    ?segment2 rdf:type base:Segment .
    ?segment3 rdf:type base:Segment .
    ?segment4 rdf:type base:Segment .
    ?segment5 rdf:type base:Segment .
    ?segment6 rdf:type base:Segment .
}"""
    )
    # per sensor: windows starting at 0,1,2 of its own 8-chain; cross-sensor
    # paths die on the shared-?sensor join
    assert len(rows) == 3 * n_sensors
    assert all(len(r) == 7 for r in rows)
    one = next(r for r in rows if r[0] == f"{tb}sensor0" and r[1] == f"{tb}seg_0_0")
    assert one[1:] == [f"{tb}seg_0_{i}" for i in range(6)]


def test_combined_syntax_example(spark):
    """examples/sparql_syntax/combination/combined_syntax_example.rs: the
    eight-stage combined workflow — RDF facts, Turtle-star reliability
    annotations, SPARQL-star query, classical RULE (FILTER ?t > 80),
    SELECT, PROB(combination=minmax) RULE whose ';'-list premise consumes
    the classical rule's output, SELECT, and the SPARQL-star re-query."""
    EX = "http://example.org/"
    store = QuadStore(spark)
    e = SparqlEngine(spark, store)
    e.add_triples(
        [
            (f"{EX}sensor/S1", f"{EX}temperature", "92"),
            (f"{EX}sensor/S1", f"{EX}pressure", "135"),
            (f"{EX}sensor/S2", f"{EX}temperature", "71"),
            (f"{EX}sensor/S2", f"{EX}pressure", "118"),
            (f"{EX}sensor/S3", f"{EX}temperature", "88"),
            (f"{EX}sensor/S3", f"{EX}pressure", "142"),
        ]
    )
    parse_into(
        store,
        '<< <http://example.org/sensor/S1> <http://example.org/temperature> "92" >> <http://example.org/reliability> "0.95" .\n'
        '<< <http://example.org/sensor/S2> <http://example.org/temperature> "71" >> <http://example.org/reliability> "0.80" .\n'
        '<< <http://example.org/sensor/S3> <http://example.org/temperature> "88" >> <http://example.org/reliability> "0.85" .',
        fmt="turtle",
    )

    star_query = """SELECT ?sensor ?temp ?reliability WHERE {
    << ?sensor <http://example.org/temperature> ?temp >> <http://example.org/reliability> ?reliability .
}"""
    star1 = sorted(tuple(r) for r in e.execute(star_query))
    assert star1 == [
        (f"{EX}sensor/S1", "92", "0.95"),
        (f"{EX}sensor/S2", "71", "0.80"),
        (f"{EX}sensor/S3", "88", "0.85"),
    ]

    e.register_rule(
        """PREFIX ex: <http://example.org/>

RULE :OverheatAlert :-
CONSTRUCT {
    ?sensor ex:overheatAlert true .
}
WHERE {
    ?sensor ex:temperature ?t .
    FILTER(?t > 80)
}"""
    )
    e.materialize()
    alerts = sorted(
        r[0]
        for r in e.execute(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?sensor WHERE { ?sensor ex:overheatAlert true . }"
        )
    )
    assert alerts == [f"{EX}sensor/S1", f"{EX}sensor/S3"]

    # Stage 6: PROB(minmax) rule consuming the classical output; ';' list
    derived = e.register_rule(
        """PREFIX ex: <http://example.org/>

RULE :CriticalRisk PROB(combination=minmax) :-
CONSTRUCT {
    ?sensor ex:criticalRisk true .
}
WHERE {
    ?sensor ex:overheatAlert true ;
            ex:pressure ?p .
    FILTER(?p > 130)
}"""
    )
    critical = sorted(
        r[0]
        for r in e.execute(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?sensor WHERE { ?sensor ex:criticalRisk true . }"
        )
    )
    assert critical == [f"{EX}sensor/S1", f"{EX}sensor/S3"]

    # Stage 8: annotations still accessible, untouched
    assert sorted(tuple(r) for r in e.execute(star_query)) == star1


def test_combination_ml_example(spark):
    """examples/sparql_syntax/combination/combination_ml.rs: one RULE text
    carrying BOTH a classical CONSTRUCT/WHERE (temp > 25 → alert) and a
    trailing ML.PREDICT clause; the rule fires on materialize, the
    predictions come back as a DataFrame and are written back as
    sensor:predictedTemperature / sensor:predictionConfidence facts that
    the example's three final SELECTs then read."""
    EX = "http://example.org#"
    SENSOR = "http://example.org/sensor#"
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org#"
         xmlns:sensor="http://example.org/sensor#">
    <rdf:Description rdf:about="http://example.org#room101">
        <rdf:type rdf:resource="http://example.org#Room"/>
        <sensor:temperature>22.5</sensor:temperature>
        <sensor:humidity>45.0</sensor:humidity>
        <sensor:occupancy>5</sensor:occupancy>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org#room102">
        <rdf:type rdf:resource="http://example.org#Room"/>
        <sensor:temperature>23.8</sensor:temperature>
        <sensor:humidity>52.0</sensor:humidity>
        <sensor:occupancy>8</sensor:occupancy>
    </rdf:Description>
    <rdf:Description rdf:about="http://example.org#room103">
        <rdf:type rdf:resource="http://example.org#Room"/>
        <sensor:temperature>27.2</sensor:temperature>
        <sensor:humidity>48.0</sensor:humidity>
        <sensor:occupancy>3</sensor:occupancy>
    </rdf:Description>
</rdf:RDF>"""
    e = _engine(spark, xml)
    # deterministic stand-in for the pyo3 temperature model
    e.register_model("temperature_predictor", lambda X: X.iloc[:, 0] + 0.5)

    predictions = e.register_rule(
        """PREFIX ex: <http://example.org#>
PREFIX sensor: <http://example.org/sensor#>
RULE :TemperatureAlert :-
    CONSTRUCT {
        ?room ex:temperatureAlert "High temperature detected" .
    }
    WHERE {
        ?room sensor:temperature ?temp ;
            sensor:humidity ?humidity
        FILTER (?temp > 25)
    }
    ML.PREDICT(MODEL "temperature_predictor",
        INPUT {
            SELECT ?room ?temp ?humidity ?occupancy
            WHERE {
                ?room sensor:temperature ?temp ;
                    sensor:humidity ?humidity ;
                    sensor:occupancy ?occupancy
            }
        },
        OUTPUT ?predicted_temp
    )"""
    )
    e.materialize()

    # classical part: only room103 (27.2 > 25)
    alerts = [tuple(r) for r in e.execute(
        "PREFIX ex: <http://example.org#> SELECT ?room ?alert "
        "WHERE { ?room ex:temperatureAlert ?alert . }"
    )]
    assert alerts == [(f"{EX}room103", "High temperature detected")]

    # ML part: per-room predictions (add_prediction_to_database parity)
    rows = predictions.collect()
    assert {r.room for r in rows} == {f"{EX}room10{i}" for i in (1, 2, 3)}
    e.add_triples(
        [t for r in rows for t in (
            (r.room, f"{SENSOR}predictedTemperature", f"{float(r.predicted_temp):g}"),
            (r.room, f"{SENSOR}predictionConfidence", "0.95"),
        )]
    )
    got = sorted(tuple(r) for r in e.execute(
        """PREFIX sensor: <http://example.org/sensor#>
SELECT ?room ?predicted_temp ?confidence
WHERE {
    ?room sensor:predictedTemperature ?predicted_temp ;
          sensor:predictionConfidence ?confidence
}"""
    ))
    assert got == [
        (f"{EX}room101", "23", "0.95"),
        (f"{EX}room102", "24.3", "0.95"),
        (f"{EX}room103", "27.7", "0.95"),
    ]
    all_rooms = e.execute(
        """PREFIX sensor: <http://example.org/sensor#>
SELECT ?room ?temp ?humidity ?occupancy
WHERE {
    ?room sensor:temperature ?temp ;
          sensor:humidity ?humidity ;
          sensor:occupancy ?occupancy
}"""
    )
    assert len(all_rooms) == 3


def test_simple_volcano_example(spark):
    """examples/simple_volcano.rs: the three logical plans the example
    hands to the Streamertail optimizer — a name scan, a name⋈age join
    on ?person, and a name scan filtered to "Alice" — declared as SPARQL
    over the example's 8-triple alice/bob/charlie dataset; Catalyst
    picks the physical plan the reference's find_best_plan searches for."""
    store = QuadStore(spark)
    ex = "http://example.org/"
    store.add_quads(
        [
            (f"{ex}alice", f"{ex}name", "Alice", None),
            (f"{ex}bob", f"{ex}name", "Bob", None),
            (f"{ex}charlie", f"{ex}name", "Charlie", None),
            (f"{ex}alice", f"{ex}age", "25", None),
            (f"{ex}bob", f"{ex}age", "30", None),
            (f"{ex}charlie", f"{ex}age", "35", None),
            (f"{ex}alice", f"{ex}worksAt", f"{ex}company", None),
            (f"{ex}bob", f"{ex}worksAt", f"{ex}company", None),
        ]
    )
    e = SparqlEngine(spark, store)

    # Example 1: simple scan (?person ex:name ?name)
    scan = sorted(
        tuple(r)
        for r in e.execute(
            f"SELECT ?person ?name WHERE {{ ?person <{ex}name> ?name }}"
        )
    )
    assert scan == [
        (f"{ex}alice", "Alice"),
        (f"{ex}bob", "Bob"),
        (f"{ex}charlie", "Charlie"),
    ]

    # Example 2: join of the name and age scans on ?person
    joined = sorted(
        tuple(r)
        for r in e.execute(
            f"SELECT ?person ?name ?age WHERE {{ "
            f"?person <{ex}name> ?name . ?person <{ex}age> ?age }}"
        )
    )
    assert joined == [
        (f"{ex}alice", "Alice", "25"),
        (f"{ex}bob", "Bob", "30"),
        (f"{ex}charlie", "Charlie", "35"),
    ]

    # Example 3: selection σ(name = "Alice") over the scan
    filtered = [
        tuple(r)
        for r in e.execute(
            f'SELECT ?person ?name WHERE {{ ?person <{ex}name> ?name . '
            f'FILTER(?name = "Alice") }}'
        )
    ]
    assert filtered == [(f"{ex}alice", "Alice")]
