"""HTTP endpoint (reference kolibrie-http-server/src/main.rs routes):
/query with RDF context + rules, /update round-trip, RSP register → push →
events session flow — all through Flask's test client."""

import json

import pytest

flask = pytest.importorskip("flask")


@pytest.fixture(scope="module")
def client(spark):
    from kolibrie_spark.http_server import create_app

    app = create_app(spark, allow_load=True)
    app.testing = True
    return app.test_client()


def test_playground(client):
    r = client.get("/")
    assert r.status_code == 200 and b"kolibrie_spark" in r.data


def test_query_with_turtle_context(client):
    r = client.post(
        "/query",
        json={
            "sparql": "SELECT ?n WHERE { ?s <http://ex/name> ?n } ORDER BY ?n",
            "rdf": """@prefix ex: <http://ex/> .
                      ex:a ex:name "alice" . ex:b ex:name "bob" .""",
            "format": "turtle",
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["results"][0]["data"] == [["alice"], ["bob"]]
    assert body["results"][0]["execution_time_ms"] > 0


def test_query_multiple_queries_and_rule(client):
    r = client.post(
        "/query",
        json={
            "queries": [
                "SELECT ?z WHERE { <http://ex/a> <http://ex/grandparent> ?z }",
                "SELECT (COUNT(?s) AS ?c) WHERE { ?s ?p ?o }",
            ],
            "rdf": "<http://ex/a> <http://ex/parent> <http://ex/b> .\n"
            "<http://ex/b> <http://ex/parent> <http://ex/c> .\n",
            "format": "ntriples",
            "rule": "RULE :Grandparent :- "
            "CONSTRUCT { ?x <http://ex/grandparent> ?z } "
            "WHERE { ?x <http://ex/parent> ?y . ?y <http://ex/parent> ?z }",
        },
    )
    assert r.status_code == 200
    results = r.get_json()["results"]
    assert results[0]["data"] == [["http://ex/c"]]
    assert results[1]["data"] == [["3"]]  # 2 base + 1 inferred


def test_query_with_n3logic(client):
    r = client.post(
        "/query",
        json={
            "sparql": "SELECT ?g WHERE { <A> <http://fam/guardian> ?g }",
            "rdf": "<A> <http://fam/parent> <B> .",
            "format": "ntriples",
            "n3logic": "@prefix fam: <http://fam/> .\n"
            "{ ?x fam:parent ?y . } => { ?x fam:guardian ?y . } .",
        },
    )
    assert r.status_code == 200
    assert r.get_json()["results"][0]["data"] == [["B"]]


def test_query_errors(client):
    assert client.post("/query", data="not json",
                       content_type="application/json").status_code == 400
    assert client.post("/query", json={}).status_code == 400


def test_update_round_trip(client):
    r = client.post(
        "/update",
        json={"sparql": 'INSERT DATA { <u:s> <u:p> "v" }'},
    )
    assert r.status_code == 200 and r.get_json()["status"] == "ok"
    q = client.post("/query", json={"sparql": "SELECT ?o WHERE { <u:s> <u:p> ?o }"})
    # /query uses a fresh context store; the /update store is the app's own
    assert q.get_json()["results"][0]["data"] == []
    # but a second update against the same store sees the first
    r2 = client.post(
        "/update",
        json={"sparql": "DELETE WHERE { <u:s> <u:p> ?o }"},
    )
    assert r2.status_code == 200


def test_rsp_register_push_events_round_trip(client):
    reg = client.post(
        "/rsp/register",
        json={
            "query": """REGISTER RSTREAM <out> AS SELECT *
                FROM NAMED WINDOW <w> ON <s1> [RANGE 10 STEP 10]
                WHERE { WINDOW <w> { ?s <http://ex/reading> ?v } }""",
        },
    )
    assert reg.status_code == 200
    sid = reg.get_json()["session_id"]

    for t, (s, v) in enumerate([("d1", "7"), ("d2", "9")]):
        push = client.post(
            "/rsp/push",
            json={
                "session_id": sid,
                "stream": "s1",
                "timestamp": t,
                "ntriples": f'<{s}> <http://ex/reading> "{v}" .',
            },
        )
        assert push.status_code == 200 and push.get_json()["status"] == "ok"
    # event at t=11 closes window [0,10)
    client.post(
        "/rsp/push",
        json={
            "session_id": sid, "stream": "s1", "timestamp": 11,
            "ntriples": '<d3> <http://ex/reading> "1" .',
        },
    )
    ev = client.get(f"/rsp/events/{sid}")
    assert ev.status_code == 200
    assert ev.mimetype == "text/event-stream"
    payloads = [
        json.loads(line[len("data: "):])
        for line in ev.get_data(as_text=True).splitlines()
        if line.startswith("data: ") and line != "data: {}"
    ]
    got = {(p["s"], p["v"]) for p in payloads}
    assert got == {("d1", "7"), ("d2", "9")}


def test_rsp_push_unknown_session(client):
    r = client.post(
        "/rsp/push",
        json={"session_id": "nope", "stream": "s", "timestamp": 0,
              "ntriples": "<a> <b> <c> ."},
    )
    assert r.status_code == 404


def test_rsp_one_shot_query(client):
    r = client.post(
        "/rsp-query",
        json={
            "query": """REGISTER RSTREAM <out> AS SELECT *
                FROM NAMED WINDOW <w> ON <s1> [RANGE 5 STEP 5]
                WHERE { WINDOW <w> { ?s <http://ex/t> ?v } }""",
            "events": [
                {"stream": "s1", "timestamp": 1,
                 "ntriples": '<x> <http://ex/t> "1" .'},
                {"stream": "s1", "timestamp": 6,
                 "ntriples": '<y> <http://ex/t> "2" .'},
            ],
        },
    )
    assert r.status_code == 200
    rows = r.get_json()["results"]
    assert {(p["s"], p["v"]) for p in rows} == {("x", "1")}


def test_query_ask_and_construct_forms(client):
    r = client.post(
        "/query",
        json={
            "sparql": 'ASK { ?s <http://ex/name> "alice" }',
            "rdf": '''@prefix ex: <http://ex/> .
                      ex:a ex:name "alice" .''',
            "format": "turtle",
        },
    )
    assert r.status_code == 200
    assert r.get_json()["results"][0]["data"] == [["True"]]
    r = client.post(
        "/query",
        json={
            "sparql": "CONSTRUCT { ?s <http://ex/known> ?n } "
            "WHERE { ?s <http://ex/name> ?n }",
            "rdf": """@prefix ex: <http://ex/> .
                      ex:a ex:name "alice" .""",
            "format": "turtle",
        },
    )
    assert r.status_code == 200
    assert r.get_json()["results"][0]["data"] == [
        ["http://ex/a", "http://ex/known", "alice", ""]
    ]


def test_legacy_protocol_endpoint(client):
    """examples/http_test/http_check.rs + sparql_database.rs:2065-2113:
    the first-generation SPARQL-protocol endpoint on '/' — POST update
    bodies by content type (including the bare-token 'INSERT { s p o }'
    alias and its exact legacy status strings), GET ?query= returning
    tab/newline-joined plain-text rows."""
    # the http_check example's own curl: bare-token data alias
    r = client.post(
        "/", data="INSERT { s p o }",
        content_type="application/sparql-update",
    )
    assert r.get_data(as_text=True) == "Update Successful"

    # standard form reports changed-quad counts
    r = client.post(
        "/",
        data="INSERT DATA { <urn:alice> <urn:name> \"Alice\" . "
        "<urn:bob> <urn:name> \"Bob\" }",
        content_type="application/sparql-update",
    )
    assert r.get_data(as_text=True) == "Update Successful (inserted 2, deleted 0)"

    # GET ?query= → tab-joined rows, newline-separated
    r = client.get("/?query=SELECT ?s ?n WHERE { ?s <urn:name> ?n }")
    rows = sorted(r.get_data(as_text=True).split("\n"))
    assert rows == ["urn:alice\tAlice", "urn:bob\tBob"]
    assert r.mimetype == "text/plain"

    # POST application/sparql-query body
    r = client.post(
        "/", data="SELECT ?n WHERE { <urn:alice> <urn:name> ?n }",
        content_type="application/sparql-query",
    )
    assert r.get_data(as_text=True) == "Alice"

    # form-urlencoded query= and update=
    r = client.post("/", data={"query": "SELECT ?o WHERE { s p ?o }"},
                    content_type="application/x-www-form-urlencoded")
    assert "Query Failed" in r.get_data(as_text=True)  # bare pattern ≠ SPARQL
    r = client.post(
        "/",
        data={"update": "DELETE DATA { <urn:bob> <urn:name> \"Bob\" }"},
        content_type="application/x-www-form-urlencoded",
    )
    assert r.get_data(as_text=True) == "Update Successful (inserted 0, deleted 1)"

    # parse failures → legacy error strings, never exceptions
    r = client.get("/?query=NOT SPARQL AT ALL")
    assert r.get_data(as_text=True).startswith("Query Failed:")
    r = client.post("/", data="GIBBERISH", content_type="application/sparql-update")
    assert r.get_data(as_text=True) == "Update Failed"
    r = client.post("/", data="x", content_type="text/weird")
    assert r.get_data(as_text=True) == "Bad Request"

    # the bare-token alias really stored (s, p, o) verbatim
    r = client.get("/?query=SELECT ?o WHERE { <s> <p> ?o }")
    assert r.get_data(as_text=True) == "o"

    # plain GET / still serves the playground
    r = client.get("/")
    assert r.mimetype == "text/html"


def test_legacy_update_alias_variants(client):
    """parser.rs:1864-1917 alias rules: IRIs and quoted literals in the
    alias, DELETE alias, variable/blank rejection."""
    assert (
        client.post(
            "/",
            data='INSERT { <urn:x> <urn:tag> "hello world" . <urn:x> <urn:n> 1 }',
            content_type="application/sparql-update",
        ).get_data(as_text=True)
        == "Update Successful"
    )
    r = client.get('/?query=SELECT ?t WHERE { <urn:x> <urn:tag> ?t }')
    assert r.get_data(as_text=True) == "hello world"

    # DELETE alias removes it again
    assert (
        client.post(
            "/",
            data='DELETE { <urn:x> <urn:tag> "hello world" }',
            content_type="application/sparql-update",
        ).get_data(as_text=True)
        == "Update Successful"
    )
    assert client.get(
        '/?query=SELECT ?t WHERE { <urn:x> <urn:tag> ?t }'
    ).get_data(as_text=True) == ""

    # variables are illegal in data blocks (parser.rs verify errors)
    assert (
        client.post(
            "/", data="INSERT { ?s p o }",
            content_type="application/sparql-update",
        ).get_data(as_text=True)
        == "Update Failed"
    )
    # blank nodes are illegal in DELETE DATA
    assert (
        client.post(
            "/", data="DELETE { _:b p o }",
            content_type="application/sparql-update",
        ).get_data(as_text=True)
        == "Update Failed"
    )


def test_load_route_distributed(client, tmp_path):
    """POST /load {path, distributed} pulls a server-side file into the
    app store through the bulk readers (VERDICT r10 task #7)."""
    f = tmp_path / "d.nt"
    f.write_text('<urn:h1> <urn:hp> "hv" .\n<urn:h2> <urn:hp> "hw" .\n')
    r = client.post(
        "/load", json={"path": str(f), "distributed": True}
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "ok" and body["quads"] >= 2
    # the app store is the legacy endpoint's target (POST /query builds a
    # per-request context engine, mirroring the reference)
    r2 = client.get(
        "/", query_string={
            "query": "SELECT ?o WHERE { ?s <urn:hp> ?o } ORDER BY ?o"
        },
    )
    rows = r2.get_data(as_text=True).splitlines()
    assert rows == ["hv", "hw"]

    r3 = client.post("/load", json={"distributed": True})
    assert r3.status_code == 400


def test_load_route_disabled_by_default(spark, tmp_path):
    """ADVICE r11 (medium): POST /load is a server-side file-read
    primitive, so it must be OFF unless create_app opts in."""
    from kolibrie_spark.http_server import create_app

    app = create_app(spark)  # no allow_load
    app.testing = True
    c = app.test_client()
    f = tmp_path / "x.nt"
    f.write_text('<urn:a> <urn:b> "c" .\n')
    r = c.post("/load", json={"path": str(f)})
    assert r.status_code == 403
    assert "disabled" in r.get_json()["error"]


def test_load_route_root_confinement(spark, tmp_path):
    """load_root confines resolvable paths to one subtree (realpath-based,
    so ../ and symlink escapes are both caught)."""
    from kolibrie_spark.http_server import create_app

    root = tmp_path / "data"
    root.mkdir()
    inside = root / "ok.nt"
    inside.write_text('<urn:r1> <urn:rp> "rv" .\n')
    outside = tmp_path / "secret.nt"
    outside.write_text('<urn:s1> <urn:sp> "sv" .\n')

    app = create_app(spark, allow_load=True, load_root=root)
    app.testing = True
    c = app.test_client()

    assert c.post("/load", json={"path": str(inside)}).status_code == 200
    r = c.post("/load", json={"path": str(outside)})
    assert r.status_code == 403
    # ../ traversal out of the root is normalised away by realpath
    r2 = c.post("/load", json={"path": str(root / ".." / "secret.nt")})
    assert r2.status_code == 403
    # a symlink inside the root pointing outside is followed and rejected
    link = root / "sneaky.nt"
    try:
        link.symlink_to(outside)
    except OSError:
        pytest.skip("symlinks unavailable")
    r3 = c.post("/load", json={"path": str(link)})
    assert r3.status_code == 403
