"""Streaming (RSP-QL) — ports the reference's scripted-timeline tests:
s2r.rs inline unit tests and tests/rsp_engine_test.rs scenarios, with exact
firing counts and emissions."""

import pytest

from kolibrie_spark.streaming.r2s import DStream, IStream, RStream
from kolibrie_spark.streaming.rspql import ParseError, parse_duration, parse_retrieve, parse_rspql
from kolibrie_spark.streaming.s2r import CSparqlWindow, ReportStrategy, Periodic


# ------------------------------------------------------------------ S2R unit
def test_window_scope_firing_count():
    """Ports s2r.rs test_window: width 10, slide 2, events at ts 0..9 ->
    exactly 4 firings (the reference's own expected count)."""
    w = CSparqlWindow(width=10, slide=2)
    fired = []
    w.on_fire = lambda content, ts: fired.append((ts, sorted(content.items())))
    for i in range(10):
        w.add(f"s{i}", i)
    assert len(fired) == 4
    assert [ts for ts, _ in fired] == [2, 4, 6, 8]
    assert fired[0][1] == ["s0", "s1"]  # window [0,2)
    assert fired[1][1] == ["s0", "s1", "s2", "s3"]  # [0,4)


def test_window_late_event_never_refires():
    w = CSparqlWindow(width=3, slide=1)
    fired = []
    w.on_fire = lambda c, ts: fired.append(ts)
    w.add("a", 5)   # fires the (empty) just-closed window [2,5)
    w.add("b", 6)   # fires [3,6) containing a
    w.add("late", 2)  # re-opens past windows but app_time gate blocks firing
    assert fired == [5, 6]


def test_report_non_empty_content():
    w = CSparqlWindow(
        width=2, slide=1,
        report=[ReportStrategy.ON_WINDOW_CLOSE, ReportStrategy.NON_EMPTY_CONTENT],
    )
    fired = []
    w.on_fire = lambda c, ts: fired.append(sorted(c.items()))
    w.add("a", 1)
    w.add("b", 10)  # closed windows [?,?<10] containing a: max-close has a
    w.add("c", 20)
    assert all(len(items) > 0 for items in fired)


def test_report_periodic():
    w = CSparqlWindow(width=4, slide=1, report=[Periodic(2)])
    fired = []
    w.on_fire = lambda c, ts: fired.append(ts)
    for t in range(1, 7):
        w.add(f"x{t}", t)
    assert fired == [2, 4, 6]


# ------------------------------------------------------------------ R2S unit
def test_r2s_operators():
    rs, is_, ds = RStream(), IStream(), DStream()
    assert rs.eval([1, 2], 0) == [1, 2]
    assert is_.eval([1, 2], 0) == [1, 2]
    assert is_.eval([2, 3], 1) == [3]
    assert ds.eval([1, 2], 0) == []
    assert ds.eval([2, 3], 1) == [1]
    assert ds.eval([3], 2) == [2]


# -------------------------------------------------------------- RSPQL parser
def test_parse_durations():
    assert parse_duration("10") == 10
    assert parse_duration("PT10S") == 10
    assert parse_duration("PT5M") == 300
    assert parse_duration("PT1H") == 3600
    with pytest.raises(ParseError):
        parse_duration("P1D")


def test_parse_register():
    q = parse_rspql(
        """
        REGISTER ISTREAM <http://out/stream> AS
        SELECT *
        FROM NAMED WINDOW :w ON ?stream [RANGE 3 STEP 1]
        WHERE { WINDOW :w { ?s a <http://test/IType> . } }
        """
    )
    assert q.operator == "ISTREAM"
    assert q.output_iri == "http://out/stream"
    assert q.windows[0].iri == "w"
    assert q.windows[0].stream is None  # variable stream
    assert (q.windows[0].width, q.windows[0].slide) == (3, 1)
    assert len(q.windows[0].group.elements) == 1


def test_parse_register_tumbling_default_and_policy():
    q = parse_rspql(
        """
        REGISTER RSTREAM <out> AS SELECT ?a
        FROM NAMED WINDOW :w1 ON :s1 [RANGE PT10S] WITH POLICY STEAL
        FROM NAMED WINDOW :w2 ON :s2 [RANGE 5 STEP 1]
        WHERE { WINDOW :w1 { ?a <p> ?b } WINDOW :w2 { ?a <q> ?c } }
        """
    )
    assert (q.windows[0].width, q.windows[0].slide) == (10, 10)  # no STEP: tumbling
    assert q.windows[0].policy == ("STEAL",)
    assert q.windows[1].stream == "s2"


# ------------------------------------------------------- engine: R2S streams
ITYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _mk(spark, query, **kw):
    from kolibrie_spark.streaming.engine import RSPEngine

    out = []
    eng = RSPEngine(spark, query, consumer=lambda row: out.append(row), **kw)
    return eng, out


def test_istream_scripted_timeline(spark):
    """Ports rsp_engine_test.rs rsp_ql_istream_semantics."""
    eng, out = _mk(
        spark,
        """REGISTER ISTREAM <http://out/stream> AS SELECT *
           FROM NAMED WINDOW :w ON ?stream [RANGE 3 STEP 1]
           WHERE { WINDOW :w { ?s a <http://test/IType> . } }""",
    )
    for i, name in enumerate(["A", "B", "C", "D"], start=1):
        eng.add((f"http://test/subject{name}", ITYPE, "http://test/IType"), i)
    assert len(out) == 3
    assert [row[0][1] for row in out] == [
        "http://test/subjectA",
        "http://test/subjectB",
        "http://test/subjectC",
    ]


def test_dstream_scripted_timeline(spark):
    """Ports rsp_engine_test.rs rsp_ql_dstream_semantics.

    Under the reference's *code* semantics (s2r.rs: membership
    open <= ts < close, OnWindowClose when close <= ts — the semantics its
    own s2r unit tests and the ISTREAM timeline pin), the firing contents
    are {A}@2, {A,B}@3, {A,B,C}@4, {B,C,D}@5, {C,D,E}@6, so DSTREAM emits
    the deletion of A at ts=5 and of B at ts=6. The reference test file
    instead annotates contents one slide wider and asserts a single
    emission (rsp_engine_test.rs:105-193) — inconsistent with its own unit
    tests; we follow the code."""
    eng, out = _mk(
        spark,
        """REGISTER DSTREAM <http://out/stream> AS SELECT *
           FROM NAMED WINDOW :w ON ?stream [RANGE 3 STEP 1]
           WHERE { WINDOW :w { ?s a <http://test/DType> . } }""",
    )
    for i, name in enumerate(["A", "B", "C", "D", "E", "F"], start=1):
        eng.add((f"http://test/subject{name}", ITYPE, "http://test/DType"), i)
    assert out == [
        [("s", "http://test/subjectA")],
        [("s", "http://test/subjectB")],
    ]


def test_rstream_single_window_integration(spark):
    """Ports rsp_ql_integration: 20 events on a variable stream."""
    eng, out = _mk(
        spark,
        """REGISTER RSTREAM <http://out/stream> AS SELECT *
           FROM NAMED WINDOW :wind ON ?s [RANGE 10 STEP 2]
           WHERE { WINDOW :wind { ?s a <http://www.w3.org/test/SuperType> . } }""",
    )
    for i in range(20):
        eng.add((f"http://test.be/subject{i}", ITYPE, "http://www.w3.org/test/SuperType"), i)
    assert out  # results from window processing


def test_multi_window_join_disjoint_subjects_is_empty(spark):
    """Ports rsp_ql_joining_multi_window_integration: same ?s over disjoint
    subject sets -> join must produce nothing."""
    eng, out = _mk(
        spark,
        """REGISTER RSTREAM <http://out/stream> AS SELECT *
           FROM NAMED WINDOW :wind ON :stream1 [RANGE 10 STEP 2]
           FROM NAMED WINDOW :wind2 ON :stream2 [RANGE 5 STEP 1]
           WHERE {
             WINDOW :wind { ?s a <http://www.w3.org/test/Temperature> . }
             WINDOW :wind2 { ?s a <http://www.w3.org/test/CO2> . }
           }""",
    )
    for i in range(10):
        eng.add_to_stream("stream1", (f"http://test.be/temp{i}", ITYPE, "http://www.w3.org/test/Temperature"), i)
    for i in range(10):
        eng.add_to_stream("stream2", (f"http://test.be/co2{i}", ITYPE, "http://www.w3.org/test/CO2"), i + 10)
    eng.stop()  # flush remaining windows (reference integration tests do this)
    assert out == []


def test_multi_window_cross_join_distinct_vars(spark):
    """Ports rsp_ql_integration_with_join: distinct vars -> cross product."""
    eng, out = _mk(
        spark,
        """REGISTER RSTREAM <http://out/stream> AS SELECT *
           FROM NAMED WINDOW :wind ON :stream1 [RANGE 10 STEP 2]
           FROM NAMED WINDOW :wind2 ON :stream2 [RANGE 5 STEP 1]
           WHERE {
             WINDOW :wind { ?s a <http://www.w3.org/test/Temperature> . }
             WINDOW :wind2 { ?s2 a <http://www.w3.org/test/CO2> . }
           }""",
    )
    for i in range(10):
        eng.add_to_stream("stream1", (f"http://test.be/temp{i}", ITYPE, "http://www.w3.org/test/Temperature"), i)
    for i in range(10):
        eng.add_to_stream("stream2", (f"http://test.be/co2{i}", ITYPE, "http://www.w3.org/test/CO2"), i + 10)
    eng.stop()  # flush remaining windows (reference integration tests do this)
    assert out
    assert {"s", "s2"} == {k for row in out for k, _ in row}


def test_steal_policy_emits_with_stale_results(spark):
    """Steal emits on every firing once all windows materialized at least
    once (rsp_engine.rs:718-755); Wait emits only on full cycles."""
    q = """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w1 ON :s1 [RANGE 2 STEP 1]
           FROM NAMED WINDOW :w2 ON :s2 [RANGE 2 STEP 1]
           WHERE { WINDOW :w1 { ?a <p> ?x } WINDOW :w2 { ?b <q> ?y } }"""
    for policy, expect_many in ((("WAIT",), False), (("STEAL",), True)):
        eng, out = _mk(spark, q, sync_policy=policy)
        eng.add_to_stream("s1", ("a1", "p", "1"), 1)
        eng.add_to_stream("s2", ("b1", "q", "1"), 1)
        eng.add_to_stream("s1", ("a2", "p", "2"), 2)   # w1 fires {a1}
        eng.add_to_stream("s2", ("b2", "q", "2"), 2)   # w2 fires {b1} -> cycle
        n_first = len(out)
        assert n_first >= 1
        eng.add_to_stream("s1", ("a3", "p", "3"), 3)   # only w1 fires again
        eng.add_to_stream("s1", ("a4", "p", "4"), 4)   # only w1 fires again
        if expect_many:
            assert len(out) > n_first  # stale w2 results reused
        else:
            assert len(out) == n_first  # waits for w2 forever


def test_timeout_policy_steal_and_drop(spark):
    q = """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w1 ON :s1 [RANGE 2 STEP 1]
           FROM NAMED WINDOW :w2 ON :s2 [RANGE 2 STEP 1]
           WHERE { WINDOW :w1 { ?a <p> ?x } WINDOW :w2 { ?b <q> ?y } }"""
    for fallback, expect_emit in (("STEAL", True), ("DROP", False)):
        clock_now = [0.0]
        eng, out = _mk(
            spark, q,
            sync_policy=("TIMEOUT", 10, fallback),
            clock=lambda: clock_now[0],
        )
        # materialize both windows once (full cycle)
        eng.add_to_stream("s1", ("a1", "p", "1"), 1)
        eng.add_to_stream("s2", ("b1", "q", "1"), 1)
        eng.add_to_stream("s1", ("a2", "p", "2"), 2)
        eng.add_to_stream("s2", ("b2", "q", "2"), 2)
        base = len(out)
        assert base >= 1
        # open a cycle with only w1, then let the deadline pass
        eng.add_to_stream("s1", ("a3", "p", "3"), 3)
        clock_now[0] = 100.0
        eng.add_to_stream("s1", ("zz", "p", "9"), 4)  # triggers timeout check
        if expect_emit:
            assert len(out) > base
        else:
            assert len(out) == base


def test_static_join_enriches_window_results(spark):
    """Static patterns outside WINDOW blocks join at emission
    (rsp/builder.rs:184-199, rsp_engine.rs:595-620)."""
    eng, out = _mk(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON ?any [RANGE 2 STEP 1]
           WHERE { WINDOW :w { ?sensor <hasReading> ?v }
                   ?sensor <locatedIn> ?room }""",
    )
    eng.add_static_triples([("sensor1", "locatedIn", "kitchen")])
    eng.add(("sensor1", "hasReading", "20"), 1)
    eng.add(("sensor2", "hasReading", "30"), 2)  # no static location
    eng.add(("x", "hasReading", "0"), 3)
    assert out
    for row in out:
        d = dict(row)
        assert d["sensor"] == "sensor1" and d["room"] == "kitchen"


def test_filter_in_window_block_uses_spark_path(spark):
    """Window groups with FILTER fall back to the full Spark compiler."""
    eng, out = _mk(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON ?any [RANGE 2 STEP 1]
           WHERE { WINDOW :w { ?s <temp> ?t . FILTER(?t > 25) } }""",
    )
    eng.add(("roomB", "temp", "30"), 1)
    eng.add(("roomA", "temp", "20"), 2)
    eng.add(("x", "temp", "0"), 3)
    assert out
    assert all(dict(row)["s"] == "roomB" for row in out)


def test_streaming_rule_materializes_construct(spark):
    """Ports combination_stream.rs: RULE :- RSTREAM FROM NAMED WINDOW
    [SLIDING 10 SLIDE 2 REPORT ON_WINDOW_CLOSE TICK TIME_DRIVEN]
    CONSTRUCT/WHERE — firings instantiate the template into the store."""
    from kolibrie_spark.engine import SparqlEngine

    engine = SparqlEngine(spark)
    rows = []
    rsp = engine.register_rule(
        """PREFIX ex: <http://example.org#>
RULE :TemperatureAlert :-
RSTREAM
FROM NAMED WINDOW <http://example.org/window1> ON <http://example.org/temperatureStream> [SLIDING 10 SLIDE 2 REPORT ON_WINDOW_CLOSE TICK TIME_DRIVEN]
CONSTRUCT {
    ?room <http://example.org#hasAlert> "high_temperature" .
}
WHERE {
    ?reading <http://example.org#room> ?room .
    ?reading <http://example.org#temperature> ?temp .
    FILTER (?temp > 90)
}"""
    )
    # RSPEngine returned; feed readings — r1 hot, r2 cool
    for t, (rid, room, temp) in enumerate(
        [("r1", "room101", "95"), ("r2", "room102", "45")]
    ):
        rsp.add_to_stream(
            "http://example.org/temperatureStream",
            (rid, "http://example.org#room", room),
            t,
        )
        rsp.add_to_stream(
            "http://example.org/temperatureStream",
            (rid, "http://example.org#temperature", temp),
            t,
        )
    # advance app time to t=10: the latest closed window is [0,10), which
    # holds both readings (C-SPARQL reports the max-close closed window)
    rsp.add_to_stream(
        "http://example.org/temperatureStream",
        ("r3", "http://example.org#temperature", "10"),
        10,
    )
    got = engine.execute(
        "SELECT ?room WHERE { ?room <http://example.org#hasAlert> ?a }"
    )
    assert got == [["room101"]]  # hot room materialized, cool room not


def test_streaming_rule_parse_shapes():
    from kolibrie_spark.streaming.rules import parse_streaming_rule

    r = parse_streaming_rule(
        """RULE :X :- DSTREAM
FROM NAMED WINDOW <w> ON <s> [RANGE 15 REPORT PERIODIC 5 TICK TIME_DRIVEN]
CONSTRUCT { ?a <p> "v" . }
WHERE { ?a <q> ?b . }"""
    )
    assert r.operator == "DSTREAM" and r.name == "X"
    assert "REGISTER DSTREAM <urn:rule:X>" in r.register_text
    assert "WINDOW <w>" in r.register_text
    assert len(r.template) == 1


def test_parse_rsp_ql_syntax_example_verbatim():
    """Ports examples/sparql_syntax/rsp_ql_syntax/retrieve.rs: the full
    RETRIEVE + REGISTER text parses as-is, including the undeclared
    ssn:/: prefixed terms the reference resolves leniently
    (resolve_term_with_prefix falls back to the raw name)."""
    q = """RETRIEVE SOME ACTIVE STREAM ?s FROM <http://my.org/catalog>
WITH {
    ?s a :Stream .
    ?s :hasDescriptor ?descriptor .
    ?descriptor :hasMetaData ?meta.
    ?meta :hasLocation <:somelocation>.
    ?meta :hasCoverage <:someArea>.
}
REGISTER RSTREAM <http://out/stream> AS
SELECT *
FROM NAMED WINDOW :wind ON ?s [RANGE PT10M STEP PT1M]
WHERE {
    WINDOW :wind {
        ?obs a ssn:Observation .
        ?obs ssn:hasSimpleResult ?value .
    }
}"""
    clause = parse_retrieve(q)
    assert clause.mode == "SOME" and clause.variable == "s"
    assert len(clause.group.elements) == 5
    reg = parse_rspql(q[q.index("REGISTER") :])
    assert reg.operator == "RSTREAM"
    assert reg.output_iri == "http://out/stream"
    w = reg.windows[0]
    assert (w.iri, w.width, w.slide, w.stream) == ("wind", 600, 60, None)
    # undeclared ssn: terms kept as raw prefixed names (reference parity)
    pats = [e for e in w.group.elements]
    assert any(getattr(p.p, "value", None) == "ssn:hasSimpleResult" for p in pats)


def test_continuous_stream_rule_strings_parse():
    """Grammar-parity pin for combination/continious_stream.rs: its three
    windowed RULE strings (SLIDING+SLIDE, TUMBLING with TUPLE_DRIVEN tick,
    RANGE with bare `REPORT PERIODIC`) must all parse to the matching
    stream operators."""
    from kolibrie_spark.streaming.rules import parse_streaming_rule

    rstream = parse_streaming_rule(
        """PREFIX ex: <http://example.org#>
RULE :TemperatureAlert :-
RSTREAM
FROM NAMED WINDOW <http://example.org/window1> ON <http://example.org/temperatureStream> [SLIDING 6 SLIDE 2 REPORT ON_WINDOW_CLOSE TICK TIME_DRIVEN]
CONSTRUCT { ?room ex:hasAlert "high_temperature" . }
WHERE { ?reading ex:room ?room ;
                 ex:temperature ?temp ;
                 ex:timestamp ?time .
        FILTER (?temp > 90) }"""
    )
    istream = parse_streaming_rule(
        """PREFIX ex: <http://example.org#>
RULE :NewHighTemp :-
ISTREAM
FROM NAMED WINDOW <http://example.org/window2> ON <http://example.org/tempStream> [TUMBLING 4 REPORT NON_EMPTY_CONTENT TICK TUPLE_DRIVEN]
CONSTRUCT { ?room ex:newHighReading ?temp . }
WHERE { ?reading ex:room ?room ; ex:temperature ?temp . FILTER (?temp > 85) }"""
    )
    dstream = parse_streaming_rule(
        """PREFIX ex: <http://example.org#>
RULE :ExtremeAlert :-
DSTREAM
FROM NAMED WINDOW <http://example.org/window3> ON <http://example.org/sensorStream> [RANGE 8 REPORT PERIODIC TICK TIME_DRIVEN]
CONSTRUCT { ?room ex:extremeLevel ?temp . }
WHERE { ?reading ex:room ?room ; ex:temperature ?temp ; ex:timestamp ?time .
        FILTER (?temp > 115) }"""
    )
    assert (rstream.operator, istream.operator, dstream.operator) == (
        "RSTREAM",
        "ISTREAM",
        "DSTREAM",
    )
    assert all(len(r.template) == 1 for r in (rstream, istream, dstream))
