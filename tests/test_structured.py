"""Structured (micro-batch, DataFrame-state) RSP compilation — the scale
path twin of the faithful engine."""

import pytest
from pyspark.sql import functions as F

ITYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def events_df(spark, rows):
    """rows: (s, p, o, stream, event_time)"""
    return spark.createDataFrame(
        [(s, p, o, None, st, t) for (s, p, o, st, t) in rows],
        "s string, p string, o string, g string, stream string, event_time long",
    )


def test_window_assignments(spark):
    from kolibrie_spark.streaming.structured import window_assignments

    df = spark.createDataFrame([("a", 5)], "s string, event_time long")
    out = window_assignments(df, "event_time", 10, 2).select(
        "window_open", "window_close"
    )
    got = sorted((r.window_open, r.window_close) for r in out.collect())
    # event at t=5 belongs to windows opening at 0,2,4 (width 10, slide 2,
    # non-negative opens, open <= 5 < open+10)
    assert got == [(0, 10), (2, 12), (4, 14)]


def test_rstream_micro_batches(spark):
    from kolibrie_spark.streaming.structured import compile_structured

    q = compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s <reading> ?v } }""",
    )
    ev = events_df(
        spark,
        [(f"dev{t}", "reading", str(t), "s1", t) for t in range(8)],
    )
    out = q.run_events_df(ev, batch_seconds=4)
    assert out  # windows [0,4) and [2,6)... fire as hwm passes closes
    # every emitted binding carries both vars
    assert all({k for k, _ in row} == {"s", "v"} for row in out)


def test_istream_emits_only_new(spark):
    from kolibrie_spark.streaming.structured import compile_structured

    q = compile_structured(
        spark,
        """REGISTER ISTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s a <T> } }""",
    )
    ev = events_df(
        spark,
        [(f"x{t}", ITYPE, "T", "s1", t) for t in range(10)],
    )
    out = q.run_events_df(ev, batch_seconds=2)
    # ISTREAM: each subject emitted at most once
    subjects = [dict(r)["s"] for r in out]
    assert len(subjects) == len(set(subjects))
    assert len(subjects) >= 4


def test_dstream_emits_dropped(spark):
    from kolibrie_spark.streaming.structured import compile_structured

    q = compile_structured(
        spark,
        """REGISTER DSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 2 STEP 2]
           WHERE { WINDOW :w { ?s a <T> } }""",
    )
    ev = events_df(
        spark,
        [("a", ITYPE, "T", "s1", 0), ("b", ITYPE, "T", "s1", 2), ("c", ITYPE, "T", "s1", 4)],
    )
    out = q.run_events_df(ev, batch_seconds=2)
    dropped = [dict(r)["s"] for r in out]
    assert "a" in dropped  # a left the tumbling window after [0,2) fired


def test_watermark_drops_late_events(spark):
    from kolibrie_spark.streaming.structured import compile_structured

    mk = lambda wm: compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 100 STEP 10]
           WHERE { WINDOW :w { ?s <p> ?v } }""",
        watermark=wm,
    )
    # a late event 50s behind the high-water mark
    q = mk(5)
    q.process_batch(events_df(spark, [("new", "p", "1", "s1", 60)]))
    q.process_batch(events_df(spark, [("late", "p", "2", "s1", 10)]))
    buffered = {r.s for r in q.buffer.collect()}
    assert "late" not in buffered
    q2 = mk(None)  # no watermark: late event kept (faithful-leaning)
    q2.process_batch(events_df(spark, [("new", "p", "1", "s1", 60)]))
    q2.process_batch(events_df(spark, [("late", "p", "2", "s1", 10)]))
    assert {r.s for r in q2.buffer.collect()} == {"new", "late"}


def test_state_buffer_is_bounded(spark):
    from kolibrie_spark.streaming.structured import compile_structured

    q = compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s <p> ?v } }""",
    )
    rows = [(f"e{t}", "p", str(t), "s1", t) for t in range(0, 60)]
    q.run_events_df(events_df(spark, rows), batch_seconds=10)
    # retention horizon = hwm - (width + slide) = 59 - 6
    assert q.buffer.count() <= 8


def test_multi_window_static_join(spark):
    from kolibrie_spark.store import QuadStore
    from kolibrie_spark.streaming.structured import compile_structured

    static = QuadStore.from_rows(spark, [("dev1", "locatedIn", "lab")])
    q = compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w1 ON :s1 [RANGE 4 STEP 2]
           FROM NAMED WINDOW :w2 ON :s2 [RANGE 4 STEP 2]
           WHERE { WINDOW :w1 { ?d <temp> ?t } WINDOW :w2 { ?d <hum> ?h }
                   ?d <locatedIn> ?room }""",
        static_store=static,
    )
    ev = events_df(
        spark,
        [
            ("dev1", "temp", "20", "s1", 1),
            ("dev1", "hum", "40", "s2", 1),
            ("dev2", "temp", "99", "s1", 2),  # no static location, no hum
            ("dev1", "temp", "21", "s1", 5),
            ("dev1", "hum", "41", "s2", 5),
        ],
    )
    out = q.run_events_df(ev, batch_seconds=3)
    assert out
    for row in out:
        d = dict(row)
        assert d["d"] == "dev1" and d["room"] == "lab"


def test_real_readstream_foreachbatch(spark, tmp_path):
    """Attach StructuredRSP to an actual file streaming source via
    writeStream/foreachBatch (the production wiring of start())."""
    import time

    from kolibrie_spark.streaming.structured import compile_structured

    src = tmp_path / "stream_in"
    src.mkdir()
    chk = tmp_path / "chk"
    q = compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s <reading> ?v } }""",
    )
    schema = "s string, p string, o string, g string, stream string, event_time long"
    stream_df = spark.readStream.schema(schema).json(str(src))

    # first batch of files before starting, then more
    import json

    def write_file(name, rows):
        (src / name).write_text(
            "\n".join(
                json.dumps(
                    dict(s=s, p=p, o=o, g=None, stream=st, event_time=t)
                )
                for (s, p, o, st, t) in rows
            )
        )

    write_file("a.json", [(f"d{t}", "reading", str(t), "s1", t) for t in range(5)])
    sq = q.start(stream_df, str(chk))
    try:
        write_file("b.json", [(f"d{t}", "reading", str(t), "s1", t) for t in range(5, 9)])
        deadline = time.time() + 60
        while time.time() < deadline and not q.emissions:
            sq.processAllAvailable()
            time.sleep(0.3)
    finally:
        sq.stop()
    assert q.emissions  # windows fired through the live streaming sink
    assert all({k for k, _ in row} == {"s", "v"} for row in q.emissions)


def test_database_union(spark):
    from kolibrie_spark.store import QuadStore

    a = QuadStore.from_rows(spark, [("x", "p", "1"), ("y", "p", "2", "g1")])
    b = QuadStore.from_rows(spark, [("x", "p", "1"), ("z", "q", "3")])
    merged = a.union(b)
    assert merged.quads.count() == 3  # shared quad deduped
    assert merged.named_graph_names().count() == 1


def test_sink_mode_no_driver_materialization(spark, tmp_path):
    """Scale path (VERDICT r1 #3): with a sink, emissions are handed to it
    as DataFrames inside the batch and nothing collects on the driver; the
    sunk results equal collect-mode output."""
    from kolibrie_spark.streaming.structured import compile_structured, parquet_sink

    query = """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s <reading> ?v } }"""
    rows = [(f"dev{t}", "reading", str(t), "s1", t) for t in range(8)]

    path = str(tmp_path / "results")
    sunk_frames = []

    def spy_sink(out_df):
        assert hasattr(out_df, "write")  # a DataFrame, not rows
        sunk_frames.append(out_df)
        parquet_sink(path)(out_df)

    q_sink = compile_structured(spark, query, sink=spy_sink)
    returned = q_sink.run_events_df(events_df(spark, rows), batch_seconds=4)
    assert returned == [] and q_sink.emissions == []  # nothing on the driver
    assert sunk_frames

    q_collect = compile_structured(spark, query)
    q_collect.run_events_df(events_df(spark, rows), batch_seconds=4)
    expected = sorted(tuple(sorted(r)) for r in q_collect.emissions)
    got = sorted(
        tuple(sorted(r.asDict().items())) for r in spark.read.parquet(path).collect()
    )
    assert got == expected


def test_start_foreachbatch_with_sink(spark, tmp_path):
    """start() drives process_batch through a real foreachBatch stream; in
    sink mode the results land in the results table only."""
    import time

    from kolibrie_spark.streaming.structured import compile_structured, parquet_sink

    src_dir, ckpt, results = (
        str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "res"),
    )
    rows = [(f"dev{t}", "reading", str(t), None, "s1", t) for t in range(8)]
    spark.createDataFrame(
        rows,
        "s string, p string, o string, g string, stream string, event_time long",
    ).write.parquet(src_dir)

    q = compile_structured(
        spark,
        """REGISTER RSTREAM <out> AS SELECT *
           FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 2]
           WHERE { WINDOW :w { ?s <reading> ?v } }""",
        sink=parquet_sink(results),
    )
    stream = (
        spark.readStream.schema(
            "s string, p string, o string, g string, stream string, event_time long"
        ).parquet(src_dir)
    )
    sq = q.start(stream, ckpt)
    sq.processAllAvailable()
    sq.stop()
    assert q.emissions == []
    assert spark.read.parquet(results).count() > 0


def test_sessionize_stream_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator path: per-user open-session state via
    applyInPandasWithState; closed sessions emit across micro-batches and
    match the batch sessionize() twin."""
    import time

    from kolibrie_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [("u1", 0), ("u1", 10), ("u1", 1000), ("u1", 1005), ("u2", 5)]
    spark.createDataFrame(batch1, "u string, t long").write.parquet(src)

    stream = spark.readStream.schema("u string, t long").parquet(src)
    out = sessionize_stream(stream, "u", "t", gap=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    got1 = {
        (r.u, r.session_id, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }
    # u1's first session (0..10) closed by the 1000 event; (1000,1005) open
    assert got1 == {("u1", 0, 10, 2)}

    # a later batch closes u1's open session; u2 stays open forever
    spark.createDataFrame([("u1", 5000)], "u string, t long").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got2 = {
        (r.u, r.session_id, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }
    assert got2 == {("u1", 0, 10, 2), ("u1", 1000, 1005, 2)}


def test_sessionize_stream_event_time_timeout_flushes_idle(spark, tmp_path):
    """flush_open_sessions=True: once the event-time watermark passes an
    idle user's last+gap, the open session is emitted and its state freed
    (round-3 ADVICE fix: NoTimeout held idle sessions forever)."""
    from kolibrie_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # times sit well above epoch 0: the initial watermark is 0 and rows at
    # exactly the watermark are dropped as late
    batch1 = [("u1", 1000), ("u1", 1010), ("u2", 1005)]
    spark.createDataFrame(batch1, "u string, t long").write.parquet(src)

    stream = spark.readStream.schema("u string, t long").parquet(src)
    out = sessionize_stream(stream, "u", "t", gap=60, flush_open_sessions=True)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_flush_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # an unrelated user's much-later event advances the watermark past
    # u1's and u2's last+gap — their open sessions must flush WITHOUT any
    # further u1/u2 events
    spark.createDataFrame([("u3", 10_000)], "u string, t long").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    # one more batch: the watermark computed at batch N flushes at N+1
    spark.createDataFrame([("u3", 10_001)], "u string, t long").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {
        (r.u, r.session_id, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_flush_test").collect()
    }
    assert ("u1", 1000, 1010, 2) in got
    assert ("u2", 1005, 1005, 1) in got


def test_sessionize_batch_matches_manual(spark):
    from kolibrie_spark.operators.temporal import sessionize

    rows = [("u1", 0), ("u1", 100), ("u1", 5000), ("u2", 50)]
    df = spark.createDataFrame(rows, "u string, t long")
    got = {
        (r.u, r.t): (r.session_seq, r.session_id)
        for r in sessionize(df, "u", "t", gap=1800).collect()
    }
    assert got == {
        ("u1", 0): (1, 0),
        ("u1", 100): (1, 0),
        ("u1", 5000): (2, 5000),
        ("u2", 50): (1, 50),
    }


def test_sessionize_split_by_bit_identical(spark):
    """split_by pre-split must match the unsplit plan exactly, including
    sessions that span bucket boundaries and buckets with no new session
    (a single session crossing 3+ buckets exercises the open-start carry)."""
    import random

    from kolibrie_spark.operators.temporal import sessionize

    rng = random.Random(7)
    rows = []
    for u in range(6):
        t = rng.randrange(0, 500)
        for _ in range(rng.randrange(30, 80)):
            # mix of small steps (same session, often crossing the 1000s
            # bucket edge) and > gap jumps (new sessions)
            t += rng.choice([5, 40, 200, 900, 2500])
            rows.append((f"u{u}", t))
    # one session fully covering many buckets: steps always < gap
    t = 100
    for _ in range(50):
        t += 400  # bucket width 1000, gap 600 -> no new flags for 20 buckets
        rows.append(("marathon", t))
    df = spark.createDataFrame(rows, "u string, t long")
    base = {
        (r.u, r.t, r.session_seq, r.session_id)
        for r in sessionize(df, "u", "t", gap=600).collect()
    }
    split = {
        (r.u, r.t, r.session_seq, r.session_id)
        for r in sessionize(df, "u", "t", gap=600, split_by=1000).collect()
    }
    assert split == base


def test_sessionize_split_by_breaks_power_user_chain(spark):
    """Skew guard: with one user holding 50% of all events, the unsplit
    plan funnels that user into ONE window task; split_by bounds every
    (user, bucket) group so no single task owns the power user's timeline."""
    from pyspark.sql import functions as F

    from kolibrie_spark.operators.temporal import sessionize

    rows = [("whale", i * 10) for i in range(4000)]
    rows += [(f"u{i % 40}", 40_000 + i * 7) for i in range(4000)]
    df = spark.createDataFrame(rows, "u string, t long")

    split_by = 2000  # whale: 4000 events over 40000s -> 200 events/bucket
    out = sessionize(df, "u", "t", gap=600, split_by=split_by)
    base = {
        (r.u, r.t, r.session_seq, r.session_id)
        for r in sessionize(df, "u", "t", gap=600).collect()
    }
    assert {
        (r.u, r.t, r.session_seq, r.session_id) for r in out.collect()
    } == base

    # the serial unit of work is the (user, bucket) group: the whale's
    # worst group must be a small slice of its 4000-event timeline
    sizes = (
        df.withColumn("b", (F.col("t") / split_by).cast("long"))
        .groupBy("u", "b")
        .count()
    )
    assert sizes.agg(F.max("count")).first()[0] <= 220


def test_live_istream_gate_matches_replay_twin(spark):
    """The live readStream->foreachBatch ISTREAM gate must emit exactly the
    batch replay twin's rows, restricted to windows that close under the
    final high-water mark (the last partial window never fires live)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from kolibrie_spark.streaming.replay import istream_replay

    sf = "/root/testdata/sf0.001"
    width = 864000
    live = {
        (r.window_open, r.u, r.t)
        for r in entry_mod._q_streaming_istream_live(spark, sf).collect()
    }
    ev = entry_mod._events_stream_df(spark, sf)
    hwm = ev.agg(F.max("event_time")).first()[0]
    twin = {
        (r.window_open, r.u, r.t)
        for r in istream_replay(ev, "event_time", width, ["u", "t"])
        .filter(F.col("window_open") + width <= hwm)
        .collect()
    }
    assert live == twin and live


def test_funnel_stream_matches_batch(spark, tmp_path):
    """Streaming funnel (applyInPandasWithState, one state row per user)
    converges to the batch funnel() result when all events have arrived
    in order."""
    from kolibrie_spark.operators.analytics import funnel
    from kolibrie_spark.streaming.funnel import funnel_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        ("u1", 100, "view"),
        ("u1", 200, "cart"),
        ("u2", 150, "view"),
        ("u3", 50, "buy"),  # buy before view: must not count
    ]
    batch2 = [
        ("u1", 300, "buy"),
        ("u2", 140, "cart"),  # before u2's t1=150: not after -> no advance
        ("u3", 60, "view"),
        ("u3", 70, "buy"),
    ]
    steps = ["view", "cart", "buy"]
    spark.createDataFrame(batch1, "u string, t long, et string").write.parquet(src)
    stream = spark.readStream.schema("u string, t long, et string").parquet(src)
    out = funnel_stream(stream, "u", "t", "et", steps)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(batch2, "u string, t long, et string").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    # latest emission per user = current funnel state
    rows = spark.sql(
        "SELECT * FROM funnel_test"
    ).collect()
    latest = {}
    for r in rows:
        cur = (r["t1"], r["t2"], r["t3"])
        prev = latest.get(r["uid"])
        # update stream: a later emission strictly advances (more fields set)
        if prev is None or sum(v is not None for v in cur) >= sum(
            v is not None for v in prev
        ):
            latest[r["uid"]] = cur
    all_events = batch1 + batch2
    bdf = spark.createDataFrame(all_events, "u string, t long, et string")
    batch_out = {
        r["uid"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel(bdf, "u", "t", "et", steps).collect()
    }
    # streaming emits only users who entered the funnel (t1 set)
    assert {u: v for u, v in latest.items() if v[0] is not None} == batch_out
    assert batch_out["u1"] == (100, 200, 300)
    assert batch_out["u2"] == (150, None, None)
    assert batch_out["u3"] == (60, None, None)


def test_funnel_stream_recovers_from_checkpoint(spark, tmp_path):
    """Stop the stateful funnel query after batch 1 and start a NEW query
    from the same checkpoint: state (step-time vectors) must survive the
    restart, so batch 2 continues each user's funnel instead of starting
    over — the Structured Streaming recovery contract. (Sink is a
    foreachBatch parquet appender: the memory sink does not support
    checkpoint recovery.)"""
    import os

    from kolibrie_spark.streaming.funnel import funnel_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    results = str(tmp_path / "results")
    steps = ["view", "cart", "buy"]
    spark.createDataFrame(
        [("u1", 100, "view"), ("u1", 200, "cart")],
        "u string, t long, et string",
    ).write.parquet(src)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(results)

    def start_query():
        stream = spark.readStream.schema("u string, t long, et string").parquet(src)
        return (
            funnel_stream(stream, "u", "t", "et", steps)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start_query()
    q1.processAllAvailable()
    q1.stop()

    # new process-equivalent: fresh query object, same checkpoint
    spark.createDataFrame(
        [("u1", 300, "buy")], "u string, t long, et string"
    ).write.mode("append").parquet(src)
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    rows = spark.read.parquet(results).collect()
    # the restarted query only saw batch 2, but recovered t1/t2 from
    # state: its final emission shows the COMPLETED funnel
    emissions = sorted(
        ((r["t1"], r["t2"], r["t3"]) for r in rows if r["uid"] == "u1"),
        key=lambda x: sum(v is not None for v in x),
    )
    assert emissions[-1] == (100, 200, 300)


def test_ewma_stream_matches_batch_fold(spark, tmp_path):
    """Streaming EWMA (applyInPandasWithState, 2-number state per key)
    converges to the batch ewma_last fold over the full history when
    batch boundaries respect event-time order."""
    from kolibrie_spark.operators.scd import ewma_last
    from kolibrie_spark.streaming.ewma import ewma_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    hist = [(f"k{i % 3}", i, float(((i * 31) % 97) - 48) / 7.0) for i in range(60)]
    # two chronological batches
    spark.createDataFrame(hist[:30], "k string, t long, v double").write.parquet(src)

    stream = spark.readStream.schema("k string, t long, v double").parquet(src)
    out = ewma_stream(stream, "k", "t", "v", alpha=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(hist[30:], "k string, t long, v double").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    # last emission per key == batch fold over the whole history
    live = {
        r.k: (r.n_obs, r.ewma)
        for r in spark.sql(
            "SELECT k, n_obs, ewma FROM (SELECT *, row_number() OVER "
            "(PARTITION BY k ORDER BY n_obs DESC) AS rn FROM ewma_test) "
            "WHERE rn = 1"
        ).collect()
    }
    batch_df = spark.createDataFrame(hist, "k string, t long, v double")
    want = {
        r.k: (r.n_obs, r.ewma)
        for r in ewma_last(batch_df, "k", "t", "v", alpha=0.3).collect()
    }
    assert live == want


_TWO_WINDOW_Q = """REGISTER RSTREAM <out> AS SELECT *
       FROM NAMED WINDOW :w1 ON :s1 [RANGE 4 STEP 4]
       FROM NAMED WINDOW :w2 ON :s2 [RANGE 5 STEP 5]
       WHERE { WINDOW :w1 { ?a <p> ?x } WINDOW :w2 { ?b <q> ?y } }"""


def _two_stream_events(spark, n=18):
    rows = []
    for ts in range(n):
        rows.append((f"a{ts}", "p", f"x{ts % 3}", "s1", ts))
        rows.append((f"b{ts}", "q", f"y{ts % 2}", "s2", ts))
    return events_df(spark, rows)


def test_structured_wait_vs_steal_coordination(spark):
    """Batch twin of rsp_engine.rs:539-770 Wait/Steal: with w1 closing at
    4,8,12,16 and w2 at 5,10,15 (never simultaneously under 1-second
    batches), Wait emits only on full cycles while Steal also emits on
    w1-only firings with stale w2 results."""
    from kolibrie_spark.streaming.structured import compile_structured

    ev = _two_stream_events(spark)
    wait = compile_structured(spark, _TWO_WINDOW_Q, sync_policy=("WAIT",))
    steal = compile_structured(spark, _TWO_WINDOW_Q, sync_policy=("STEAL",))
    wait_out = wait.run_events_df(ev, batch_seconds=1)
    steal_out = steal.run_events_df(ev, batch_seconds=1)
    # Wait cycles complete at hwm 5 (w1@4+w2@5), 10 (w1@8+w2@10),
    # 15 (w1@12+w2@15); Steal additionally fires at 8, 12, 16 (stale w2)
    assert len(wait.emissions) < len(steal.emissions)
    # every Wait emission is also a Steal emission (same fresh-fresh join)
    def as_multiset(rows):
        return sorted(tuple(r) for r in rows)
    assert set(map(tuple, wait_out)) <= set(map(tuple, steal_out))
    # the Steal-only rows join a FRESH w1 with a STALE w2 (b-values older
    # than the a-values' window)
    steal_only = [r for r in steal_out if tuple(r) not in set(map(tuple, wait_out))]
    assert steal_only


def test_structured_timeout_event_time_deadline(spark):
    """Timeout(d, STEAL) flushes an open cycle once the high-water mark
    runs d seconds past the cycle's first firing; DROP discards it."""
    from kolibrie_spark.streaming.structured import compile_structured

    # s2 stops at ts 9, so w2 last fires [0,5) and every later w1 firing
    # leaves an open cycle that only the deadline can resolve
    rows = []
    for ts in range(18):
        rows.append((f"a{ts}", "p", "x", "s1", ts))
        if ts < 10:
            rows.append((f"b{ts}", "q", "y", "s2", ts))
    ev = events_df(spark, rows)
    out_by_fallback = {}
    for fallback in ("STEAL", "DROP"):
        q = compile_structured(
            spark, _TWO_WINDOW_Q, sync_policy=("TIMEOUT", 3, fallback)
        )
        q.run_events_df(ev, batch_seconds=1)
        out_by_fallback[fallback] = list(q.emissions)
    assert len(out_by_fallback["STEAL"]) > len(out_by_fallback["DROP"])


def test_live_two_window_sync_matches_faithful_engine(spark, tmp_path):
    """VERDICT r3 item #6: a REAL two-window readStream run (file source,
    one file per second so micro-batches close at most one window — the
    granularity where batch and event-at-a-time coordination coincide)
    produces, for BOTH Wait and Steal, exactly the faithful RSPEngine's
    emissions on the same timeline; and the Wait-vs-Steal emission
    difference is the stale-reuse firings."""
    import os
    import time

    from kolibrie_spark.streaming.engine import RSPEngine
    from kolibrie_spark.streaming.structured import compile_structured

    n = 18
    live_out = {}
    for policy in (("WAIT",), ("STEAL",)):
        src = tmp_path / f"in_{policy[0]}"
        src.mkdir()
        for ts in range(n):
            rows = [
                (f"a{ts}", "p", f"x{ts % 3}", "s1", ts),
                (f"b{ts}", "q", f"y{ts % 2}", "s2", ts),
            ]
            events_df(spark, rows).coalesce(1).write.mode("overwrite").json(
                str(tmp_path / f"part_{policy[0]}_{ts}")
            )
            part = tmp_path / f"part_{policy[0]}_{ts}"
            jfile = next(f for f in os.listdir(part) if f.endswith(".json"))
            dst = src / f"e{ts:03d}.json"
            os.rename(part / jfile, dst)
            os.utime(dst, (ts * 1000, ts * 1000))
        q = compile_structured(spark, _TWO_WINDOW_Q, sync_policy=policy)
        stream = (
            spark.readStream.schema(
                "s string, p string, o string, g string, stream string, "
                "event_time long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        sq = q.start(stream, str(tmp_path / f"ckpt_{policy[0]}"))
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()
        live_out[policy[0]] = sorted(map(tuple, q.emissions))

    faithful_out = {}
    for policy in (("WAIT",), ("STEAL",)):
        collected = []
        eng = RSPEngine(
            spark,
            _TWO_WINDOW_Q,
            consumer=collected.append,
            sync_policy=policy,
        )
        for ts in range(n):
            eng.add_to_stream("s1", (f"a{ts}", "p", f"x{ts % 3}"), ts)
            eng.add_to_stream("s2", (f"b{ts}", "q", f"y{ts % 2}"), ts)
        faithful_out[policy[0]] = sorted(map(tuple, collected))

    assert live_out["WAIT"] == faithful_out["WAIT"]
    assert live_out["STEAL"] == faithful_out["STEAL"]
    assert len(live_out["STEAL"]) > len(live_out["WAIT"])


def test_structured_timeout_matches_faithful_engine_event_clock(spark):
    """ADVICE r4: the structured TIMEOUT path must match RSPEngine driven
    by an injected EVENT-TIME clock — in particular the deadline flush
    must emit the window results as of the deadline (pre-batch state),
    not results evaluated in the same batch that trips the deadline.

    Both streams keep flowing (a stalled stream is the documented
    global-hwm divergence, not what this pins): w1 closes at 4,8,12,16
    and w2 at 5,10,15, so every cycle opens with a lone w1 firing and the
    1-second deadline trips at the NEXT event — the same event whose
    batch fires w2 — making flush-before-eval vs flush-after-eval
    produce different emissions."""
    from kolibrie_spark.streaming.engine import RSPEngine
    from kolibrie_spark.streaming.structured import compile_structured

    rows = []
    for ts in range(18):
        rows.append((f"a{ts}", "p", f"x{ts % 3}", "s1", ts))
        rows.append((f"b{ts}", "q", f"y{ts % 2}", "s2", ts))

    for fallback in ("STEAL", "DROP"):
        q = compile_structured(
            spark, _TWO_WINDOW_Q, sync_policy=("TIMEOUT", 1, fallback)
        )
        q.run_events_df(events_df(spark, rows), batch_seconds=1)
        structured = sorted(map(tuple, q.emissions))

        collected = []
        clock_now = [0.0]
        eng = RSPEngine(
            spark,
            _TWO_WINDOW_Q,
            consumer=collected.append,
            sync_policy=("TIMEOUT", 1, fallback),
            clock=lambda: clock_now[0],
        )
        for ts in range(18):
            clock_now[0] = float(ts)
            eng.add_to_stream("s1", (f"a{ts}", "p", f"x{ts % 3}"), ts)
            eng.add_to_stream("s2", (f"b{ts}", "q", f"y{ts % 2}"), ts)
        faithful = sorted(map(tuple, collected))
        assert structured == faithful, (
            f"fallback={fallback}: structured {len(structured)} emissions "
            f"!= faithful {len(faithful)}"
        )


def _report_parity(spark, query, timeline):
    """Run one (query, scripted-timeline) scenario through BOTH engines —
    structured at one-event-time-per-batch granularity and the faithful
    RSPEngine event-at-a-time — and return (structured, faithful)
    emission lists."""
    from kolibrie_spark.streaming.engine import RSPEngine
    from kolibrie_spark.streaming.structured import compile_structured

    q = compile_structured(spark, query)
    q.run_events_df(
        events_df(spark, [(s, p, o, st, ts) for (st, (s, p, o), ts) in timeline]),
        batch_seconds=1,
    )
    structured = sorted(map(tuple, q.emissions))

    collected = []
    eng = RSPEngine(spark, query, consumer=collected.append)
    eng.add_events(timeline)
    return structured, sorted(map(tuple, collected))


@pytest.mark.parametrize(
    "report, timeline",
    [
        (  # NonEmptyContent gates out the empty just-closed windows that
           # plain OnWindowClose would fire (gap timeline from s2r tests)
            "REPORT NON_EMPTY_CONTENT REPORT ON_WINDOW_CLOSE",
            [("s1", (f"a{t}", "p", f"x{t % 2}", ), t) for t in (1, 2, 3, 10, 20)],
        ),
        (  # Periodic(2): fires only on even event times
            "REPORT PERIODIC 2",
            [("s1", (f"a{t}", "p", f"x{t % 3}"), t) for t in range(1, 8)],
        ),
        (  # OnContentChange (reference quirk: fires on content EQUAL to
           # the last judged) over a timeline with repeats and changes
            "REPORT ON_CONTENT_CHANGE",
            [
                ("s1", ("a", "p", "x"), 1),
                ("s1", ("a", "p", "x"), 2),
                ("s1", ("a", "p", "x"), 4),
                ("s1", ("b", "p", "y"), 6),
                ("s1", ("b", "p", "y"), 7),
                ("s1", ("c", "p", "z"), 9),
            ],
        ),
        (  # NonEmptyContent alone: fires open windows too (max-close
           # candidate judged on pre-event content)
            "REPORT NON_EMPTY_CONTENT",
            [("s1", (f"a{t}", "p", "x"), t) for t in (1, 3, 6, 7, 11)],
        ),
    ],
    ids=["nonempty+close", "periodic", "content-change", "nonempty-alone"],
)
def test_structured_report_strategies_match_faithful(spark, report, timeline):
    """VERDICT r4 item #5: the faithful engine's report-strategy timeline
    semantics hold on the structured path too (at one-event-time-per-batch
    granularity, where the two coordinations coincide)."""
    timeline = [(st, tuple(tr), ts) for (st, tr, ts) in timeline]
    query = (
        "REGISTER RSTREAM <out> AS SELECT * "
        f"FROM NAMED WINDOW :w ON :s1 [RANGE 4 STEP 1 {report}] "
        "WHERE { WINDOW :w { ?a <p> ?x } }"
    )
    structured, faithful = _report_parity(spark, query, timeline)
    assert structured == faithful


@pytest.mark.parametrize(
    "report, rng",
    [
        ("REPORT NON_EMPTY_CONTENT", "[RANGE 6 STEP 2"),
        ("REPORT PERIODIC 4", "[RANGE 9 STEP 3"),
        ("REPORT ON_CONTENT_CHANGE", "[RANGE 8 STEP 2"),
    ],
    ids=["nonempty-step2", "periodic-step3", "content-change-step2"],
)
def test_structured_report_strategies_sliding_step_gt1(spark, report, rng):
    """Report-strategy parity must also hold for STEP > 1 (multi-slide
    window arithmetic in _report_fire's candidate reconstruction)."""
    from kolibrie_spark.streaming.engine import RSPEngine
    from kolibrie_spark.streaming.structured import compile_structured

    query = (
        "REGISTER RSTREAM <out> AS SELECT * "
        f"FROM NAMED WINDOW :w ON :s1 {rng} {report}] "
        "WHERE { WINDOW :w { ?a <p> ?x } }"
    )
    timeline = [
        ("s1", (f"a{t}", "p", f"x{t % 2}"), t) for t in (1, 2, 5, 7, 8, 11, 14, 15)
    ]
    q = compile_structured(spark, query)
    q.run_events_df(
        events_df(spark, [(s, p, o, st, ts) for (st, (s, p, o), ts) in timeline]),
        batch_seconds=1,
    )
    structured = sorted(map(tuple, q.emissions))
    collected = []
    eng = RSPEngine(spark, query, consumer=collected.append)
    eng.add_events(timeline)
    assert structured == sorted(map(tuple, collected))


def test_per_stream_hwm_holds_stalled_stream_window(spark):
    """VERDICT r6 item #9: with per_stream_hwm=True, a stalled stream's
    window must HOLD (event-driven firing, reference
    rsp_engine.rs:773-811 routes events only to the matching windows) —
    parity with the faithful RSPEngine on a two-stream timeline where s2
    stalls at ts=5 while s1 runs to ts=17; the default global-hwm mode
    keeps closing the stalled window (the documented divergence)."""
    from kolibrie_spark.streaming.engine import RSPEngine
    from kolibrie_spark.streaming.structured import compile_structured

    n = 18
    stall_at = 5

    def timeline():
        for ts in range(n):
            rows = [(f"a{ts}", "p", f"x{ts % 3}", "s1", ts)]
            if ts < stall_at:
                rows.append((f"b{ts}", "q", f"y{ts % 2}", "s2", ts))
            yield ts, rows

    # faithful engine: event-at-a-time, s2's window never fires past its
    # last event
    collected = []
    eng = RSPEngine(spark, _TWO_WINDOW_Q, consumer=collected.append)
    for ts, rows in timeline():
        for s, p, o, st, t in rows:
            eng.add_to_stream(st, (s, p, o), t)
    faithful = sorted(map(tuple, collected))

    # structured, per-stream hwm, one event time per micro-batch (the
    # granularity where batch and event coordination coincide)
    q = compile_structured(spark, _TWO_WINDOW_Q, per_stream_hwm=True)
    out = []
    for ts, rows in timeline():
        out.extend(q.process_batch(events_df(spark, rows)))
    assert sorted(map(tuple, out)) == faithful

    # default mode diverges by design: the global hwm closes w2 windows
    # after s2 stalls, so it fires MORE (stale s2 content joins under
    # WAIT only when both windows fired this cycle — compare emission
    # multisets, not just counts, to pin the divergence is real)
    q_global = compile_structured(spark, _TWO_WINDOW_Q)
    out_global = []
    for ts, rows in timeline():
        out_global.extend(q_global.process_batch(events_df(spark, rows)))
    assert sorted(map(tuple, out_global)) != faithful


def test_fast_control_plane_matches_general_path(spark):
    """r13 differential pin: the one-job fast control plane (driver-side
    occupied-bucket close arithmetic + lazy-horizon checkpoint) must
    reproduce the general path's emissions AND firing trace exactly —
    including high-water-mark jumps larger than width+slide (where
    eviction can silently retire a never-fired window) and empty
    micro-batches."""
    import random

    from kolibrie_spark.streaming.structured import compile_structured

    queries = [
        # sliding, STEP < RANGE
        (
            "REGISTER ISTREAM <out> AS SELECT * "
            "FROM NAMED WINDOW :w ON :ev [RANGE 20 STEP 5] "
            "WHERE { WINDOW :w { ?u <t> ?t } }",
            ("WAIT",),
        ),
        # two tumbling windows, STEAL coordination
        (
            "REGISTER RSTREAM <out> AS SELECT * "
            "FROM NAMED WINDOW :w1 ON :ev [RANGE 10 STEP 10] "
            "FROM NAMED WINDOW :w2 ON :ev [RANGE 15 STEP 15] "
            "WHERE { WINDOW :w1 { ?u <t> ?t } WINDOW :w2 { ?u <t> ?t } }",
            ("STEAL",),
        ),
    ]
    rng = random.Random(7)
    for qtext, policy in queries:
        t, rows = 0, []
        for i in range(14):
            # one guaranteed gap > width+slide (the eviction-retires-window
            # edge where the buffer aggregate would see nothing) plus
            # random small steps; i==7 pins the jump so the edge is
            # exercised every run
            t += 40 if i == 7 else rng.choice([1, 2, 3, 5])
            rows.append(
                (
                    f"u{rng.randint(0, 4)}",
                    "t",
                    f"x{rng.randint(0, 2)}",
                    "ev",
                    t,
                )
            )
        df = events_df(spark, rows)
        got = []
        for fast in (True, False):
            q = compile_structured(spark, qtext, sync_policy=policy)
            q._fast = fast
            res = q.run_events_df(df, batch_seconds=10)
            got.append((res, dict(q._fired_until)))
        assert got[0] == got[1], f"fast!=general for {qtext}"


def test_fast_control_plane_per_stream_hwm_parity(spark):
    """Same differential under per_stream_hwm=True with one stalled
    stream: the fast path's per-(stream,bucket) marks must hold a stalled
    stream's window exactly like the general path."""
    from kolibrie_spark.streaming.structured import compile_structured

    qtext = (
        "REGISTER RSTREAM <out> AS SELECT * "
        "FROM NAMED WINDOW :w1 ON :a [RANGE 10 STEP 10] "
        "FROM NAMED WINDOW :w2 ON :b [RANGE 10 STEP 10] "
        "WHERE { WINDOW :w1 { ?u <t> ?t } WINDOW :w2 { ?u <t> ?t } }"
    )
    rows = [
        ("u1", "t", "x", "a", 2),
        ("u1", "t", "x", "b", 3),
        ("u2", "t", "x", "a", 12),   # stream b stalls: its window must hold
        ("u1", "t", "x", "a", 23),
        ("u1", "t", "x", "b", 24),
    ]
    df = events_df(spark, rows)
    got = []
    for fast in (True, False):
        q = compile_structured(
            spark, qtext, sync_policy=("STEAL",), per_stream_hwm=True
        )
        q._fast = fast
        res = q.run_events_df(df, batch_seconds=5)
        got.append((res, dict(q._fired_until)))
    assert got[0] == got[1]
