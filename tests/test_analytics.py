"""Paragraph dedup, funnel, and retention operators."""

import datetime

import duckdb
import pytest


# ---------------------------------------------------------------------------
# paragraph dedup
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_basic(spark):
    from kolibrie_spark.operators.paragraphs import dedup_paragraphs

    docs = [
        (1, "intro\ncookie banner\nbody one"),
        (2, "cookie banner\nbody two"),
        (3, "cookie banner\n\nbody three\nbody three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    # doc 1 holds the first occurrence of the banner -> untouched
    assert out[1]["text_clean"] == "intro\ncookie banner\nbody one"
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
    # doc 2 loses the banner (first occurrence is doc 1)
    assert out[2]["text_clean"] == "body two"
    assert out[2]["n_kept"] == 1
    # doc 3: banner gone, empty line preserved, its own intra-doc dup gone
    assert out[3]["text_clean"] == "\nbody three"
    assert out[3]["n_paras"] == 4 and out[3]["n_kept"] == 2


def test_dedup_paragraphs_partition_invariant(spark):
    from kolibrie_spark.operators.paragraphs import dedup_paragraphs

    docs = [(i, f"shared header\nunique body {i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        (r["doc_id"], r["text_clean"])
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    )
    b = sorted(
        (r["doc_id"], r["text_clean"])
        for r in dedup_paragraphs(df.repartition(7), "doc_id", "text").collect()
    )
    assert a == b
    # only doc 0 keeps the header
    kept_header = [d for d, t in a if "shared header" in t]
    assert kept_header == [0]


def test_dedup_paragraphs_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.paragraphs import (
        dedup_paragraphs,
        dedup_paragraphs_duckdb_sql,
    )

    rng = random.Random(9)
    paras = [f"para-{i}" for i in range(12)] + ["", "boiler"]
    docs = [
        (i, "\n".join(rng.choice(paras) for _ in range(rng.randint(1, 6))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mine = {
        tuple(r) for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    ref = {
        tuple(r)
        for r in con.execute(
            dedup_paragraphs_duckdb_sql("t", "doc_id", "text")
        ).fetchall()
    }
    assert mine == ref


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_funnel_basic(spark):
    from kolibrie_spark.operators.analytics import funnel

    ev = [
        # u1 completes view -> cart -> buy in order
        (1, _ts("2026-01-01 10:00"), "view"),
        (1, _ts("2026-01-01 11:00"), "cart"),
        (1, _ts("2026-01-01 12:00"), "buy"),
        # u2 abandons after cart
        (2, _ts("2026-01-02 09:00"), "view"),
        (2, _ts("2026-01-02 09:30"), "cart"),
        # u3 buys BEFORE viewing: buy must not count
        (3, _ts("2026-01-03 08:00"), "buy"),
        (3, _ts("2026-01-03 09:00"), "view"),
        # u4 never views -> not in result
        (4, _ts("2026-01-04 10:00"), "cart"),
    ]
    df = spark.createDataFrame(ev, "uid long, ts timestamp, et string")
    out = {
        r["uid"]: r
        for r in funnel(df, "uid", "ts", "et", ["view", "cart", "buy"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["t3"] == _ts("2026-01-01 12:00")
    assert out[2]["t2"] == _ts("2026-01-02 09:30") and out[2]["t3"] is None
    assert out[3]["t2"] is None and out[3]["t3"] is None


def test_funnel_strictly_after(spark):
    from kolibrie_spark.operators.analytics import funnel

    ev = [
        (1, _ts("2026-01-01 10:00"), "a"),
        (1, _ts("2026-01-01 10:00"), "b"),  # same instant: not after
        (1, _ts("2026-01-01 10:01"), "b"),
    ]
    df = spark.createDataFrame(ev, "uid long, ts timestamp, et string")
    [r] = funnel(df, "uid", "ts", "et", ["a", "b"]).collect()
    assert r["t2"] == _ts("2026-01-01 10:01")


def test_funnel_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.analytics import funnel, funnel_duckdb_sql

    rng = random.Random(13)
    types = ["view", "cart", "buy", "noise"]
    ev = [
        (
            rng.randint(1, 30),
            _ts("2026-01-01 00:00") + datetime.timedelta(minutes=rng.randint(0, 5000)),
            rng.choice(types),
        )
        for _ in range(600)
    ]
    df = spark.createDataFrame(ev, "uid long, ts timestamp, et string")
    mine = {
        tuple(r)
        for r in funnel(df, "uid", "ts", "et", ["view", "cart", "buy"]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (uid BIGINT, ts TIMESTAMP, et VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ev)
    ref = {
        tuple(r)
        for r in con.execute(
            funnel_duckdb_sql("t", "uid", "ts", "et", ["view", "cart", "buy"])
        ).fetchall()
    }
    assert mine == ref


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------


def test_retention_basic(spark):
    from kolibrie_spark.operators.analytics import retention

    ev = [
        (1, _ts("2026-01-01 10:00")),
        (1, _ts("2026-01-09 10:00")),  # day 8 -> week 1
        (2, _ts("2026-01-01 23:00")),
        (2, _ts("2026-01-02 01:00")),  # day 1 -> week 0
        (3, _ts("2026-01-05 00:00")),
    ]
    df = spark.createDataFrame(ev, "uid long, ts timestamp")
    out = {
        (str(r["cohort_day"]), r["week_offset"]): r["n_users"]
        for r in retention(df, "uid", "ts").collect()
    }
    assert out[("2026-01-01", 0)] == 2  # u1+u2 week 0
    assert out[("2026-01-01", 1)] == 1  # u1 returns in week 1
    assert out[("2026-01-05", 0)] == 1


def test_retention_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.analytics import (
        retention,
        retention_duckdb_sql,
    )

    rng = random.Random(17)
    ev = [
        (
            rng.randint(1, 40),
            _ts("2026-01-01 00:00") + datetime.timedelta(hours=rng.randint(0, 2000)),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(ev, "uid long, ts timestamp")
    mine = {
        (str(r["cohort_day"]), r["week_offset"], r["n_users"])
        for r in retention(df, "uid", "ts").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (uid BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ev)
    ref = {
        (str(r[0])[:10], r[1], r[2])
        for r in con.execute(retention_duckdb_sql("t", "uid", "ts")).fetchall()
    }
    assert mine == ref


# ---------------------------------------------------------------------------
# duplicated-substring removal
# ---------------------------------------------------------------------------


def test_remove_duplicate_spans_basic(spark):
    from kolibrie_spark.operators.substring import remove_duplicate_spans

    boiler = "SUBSCRIBE-TO-OUR-NEWSLETTER-TODAY"  # 33 chars
    docs = [
        (1, f"first doc intro {boiler} and unique tail one"),
        (2, f"second doc {boiler} different content here"),
        (3, "totally unique short document body text"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "doc_id", "text", span_len=30).collect()
    }
    # doc 1 holds the first occurrence -> untouched
    assert out[1]["text_clean"] == docs[0][1] and out[1]["n_removed"] == 0
    # doc 2 loses the boilerplate span (and surrounding covered windows)
    assert boiler not in out[2]["text_clean"]
    assert out[2]["n_removed"] > 0
    assert out[2]["text_clean"].startswith("second doc")
    assert out[2]["text_clean"].endswith("here")
    assert out[3]["text_clean"] == docs[2][1] and out[3]["n_removed"] == 0
    assert out[4]["text_clean"] == "tiny" and out[4]["n_removed"] == 0


def test_remove_duplicate_spans_intra_doc(spark):
    from kolibrie_spark.operators.substring import remove_duplicate_spans

    span = "x" * 30
    df = spark.createDataFrame(
        [(1, f"A {span} B {span} C")], "doc_id long, text string"
    )
    [r] = remove_duplicate_spans(df, "doc_id", "text", span_len=20).collect()
    # a periodic self-overlapping repeat collapses aggressively (documented
    # artifact): every window after the globally first is covered, so only
    # the first window's uncovered head survives
    assert r["text_clean"] == "A x BC" and r["n_removed"] == 61


def test_remove_duplicate_spans_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.substring import (
        remove_duplicate_spans,
        remove_duplicate_spans_duckdb_sql,
    )

    rng = random.Random(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    boilers = [
        "this is a very long repeated legal disclaimer line",
        "click here to accept all cookies on this site now",
    ]
    docs = []
    for i in range(50):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 15))]
        if rng.random() < 0.5:
            words.insert(rng.randint(0, len(words)), rng.choice(boilers))
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mine = {
        tuple(r)
        for r in remove_duplicate_spans(df, "doc_id", "text", span_len=25).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    ref = {
        tuple(r)
        for r in con.execute(
            remove_duplicate_spans_duckdb_sql("t", "doc_id", "text", span_len=25)
        ).fetchall()
    }
    assert mine == ref


def test_remove_duplicate_spans_partition_invariant(spark):
    from kolibrie_spark.operators.substring import remove_duplicate_spans

    docs = [
        (i, f"common shared prefix line for everyone {i} plus suffix {i % 3}")
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df, "doc_id", "text", 30).collect()))
    b = sorted(
        map(
            tuple,
            remove_duplicate_spans(df.repartition(11), "doc_id", "text", 30).collect(),
        )
    )
    assert a == b


def test_remove_duplicate_spans_hash_keys_equivalent(spark):
    """The hashed-shuffle-key scale path produces identical output to the
    exact raw-string mode (12-byte keys vs L-char keys)."""
    import random

    from kolibrie_spark.operators.substring import remove_duplicate_spans

    rng = random.Random(53)
    vocab = ["alpha", "beta", "gamma", "delta"]
    boiler = "shared boilerplate legal disclaimer sentence"
    docs = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 12))]
        if rng.random() < 0.6:
            words.insert(rng.randint(0, len(words)), boiler)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = sorted(
        map(tuple, remove_duplicate_spans(df, "doc_id", "text", 25).collect())
    )
    hashed = sorted(
        map(
            tuple,
            remove_duplicate_spans(
                df, "doc_id", "text", 25, hash_keys=True
            ).collect(),
        )
    )
    assert exact == hashed


def test_funnel_horizon(spark):
    from kolibrie_spark.operators.analytics import funnel

    ev = [
        (1, 0, "a"), (1, 50, "b"), (1, 200, "c"),   # c outside horizon 100
        (2, 0, "a"), (2, 40, "b"), (2, 90, "c"),    # all inside
        (3, 0, "a"), (3, 150, "b"),                 # b outside horizon
    ]
    df = spark.createDataFrame(ev, "uid long, ts long, et string")
    out = {
        r["uid"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel(df, "uid", "ts", "et", ["a", "b", "c"], horizon=100).collect()
    }
    assert out[1] == (0, 50, None)
    assert out[2] == (0, 40, 90)
    assert out[3] == (0, None, None)


def test_funnel_horizon_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.analytics import funnel, funnel_duckdb_sql

    rng = random.Random(29)
    ev = [
        (rng.randint(1, 25), rng.randint(0, 1000), rng.choice(["a", "b", "c", "z"]))
        for _ in range(500)
    ]
    df = spark.createDataFrame(ev, "uid long, ts long, et string")
    mine = {
        (r["uid"], r["t1"], r["t2"], r["t3"])
        for r in funnel(df, "uid", "ts", "et", ["a", "b", "c"], horizon=200).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (uid BIGINT, ts BIGINT, et VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ev)
    sql = funnel_duckdb_sql("t", "uid", "ts", "et", ["a", "b", "c"], horizon=200)
    ref = {tuple(r) for r in con.execute(sql).fetchall()}
    assert mine == ref
