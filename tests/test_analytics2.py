"""Weighted sampling, token budget, rolling windows, pivot counts."""

import datetime

import duckdb


def test_weighted_sample_extremes(spark):
    from kolibrie_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, w double")
    kept = sorted(r["k"] for r in weighted_sample(df, "k", "w").collect())
    assert kept == [i for i in range(100) if i % 2 == 0]  # w=1 kept, w=0 dropped


def test_weighted_sample_rate_and_determinism(spark):
    from kolibrie_spark.operators.sampling import weighted_sample

    rows = [(i, 0.3) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, w double")
    kept1 = sorted(r["k"] for r in weighted_sample(df, "k", "w").collect())
    kept2 = sorted(
        r["k"] for r in weighted_sample(df.repartition(5), "k", "w").collect()
    )
    assert kept1 == kept2
    assert 0.25 < len(kept1) / 2000 < 0.35


def test_weighted_sample_duckdb_twin(spark):
    from kolibrie_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_duckdb_predicate,
    )

    rows = [(i, (i % 10) / 10.0) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, w double")
    mine = sorted(
        r["k"] for r in weighted_sample(df, "k", "w", scale=1.5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = weighted_sample_duckdb_predicate("k", "w", scale=1.5)
    ref = sorted(r[0] for r in con.execute(f"SELECT k FROM t WHERE {pred}").fetchall())
    assert mine == ref


def test_token_budget_shares(spark):
    from kolibrie_spark.operators.profiling import token_budget

    rows = [("big", "a b c d e")] * 6 + [("small", "x y")] * 2
    df = spark.createDataFrame(rows, "src string, text string")
    out = {r["src"]: r for r in token_budget(df, "src", "text").collect()}
    assert out["big"]["n_tokens"] == 30 and out["small"]["n_tokens"] == 4
    assert abs(out["big"]["token_share"] - 30 / 34) < 1e-12
    assert out["big"]["cum_share"] == 30 / 34
    assert out["small"]["cum_share"] == 1.0


def test_token_budget_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.profiling import (
        token_budget,
        token_budget_duckdb_sql,
    )

    rng = random.Random(7)
    rows = [
        (f"s{rng.randint(0, 5)}", " ".join("tok" for _ in range(rng.randint(1, 20))))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    mine = {tuple(r) for r in token_budget(df, "src", "text").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    ref = {
        tuple(r)
        for r in con.execute(token_budget_duckdb_sql("t", "src", "text")).fetchall()
    }
    assert mine == ref


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_rolling_user_stats_values(spark):
    from kolibrie_spark.operators.analytics import rolling_user_stats

    base = _ts("2026-01-01 10:00")
    us = lambda m: int((base + datetime.timedelta(minutes=m)).timestamp() * 1_000_000)
    ev = [
        (1, 1, us(0), 1.0),
        (2, 1, us(10), 2.0),
        (3, 1, us(30), 4.0),
        (4, 1, us(90), 8.0),  # 90min: outside 1h of events 1,2 but not 3
        (5, 2, us(0), 100.0),
    ]
    df = spark.createDataFrame(ev, "eid long, uid long, ts_us long, v double")
    out = {
        r["eid"]: r
        for r in rolling_user_stats(df, "uid", "ts_us", "v", "eid").collect()
    }
    assert out[3]["roll3_cents"] == 700  # 1+2+4
    assert out[4]["roll3_cents"] == 1400  # 2+4+8
    assert out[3]["range_cents"] == 700  # all within 1h
    assert out[4]["range_cents"] == 1200  # event 3 (30min) + itself
    assert out[5]["roll3_cents"] == 10000


def test_rolling_user_stats_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.analytics import (
        rolling_user_stats,
        rolling_user_stats_duckdb_sql,
    )

    rng = random.Random(23)
    ev = [
        (
            i,
            rng.randint(1, 20),
            1_700_000_000_000_000 + rng.randint(0, 20_000) * 1_000_000,
            round(rng.uniform(0, 50), 2),
        )
        for i in range(800)
    ]
    df = spark.createDataFrame(ev, "eid long, uid long, ts_us long, v double")
    mine = {
        tuple(r)
        for r in rolling_user_stats(
            df, "uid", "ts_us", "v", "eid", range_us=5_000_000_000
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (eid BIGINT, uid BIGINT, ts_us BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ev)
    ref = {
        tuple(r)
        for r in con.execute(
            rolling_user_stats_duckdb_sql(
                "t", "uid", "ts_us", "v", "eid", range_us=5_000_000_000
            )
        ).fetchall()
    }
    assert mine == ref


def test_pivot_counts(spark):
    from kolibrie_spark.operators.analytics import pivot_counts

    rows = [("s1", "en"), ("s1", "en"), ("s1", "fr"), ("s2", "fr"), ("s2", "xx")]
    df = spark.createDataFrame(rows, "src string, lang string")
    out = {
        r["src"]: (r["n_en"], r["n_fr"])
        for r in pivot_counts(df, "src", "lang", ["en", "fr"]).collect()
    }
    assert out == {"s1": (2, 1), "s2": (0, 1)}  # 'xx' dropped, missing -> 0


def test_pivot_counts_duckdb_twin(spark):
    import random

    from kolibrie_spark.operators.analytics import (
        pivot_counts,
        pivot_counts_duckdb_sql,
    )

    rng = random.Random(31)
    rows = [
        (f"s{rng.randint(0, 6)}", rng.choice(["en", "fr", "de", "zz"]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "src string, lang string")
    vals = ["en", "fr", "de"]
    mine = {tuple(r) for r in pivot_counts(df, "src", "lang", vals).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    ref = {
        tuple(r)
        for r in con.execute(
            pivot_counts_duckdb_sql("t", "src", "lang", vals)
        ).fetchall()
    }
    assert mine == ref


def test_embedding_contamination_detects_planted(spark):
    import numpy as np

    from kolibrie_spark.operators.contamination import embedding_contamination

    rng = np.random.RandomState(3)
    vecs = rng.randn(80, 16).round(4)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "cid long, embedding array<double>",
    )
    # bench = 5 corpus vectors with tiny jitter + 3 unrelated vectors
    planted = [(1000 + i, [float(x) * 1.0005 for x in vecs[i * 7]]) for i in range(5)]
    noise = [(2000 + i, [float(x) for x in rng.randn(16).round(4)]) for i in range(3)]
    bench = spark.createDataFrame(
        planted + noise, "bid long, embedding array<double>"
    )
    out = embedding_contamination(
        corpus, "cid", bench, "bid", "embedding", dim=16, tau=0.999
    )
    got = {(r["corpus_id"], r["bench_id"]) for r in out.collect()}
    # scaling preserves cosine exactly -> every planted pair within any
    # bucket split must map cid=i*7 to bid=1000+i; noise never matches
    assert got <= {(i * 7, 1000 + i) for i in range(5)}
    assert len(got) >= 4  # at most one pair lost to a bucket split
    assert all(b < 2000 for _, b in got)


def test_embedding_contamination_broadcasts_bench(spark):
    import numpy as np

    from kolibrie_spark.operators.contamination import embedding_contamination

    rng = np.random.RandomState(5)
    mk = lambda n, o: [(o + i, [float(x) for x in rng.randn(8)]) for i in range(n)]
    corpus = spark.createDataFrame(mk(40, 0), "cid long, embedding array<double>")
    bench = spark.createDataFrame(mk(4, 100), "bid long, embedding array<double>")
    plan = (
        embedding_contamination(corpus, "cid", bench, "bid", "embedding", dim=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_json_field_and_agg(spark):
    from kolibrie_spark.operators.semistructured import json_agg_by_key

    rows = [
        ("a", '{"k": 10}'),
        ("a", '{"k": 5, "other": 1}'),
        ("a", "not json"),
        ("a", '{"nokey": 2}'),
        ("b", '{"k": -3}'),
    ]
    df = spark.createDataFrame(rows, "g string, props string")
    out = {r["g"]: r for r in json_agg_by_key(df, "g", "props", "k").collect()}
    assert out["a"]["n_parsed"] == 2 and out["a"]["sum_v"] == 15
    assert out["a"]["min_v"] == 5 and out["a"]["max_v"] == 10
    assert out["b"]["sum_v"] == -3


def test_json_agg_duckdb_twin(spark):
    import json
    import random

    from kolibrie_spark.operators.semistructured import (
        json_agg_by_key,
        json_agg_by_key_duckdb_sql,
    )

    rng = random.Random(43)
    rows = []
    for _ in range(300):
        g = f"t{rng.randint(0, 4)}"
        roll = rng.random()
        if roll < 0.7:
            rows.append((g, json.dumps({"k": rng.randint(-100, 100)})))
        elif roll < 0.85:
            rows.append((g, json.dumps({"j": 1})))
        else:
            rows.append((g, "garbage{"))
    df = spark.createDataFrame(rows, "g string, props string")
    mine = {tuple(r) for r in json_agg_by_key(df, "g", "props", "k").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    ref = {
        tuple(r)
        for r in con.execute(
            json_agg_by_key_duckdb_sql("t", "g", "props", "k")
        ).fetchall()
    }
    assert mine == ref


def test_embedding_contamination_repetitions_raise_recall(spark):
    import numpy as np

    from kolibrie_spark.operators.contamination import embedding_contamination

    rng = np.random.RandomState(9)
    vecs = rng.randn(120, 16).round(4)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "cid long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(1000 + i, [float(x) * 1.0004 for x in vecs[i]]) for i in range(120)],
        "bid long, embedding array<double>",
    )
    args = (corpus, "cid", bench, "bid", "embedding")
    n1 = embedding_contamination(*args, dim=16, tau=0.999).count()
    n3 = embedding_contamination(*args, dim=16, tau=0.999, repetitions=3).count()
    assert n3 >= n1  # extra plane sets can only ADD shared-bucket pairs
    assert n3 >= 118  # ~all 120 planted pairs recovered at r=3
    # dedupe: no pair may appear twice
    out3 = embedding_contamination(*args, dim=16, tau=0.999, repetitions=3)
    rows = [(r["corpus_id"], r["bench_id"]) for r in out3.collect()]
    assert len(rows) == len(set(rows))


def test_session3_operators_on_empty_input(spark):
    """Every session-3 operator must handle an empty corpus/stream
    gracefully (no crash, empty or degenerate-but-sane output)."""
    from pyspark.sql import functions as F

    from kolibrie_spark.operators.analytics import (
        funnel,
        pivot_counts,
        retention,
        rolling_user_stats,
    )
    from kolibrie_spark.operators.audit import audit_counts, diff_snapshots
    from kolibrie_spark.operators.fuzzyjoin import fuzzy_vocab_pairs
    from kolibrie_spark.operators.normalize import normalize_text
    from kolibrie_spark.operators.paragraphs import dedup_paragraphs
    from kolibrie_spark.operators.profiling import ks_drift, token_budget
    from kolibrie_spark.operators.sampling import (
        domain_cap_sample,
        weighted_sample,
    )
    from kolibrie_spark.operators.scd import downsample_last, scd2_intervals
    from kolibrie_spark.operators.sketches import kmv_distinct
    from kolibrie_spark.operators.substring import remove_duplicate_spans

    docs = spark.createDataFrame([], "doc_id long, text string, source string, w double")
    ev = spark.createDataFrame([], "eid long, uid long, ts long, v double, et string")

    assert kmv_distinct(docs, "source", "text").count() == 0
    assert ks_drift(docs, "source", "doc_id", "a", "b").count() == 0
    assert token_budget(docs, "source", "text").count() == 0
    assert fuzzy_vocab_pairs(docs, "text").count() == 0
    assert normalize_text(docs, "text").count() == 0
    assert dedup_paragraphs(docs, "doc_id", "text").count() == 0
    assert remove_duplicate_spans(docs, "doc_id", "text").count() == 0
    assert domain_cap_sample(docs, "doc_id", "source", 5).count() == 0
    assert weighted_sample(docs, "doc_id", "w").count() == 0
    assert funnel(ev, "uid", "ts", "et", ["a", "b"]).count() == 0
    assert retention(ev, "uid", "ts").count() == 0
    assert rolling_user_stats(ev, "uid", "ts", "v", "eid").count() == 0
    assert pivot_counts(docs, "source", "text", ["x"]).count() == 0
    assert scd2_intervals(ev, "uid", "ts").count() == 0
    assert downsample_last(ev, "uid", "ts", "v", 100, "eid").count() == 0
    assert diff_snapshots(docs, docs, "doc_id", ["text"]).count() == 0
    # audit over empty: rules still produce one row each with 0 violations
    audit = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in audit_counts(docs, {"null_text": F.col("text").isNull()}).collect()
    }
    assert audit == {"null_text": (0, 0)}


def test_earlier_curation_operators_on_empty_input(spark):
    """Round-3 session-1/2 operators under an empty corpus."""
    from pyspark.sql import functions as F

    from kolibrie_spark.operators.contamination import ngram_containment
    from kolibrie_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from kolibrie_spark.operators.dsir import dsir_logweights
    from kolibrie_spark.operators.packing import pack_sequences
    from kolibrie_spark.operators.scrub import scrub_pii
    from kolibrie_spark.operators.search import bm25_topk, top_terms
    from kolibrie_spark.operators.textanalysis import gopher_rules

    docs = spark.createDataFrame([], "doc_id long, text string, source string, toks long")
    bench = spark.createDataFrame([("b", "benchmark text here")], "bid string, text string")

    assert exact_dedup(docs, ["text"], "doc_id").count() == 0
    assert minhash_lsh_pairs(docs, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).count() == 0
    assert ngram_containment(docs, "doc_id", "text", bench, "text", 3).count() == 0
    assert gopher_rules(docs, "doc_id", "text").count() == 0
    assert top_terms(docs, "text", 5).count() == 0
    assert bm25_topk(docs, "doc_id", "text", "query terms", 5).count() == 0
    assert pack_sequences(docs, "doc_id", "toks", 128, shards=4).count() == 0
    # dsir over empty raw corpus (target also empty)
    assert dsir_logweights(docs, docs, "doc_id", "text").count() == 0
    assert scrub_pii(docs, "doc_id", "text").count() == 0


def test_hard_negatives_contract_and_twin(spark):
    import numpy as np

    from kolibrie_spark.operators.embeddings import (
        hard_negatives,
        hard_negatives_duckdb_sql,
    )

    rng = np.random.RandomState(13)
    # two label clusters around distinct centers + a cross-class near-dup
    c0, c1 = rng.randn(8), rng.randn(8)
    rows = []
    for i in range(40):
        lbl = i % 2
        vec = (c0 if lbl == 0 else c1) + 0.3 * rng.randn(8)
        rows.append((i, [float(x) for x in vec.round(4)], lbl))
    # plant: vector 100 is label 1 but sits exactly on vector 0 (label 0)
    rows.append((100, rows[0][1], 1))
    df = spark.createDataFrame(rows, "vid long, embedding array<double>, label int")
    out = hard_negatives(
        df, "vid", "embedding", "label", dim=8, per_anchor=2
    )
    got = {(r["anchor_id"], r["negative_id"]) for r in out.collect()}
    # the planted twin is anchor 0's hardest negative (cosine 1.0, same bucket)
    assert (0, 100) in got and (100, 0) in got

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vid BIGINT, embedding DOUBLE[], label INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ref = {
        tuple(r)
        for r in con.execute(
            hard_negatives_duckdb_sql(
                "t", "vid", "embedding", "label", dim=8, per_anchor=2
            )
        ).fetchall()
    }
    mine = {tuple(r) for r in out.collect()}
    assert mine == ref


def test_hard_negatives_positive_relation(spark):
    import numpy as np

    from kolibrie_spark.operators.embeddings import hard_negatives

    rng = np.random.RandomState(17)
    c0, c1 = rng.randn(8) * 3, rng.randn(8) * 3
    rows = [
        (i, [float(x) for x in ((c0 if i % 2 == 0 else c1) + 0.1 * rng.randn(8)).round(4)], i % 2)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vid long, embedding array<double>, label int")
    pos = hard_negatives(
        df, "vid", "embedding", "label", dim=8, per_anchor=1, relation="positive"
    ).collect()
    labels = dict((r[0], r[2]) for r in rows)
    assert len(pos) > 0
    for r in pos:
        assert labels[r["anchor_id"]] == labels[r["negative_id"]]
        assert r["anchor_id"] != r["negative_id"]
        assert r["cosine"] > 0.9  # tight same-cluster pairs


def test_merge_intervals(spark):
    from kolibrie_spark.operators.temporal import merge_intervals

    rows = [
        ("u1", 0, 10), ("u1", 5, 12), ("u1", 12, 15),  # touch merges
        ("u1", 20, 25),
        ("u2", 3, 4), ("u2", 6, 7),
        ("u3", 0, 100), ("u3", 10, 20),  # contained
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        (r.k, r.s, r.e): r.n_merged
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert out == {
        ("u1", 0, 15): 3, ("u1", 20, 25): 1,
        ("u2", 3, 4): 1, ("u2", 6, 7): 1,
        ("u3", 0, 100): 2,
    }


def test_merge_intervals_matches_duckdb(spark):
    import duckdb

    from kolibrie_spark.operators.temporal import (
        merge_intervals,
        merge_intervals_duckdb_sql,
    )

    rows = [(f"k{i % 5}", (i * 37) % 100, (i * 37) % 100 + (i * 13) % 30)
            for i in range(200)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    mine = sorted(
        (r.k, r.s, r.e, r.n_merged)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, s BIGINT, e BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ref = sorted(
        tuple(r) for r in con.execute(
            merge_intervals_duckdb_sql("t", "k", "s", "e")
        ).fetchall()
    )
    assert mine == ref


def test_triangle_count(spark):
    from kolibrie_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant 5 + isolated pair
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5), (8, 9), (2, 1)]  # duplicate reversed edge, no effect
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.id: r.triangles for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_matches_duckdb(spark):
    import duckdb

    from kolibrie_spark.operators.graph import (
        triangle_count,
        triangle_count_duckdb_sql,
    )

    edges = [((i * 7) % 30, (i * 13 + 5) % 30) for i in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    mine = sorted((r.id, r.triangles) for r in triangle_count(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    ref = sorted(
        tuple(r)
        for r in con.execute(triangle_count_duckdb_sql("edges_t")).fetchall()
    )
    assert mine == ref


def test_hll_distinct_accuracy_and_twin(spark):
    import duckdb

    from kolibrie_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_duckdb_sql,
    )

    rows = [(f"g{i % 2}", f"value-{(i * 17) % 3000}-x") for i in range(8000)]
    df = spark.createDataFrame(rows, "g string, v string")
    mine = {
        r.g: (r.v_zero, r.s_scaled, r.est_distinct)
        for r in hll_distinct(df, "g", "v").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    ref = {
        g: (vz, s, est)
        for g, vz, s, est in con.execute(
            hll_distinct_duckdb_sql("t", "g", "v")
        ).fetchall()
    }
    assert mine == ref  # bit-exact, including the double estimate
    for vz, s, est in mine.values():
        # each group sees ~1500 distinct; HLL with m=16 has ~26% rse
        assert 700 < est < 2800


def test_hll_distinct_small_group_exactish(spark):
    from kolibrie_spark.operators.sketches import hll_distinct

    rows = [("g", f"v{i}") for i in range(3)] * 10
    df = spark.createDataFrame(rows, "g string, v string")
    r = hll_distinct(df, "g", "v").collect()[0]
    # 3 distinct, 16 registers -> linear counting branch
    assert r.v_zero >= 13 and 1 <= r.est_distinct <= 8


def test_mad_outliers(spark):
    import duckdb

    from kolibrie_spark.operators.profiling import (
        mad_outliers,
        mad_outliers_duckdb_sql,
    )

    rows = [("g1", i, float((i * 7) % 20)) for i in range(100)]
    rows += [("g1", 100, 500.0), ("g1", 101, -400.0)]  # outliers
    rows += [("g2", 200 + i, 5.0) for i in range(10)]  # MAD 0 -> skipped
    df = spark.createDataFrame(rows, "g string, id long, v double")
    mine = sorted(
        (r.id, r.g, r.v, r.robust_z)
        for r in mad_outliers(df, "g", "v", "id").collect()
    )
    assert [m[0] for m in mine] == [100, 101]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ref = sorted(
        tuple(r)
        for r in con.execute(
            mad_outliers_duckdb_sql("t", "g", "v", "id")
        ).fetchall()
    )
    assert mine == ref  # bit-exact incl. robust_z


def test_ewma_last(spark):
    import duckdb

    from kolibrie_spark.operators.scd import ewma_last, ewma_last_duckdb_sql

    rows = [(f"k{i % 3}", i, float(((i * 31) % 97) - 48) / 7.0) for i in range(90)]
    rows.append(("k0", 1000, None))
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    mine = sorted(
        (r.k, r.n_obs, r.ewma)
        for r in ewma_last(df, "k", "ts", "v", alpha=0.3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, ts BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ref = sorted(
        tuple(r)
        for r in con.execute(
            ewma_last_duckdb_sql("t", "k", "ts", "v", alpha=0.3)
        ).fetchall()
    )
    assert mine == ref  # bit-exact fold
    # hand-check one key: s_i = 0.3 v_i + 0.7 s_{i-1} over ts order
    seq = [v for k, ts, v in sorted(rows, key=lambda r: (r[1],))
           if k == "k1" and v is not None]
    s = seq[0]
    for x in seq[1:]:
        s = 0.3 * x + 0.7 * s
    got = dict((k, e) for k, n, e in mine)["k1"]
    assert got == s


def test_resize_images_box_floor_and_roundtrip(spark):
    from kolibrie_spark.operators.multimodal import (
        build_png,
        decode_png,
        resize_images,
    )

    w, h = 12, 8
    gen = lambda x, y: (x * 7 + y * 13 + 5) % 256
    df = spark.createDataFrame(
        [("a", build_png(w, h, gen))], "media_id string, data binary"
    )
    out = resize_images(df, 6, 4).collect()[0]
    assert out.decode_error is None and (out.width, out.height) == (6, 4)
    d = decode_png(bytes(out.data))  # re-encoded blob is a valid PNG
    assert (d["width"], d["height"], d["channels"]) == (6, 4, 1)
    px = bytes(d["pixels"])
    for y in range(4):
        for x in range(6):
            box = [gen(2 * x, 2 * y), gen(2 * x + 1, 2 * y),
                   gen(2 * x, 2 * y + 1), gen(2 * x + 1, 2 * y + 1)]
            assert px[y * 6 + x] == sum(box) // 4


def test_resize_images_rgb_and_errors(spark):
    import struct
    import zlib

    from kolibrie_spark.operators.multimodal import resize_images

    # tiny RGB png: encode manually via build_png? build_png is grayscale;
    # construct a 2x2 RGB PNG by hand
    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + bytes([255, 0, 0, 0, 255, 0]) + b"\x00" + bytes(
        [0, 0, 255, 255, 255, 255]
    )
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [("rgb", png), ("bad", b"nope")], "media_id string, data binary"
    )
    rows = {r.media_id: r for r in resize_images(df, 1, 1).collect()}
    # luma: (299*255)//1000=76, (587*255)//1000=149, (114*255)//1000=29,
    # white=(299*255+587*255+114*255)//1000=255 -> mean floor
    assert rows["rgb"].decode_error is None
    from kolibrie_spark.operators.multimodal import decode_png

    px = bytes(decode_png(bytes(rows["rgb"].data))["pixels"])
    assert px[0] == (76 + 149 + 29 + 255) // 4
    assert rows["bad"].decode_error is not None and rows["bad"].data is None


def test_path_ngrams(spark):
    import duckdb

    from kolibrie_spark.operators.analytics import (
        path_ngrams,
        path_ngrams_duckdb_sql,
    )

    types = ["view", "view", "click", "buy"]
    rows = [
        (f"u{i % 7}", i, types[(i * 3 + i // 7) % 4], i) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "u string, ts long, t string, id long")
    mine = sorted(
        (r.path, r.n_occurrences)
        for r in path_ngrams(df, "u", "ts", "t", "id", n=3, k=5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR, ts BIGINT, t VARCHAR, id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    ref = sorted(
        tuple(r)
        for r in con.execute(
            path_ngrams_duckdb_sql("t", "u", "ts", "t", "id", n=3, k=5)
        ).fetchall()
    )
    # the generator yields exactly 4 distinct trigram paths; k=5 returns all
    assert mine == ref and len(mine) == 4
    assert sum(c for _, c in mine) == 120 - 7 * 2  # every window complete
    # every path is a full trigram
    assert all(p.count(" > ") == 2 for p, c in mine)
