"""Round-3 session-2 curation operators: cross-doc span profiling,
Gopher quality rules, incremental corpus dedup, binned range join,
Z-order layout, embedding centroids — brute-force Python oracles."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # docs 1-3 share the 5-gram "the cat sat on the" (df=3)
        (1, "the cat sat on the mat today", "web"),
        (2, "the cat sat on the rug today", "web"),
        (3, "yes the cat sat on the mat", "web"),
        (4, "completely different words here appear once only", "books"),
        (5, "short", "books"),  # < 5 words: zero spans
        (6, "the cat sat on the mat today", "code"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _spans(text, n=5):
    w = text.strip().lower().split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_common_span_profile_brute_force(spark, docs):
    from kolibrie_spark.operators.spans import common_span_profile

    out = {
        r["doc_id"]: r
        for r in common_span_profile(docs, "doc_id", "text", n=5, min_df=3).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    span_df = {}
    for t in texts.values():
        for s in _spans(t):
            span_df[s] = span_df.get(s, 0) + 1
    for did, t in texts.items():
        spans = _spans(t)
        n_common = sum(1 for s in spans if span_df[s] >= 3)
        assert out[did]["n_spans"] == len(spans)
        assert out[did]["n_common"] == n_common
        expect_frac = n_common / len(spans) if spans else 0.0
        assert out[did]["common_frac"] == pytest.approx(expect_frac)
    assert out[5]["n_spans"] == 0 and out[5]["common_frac"] == 0.0
    # the shared boilerplate span reaches min_df via docs 1, 2(prefix), 3, 6
    assert out[1]["n_common"] >= 1


def test_common_span_profile_duckdb_twin(spark, docs):
    import duckdb

    from kolibrie_spark.operators.spans import (
        common_span_profile,
        common_span_profile_duckdb_sql,
    )

    mine = {
        tuple(r)
        for r in common_span_profile(docs, "doc_id", "text", n=3, min_df=2).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    ref = {
        tuple(r)
        for r in con.execute(
            common_span_profile_duckdb_sql("documents", "doc_id", "text", 3, 2)
        ).fetchall()
    }
    assert mine == ref


def test_common_span_profile_heavy_df_cap_equivalence(spark, docs):
    """The opt-in heavy_df_cap skew guard must produce the EXACT same
    output as the default window plan (VERDICT r8 #3: the guard shipped
    with the equivalence claimed in the docstring but pinned nowhere).
    Caps exercised: == min_df (every common span routed through the
    broadcast), between (mixed heavy/light), and far above any df (heavy
    set empty — pure window path on guarded code)."""
    from kolibrie_spark.operators.spans import common_span_profile

    for n, min_df in ((5, 3), (3, 2)):
        base = sorted(
            tuple(r)
            for r in common_span_profile(
                docs, "doc_id", "text", n=n, min_df=min_df
            ).collect()
        )
        for cap in (min_df, min_df + 1, 100):
            guarded = sorted(
                tuple(r)
                for r in common_span_profile(
                    docs, "doc_id", "text", n=n, min_df=min_df, heavy_df_cap=cap
                ).collect()
            )
            assert guarded == base, (n, min_df, cap)


def test_common_span_profile_heavy_df_cap_below_min_df_raises(spark, docs):
    from kolibrie_spark.operators.spans import common_span_profile

    with pytest.raises(ValueError, match="heavy_df_cap must be >= min_df"):
        common_span_profile(
            docs, "doc_id", "text", n=5, min_df=3, heavy_df_cap=2
        )


def test_gopher_rules_flags(spark):
    from kolibrie_spark.operators.textanalysis import gopher_rules

    rows = [
        (1, " ".join(["word"] * 10)),  # too short for min_words=5? no: ok
        (2, "## ## ## ## ##"),  # all symbols -> symbol ratio fails
        (3, "the and of to a in is it that for good words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            df, "doc_id", "text", min_words=5, max_words=100
        ).collect()
    }
    assert out[1]["ok_word_count"] == 1
    assert out[1]["n_words"] == 10
    assert out[1]["ok_stopwords"] == 0  # no stopwords at all
    assert out[2]["ok_symbol_ratio"] == 0
    assert out[2]["gopher_pass"] == 0
    assert out[3]["ok_stopwords"] == 1
    assert out[3]["stopwords_distinct"] == 10
    # mean word length of doc 1: all words are 4 chars
    assert out[1]["mean_word_len"] == pytest.approx(4.0)


def test_gopher_rules_duckdb_twin(spark, docs):
    import duckdb

    from kolibrie_spark.operators.textanalysis import (
        gopher_rules,
        gopher_rules_duckdb_sql,
    )

    mine = {
        tuple(r)
        for r in gopher_rules(docs, "doc_id", "text", min_words=5).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    ref = {
        tuple(r)
        for r in con.execute(
            gopher_rules_duckdb_sql("documents", "doc_id", "text", min_words=5)
        ).fetchall()
    }
    assert mine == ref


def test_dedup_against_corpus(spark, docs):
    from kolibrie_spark.operators.incremental import dedup_against_corpus

    batch = docs.where(F.col("doc_id").isin(1, 4, 5))
    corpus = docs.where(~F.col("doc_id").isin(1, 4, 5))
    out = dedup_against_corpus(batch, corpus, "doc_id", "text")
    kept = {r["doc_id"] for r in out.collect()}
    # doc 1's content also exists in the corpus as doc 6 -> dropped;
    # docs 4 and 5 are unique to the batch -> kept
    assert kept == {4, 5}
    assert "fp" in out.columns


def test_interval_join_binned_vs_brute_force(spark):
    from kolibrie_spark.operators.rangejoin import interval_join_binned

    base = datetime(2024, 1, 1)
    events = [
        (i, base + timedelta(minutes=7 * i, microseconds=123456 * (i % 3)), float(i))
        for i in range(60)
    ]
    edf = spark.createDataFrame(events, "event_id long, ts timestamp, value double")
    ivs = [
        (100, base + timedelta(minutes=10), base + timedelta(minutes=45)),
        # interval longer than the bin width: must still match exactly
        (101, base + timedelta(minutes=50), base + timedelta(hours=3)),
        # sub-second exclusive end straddling a bin boundary
        (102, base + timedelta(minutes=59, seconds=59), base + timedelta(hours=1, microseconds=999999)),
        (103, base + timedelta(days=2), base + timedelta(days=3)),  # no matches
    ]
    idf = spark.createDataFrame(
        ivs, "anchor_id long, start_ts timestamp, end_ts timestamp"
    )
    out = interval_join_binned(edf, idf, "ts", "start_ts", "end_ts", 1800)
    got = {(r["anchor_id"], r["event_id"]) for r in out.collect()}
    expect = {
        (a, e)
        for a, s, t in ivs
        for e, ts, _ in events
        if s <= ts < t
    }
    assert got == expect
    assert (103, 0) not in got


def test_zorder_value_brute_force(spark):
    from kolibrie_spark.operators.layout import zorder_value

    def morton(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321), (40000, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z"))
    for r in out.collect():
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_duckdb_twin(spark):
    import duckdb

    from kolibrie_spark.operators.layout import (
        zorder_value,
        zorder_value_duckdb,
    )

    rows = [(i * 977 % 65536, i * 389 % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    mine = {
        (r["x"], r["y"], r["z"])
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    z = zorder_value_duckdb("x", "y")
    ref = {tuple(r) for r in con.execute(f"SELECT x, y, {z} FROM t").fetchall()}
    assert mine == ref


def test_zorder_layout_clusters(spark):
    """Writing the z-ordered frame must tighten per-partition key ranges
    on BOTH dimensions vs a single-column sort."""
    from kolibrie_spark.operators.layout import zorder_layout

    rows = [(x, y) for x in range(0, 64) for y in range(0, 64)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_layout(df, "x", "y", num_partitions=16)
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    # a 64x64 grid in 16 z-partitions: each partition covers a ~16x16
    # tile neighborhood, so both spans stay well under the full 63
    assert sum(r["xs"] for r in spans) / len(spans) < 40
    assert sum(r["ys"] for r in spans) / len(spans) < 40
    assert out.columns == ["x", "y"]


def test_group_centroids_exact(spark):
    from kolibrie_spark.operators.embeddings import group_centroids

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (0, [3.0, 2.0, 1.0]),
        (1, [0.5, -0.5, 0.25]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {
        (r["label"], r["dim"]): (r["centroid"], r["n_vecs"])
        for r in group_centroids(df, "label", "embedding").collect()
    }
    assert out[(0, 0)] == (2.0, 2)
    assert out[(0, 1)] == (2.0, 2)
    assert out[(0, 2)] == (2.0, 2)
    assert out[(1, 0)] == (0.5, 1)
    assert out[(1, 1)] == (-0.5, 1)
    assert out[(1, 2)] == (0.25, 1)


def test_group_centroids_shuffle_invariant(spark):
    """Integer-scaled summation: identical result under different
    partitionings (plain float sums would not guarantee this)."""
    import random

    from kolibrie_spark.operators.embeddings import group_centroids

    rng = random.Random(7)
    rows = [(i % 3, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    df1 = spark.createDataFrame(rows, "label int, embedding array<float>")
    df2 = df1.repartition(13, "label")
    a = sorted(map(tuple, group_centroids(df1, "label", "embedding").collect()))
    b = sorted(map(tuple, group_centroids(df2, "label", "embedding").collect()))
    assert a == b


def test_linear_quality_score_flags(spark):
    from kolibrie_spark.ml.quality import linear_quality_score

    rows = [
        (1, "the cat sat on the mat and it is a fine day for all of us"),
        (2, "!!! ??? ... ;;; :::"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # positive weight on stopword ratio, negative on punctuation
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(
            df, "doc_id", "text", [0.0, -8.0, 6.0, 0.0, 0.0], 0.0
        ).collect()
    }
    assert out[1]["keep"] == 1 and out[1]["quality_score"] > 0.5
    assert out[2]["keep"] == 0 and out[2]["quality_score"] < 0.5


def test_train_quality_classifier_separates(spark):
    """MLlib training on weak labels must learn weights that separate
    clean prose from punctuation spam via the same feature expressions."""
    from kolibrie_spark.ml.quality import (
        linear_quality_score,
        train_quality_classifier,
    )

    import random

    rng = random.Random(9)
    clean_words = "the cat sat on a mat and it is that day for work".split()
    rows = []
    for i in range(40):
        rows.append((i, " ".join(rng.choices(clean_words, k=30)), 1))
    for i in range(40, 80):
        rows.append((i, " ".join(rng.choices(["!!!", "###", "..?!"], k=30)), 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights, bias = train_quality_classifier(df, "text", "label")
    scored = {
        r["doc_id"]: r["keep"]
        for r in linear_quality_score(
            df, "doc_id", "text", weights, bias
        ).collect()
    }
    acc = sum(
        1 for i, _, lab in rows if scored[i] == lab
    ) / len(rows)
    assert acc >= 0.95, f"train/apply accuracy {acc}"


def test_semantic_dedup_brute_force(spark):
    import math
    import random

    from kolibrie_spark.operators.semdedup import semantic_dedup

    rng = random.Random(13)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(10)]
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # three tight copies of each base vector
            rows.append((vid, [x + rng.uniform(-1e-3, 1e-3) for x in b]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, "vec_id", "embedding", ncells=4, threshold=0.999)
    kept = {r["vec_id"] for r in out.collect()}

    # brute-force replication: same first-N centroids, same drop rule
    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.collect()  # float32-rounded values, as Spark computes
    }
    cents = [vecs[i] for i in sorted(vecs)[:4]]
    cell = {
        i: min(range(4), key=lambda c: (l2sq(vecs[i], cents[c]), c))
        for i in vecs
    }
    expect = {
        i
        for i in vecs
        if not any(
            j < i and cell[j] == cell[i] and cos(vecs[j], vecs[i]) >= 0.999
            for j in vecs
        )
    }
    assert kept == expect
    # each clone triplet that lands in one cell keeps exactly its lowest id
    assert len(kept) < len(vecs)


def test_dsir_logweights_favors_target_like_docs(spark):
    from kolibrie_spark.operators.dsir import dsir_logweights

    target_words = "alpha beta gamma delta epsilon"
    other_words = "one two three four five six seven"
    rows = [(i, target_words, "t") for i in range(10)]
    rows += [(10 + i, other_words, "r") for i in range(30)]
    rows += [(40, "alpha beta gamma delta epsilon", "r")]  # target-like raw doc
    rows += [(41, "", "r")]  # empty doc -> no grams, NULL weight
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = df.where(F.col("source") == "t")
    out = {r["doc_id"]: r for r in dsir_logweights(df, target, "doc_id", "text").collect()}
    # target-like raw doc scores above the off-distribution docs
    assert out[40]["logw"] > out[10]["logw"]
    assert out[41]["n_grams"] == 1  # split('') yields one empty-string gram
    # weights identical under a different partitioning (integer sums)
    out2 = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(
            df.repartition(7, "doc_id"), target, "doc_id", "text"
        ).collect()
    }
    assert out2 == {k: v["logw"] for k, v in out.items()}
