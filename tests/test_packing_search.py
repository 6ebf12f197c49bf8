"""Sequence packing and BM25 retrieval: brute-force Python oracles plus
DuckDB bit-equality for the cross-engine twins."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a lazy dog sleeps in the sun all day long today"),
        (3, "spark query engines compile plans into distributed jobs"),
        (4, "the fox and the dog are friends in the quiet forest"),
        (5, "query optimization reorders joins and prunes columns"),
        (6, ""),
        (7, "dog dog dog dog dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {i: t.split() for i, t in rows}
    # split(trim(text), '\s+') yields [''] for empty text in Spark and
    # DuckDB alike, so an empty doc has dl=1, not 0
    dls = {i: len(w) if w else 1 for i, w in docs.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    dfs = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    scores = {}
    for i, w in docs.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            denom = tf + k1 * (1 - b + b * dls[i] / avgdl)
            s += idf * tf * (k1 + 1.0) / denom
        if s > 0:
            scores[i] = s
    return scores


def test_bm25_matches_brute_force(spark, corpus):
    from kolibrie_spark.operators.search import bm25_topk

    terms = ["dog", "query"]
    got = {r.doc_id: r.bm25 for r in bm25_topk(corpus, "doc_id", "text", terms).collect()}
    want = _brute_bm25([(r.doc_id, r.text) for r in corpus.collect()], terms)
    assert set(got) == set(want)
    # bm25_topk rounds to 9 dp for cross-engine stability
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    # repeated-term doc must outscore single mentions on the 'dog' axis
    one_term = {r.doc_id: r.bm25 for r in bm25_topk(corpus, "doc_id", "text", ["dog"]).collect()}
    assert one_term[7] == max(one_term.values())


def test_bm25_duckdb_twin_bit_identical(spark, corpus):
    from kolibrie_spark.operators.search import bm25_topk, bm25_topk_duckdb_sql

    terms = ["the", "fox", "query"]
    sdf = bm25_topk(corpus, "doc_id", "text", terms, k=5)
    got = [(r.doc_id, r.bm25) for r in sdf.collect()]
    con = duckdb.connect()
    con.register("docs", sdf.sparkSession.createDataFrame(corpus.collect()).toPandas())
    want = con.execute(
        bm25_topk_duckdb_sql("docs", "doc_id", "text", terms, k=5)
    ).fetchall()
    assert got == [(i, s) for i, s in want]  # exact float equality


def test_bm25_topk_limit_and_ties(spark, corpus):
    from kolibrie_spark.operators.search import bm25_topk

    out = bm25_topk(corpus, "doc_id", "text", ["dog"], k=2).collect()
    assert len(out) == 2
    assert out[0].bm25 >= out[1].bm25
    with pytest.raises(ValueError):
        bm25_topk(corpus, "doc_id", "text", [])


@pytest.fixture(scope="module")
def docs_tokens(spark):
    rows = [(i, (i * 37) % 11) for i in range(1, 41)]  # includes zeros
    return spark.createDataFrame(rows, "doc_id long, tokens long")


def test_pack_sequences_layout_invariants(spark, docs_tokens):
    from kolibrie_spark.operators.packing import pack_sequences

    budget = 16
    out = pack_sequences(docs_tokens, "doc_id", "tokens", budget, shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 40
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        # token_start is the running sum of prior docs' tokens, in id order
        acc = 0
        for r in rs:
            assert r.token_start == acc
            assert r.seq_first == acc // budget
            last = acc + max(r.tokens, 1) - 1
            assert r.seq_last == last // budget
            assert r.n_seqs == r.seq_last - r.seq_first + 1
            acc += r.tokens


def test_pack_chunks_conservation(spark, docs_tokens):
    from kolibrie_spark.operators.packing import pack_chunks

    budget = 16
    chunks = pack_chunks(docs_tokens, "doc_id", "tokens", budget, shards=4)
    pdf = chunks.toPandas()
    # every doc's slices cover exactly its token count, starting at 0
    toks = {r.doc_id: r.tokens for r in docs_tokens.collect()}
    for doc_id, grp in pdf.groupby("doc_id"):
        grp = grp.sort_values("seq")
        assert int(grp.n_toks.sum()) == toks[doc_id]
        assert int(grp.doc_tok_start.iloc[0]) == 0
        # slices are contiguous
        assert list(grp.doc_tok_start + grp.n_toks)[:-1] == list(grp.doc_tok_start)[1:]
    # zero-token docs emit no rows
    assert set(pdf.doc_id) == {i for i, t in toks.items() if t > 0}
    # no sequence exceeds the budget
    per_seq = pdf.groupby(["shard", "seq"]).n_toks.sum()
    assert (per_seq <= budget).all()
    # all but each shard's final sequence are exactly full
    for shard, grp in pdf.groupby("shard"):
        full = grp.groupby("seq").n_toks.sum()
        assert (full[full.index < full.index.max()] == budget).all()


def test_pack_sequences_duckdb_twin_bit_identical(spark, docs_tokens):
    from kolibrie_spark.operators.packing import (
        pack_sequences,
        pack_sequences_duckdb_sql,
    )

    sdf = pack_sequences(docs_tokens, "doc_id", "tokens", 16, shards=4).select(
        F.col("doc_id").alias("id"), "shard", "token_start", "seq_first", "seq_last", "n_seqs"
    )
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.register("d", docs_tokens.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            pack_sequences_duckdb_sql("d", "doc_id", "tokens", 16, 4)
        ).fetchall()
    )
    assert got == want


def test_pack_rejects_bad_params(spark, docs_tokens):
    from kolibrie_spark.operators.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(docs_tokens, "doc_id", "tokens", 0)
    with pytest.raises(ValueError):
        pack_sequences(docs_tokens, "doc_id", "tokens", 16, shards=0)


def test_rrf_fuse_matches_hand_computation(spark):
    """RRF: rank by (score desc, id), 1/(60+rank) summed per list;
    absent-from-list contributes 0; ties break on id."""
    from kolibrie_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "vec_id long, c double"
    )
    got = {
        r.doc_id: r.rrf
        for r in rrf_fuse(
            [(a, "doc_id", "s"), (b, "vec_id", "c")], k=10
        ).collect()
    }
    # list a ranks: 1->1, 2->2 (tie 5.0 breaks on id), 3->3, 4->4
    # list b ranks: 3->1, 5->2, 1->3
    assert got[1] == 1 / 61 + 1 / 63
    assert got[2] == 1 / 62 + 0.0
    assert got[3] == 1 / 63 + 1 / 61
    assert got[4] == 1 / 64
    assert got[5] == 1 / 62
    # fusion order: 1 and 3 share the top score; id breaks the tie
    order = [
        r.doc_id
        for r in rrf_fuse([(a, "doc_id", "s"), (b, "vec_id", "c")], k=3).collect()
    ]
    assert order == [1, 3, 2]


def test_rrf_fuse_three_lists_and_duckdb_twin(spark):
    """Three-retriever fusion equals the DuckDB twin bit-for-bit."""
    import duckdb

    from kolibrie_spark.operators.search import rrf_fuse, rrf_fuse_duckdb_sql

    lists = [
        [(i, float((i * 7) % 11)) for i in range(8)],
        [(i, float((i * 3) % 13)) for i in range(2, 12)],
        [(i, float((i * 5) % 7)) for i in range(5, 15)],
    ]
    dfs = [
        (spark.createDataFrame(rows, "id long, sc double"), "id", "sc")
        for rows in lists
    ]
    got = [(r.doc_id, r.rrf) for r in rrf_fuse(dfs, k=12).collect()]

    con = duckdb.connect()
    sqls = []
    for j, rows in enumerate(lists):
        vals = ", ".join(f"({i}, {s})" for i, s in rows)
        sqls.append((f"SELECT * FROM (VALUES {vals}) AS t(id, sc)", "id", "sc"))
    want = con.execute(rrf_fuse_duckdb_sql(sqls, k=12)).fetchall()
    assert [(int(i), float(s)) for i, s in want] == got
