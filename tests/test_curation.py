"""Curation operators: repetition metrics, domain-mix sampling,
benchmark contamination, corpus top terms — brute-force Python oracles
plus DuckDB twins."""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat the cat sat again", "web"),
        (2, "one two three four five six seven eight", "web"),
        (3, "spam spam spam spam spam spam", "web"),
        (4, "alpha beta gamma alpha beta gamma alpha beta", "books"),
        (5, "x", "books"),
        (6, "", "code"),
        (7, "the quick brown fox jumps over the lazy dog", "code"),
        (8, "to be or not to be that is the question", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _ngrams(text, n):
    w = text.strip().lower().split() if text.strip() else [""]
    # split('\s+') on empty text yields [''] in both engines
    if text == "":
        w = [""]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def test_repetition_metrics_brute_force(spark, docs):
    from kolibrie_spark.operators.textanalysis import repetition_metrics

    got = {
        r.doc_id: (r.dup_word_frac, r.dup_2gram_frac, r.dup_3gram_frac)
        for r in repetition_metrics(docs, "doc_id", "text").collect()
    }
    for doc_id, text, _src in [
        (r.doc_id, r.text, r.source) for r in docs.collect()
    ]:
        for slot, n in ((0, 1), (1, 2), (2, 3)):
            grams = _ngrams(text, n)
            want = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
            assert got[doc_id][slot] == pytest.approx(want, abs=1e-15), (
                doc_id,
                n,
            )
    # pure-repetition doc: 6 'spam' words -> dup_word_frac 5/6
    assert got[3][0] == pytest.approx(5 / 6)
    # no-repetition doc
    assert got[2] == (0.0, 0.0, 0.0)


def test_repetition_duckdb_twin(spark, docs):
    from kolibrie_spark.operators.textanalysis import (
        dup_ngram_fraction_duckdb,
        repetition_metrics,
    )

    got = sorted(
        tuple(r) for r in repetition_metrics(docs, "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {dup_ngram_fraction_duckdb('text', 1)},"
            f" {dup_ngram_fraction_duckdb('text', 2)},"
            f" {dup_ngram_fraction_duckdb('text', 3)} FROM docs"
        ).fetchall()
    )
    assert got == want  # exact float equality


def test_domain_mix_sample(spark, docs):
    from kolibrie_spark.operators.sampling import (
        domain_mix_duckdb_sql,
        domain_mix_sample,
    )

    out = domain_mix_sample(docs, "doc_id", "source", alpha=0.5, target_frac=0.5)
    got = sorted((r.doc_id, r.source) for r in out.collect())
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            domain_mix_duckdb_sql("docs", "doc_id", "source", 0.5, 0.5)
        ).fetchall()
    )
    assert got == want
    # determinism: same kept set on rerun
    again = sorted((r.doc_id, r.source) for r in out.collect())
    assert got == again
    with pytest.raises(ValueError):
        domain_mix_sample(docs, "doc_id", "source", 0.5, 0.0)


def test_domain_mix_upweights_small_domains(spark):
    from kolibrie_spark.operators.sampling import domain_mix_sample

    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k long, d string")
    kept = domain_mix_sample(df, "k", "d", alpha=0.5, target_frac=0.3).groupBy(
        "d"
    ).count()
    by = {r.d: r["count"] for r in kept.collect()}
    # alpha=0.5 shifts share toward the small domain: its keep RATE must
    # exceed the big domain's (0.3 flat would keep 30% of each)
    assert by["small"] / 100 > by["big"] / 900
    # and the overall take is near the 30% target
    assert 0.2 < (by["small"] + by["big"]) / 1000 < 0.45


def test_ngram_containment_brute_force(spark, docs):
    from kolibrie_spark.operators.contamination import ngram_containment

    bench = docs.filter(F.col("source") == "code").select("text")
    out = ngram_containment(docs, "doc_id", "text", bench, "text", n=3)
    got = {
        r.doc_id: (r.n_ngrams, r.n_contaminated, r.containment)
        for r in out.collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    bench_set = set()
    for did, text in rows:
        if did in (6, 7):
            bench_set |= set(_ngrams(text, 3))
    for did, text in rows:
        grams = set(_ngrams(text, 3))
        hits = len(grams & bench_set)
        want_frac = hits / len(grams) if grams else 0.0
        assert got[did] == (len(grams), hits, pytest.approx(want_frac)), did
    # the benchmark doc itself is fully contaminated
    assert got[7][2] == 1.0
    # short/empty docs get 0 ngrams, containment 0.0
    assert got[5] == (0, 0, 0.0)
    assert got[6] == (0, 0, 0.0)


def test_ngram_containment_duckdb_twin(spark, docs):
    from kolibrie_spark.operators.contamination import (
        ngram_containment,
        ngram_containment_duckdb_sql,
    )

    bench = docs.filter(F.col("source") == "code").select("text")
    out = ngram_containment(docs, "doc_id", "text", bench, "text", n=2)
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            ngram_containment_duckdb_sql(
                "docs",
                "doc_id",
                "text",
                "(SELECT text FROM docs WHERE source = 'code')",
                "text",
                n=2,
            )
        ).fetchall()
    )
    assert got == want


def test_tokenize_to_ids(spark, docs):
    from kolibrie_spark.operators.search import (
        build_vocab,
        tokenize_to_ids,
        tokenize_to_ids_duckdb_sql,
    )

    vocab = build_vocab(docs, "text", 5)
    assert vocab[0] == "spam"  # ties: spam/the at 6, lexicographic
    out = {r.doc_id: r for r in tokenize_to_ids(docs, "doc_id", "text", vocab).collect()}
    # doc 3: 'spam' x6 -> id 1 six times, zero OOV
    assert out[3].token_ids == [1] * 6 and out[3].n_oov == 0
    # ids round-trip through the vocab; OOV counted
    words = "the quick brown fox jumps over the lazy dog".split()
    for w, i in zip(words, out[7].token_ids):
        assert (vocab[i - 1] == w) if i > 0 else (w not in vocab)
    assert out[7].n_oov == sum(1 for w in words if w not in vocab)
    # DuckDB twin bit-identical
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    want = con.execute(
        tokenize_to_ids_duckdb_sql("d", "doc_id", "text", vocab)
    ).fetchall()
    got = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_oov)
        for r in tokenize_to_ids(docs, "doc_id", "text", vocab).collect()
    )
    assert got == sorted((i, tuple(t), n) for i, t, n in want)


def test_chunk_documents(spark):
    from kolibrie_spark.operators.packing import (
        chunk_documents,
        chunk_documents_duckdb_sql,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "a b"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", size=4, overlap=1)
    got = sorted(tuple(r) for r in out.collect())
    # doc 1: stride 3 -> starts 0,3,6 covering all 10 words
    d1 = [g for g in got if g[0] == 1]
    assert [(c[1], c[2], c[4]) for c in d1] == [(0, 0, 4), (1, 3, 4), (2, 6, 4)]
    assert d1[0][3] == "w0 w1 w2 w3" and d1[2][3] == "w6 w7 w8 w9"
    # short and empty docs: exactly one chunk
    assert len([g for g in got if g[0] == 2]) == 1
    assert len([g for g in got if g[0] == 3]) == 1
    # overlap: consecutive chunks share `overlap` words
    assert d1[0][3].split()[-1] == d1[1][3].split()[0]
    # DuckDB twin bit-identical
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = con.execute(
        chunk_documents_duckdb_sql("d", "doc_id", "text", 4, 1)
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=4, overlap=4)


def test_top_per_group(spark):
    from kolibrie_spark.operators.profiling import (
        top_per_group,
        top_per_group_duckdb_sql,
    )

    rows = [(i, f"g{i % 3}", float((i * 7) % 10)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    out = top_per_group(df, "grp", "score", 2, "doc_id")
    got = sorted(tuple(r) for r in out.collect())
    assert len(got) == 6  # 2 per group x 3 groups
    # per group: ranks 1..2, scores non-increasing, ties by id asc
    by_grp = {}
    for did, grp, score, rank in got:
        by_grp.setdefault(grp, []).append((rank, score, did))
    for grp, lst in by_grp.items():
        lst.sort()
        assert [r for r, _, _ in lst] == [1, 2]
        assert lst[0][1] >= lst[1][1]
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = con.execute(
        top_per_group_duckdb_sql("d", "grp", "score", 2, "doc_id", "doc_id, grp, score")
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_lm_score(spark, docs):
    import math

    from kolibrie_spark.operators.lm import K_SMOOTH, lm_score, lm_score_duckdb_sql

    got = {r.doc_id: r for r in lm_score(docs, "doc_id", "text").collect()}
    # brute-force oracle
    texts = {r.doc_id: r.text for r in docs.collect()}
    bgs = {
        did: list(zip(t.lower().split(), t.lower().split()[1:]))
        for did, t in texts.items()
        if t.strip()
    }
    all_bg = [b for v in bgs.values() for b in v]
    vocab = {w for b in all_bg for w in b}
    from collections import Counter

    cb, cc = Counter(all_bg), Counter(b[0] for b in all_bg)
    for did, doc_bgs in bgs.items():
        if not doc_bgs:
            continue
        s = 0.0
        for b in doc_bgs:
            s = s + math.log(
                (cb[b] + K_SMOOTH) / (cc[b[0]] + K_SMOOTH * len(vocab))
            )
        assert got[did].n_bigrams == len(doc_bgs)
        assert got[did].avg_logp == pytest.approx(s / len(doc_bgs), abs=1e-8)
    # repeated doc ("spam"x6): highest typicality of its own bigrams
    assert got[3].avg_logp > got[7].avg_logp
    # empty doc: no bigrams, NULL score
    assert got[6].n_bigrams == 0 and got[6].avg_logp is None
    # DuckDB twin bit-identical
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    want = con.execute(lm_score_duckdb_sql("d", "doc_id", "text")).fetchall()
    got_rows = sorted(
        tuple(r) for r in lm_score(docs, "doc_id", "text").collect()
    )
    assert got_rows == sorted(tuple(r) for r in want)


def test_group_split_no_leakage(spark):
    from kolibrie_spark.operators.sampling import (
        group_split,
        group_split_duckdb_case,
    )

    rows = [(i, f"host{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    splits = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = group_split(df, "host", splits)
    got = [(r.doc_id, r.host, r.split) for r in out.collect()]
    # leakage-safety: one split per group
    per_host = {}
    for _d, h, s in got:
        per_host.setdefault(h, set()).add(s)
    assert all(len(v) == 1 for v in per_host.values())
    # DuckDB twin agrees row-for-row
    con = duckdb.connect()
    con.register("d", df.toPandas())
    case = group_split_duckdb_case("host", splits)
    want = con.execute(
        f"SELECT doc_id, host, {case} AS split FROM d"
    ).fetchall()
    assert sorted(got) == sorted(tuple(r) for r in want)
    with pytest.raises(ValueError):
        group_split(df, "host", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        group_split(df, "host", {})


def test_profile_stats(spark):
    import math

    from kolibrie_spark.operators.profiling import (
        profile_stats,
        profile_stats_duckdb_sql,
    )

    rows = [(i, f"s{i % 3}", (i * 17) % 101) for i in range(200)]
    rows.append((200, "solo", 42))  # n == 1 group: stddev NULL
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    got = {r.src: r for r in profile_stats(df, "src", "v").collect()}
    # brute-force oracle for one group
    vals = [(i * 17) % 101 for i in range(200) if i % 3 == 0]
    m = sum(vals) / len(vals)
    sd = math.sqrt(
        (sum(x * x for x in vals) - sum(vals) ** 2 / len(vals))
        / (len(vals) - 1)
    )
    assert got["s0"].n == len(vals)
    assert got["s0"].n_distinct == len(set(vals))
    assert (got["s0"].vmin, got["s0"].vmax) == (min(vals), max(vals))
    assert got["s0"].mean == pytest.approx(m, abs=1e-12)
    assert got["s0"].stddev == pytest.approx(sd, abs=1e-12)
    assert got["solo"].stddev is None
    # DuckDB twin bit-identical
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = con.execute(profile_stats_duckdb_sql("d", "src", "v")).fetchall()
    got_rows = sorted(tuple(r) for r in profile_stats(df, "src", "v").collect())
    assert got_rows == sorted(tuple(r) for r in want)


def test_scrub_pii(spark):
    from kolibrie_spark.operators.scrub import scrub_pii, scrub_pii_duckdb_sql

    rows = [
        (1, "mail a.b+c@ex-1.co.uk and d@e.org now"),
        (2, "server at 10.0.255.1 and 8.8.8.8"),
        (3, "card 4111111111111111 ok, short 123456 stays"),
        (4, "mixed bob@x.io from 192.168.0.1 pays 5105105105105100"),
        (5, "clean text with no pii at all"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df, "doc_id", "text").collect()}
    assert got[1].scrubbed == "mail <EMAIL> and <EMAIL> now"
    assert got[1].n_email == 2 and got[1].n_ipv4 == 0
    assert got[2].scrubbed == "server at <IP> and <IP>"
    assert got[3].scrubbed == "card <NUM> ok, short 123456 stays"
    assert got[4].scrubbed == "mixed <EMAIL> from <IP> pays <NUM>"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_number) == (1, 1, 1)
    assert got[5].scrubbed == rows[4][1] and got[5].n_email == 0
    # DuckDB twin bit-identical
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = con.execute(scrub_pii_duckdb_sql("d", "doc_id", "text")).fetchall()
    got_rows = sorted(tuple(r) for r in scrub_pii(df, "doc_id", "text").collect())
    assert got_rows == sorted(tuple(r) for r in want)


def test_top_terms(spark, docs):
    from kolibrie_spark.operators.search import top_terms, top_terms_duckdb_sql

    got = [(r.term, r.cnt) for r in top_terms(docs, "text", k=5).collect()]
    # 'the' (3+2+1) and 'spam' (6) tie at 6; lexicographic tiebreak
    assert got[0] == ("spam", 6)
    assert got[1] == ("the", 6)
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = con.execute(top_terms_duckdb_sql("docs", "text", k=5)).fetchall()
    assert got == [tuple(r) for r in want]
