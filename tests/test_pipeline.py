"""CurationPipeline: the fluent chain composes the standalone operators
without changing their semantics, and the whole chain stays lazy."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # quality docs (long enough, stopworded, low punct)
        (1, "the quick brown fox jumps over the lazy dog near the river bank today", "web"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today", "web"),  # exact dup of 1
        (3, "it is a truth universally acknowledged that a reader wants for more text", "books"),
        (4, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam", "web"),  # repetitive
        (5, "short", "web"),  # low quality (too short)
        (6, "call me ishmael some years ago never mind how long precisely i sailed", "books"),
        (7, "contact admin@site.io for the quick brown fox archive and the river data", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pipeline_chain_end_to_end(spark, corpus):
    from kolibrie_spark.pipeline import CurationPipeline

    bench = spark.createDataFrame(
        [("call me ishmael some years ago never mind how long precisely i sailed",)],
        "text string",
    )
    out = (
        CurationPipeline(corpus)
        .scrub_pii()
        .filter_quality(min_score=0.6)
        .filter_repetition(max_dup_3gram=0.2)
        .decontaminate(bench, n=5, max_containment=0.5)
        .dedup_exact()
        .split_by_group("source", {"train": 0.8, "valid": 0.1, "test": 0.1})
        .dataframe()
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert 4 not in rows  # repetitive doc dropped
    assert 5 not in rows  # low-quality doc dropped
    assert 6 not in rows  # contaminated (== benchmark doc) dropped
    assert len({1, 2} & set(rows)) == 1  # exact dup pair -> one survivor
    assert 7 in rows
    assert "<EMAIL>" in rows[7].text  # scrub replaced the address
    assert rows[7].n_email == 1
    assert all(r.split in ("train", "valid", "test") for r in rows.values())
    # leakage-safety survives composition: one split per source group
    per_src = {}
    for r in rows.values():
        per_src.setdefault(r.source, set()).add(r.split)
    assert all(len(v) == 1 for v in per_src.values())


def test_pipeline_near_dedup_and_pack(spark, corpus):
    from kolibrie_spark.pipeline import CurationPipeline

    out = (
        CurationPipeline(corpus)
        .dedup_near(threshold=0.8)
        .pack(budget=16, shards=2)
        .dataframe()
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len({1, 2} & set(rows)) == 1  # near-dup (identical) collapsed
    assert {"shard", "token_start", "seq_first", "seq_last", "n_seqs"} <= set(
        out.columns
    )
    # token accounting consistent within each shard
    for r in rows.values():
        assert r.n_seqs == r.seq_last - r.seq_first + 1


def test_pipeline_is_lazy(spark, corpus):
    from kolibrie_spark.pipeline import CurationPipeline

    # building the chain must trigger no Spark jobs: construct against a
    # DataFrame whose evaluation would throw, and only fail on action
    bad = corpus.withColumn(
        "text", F.raise_error(F.lit("must not evaluate")).cast("string")
    )
    p = CurationPipeline(bad).filter_quality().filter_repetition()
    df = p.dataframe()  # still lazy — no error
    with pytest.raises(Exception, match="must not evaluate"):
        df.collect()


def test_pipeline_session3_stages(spark, corpus):
    """strip_html -> normalize_unicode -> dedup_paragraphs -> cap_domains ->
    sample_weighted compose with the original stages and stay lazy."""
    from kolibrie_spark.pipeline import CurationPipeline

    tagged = corpus.withColumn(
        "text",
        F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>  extra space")),
    )
    out = (
        CurationPipeline(tagged)
        .strip_html()
        .normalize_unicode()
        .dedup_exact()
        .cap_domains("source", 2)
        .dataframe()
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 2 (exact dup of 1 after strip+normalize) is gone
    assert 2 not in rows
    # tags stripped, whitespace canonical
    assert all("<p>" not in r["text"] and "  " not in r["text"] for r in rows.values())
    # per-domain cap respected
    from collections import Counter

    by_src = Counter(r["source"] for r in rows.values())
    assert all(n <= 2 for n in by_src.values())

    # paragraph dedup keeps first occurrence and reassembles
    para_corpus = spark.createDataFrame(
        [(1, "shared\nunique one", "a"), (2, "shared\nunique two", "a")],
        "doc_id long, text string, source string",
    )
    out2 = (
        CurationPipeline(para_corpus).dedup_paragraphs().dataframe().collect()
    )
    got = {r["doc_id"]: r["text"] for r in out2}
    assert got[1] == "shared\nunique one" and got[2] == "unique two"

    # weighted sampling is a pure filter
    w = corpus.withColumn("w", F.lit(1.0))
    assert (
        CurationPipeline(w).sample_weighted("w").dataframe().count()
        == corpus.count()
    )


def test_corpus_report(spark, corpus):
    from kolibrie_spark.pipeline import corpus_report

    rep = corpus_report(corpus, domain_col="source")
    assert set(rep) == {"stats", "budget", "langs", "quality"}
    stats = {r["source"]: r for r in rep["stats"].collect()}
    assert stats["web"]["n"] == 5 and stats["books"]["n"] == 2
    budget = {r["source"]: r for r in rep["budget"].collect()}
    assert abs(sum(r["token_share"] for r in budget.values()) - 1.0) < 1e-9
    langs = {r["source"]: r for r in rep["langs"].collect()}
    assert langs["web"]["en"] >= 3  # stopworded docs identified as english
    q = {r["source"]: r["mean_quality"] for r in rep["quality"].collect()}
    assert all(v is not None for v in q.values())
