"""Keyword retrieval over the document table: BM25 scoring + top-k.

Shape chosen for scale AND cross-engine exactness: the query's terms are
known at plan time, so per-doc term frequencies are doc-local array
expressions (``size(filter(words, = term))``) — no explode, no per-term
shuffle — and the document score is a FIXED-ORDER sum of one sub-expression
per query term. That fixed order is what makes the double arithmetic
bit-reproducible in DuckDB (a groupBy-sum over exploded terms would add
floats in partition order and drift in the last bit). Corpus statistics
(N, avgdl, per-term document frequencies) reduce to ONE aggregate row that
Catalyst broadcasts; the top-k is orderBy+limit (TakeOrdered — no global
sort materialization).

At 100 TB: one scan computes the per-term tf columns (whole-stage
codegen), the stats row is a second scan's worth of partial aggs, and the
k results stream through TakeOrdered. For repeated querying you'd
materialize the stats row once and reuse it; ``corpus_stats`` is exposed
separately for exactly that.

BM25 per Robertson/Sparck Jones with the Lucene-style idf floor:
idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)), score(d) = Σ_t idf(t) *
tf / (tf + k1 * (1 - b + b * dl/avgdl)) * (k1 + 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import word_array

K1 = 1.2
B = 0.75


def _tf(words: Column, term: str) -> Column:
    return F.size(F.filter(words, lambda w: w == F.lit(term)))


def corpus_stats(
    df: DataFrame, text_col: str, terms: list[str]
) -> DataFrame:
    """ONE row: N, avgdl, and df_<i> (document frequency) per query term.
    avgdl divides two exact integers, so the double is engine-identical."""
    words = word_array(F.lower(F.col(text_col)))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size(words)) / F.count(F.lit(1))).alias("avgdl"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.sum(F.when(_tf(words, t) > 0, 1).otherwise(0)).alias(f"df_{i}")
        )
    return df.agg(*aggs)


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k docs by BM25 over ``terms`` (matched lowercase, whitespace
    tokens). Deterministic: ties break on id ascending."""
    if not terms:
        raise ValueError("terms must be non-empty")
    stats = corpus_stats(df, text_col, terms)
    words = word_array(F.lower(F.col(text_col)))
    scored = df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col),
        F.size(words).alias("__dl"),
        *[_tf(words, t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
        F.col("n_docs"),
        F.col("avgdl"),
        *[F.col(f"df_{i}") for i in range(len(terms))],
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("avgdl")
        )
        # term contributions add LEFT-TO-RIGHT in the terms order — keep
        # the oracle SQL in the same order for bit equality
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    # ln() is only 1-ulp-accurate and differs between the JVM and libm, so
    # the raw double is NOT cross-engine bit-stable; round to 9 dp (scores
    # are O(1-10), noise is ~2e-16) and sort on the rounded key so ordering
    # and values are both engine-identical.
    return (
        scored.withColumn("bm25", F.round(score, 9))
        .filter(F.col("bm25") > 0)
        .select(F.col(id_col), F.col("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def top_terms(df: DataFrame, text_col: str, k: int = 25) -> DataFrame:
    """Corpus-wide top-k terms by occurrence count (vocabulary heavy
    hitters). One explode + one hash aggregation (map-side partial combine
    collapses each partition to its local vocabulary before the shuffle, so
    shuffle volume is ~|vocab| per partition, not |tokens|) + TakeOrdered.
    Ties break lexicographically."""
    words = word_array(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(words).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(k)
    )


def top_terms_duckdb_sql(table_expr: str, text_expr: str, k: int = 25) -> str:
    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    return f"""
SELECT term, COUNT(*) AS cnt
FROM (SELECT unnest({words}) AS term FROM {table_expr})
WHERE term <> ''
GROUP BY term
ORDER BY cnt DESC, term
LIMIT {k}
"""


def build_vocab(df: DataFrame, text_col: str, size: int) -> list[str]:
    """Top-``size`` terms by count (ties lexicographic) as the id→term
    vocabulary; id 0 is reserved for OOV, so term i maps to id i+1.
    Driver-side list (vocabularies are KBs even at 100 TB corpora)."""
    return [r.term for r in top_terms(df, text_col, size).collect()]


def tokenize_to_ids(
    df: DataFrame, id_col: str, text_col: str, vocab: list[str]
) -> DataFrame:
    """(id, token_ids array<int>, n_oov): whitespace tokens mapped through
    the vocabulary literal (OOV → 0). One map over the text — the
    vocabulary is an array literal probed with array_position, no join, no
    shuffle; the output feeds pack_chunks' per-sequence slices."""
    words = word_array(F.lower(F.col(text_col)))
    vlit = F.array(*[F.lit(w) for w in vocab])
    ids = F.transform(
        words, lambda w: F.array_position(vlit, w).cast("int")
    )
    # two selects so n_oov reads the produced token_ids column — sibling
    # expressions would run the O(|vocab|)-per-token probe twice (Spark's
    # subexpression elimination does not reliably cover lambda functions)
    out = df.select(F.col(id_col), ids.alias("token_ids"))
    return out.select(
        id_col,
        "token_ids",
        F.size(F.filter(F.col("token_ids"), lambda i: i == 0))
        .cast("long")
        .alias("n_oov"),
    )


def tokenize_to_ids_duckdb_sql(
    table_expr: str, id_col: str, text_expr: str, vocab: list[str]
) -> str:
    """DuckDB twin of :func:`tokenize_to_ids` (list_position returns NULL
    for a miss, coalesced to the same OOV id 0)."""
    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    vlit = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in vocab) + "]"
    ids = (
        f"list_transform({words}, w -> "
        f"CAST(COALESCE(list_position({vlit}, w), 0) AS INT))"
    )
    # subquery so the probe (and the vocab literal) appears once
    return (
        f"SELECT {id_col}, token_ids, "
        f"CAST(len(list_filter(token_ids, i -> i = 0)) AS BIGINT) AS n_oov "
        f"FROM (SELECT {id_col}, {ids} AS token_ids FROM {table_expr})"
    )


def bm25_topk_duckdb_sql(
    table_expr: str,
    id_col: str,
    text_expr: str,
    terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB twin of bm25_topk — same fixed-order arithmetic."""

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    tf_cols = ", ".join(
        f"len(list_filter(words, w -> w = {q(t)})) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_aggs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        denom = (
            f"CAST(tf_{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} *"
            f" CAST(dl AS DOUBLE) / avgdl)"
        )
        parts.append(f"{idf} * CAST(tf_{i} AS DOUBLE) * {k1 + 1.0} / ({denom})")
    score = " + ".join(f"({p})" for p in parts)
    return f"""
WITH w AS (
  SELECT {id_col} AS id, {words} AS words FROM {table_expr}
), t AS (
  SELECT id, len(words) AS dl, {tf_cols} FROM w
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         {df_aggs}
  FROM t
)
SELECT id AS {id_col}, ROUND(0.0 + {score}, 9) AS bm25
FROM t, stats
WHERE ROUND(0.0 + {score}, 9) > 0
ORDER BY bm25 DESC, id
LIMIT {k}
"""
