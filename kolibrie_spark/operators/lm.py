"""Corpus n-gram language-model scoring for quality filtering (the CCNet
recipe: train a cheap LM on the corpus, drop documents whose perplexity
says they don't look like language).

Model: add-k-smoothed bigram LM trained on the corpus itself —
P(w2 | w1) = (C(w1 w2) + k) / (C(w1 ·) + k·V), with C(w1 ·) the context
count (bigrams starting with w1) and V the distinct-word vocabulary size.
A document's score is the mean natural log-probability of its bigrams
(higher = more typical); docs with fewer than 2 words get NULL.

Plan shape: one explode produces the (doc, pos, w1, w2) bigram table;
bigram and context counts are two map-side-combined aggregations of it;
scoring joins the counts back (at 100 TB the count tables are the classic
MapReduce LM artifact — shuffled once, reusable across scoring runs; prune
to a top-V vocabulary before joining if V² pressure bites).

Cross-engine exactness: per-doc log-probs fold IN POSITION ORDER
(sort_array + aggregate here, list(... ORDER BY pos) + list_reduce in the
twin) — a plain SUM over the join output would add doubles in partition
order and drift. ln() itself is only 1-ulp-accurate per engine (the BM25
lesson), so the mean is rounded to 9 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import word_array

K_SMOOTH = 0.1


def _bigram_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = word_array(F.lower(F.col(text_col)))
    pairs = F.arrays_zip(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
    )
    out = df.select(
        F.col(id_col), F.posexplode(pairs).alias("pos", "bg")
    )
    return out.select(
        id_col,
        "pos",
        F.col("bg").getField("0").alias("w1"),
        F.col("bg").getField("1").alias("w2"),
    )


def lm_score(
    df: DataFrame, id_col: str, text_col: str, k: float = K_SMOOTH
) -> DataFrame:
    """(id, n_bigrams, avg_logp): mean ln P(w2|w1) under the corpus bigram
    LM, rounded to 9 dp; NULL avg_logp for docs with < 2 words."""
    # r12 (guide §2.4, reuse-not-recompute): the bigram explode feeds FIVE
    # branches (both vocab sides, the two count tables, and the scored
    # join's probe side); a lazy checkpoint materializes it once instead
    # of re-exploding the corpus per branch.  The count tables stay
    # groupBy aggregates (map-side partials — a window-count variant
    # measured slightly faster at sf0.1 but buffers whole hot-context
    # groups in one task at scale, which partial aggregation avoids).
    bg = _bigram_table(df, id_col, text_col).localCheckpoint(eager=False)
    # vocab size as a broadcast 1-row aggregate INSIDE the plan — an eager
    # .count() here would launch a full corpus explode at plan-construction
    # time and re-scan the corpus once extra per invocation
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .union(bg.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").cast("double").alias("__vs"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ctx"))
    scored = (
        bg.join(bgc, on=["w1", "w2"])
        .join(ctx, on="w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log(
                (F.col("c_bg") + F.lit(k))
                / (F.col("c_ctx") + F.lit(k) * F.col("__vs"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "lp"))),
                lambda s: s["lp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__sum_lp"),
    )
    out = per_doc.withColumn(
        "avg_logp", F.round(F.col("__sum_lp") / F.col("n_bigrams"), 9)
    ).drop("__sum_lp")
    # restore docs with no bigrams (single-word/empty) with NULL score
    base = df.select(F.col(id_col))
    return base.join(out, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "avg_logp",
    )


def lm_score_duckdb_sql(
    table_expr: str, id_col: str, text_expr: str, k: float = K_SMOOTH
) -> str:
    """DuckDB twin of :func:`lm_score` — same counts, same position-ordered
    fold, same 9-dp rounding."""
    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    return f"""
WITH w AS (
  SELECT {id_col} AS id, {words} AS ws FROM {table_expr}
), bg AS (
  SELECT id, i - 1 AS pos, ws[i] AS w1, ws[i + 1] AS w2
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
), v AS (
  SELECT COUNT(*) AS vs FROM (
    SELECT w1 AS wx FROM bg UNION SELECT w2 FROM bg
  )
), bgc AS (
  SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY 1, 2
), ctx AS (
  SELECT w1, COUNT(*) AS c_ctx FROM bg GROUP BY 1
), lp AS (
  SELECT bg.id, bg.pos,
         ln((c_bg + {k}) / (c_ctx + {k} * vs)) AS lp
  FROM bg JOIN bgc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
), agg AS (
  SELECT id, COUNT(*) AS n_bigrams,
         list_reduce(list_prepend(0.0::DOUBLE, list(lp ORDER BY pos)),
                     (acc, x) -> acc + x) AS sum_lp
  FROM lp GROUP BY id
)
SELECT d.{id_col}, COALESCE(a.n_bigrams, 0) AS n_bigrams,
       ROUND(a.sum_lp / a.n_bigrams, 9) AS avg_logp
FROM {table_expr} d LEFT JOIN agg a ON d.{id_col} = a.id
"""
