"""Cross-document span profiling (C4-style boilerplate detection).

C4 removes any three-sentence span that occurs more than once in the
corpus; the same signal at word-span granularity is "what fraction of a
document's word n-gram spans also appear in >= min_df other documents".
This is the CROSS-document complement of textanalysis.dup_ngram_fraction
(which is within-document repetition).

Scale shape (100 TB): explode to one (doc, span) row per DISTINCT span
per doc (map-side distinct inside the doc via array_distinct — no
pre-shuffle blowup from within-doc repeats), then count each span's
documents with a window partition count (one evaluation of the explode
subtree, no self-join — measured 5.7x faster than groupBy + join-back),
then reaggregate per doc. Two shuffles total (span, then doc). Hot
boilerplate spans all land on one reducer for their count; if a single
span's doc set outgrows a partition at corpus scale, pass
``heavy_df_cap`` — a skew-free pre-count routes guaranteed-common heavy
spans through a size-bounded broadcast and shatters their window groups
with a per-row salt, so every remaining window group is provably smaller
than the cap (r8; measured trade-offs in BASELINE.md r9 — the unguarded
window stays the default because the guard re-evaluates the explode).

No reference counterpart (Kolibrie has no text surface) — this is part
of the training-data curation layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import word_array, word_ngrams


def common_span_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_df: int = 3,
    heavy_df_cap: int | None = None,
) -> DataFrame:
    """Per-doc profile of corpus-common word ``n``-gram spans.

    Returns one row per input doc:
      ``id_col, n_spans, n_common, common_frac``
    where ``n_spans`` counts the doc's DISTINCT word n-grams, ``n_common``
    counts those appearing in >= ``min_df`` documents (doc frequency
    includes the doc itself), and ``common_frac`` = n_common / n_spans
    (0.0 for docs with fewer than ``n`` words).

    ``heavy_df_cap`` is the corpus-scale skew guard (opt-in; requires
    ``heavy_df_cap >= min_df``).  The default window plan puts every row
    of one span on one reducer — fine until a boilerplate span appears in
    millions of documents, at which point that reducer is an unsplittable
    straggler.  With the cap set, a skew-free pre-count (map-side-combined
    groupBy) finds the spans with doc frequency >= cap; those are
    guaranteed common (cap >= min_df, no exact count needed) and are
    marked by a BROADCAST join whose build side is bounded by
    construction at ``total_span_rows / cap`` entries; only the remaining
    spans — every window group now provably < cap rows — go through the
    window.  Same exact output (equivalence pinned in
    tests/test_curation2.py::test_common_span_profile_heavy_df_cap_equivalence);
    costs one extra evaluation of the explode subtree, which is why it is
    opt-in: measured fresh-JVM at sf0.01/sf0.1 (10x) the unguarded window
    is fastest (1.30s/1.02s vs guard 1.61s/1.94s; BASELINE.md r9) and the
    exploded input grows exactly linearly (25,165 -> 250,704 distinct
    (doc, span) rows, 9.96x), so the default is right until a single
    span's doc set outgrows one executor's partition.
    """
    from pyspark.sql.window import Window

    words = word_array(F.lower(F.col(text_col)))
    spans = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(words, n))).alias("span"),
    )
    if heavy_df_cap is not None:
        if heavy_df_cap < min_df:
            raise ValueError(
                "heavy_df_cap must be >= min_df (heavy spans are assumed "
                f"common): {heavy_df_cap} < {min_df}"
            )
        heavy = (
            spans.groupBy("span")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= heavy_df_cap)
            .select("span")
        )
        marked = spans.join(
            F.broadcast(heavy.withColumn("is_heavy", F.lit(True))),
            "span",
            "left",
        )
        # Heavy rows get a per-row salt so their (unused) window groups
        # shatter to singletons — the hot span never reaches one reducer;
        # light rows keep salt 0, so their span group stays whole (< cap
        # rows by construction) and the count is exact.
        salt = F.when(F.col("is_heavy"), F.xxhash64(F.col(id_col))).otherwise(
            F.lit(0)
        )
        light_docs = F.count("*").over(Window.partitionBy("span", "salt"))
        per_doc = (
            marked.withColumn("salt", salt)
            .withColumn(
                "is_common",
                F.when(F.col("is_heavy"), F.lit(True)).otherwise(
                    light_docs >= min_df
                ),
            )
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_spans"),
                F.sum(F.when(F.col("is_common"), 1).otherwise(0)).alias(
                    "n_common"
                ),
            )
        )
        return _reattach(df, per_doc, id_col)
    # doc frequency per span: (doc, span) is already distinct, so a plain
    # partition count is the distinct-doc count. A window count instead of
    # a groupBy + self-join halves the work: the explode subtree is
    # evaluated once and there is no join — one shuffle on span, one on doc
    span_docs = F.count("*").over(Window.partitionBy("span"))
    per_doc = (
        spans.withColumn("span_docs", span_docs)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("span_docs") >= min_df, 1).otherwise(0)).alias(
                "n_common"
            ),
        )
    )
    return _reattach(df, per_doc, id_col)


def _reattach(df: DataFrame, per_doc: DataFrame, id_col: str) -> DataFrame:
    """Docs too short to have any span: re-attach with zero counts."""
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                F.col("n_common") / F.col("n_spans").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("common_frac"),
        )
    )


def common_span_profile_duckdb_sql(
    table: str,
    id_col: str,
    text_expr: str,
    n: int = 5,
    min_df: int = 3,
) -> str:
    """DuckDB twin of :func:`common_span_profile` (1-based inclusive list
    slicing; ``range``'s exclusive end matches Spark's guarded sequence)."""
    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    grams = (
        f"list_distinct(list_transform(range(1, len({words}) - {n} + 2), "
        f"i -> array_to_string(({words})[i:i+{n - 1}], ' ')))"
    )
    return f"""
WITH spans AS (
  SELECT {id_col} AS did, unnest({grams}) AS span FROM {table}
), span_df AS (
  SELECT span, count(*) AS span_docs FROM spans GROUP BY span
), per_doc AS (
  SELECT s.did, count(*) AS n_spans,
         CAST(sum(CASE WHEN f.span_docs >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common
  FROM spans s JOIN span_df f USING (span)
  GROUP BY s.did
)
SELECT t.{id_col},
       COALESCE(p.n_spans, 0) AS n_spans,
       COALESCE(p.n_common, 0) AS n_common,
       CASE WHEN COALESCE(p.n_spans, 0) > 0
            THEN p.n_common / CAST(p.n_spans AS DOUBLE)
            ELSE 0.0 END AS common_frac
FROM {table} t LEFT JOIN per_doc p ON p.did = t.{id_col}
"""
