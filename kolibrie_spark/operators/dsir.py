"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023): score every
raw document by log( p_target(doc) / p_raw(doc) ) under bag-of-hashed-
n-gram unigram models fit on a small target corpus (the distribution you
want more of) and the raw corpus. High-weight documents look like the
target; resample proportionally (or take the top fraction) to shift the
training mixture.

Determinism: each bucket's smoothed log-probability is rounded to 1e-9
and stored as a scaled BIGINT, so the per-document accumulation is an
EXACT integer sum — invariant to shuffle order and partitioning (a raw
double sum over a doc's n-grams would not be). The final weight is one
double division, bit-identical cross-engine.

Plan shape (100 TB raw corpus): the two model tables reduce to
``buckets`` rows each (map-side-combined counts) and broadcast; scoring
is explode -> broadcast-join -> one integer-sum aggregation per doc.
The target corpus is small by construction. Nothing quadratic, one
doc-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.hashing import poly_hash, poly_hash_duckdb
from kolibrie_spark.operators.textanalysis import word_array, word_ngrams

LOGP_SCALE = 1_000_000_000  # 1e-9 log-prob resolution


def _doc_grams(text: Column) -> Column:
    """Unigrams + bigrams of the lowercased doc, as one array."""
    words = word_array(F.lower(text))
    return F.concat(words, word_ngrams(words, 2))


def _gram_buckets(df: DataFrame, id_col: str, text_col: str, buckets: int) -> DataFrame:
    # the char-fold hash is the CPU hot spot; a low-partition input (one
    # parquet file) would run it on one core — spread first
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df.select(
        F.col(id_col),
        F.explode(_doc_grams(F.col(text_col))).alias("gram"),
    ).select(
        id_col, (poly_hash(F.col("gram")) % buckets).alias("bucket")
    )


def bucket_logprobs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    prebucketed: DataFrame | None = None,
) -> DataFrame:
    """Laplace-smoothed hashed-n-gram model: one row per OCCUPIED bucket,
    ``(bucket, logp_scaled)`` with logp = ln((c+1)/(N+B)) rounded to 1e-9
    as BIGINT. Unoccupied buckets take the implicit default
    ln(1/(N+B)) — callers fold it in via the totals row. Pass
    ``prebucketed`` (an ``(id, bucket)`` frame) to reuse an already-
    materialized gram explode — the char-fold hash is the CPU cost."""
    g = prebucketed if prebucketed is not None else _gram_buckets(
        df, id_col, text_col, buckets
    )
    counts = g.groupBy("bucket").agg(F.count("*").alias("c"))
    total = g.agg(F.count("*").alias("n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.round(
            F.log((F.col("c") + 1).cast("double") / (F.col("n") + buckets))
            * LOGP_SCALE
        )
        .cast("long")
        .alias("logp_scaled"),
        F.round(
            F.log(F.lit(1.0) / (F.col("n") + buckets)) * LOGP_SCALE
        )
        .cast("long")
        .alias("default_scaled"),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 256,
    *,
    target_within_raw: bool = False,
) -> DataFrame:
    """Per-doc DSIR log importance weight over ``raw``:
    ``(id, n_grams, logw)`` with logw = (1/n) * sum over doc n-grams of
    [logp_target(bucket) - logp_raw(bucket)], rounded to 9 dp; NULL for
    docs with no grams (empty text).

    ``target_within_raw=True`` declares ``target`` a row-subset of
    ``raw`` (the usual DSIR shape: the target slice of the corpus); the
    target model is then derived from the already-hashed raw gram table
    by an id semi-join instead of re-running the char-fold hash over the
    target texts — identical counts, one fewer text pass (r12, guide
    §2.4 reuse-not-recompute)."""
    # materialize the raw gram->bucket table once: it feeds the raw model
    # counts, the per-doc scoring join and (under target_within_raw) the
    # target model, and the char-fold hash dominates CPU. One narrow
    # (id, bucket) frame — at corpus scale this is the intermediate a
    # pipeline would persist anyway.
    gb = _gram_buckets(raw, id_col, text_col, buckets).localCheckpoint(
        eager=False
    )
    tgb = (
        gb.join(target.select(F.col(id_col)), on=id_col, how="left_semi")
        if target_within_raw
        else _gram_buckets(target, id_col, text_col, buckets)
    )
    # model counts per occupied bucket; totals derive from the
    # `buckets`-row count tables (sum of counts == gram count) instead of
    # a second full pass per model (r12, guide §1.2: don't recompute what
    # a 256-row aggregate already holds). coalesce: empty corpus -> 0.
    rc = gb.groupBy("bucket").agg(F.count(F.lit(1)).alias("__rc"))
    tc = tgb.groupBy("bucket").agg(F.count(F.lit(1)).alias("__tc"))
    rn = rc.agg(F.coalesce(F.sum("__rc"), F.lit(0)).alias("__rn"))
    tn = tc.agg(F.coalesce(F.sum("__tc"), F.lit(0)).alias("__tn"))

    def _lp(c, n):
        # scaled smoothed log-prob; an absent bucket carries count 0, so
        # (0+1)/(n+B) IS the old default_scaled — one formula covers both
        return (
            F.round(
                F.log(
                    (F.coalesce(c, F.lit(0)) + 1).cast("double")
                    / (n + buckets)
                )
                * LOGP_SCALE
            )
            .cast("long")
        )

    # an EMPTY model (no grams at all) contributed NULL on its side in
    # the two-model formulation (no rows to take the default from) — the
    # when() guards preserve that: n == 0 -> NULL, which nulls the diff
    diff = (
        tc.join(rc, "bucket", "full")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .select(
            "bucket",
            (
                F.when(F.col("__tn") > 0, _lp(F.col("__tc"), F.col("__tn")))
                - F.when(F.col("__rn") > 0, _lp(F.col("__rc"), F.col("__rn")))
            ).alias("diff_scaled"),
        )
    )
    scored = (
        gb.join(F.broadcast(diff), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("diff_scaled").alias("_s"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(
                F.col("_s").cast("double")
                / (F.lit(float(LOGP_SCALE)) * F.col("n_grams")),
                9,
            ).alias("logw"),
        )
    )


def dsir_logweights_duckdb_sql(
    table: str,
    id_col: str,
    text_expr: str,
    target_pred: str,
    buckets: int = 256,
) -> str:
    """DuckDB twin: target = the ``target_pred`` slice of ``table``, raw =
    the whole table (the gate's shape). Same hash, same smoothing, same
    scaled-integer accumulation."""
    words = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    bigrams = (
        f"list_transform(range(1, len({words})), "
        f"i -> ({words})[i] || ' ' || ({words})[i + 1])"
    )
    grams = f"list_concat({words}, {bigrams})"
    bucket = f"({poly_hash_duckdb('gram')} % {buckets})"
    return f"""
WITH g AS (
  SELECT {id_col} AS did, unnest({grams}) AS gram FROM {table}
), gb AS (
  SELECT did, {bucket} AS bucket FROM g
), tg AS (
  SELECT {id_col} AS did, unnest({grams}) AS gram FROM {table} WHERE {target_pred}
), tgb AS (
  SELECT did, {bucket} AS bucket FROM tg
), r_counts AS (SELECT bucket, COUNT(*) AS c FROM gb GROUP BY bucket),
r_total AS (SELECT COUNT(*) AS n FROM gb),
t_counts AS (SELECT bucket, COUNT(*) AS c FROM tgb GROUP BY bucket),
t_total AS (SELECT COUNT(*) AS n FROM tgb),
r_model AS (
  SELECT bucket,
         CAST(round(ln((c + 1) / CAST(n + {buckets} AS DOUBLE)) * {LOGP_SCALE}) AS BIGINT) AS lp
  FROM r_counts, r_total),
t_model AS (
  SELECT bucket,
         CAST(round(ln((c + 1) / CAST(n + {buckets} AS DOUBLE)) * {LOGP_SCALE}) AS BIGINT) AS lp
  FROM t_counts, t_total),
defaults AS (
  SELECT CAST(round(ln(1.0 / (t_total.n + {buckets})) * {LOGP_SCALE}) AS BIGINT) AS t_d,
         CAST(round(ln(1.0 / (r_total.n + {buckets})) * {LOGP_SCALE}) AS BIGINT) AS r_d
  FROM t_total, r_total),
diff AS (
  SELECT COALESCE(t_model.bucket, r_model.bucket) AS bucket,
         COALESCE(t_model.lp, d.t_d) - COALESCE(r_model.lp, d.r_d) AS diff_scaled
  FROM t_model FULL JOIN r_model ON t_model.bucket = r_model.bucket
  CROSS JOIN defaults d),
scored AS (
  SELECT gb.did, COUNT(*) AS n_grams, SUM(diff.diff_scaled) AS s
  FROM gb JOIN diff USING (bucket) GROUP BY gb.did)
SELECT t.{id_col},
       COALESCE(sc.n_grams, 0) AS n_grams,
       ROUND(CAST(sc.s AS DOUBLE) / ({float(LOGP_SCALE)!r} * sc.n_grams), 9) AS logw
FROM {table} t LEFT JOIN scored sc ON sc.did = t.{id_col}
"""
