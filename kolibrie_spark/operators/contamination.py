"""Benchmark-contamination detection for training-data curation: for every
corpus document, the fraction of its distinct word n-grams that also occur
in a benchmark/eval document set (n-gram containment, the decontamination
rule used for GPT-2/3-style training sets).

Plan shape for 100 TB: the benchmark side is small (eval sets are KBs-MBs),
so its distinct n-gram set is collected into a broadcast hash relation;
the corpus side dedups n-grams DOC-LOCALLY (``array_distinct`` before
``explode`` — no shuffle spent on dedup), then one broadcast left join
marks hits and one groupBy(doc) aggregation (map-side partial) computes the
fraction. Total: one shuffle, keyed by doc id, carrying one row per
distinct (doc, n-gram).

The fraction is hits/total — a single IEEE division, engine-identical, so
the DuckDB twin is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import word_array, word_ngrams


def ngram_containment(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc contamination: (id, n_ngrams, n_contaminated,
    containment). Docs with fewer than ``n`` words have containment 0.0."""
    if n <= 0:
        raise ValueError("n must be positive")
    bench_ngrams = (
        benchmark.select(
            F.explode(
                word_ngrams(word_array(F.lower(F.col(bench_text_col))), n)
            ).alias("__ng")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_ngrams = corpus.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngrams(word_array(F.lower(F.col(text_col))), n))
        ).alias("__ng"),
    )
    joined = doc_ngrams.join(F.broadcast(bench_ngrams), on="__ng", how="left")
    return joined.groupBy(id_col).agg(
        F.count("__ng").alias("n_ngrams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
        F.when(
            F.count("__ng") > 0,
            F.coalesce(F.sum("__hit"), F.lit(0))
            / F.count("__ng").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("containment"),
    )


def ngram_containment_duckdb_sql(
    corpus_sql: str,
    id_col: str,
    text_col: str,
    bench_sql: str,
    bench_text_col: str,
    n: int = 5,
) -> str:
    """DuckDB twin of :func:`ngram_containment`. ``corpus_sql`` /
    ``bench_sql`` are table expressions (may be parenthesized SELECTs)."""

    def grams(expr: str) -> str:
        words = f"string_split_regex(trim(lower({expr})), '\\s+')"
        g = (
            f"list_transform(range(1, len({words}) - {n} + 2), "
            f"i -> array_to_string(({words})[i:i+{n - 1}], ' '))"
        )
        return f"(CASE WHEN len({words}) >= {n} THEN {g} ELSE [] END)"

    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({grams(bench_text_col)}) AS ng FROM {bench_sql}
), doc_ng AS (
  SELECT {id_col} AS id,
         unnest(list_distinct({grams(text_col)})) AS ng
  FROM {corpus_sql}
), marked AS (
  SELECT d.id, d.ng, CASE WHEN b.ng IS NOT NULL THEN 1 END AS hit
  FROM doc_ng d LEFT JOIN bench b ON d.ng = b.ng
), agg AS (
  SELECT id, COUNT(ng) AS n_ngrams,
         CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS n_contaminated
  FROM marked GROUP BY id
)
SELECT c.{id_col}, COALESCE(a.n_ngrams, 0) AS n_ngrams,
       COALESCE(a.n_contaminated, 0) AS n_contaminated,
       CASE WHEN COALESCE(a.n_ngrams, 0) > 0
            THEN a.n_contaminated / CAST(a.n_ngrams AS DOUBLE)
            ELSE 0.0 END AS containment
FROM {corpus_sql} c LEFT JOIN agg a ON c.{id_col} = a.id
"""


def embedding_contamination(
    corpus: DataFrame,
    corpus_id: str,
    bench: DataFrame,
    bench_id: str,
    vec_col: str,
    *,
    dim: int,
    tau: float = 0.9,
    bits: int = 8,
    seed: int = 42,
    repetitions: int = 1,
) -> DataFrame:
    """Embedding-level eval-set contamination: corpus rows whose vector is
    near-identical (cosine >= tau) to a benchmark vector — catches
    paraphrased/reformatted leakage that n-gram containment misses.

    The CONTRACT (what the oracle brute-forces) is: same random-hyperplane
    LSH bucket under ANY of the ``repetitions`` seeded plane sets
    (seed, seed+1, ...) AND cosine >= tau AND corpus_id != bench_id.
    The bucket conjunct is the standard recall trade — a cosine-0.99 pair
    lands in one shared bucket with probability ~(1 - (1 - p^bits)^r),
    so repetitions=3 turns the ~94% single-table recall at 0.9997 cosine
    into ~99.98%. Each repetition re-scans the corpus once (a probe-side
    union, still no corpus shuffle); pairs found by several repetitions
    dedupe via distinct on the id pair.

    Plan shape at 100 TB: eval benchmarks are tiny, so the bench side
    (id, vector, bucket) is BROADCAST and the join on the bucket key is a
    BroadcastHashJoin — the corpus is scanned once, never shuffled, and
    the cosine runs only inside matching buckets (~1/2^bits of the cross
    product). Scores are the shared left-fold dot product, bit-identical
    to the DuckDB twin.
    """
    from kolibrie_spark.operators.similarity import (
        cosine_expr,
        hyperplanes,
        signature_expr,
    )

    if repetitions < 1:
        raise ValueError("repetitions must be >= 1")
    v = F.col(vec_col)
    hits = None
    for r in range(repetitions):
        planes = hyperplanes(dim, bits, seed + r)
        c = corpus.select(
            F.col(corpus_id).alias("corpus_id"),
            v.cast("array<double>").alias("cv"),
            signature_expr(v, planes).alias("bucket"),
        )
        b = bench.select(
            F.col(bench_id).alias("bench_id"),
            v.cast("array<double>").alias("bv"),
            signature_expr(v, planes).alias("bucket"),
        )
        rep = (
            c.join(F.broadcast(b), on="bucket")
            .filter(F.col("corpus_id") != F.col("bench_id"))
            .withColumn("cosine", cosine_expr(F.col("cv"), F.col("bv")))
            .filter(F.col("cosine") >= F.lit(float(tau)))
            .select("corpus_id", "bench_id", "cosine")
        )
        hits = rep if hits is None else hits.unionAll(rep)
    if repetitions == 1:
        return hits
    # same pair found under several plane sets: identical cosine, dedupe
    return hits.distinct()


def embedding_contamination_duckdb_sql(
    corpus_sql: str,
    corpus_id: str,
    bench_sql: str,
    bench_id: str,
    vec_expr: str,
    *,
    dim: int,
    tau: float = 0.9,
    bits: int = 8,
    seed: int = 42,
) -> str:
    """Brute-force twin of :func:`embedding_contamination`: quadratic join
    evaluating the identical bucket + cosine contract."""
    from kolibrie_spark.operators.similarity import cosine_duckdb_sql, hyperplanes

    planes = hyperplanes(dim, bits, seed)
    plane_sql = (
        "["
        + ", ".join("[" + ", ".join(repr(x) for x in p) + "]" for p in planes)
        + "]"
    )
    dot_vp = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {dim}), k -> {{v}}[k] * ps[j+1][k])), "
        f"(acc, x) -> acc + x)"
    )
    sig = (
        f"list_aggregate(list_transform(generate_series(0, {bits - 1}), "
        "j -> CASE WHEN " + dot_vp + " >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT "
        "END), 'sum')"
    )
    cos = cosine_duckdb_sql("cv", "bv")
    return f"""
WITH planes AS (SELECT {plane_sql}::DOUBLE[][] AS ps),
c AS (SELECT {corpus_id} AS corpus_id,
             list_transform({vec_expr}, x -> CAST(x AS DOUBLE)) AS cv
      FROM {corpus_sql}),
b AS (SELECT {bench_id} AS bench_id,
             list_transform({vec_expr}, x -> CAST(x AS DOUBLE)) AS bv
      FROM {bench_sql}),
csig AS (SELECT corpus_id, cv, {sig.format(v='cv')} AS bucket FROM c, planes),
bsig AS (SELECT bench_id, bv, {sig.format(v='bv')} AS bucket FROM b, planes)
SELECT corpus_id, bench_id, {cos} AS cosine
FROM csig JOIN bsig USING (bucket)
WHERE corpus_id != bench_id AND {cos} >= {float(tau)}
"""
