"""Embedding-column aggregation: per-group centroids.

Training-data pipelines aggregate embedding vectors constantly (cluster
centroids for semantic dedup / SemDeDup-style pruning, per-source
quality centroids, IVF codebook refresh). Distributed float summation is
NOT bit-reproducible (IEEE addition is non-associative and shuffle
order varies), so the mean is computed over integer-scaled components:
round(v * 10^scale) fits exactly in a BIGINT, integer sums are exact and
associative in any order, and the final mean is a single double division
— bit-identical on every engine and every rerun. (A float32 component
times 10^6 has <= 44 significand bits, so the double product and the
round are both exact.)

Plan shape: posexplode (narrow, no shuffle) -> one hash aggregation on
(group, dim) with map-side combine. At 100 TB the (group, dim) key space
is groups x dim — small; the partial aggregates do all the data
reduction before the shuffle.

No reference counterpart (curation-layer operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 6,
) -> DataFrame:
    """Exact, reproducible per-group mean embedding as flat rows
    ``(group_col, dim, centroid, n_vecs)`` — one row per (group,
    component)."""
    factor = float(10**scale)
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return (
        exploded.groupBy(group_col, "dim")
        .agg(
            F.sum(
                F.round(F.col("v").cast("double") * factor).cast("long")
            ).alias("_scaled_sum"),
            F.count("*").alias("n_vecs"),
        )
        .select(
            F.col(group_col),
            F.col("dim").cast("long").alias("dim"),
            (
                F.col("_scaled_sum").cast("double")
                / (F.lit(factor) * F.col("n_vecs"))
            ).alias("centroid"),
            F.col("n_vecs"),
        )
    )


def group_centroids_duckdb_sql(
    table: str,
    group_col: str,
    vec_expr: str,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`group_centroids` (0-based dim to match
    posexplode; the two zipped unnests align positionally)."""
    factor = float(10**scale)
    return f"""
WITH exploded AS (
  SELECT {group_col},
         unnest(range(0, len({vec_expr}))) AS dim,
         unnest({vec_expr}) AS v
  FROM {table}
)
SELECT {group_col}, dim,
       CAST(sum(CAST(round(CAST(v AS DOUBLE) * {factor}) AS BIGINT)) AS DOUBLE)
         / ({factor} * count(*)) AS centroid,
       count(*) AS n_vecs
FROM exploded
GROUP BY {group_col}, dim
"""


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    *,
    dim: int,
    bits: int = 6,
    seed: int = 42,
    per_anchor: int = 1,
    relation: str = "negative",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``per_anchor`` most-similar vectors with a DIFFERENT label among
    its LSH-bucket neighbors (``relation="positive"`` flips the label
    predicate to mine the hardest same-label pairs instead — the other
    half of a contrastive batch; self-pairs excluded). Hard negatives (near the anchor but wrong
    class) are what make contrastive/embedding training converge; random
    negatives are too easy.

    CONTRACT: candidates = same random-hyperplane bucket (seeded, shared
    with the similarity index; the standard recall trade) AND different
    label; ranked by cosine DESC with id ASC tie-break. The bucket
    equi-join keeps work at ~1/2^bits of the quadratic cross product; a
    rank window per anchor emits the top ``per_anchor``. Deterministic
    end-to-end.

    Returns ``(anchor_id, negative_id, cosine)``.
    """
    from pyspark.sql.window import Window

    from kolibrie_spark.operators.similarity import (
        cosine_prenorm_expr,
        hyperplanes,
        norm_expr,
        signature_expr,
    )

    if relation not in ("negative", "positive"):
        raise ValueError("relation must be 'negative' or 'positive'")
    planes = hyperplanes(dim, bits, seed)
    v = F.col(vec_col)
    base = df.select(
        F.col(id_col).alias("id"),
        v.cast("array<double>").alias("v"),
        F.col(label_col).alias("lbl"),
        signature_expr(v, planes).alias("bucket"),
    )
    # norms hoisted to once per ROW (r12, guide §2): the within-bucket
    # quadratic pair scoring folds one dot per pair instead of three —
    # bit-identical via cosine_prenorm_expr
    a = base.select(
        F.col("id").alias("anchor_id"),
        F.col("v").alias("av"),
        norm_expr(F.col("v")).alias("__an"),
        F.col("lbl").alias("albl"),
        "bucket",
    )
    b = base.select(
        F.col("id").alias("negative_id"),
        F.col("v").alias("nv"),
        norm_expr(F.col("v")).alias("__nn"),
        F.col("lbl").alias("nlbl"),
        "bucket",
    )
    scored = (
        a.join(b, on="bucket")
        .filter(
            (F.col("albl") != F.col("nlbl"))
            if relation == "negative"
            else (
                (F.col("albl") == F.col("nlbl"))
                & (F.col("anchor_id") != F.col("negative_id"))
            )
        )
        .withColumn(
            "cosine",
            cosine_prenorm_expr(
                F.col("av"), F.col("nv"), F.col("__an"), F.col("__nn")
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_anchor)
        .select("anchor_id", "negative_id", "cosine")
    )


def hard_negatives_duckdb_sql(
    table_expr: str,
    id_col: str,
    vec_expr: str,
    label_col: str,
    *,
    dim: int,
    bits: int = 6,
    seed: int = 42,
    per_anchor: int = 1,
) -> str:
    """Brute-force twin evaluating the identical bucket+label+rank
    contract."""
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
    cos = cosine_duckdb_sql("a.v", "b.v")
    return f"""
WITH planes AS (SELECT {plane_sql}::DOUBLE[][] AS ps),
base AS (
  SELECT {id_col} AS id, list_transform({vec_expr}, x -> CAST(x AS DOUBLE)) AS v,
         {label_col} AS lbl
  FROM {table_expr}
),
sigs AS (SELECT id, v, lbl, {sig.format(v='v')} AS bucket FROM base, planes),
scored AS (
  SELECT a.id AS anchor_id, b.id AS negative_id, {cos} AS cosine
  FROM sigs a JOIN sigs b USING (bucket)
  WHERE a.lbl != b.lbl
)
SELECT anchor_id, negative_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
    ORDER BY cosine DESC, negative_id ASC) AS rn
  FROM scored
) WHERE rn <= {per_anchor}
"""
