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
