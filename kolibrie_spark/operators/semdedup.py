"""SemDeDup-style semantic deduplication (Abbas et al. 2023).

Embedding-space near-duplicate pruning at corpus scale: cluster the
embeddings, then drop within-cluster near-duplicates (cosine >=
threshold), keeping one representative per duplicate neighborhood.
The clustering is what makes it tractable — the quadratic pairwise
comparison runs only INSIDE each cell, exactly the paper's design
(their k-means clusters bound the O(n^2); cell-size skew is controlled
by raising ncells).

Drop rule (deterministic): a vector is dropped iff some LOWER-id vector
in the same cell is within the threshold — the greedy keep-first-seen
variant, reproducible on any engine and stable under reruns.

Plan shape: one no-shuffle argmin cell assignment (centroid list is a
literal folded per row), one self-join on the cell key (hash shuffle on
cell), one anti-join of the drop set. Centroids: deterministic first-N
(oracle path) or MLlib KMeans (`similarity.kmeans_centroids`) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.similarity import (
    cosine_duckdb_sql,
    cosine_prenorm_expr,
    l2sq_duckdb_sql,
    norm_expr,
    seed_centroids,
    with_ivf_cell,
)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    ncells: int = 8,
    threshold: float = 0.95,
    centroid_provider=None,
    vectorized_assign: bool = False,
) -> DataFrame:
    """Rows of ``df`` surviving semantic dedup, plus their ``ivf_cell``.
    A row is dropped iff a lower-id same-cell row has cosine similarity
    >= ``threshold`` with it.

    SCALE GUIDANCE: the within-cell comparison is quadratic IN THE CELL,
    so ``ncells`` must grow with the corpus (~n / desired_cell_size) —
    a fixed ncells makes the whole operator quadratic (measured: 10x
    data at ncells=8 cost 14x).  Past ~tens of centroids also set
    ``vectorized_assign=True``: the expression-fold assignment's codegen
    collapses there, while the Arrow matmul path stays flat (the gate
    keeps the default fold for bit-exact oracle parity at small ncells)."""
    provider = centroid_provider or seed_centroids
    centroids = provider(df, id_col, vec_col, ncells)
    assigned = with_ivf_cell(df, vec_col, centroids, vectorized=vectorized_assign)
    # the within-cell quadratic comparison joins on ivf_cell alone, which
    # caps parallelism at ncells tasks (8 cells = 8 busy cores on a
    # CPU-dense cosine loop). Salting the a-side by id hash and
    # replicating the b-side over the salts keeps every unordered pair
    # exactly once while spreading each cell over `salt` reducers —
    # bit-identical output, ncells*salt-way parallelism.
    salt = 8
    # norms hoisted to once per ROW (r12, guide §2): the quadratic pair
    # predicate below then folds one 64-element dot per pair instead of
    # three (dot + both norms) — bit-identical via cosine_prenorm_expr
    a = assigned.select(
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("_va"),
        norm_expr(F.col(vec_col)).alias("_na"),
        "ivf_cell",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int").alias("_salt"),
    )
    b = assigned.select(
        F.col(id_col).alias("_id_b"),
        F.col(vec_col).alias("_vb"),
        norm_expr(F.col(vec_col)).alias("_nb"),
        "ivf_cell",
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    drops = (
        a.join(b, ["ivf_cell", "_salt"])
        .where(F.col("_id_a") < F.col("_id_b"))
        .where(
            cosine_prenorm_expr(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            )
            >= threshold
        )
        .select(F.col("_id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(drops, id_col, "left_anti")


def semantic_dedup_duckdb_sql(
    table: str,
    id_col: str,
    vec_col: str,
    out_cols: str,
    ncells: int = 8,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin (same first-N centroids, same argmin tie-break, same
    fold accumulation order as the Spark expressions)."""
    l2_assign = l2sq_duckdb_sql("e.v", "c.cvec")
    cos = cosine_duckdb_sql("x._v", "y._v")
    return f"""
WITH e AS (
  SELECT {id_col}, list_transform({vec_col}, q -> CAST(q AS DOUBLE)) AS v
  FROM {table}
),
cent AS (SELECT {id_col} AS cid, v AS cvec FROM e ORDER BY {id_col} LIMIT {ncells}),
assign AS (
  SELECT e.{id_col}, e.v AS _v, c.cid,
         row_number() OVER (PARTITION BY e.{id_col}
                            ORDER BY {l2_assign} ASC, c.cid ASC) AS rn
  FROM e CROSS JOIN cent c),
cells AS (SELECT {id_col}, _v, cid AS ivf_cell FROM assign WHERE rn = 1),
drops AS (
  SELECT DISTINCT y.{id_col}
  FROM cells x JOIN cells y
    ON x.ivf_cell = y.ivf_cell AND x.{id_col} < y.{id_col}
  WHERE {cos} >= {threshold}
)
SELECT {out_cols}, cells.ivf_cell
FROM {table} t JOIN cells ON cells.{id_col} = t.{id_col}
WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.{id_col} = t.{id_col})
"""
