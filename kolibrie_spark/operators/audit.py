"""Data-quality auditing: the assertion pass a pipeline runs before
promoting a batch (dbt-test / Great-Expectations shape, engine-side).

``audit_counts`` evaluates a set of named boolean rules in ONE scan —
each rule is a predicate column summed as violations; no per-rule jobs.
``fk_violations_df`` counts orphaned foreign keys with a
broadcast-friendly left-join null-probe (the dimension side's distinct
keys are usually small; when they exceed broadcast size the join
sort-merges, with scan-side bloom pruning eligible on file-scan
inputs).

Output is one row per rule: ``(rule, n_violations, n_rows)`` — the
shape a CI gate asserts on ("fail promote if any n_violations > 0").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """``rules`` maps rule name -> violation predicate (TRUE = violation).
    One map-side-combined aggregation computes every rule; the result is
    unpivoted to one row per rule via a stack (no second pass)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = list(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            # coalesce: SUM over zero rows is NULL, but an audit of an
            # empty batch must report 0 violations, not unknown
            F.coalesce(F.sum(rules[name].cast("long")), F.lit(0)).alias(
                f"__v_{i}"
            )
            for i, name in enumerate(names)
        ],
    )
    stack = ", ".join(f"'{name}', __v_{i}" for i, name in enumerate(names))
    return agg.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)", "__n AS n_rows"
    ).select("rule", "n_violations", "n_rows")


def audit_counts_duckdb_sql(
    table_expr: str, rules: dict[str, str]
) -> str:
    """DuckDB twin: same one-pass conditional sums, unpivoted by UNION ALL
    (the literal twin of stack())."""
    names = list(rules)
    sums = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN ({rules[n]}) THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT) AS v_{i}"
        for i, n in enumerate(names)
    )
    branches = " UNION ALL ".join(
        f"SELECT '{n}' AS rule, v_{i} AS n_violations, n AS n_rows FROM agg"
        for i, n in enumerate(names)
    )
    return f"WITH agg AS (SELECT COUNT(*) AS n, {sums} FROM {table_expr}) {branches}"


def fk_violations_df(
    fact: DataFrame, fk_col: str, dim: DataFrame, pk_col: str
) -> DataFrame:
    """Orphaned-FK probe: fact rows (non-null fk) with no matching
    dimension key, counted by ONE aggregation over a left-join
    null-probe — a single job, no driver-side counts; the join
    broadcasts when the dim's distinct keys fit. Returns one row
    ``(n_orphans, n_rows)``."""
    probe = fact.select(F.col(fk_col)).join(
        dim.select(F.col(pk_col).alias(fk_col), F.lit(1).alias("__hit"))
        .distinct(),
        on=fk_col,
        how="left",
    )
    return probe.agg(
        F.sum(
            (F.col(fk_col).isNotNull() & F.col("__hit").isNull()).cast("long")
        ).alias("n_orphans"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def fk_violations_duckdb_sql(
    fact_expr: str, fk_col: str, dim_expr: str, pk_col: str
) -> str:
    return f"""
SELECT CAST(SUM(CASE WHEN f.{fk_col} IS NOT NULL AND d.{pk_col} IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       COUNT(*) AS n_rows
FROM {fact_expr} f
LEFT JOIN (SELECT DISTINCT {pk_col} FROM {dim_expr}) d
  ON f.{fk_col} = d.{pk_col}
"""


def diff_snapshots(
    old: DataFrame, new: DataFrame, key_col: str, value_cols: list[str]
) -> DataFrame:
    """Batch-over-batch snapshot diff: one row per changed key with
    ``change`` in {'added', 'removed', 'changed'} — the audit a pipeline
    publishes with every refresh. One full outer join on the key
    (hash-partitioned; both sides scanned once), comparison as a single
    struct equality (null-safe). Unchanged keys are dropped before any
    further processing, so the output is |delta|-sized, not |table|."""
    o = old.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in value_cols]).alias("__old"),
    )
    n = new.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in value_cols]).alias("__new"),
    )
    joined = o.join(n, on=key_col, how="full")
    return joined.select(
        key_col,
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    ).filter(
        F.col("__old").isNull()
        | F.col("__new").isNull()
        | ~F.col("__old").eqNullSafe(F.col("__new"))
    )


def diff_snapshots_duckdb_sql(
    old_expr: str, new_expr: str, key_col: str, value_cols: list[str]
) -> str:
    """DuckDB twin (same full-outer-join + row-equality shape)."""
    neq = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in value_cols
    )
    return f"""
SELECT COALESCE(o.{key_col}, n.{key_col}) AS {key_col},
       CASE WHEN o.{key_col} IS NULL THEN 'added'
            WHEN n.{key_col} IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM {old_expr} o FULL OUTER JOIN {new_expr} n
  ON o.{key_col} = n.{key_col}
WHERE o.{key_col} IS NULL OR n.{key_col} IS NULL OR ({neq})
"""
