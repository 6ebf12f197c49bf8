"""Semi-structured (JSON string) column handling.

Event pipelines carry a free-form JSON properties column next to the
typed columns; the engine must project typed fields out of it without a
Python step. Spark-first: ``from_json`` with an explicit schema compiles
to a JVM Jackson parse inside whole-stage codegen — one pass per row, no
shuffle, and Catalyst prunes the parse to just the requested fields
(OptimizeJsonExprs rewrites from_json(...).field to a single-field
parse).

An explicit schema (not ``schema_of_json`` inference) is part of the
contract: inference runs a driver-side sampling job and can drift
between batches; a typed extraction must be stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_field(col: Column, field: str, dtype: str) -> Column:
    """One typed field from a JSON-string column. Malformed JSON or a
    missing key yield NULL (PERMISSIVE mode) — never an error row."""
    return F.from_json(col, f"{field} {dtype}").getField(field)


def json_field_duckdb_sql(expr: str, field: str, dtype: str) -> str:
    """DuckDB twin. DuckDB's json_extract RAISES on malformed JSON where
    Spark's PERMISSIVE from_json yields NULL, so the parse is guarded by
    json_valid(); TRY_CAST mirrors the type coercion."""
    return (
        f"(CASE WHEN json_valid({expr}) THEN "
        f"TRY_CAST(json_extract_string({expr}, '$.{field}') AS {dtype}) END)"
    )


def json_agg_by_key(
    df: DataFrame,
    group_col: str,
    json_col: str,
    field: str,
    dtype: str = "BIGINT",
) -> DataFrame:
    """Per-group stats over one typed JSON field: count of parsable rows,
    exact integer sum, min/max. One map-side-combined aggregation; the
    JSON parse happens once per row in the same codegen stage as the
    aggregation input."""
    v = json_field(F.col(json_col), field, dtype)
    return df.groupBy(group_col).agg(
        F.count(v).alias("n_parsed"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def json_agg_by_key_duckdb_sql(
    table_expr: str,
    group_col: str,
    json_expr: str,
    field: str,
    dtype: str = "BIGINT",
) -> str:
    v = json_field_duckdb_sql(json_expr, field, dtype)
    return f"""
SELECT {group_col},
       COUNT({v}) AS n_parsed,
       CAST(SUM({v}) AS BIGINT) AS sum_v,
       MIN({v}) AS min_v,
       MAX({v}) AS max_v
FROM {table_expr}
GROUP BY {group_col}
"""
