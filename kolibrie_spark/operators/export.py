"""Deterministic export sharding + manifests for training-data hand-off.

A 100 TB curation run ends with a write: N shards a trainer can stream,
plus a manifest the NEXT run (or an auditor) can verify byte-for-byte
without re-reading the corpus. Reproducibility is the contract — shard
assignment is a pure function of the document key (the cross-engine
polynomial hash, operators/hashing.py), and each shard's content hash is
an ORDER-INDEPENDENT fold (bit_xor of per-row hashes), so any engine,
any partitioning, any retry produces the same manifest.

Spark shape: `assign_shards` is one column expression (no shuffle — the
writer's own repartition(shard) is the only exchange, and it is the one
the export needs anyway); `shard_manifest` is a single hash aggregation
(map-side partial combine → |shards| rows to the driver/manifest table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.hashing import poly_hash, poly_hash_duckdb


def shard_of(key: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards) from the document key."""
    return F.pmod(poly_hash(key.cast("string")), F.lit(n_shards)).cast("int")


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, shard_col: str = "shard"
) -> DataFrame:
    """Tag every row with its shard — a pure projection; follow with
    ``.repartition(n_shards, shard_col).write.partitionBy(shard_col)``
    (or a direct writer) so the export's exchange IS the assignment."""
    return df.withColumn(shard_col, shard_of(F.col(key_col), n_shards))


def shard_manifest(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_shards: int,
) -> DataFrame:
    """Per-shard manifest: (shard, n_rows, n_chars, content_hash).

    content_hash = bit_xor over rows of the polynomial hash of the row's
    key + content columns (chr(0)-joined) — order-independent, mergeable
    (a shard split across tasks XORs to the same value), and exactly
    recomputable by any SQL engine, so a consumer can verify a shard
    without trusting the producer. One hash aggregation, |shards| output
    rows."""
    row_repr = F.concat_ws(
        "\x00", F.col(key_col).cast("string"), *[F.col(c).cast("string") for c in content_cols]
    )
    sized = df.select(
        shard_of(F.col(key_col), n_shards).alias("shard"),
        poly_hash(row_repr).alias("__rh"),
        sum(
            (F.length(F.coalesce(F.col(c).cast("string"), F.lit(""))) for c in content_cols),
            F.lit(0),
        ).alias("__len"),
    )
    return (
        sized.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__len").cast("long").alias("n_chars"),
            F.expr("bit_xor(__rh)").alias("content_hash"),
        )
        .orderBy("shard")
    )


def shard_manifest_duckdb_sql(
    table_expr: str,
    key_col: str,
    content_cols: list[str],
    n_shards: int,
) -> str:
    """DuckDB twin of :func:`shard_manifest` (same key hash, same row
    representation, same xor fold)."""
    key_s = f"CAST({key_col} AS VARCHAR)"
    parts = [key_s] + [f"CAST({c} AS VARCHAR)" for c in content_cols]
    row_repr = " || chr(0) || ".join(parts)
    lens = " + ".join(f"length(COALESCE(CAST({c} AS VARCHAR), ''))" for c in content_cols)
    kh = poly_hash_duckdb(key_s)
    rh = poly_hash_duckdb(f"({row_repr})")
    return (
        f"WITH rows_ AS (SELECT CAST({kh} % {n_shards} AS INT) AS shard, "
        f"{rh} AS rh, {lens} AS len FROM {table_expr}) "
        "SELECT shard, COUNT(*) AS n_rows, "
        "CAST(SUM(len) AS BIGINT) AS n_chars, bit_xor(rh) AS content_hash "
        "FROM rows_ GROUP BY shard ORDER BY shard"
    )
