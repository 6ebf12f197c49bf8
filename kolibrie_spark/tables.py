"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Handles both historical schemas of the events table's ``ts`` column:
TIMESTAMP(NANOS) parquet (which Spark's vectorized reader rejects —
``spark.sql.legacy.parquet.nanosAsLong`` reads it as BIGINT nanoseconds,
then integer ``div`` truncates to micros) and plain ``timestamp[us]``
parquet (cast to TIMESTAMP under a pinned UTC session zone so
``unix_micros`` matches DuckDB's naive-as-UTC ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def parallelized(df: DataFrame) -> DataFrame:
    """Spread a small scan across the cluster before CPU-dense per-row work
    (array/regex/codec expressions). A small parquet file arrives as ONE
    input partition, serializing compute that is embarrassingly parallel;
    at real scale inputs already have many partitions and this is a no-op
    (the guard keeps the shuffle off the fast path)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = True
) -> DataFrame:
    """``parallel=False`` skips the CPU-spread repartition for consumers
    that only route a key column into a hash join/aggregate — the spread
    would be a pure extra Exchange there (the very next operator
    re-shuffles by the join key; r12, guide §2.1)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # SESSION-WIDE side effect, applied on EVERY events load (not just
        # one schema path) so timestamp semantics cannot depend on load
        # order or file schema: the whole correctness contract (DuckDB
        # treats naive timestamps as UTC) assumes a UTC session zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        dt = df.schema["ts"].dataType.simpleString()
        if dt == "bigint":
            # TIMESTAMP(NANOS) parquet read as BIGINT nanos
            ts_us = F.expr("ts div 1000")
        else:
            # plain timestamp[us] parquet (timestamp or timestamp_ntz);
            # the UTC pin makes the cast match DuckDB's epoch_us
            ts_us = F.expr("unix_micros(cast(ts as timestamp))")
        return df.withColumn("ts_us", ts_us).withColumn(
            "event_time", F.timestamp_micros(F.col("ts_us"))
        )
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if parallel and name in ("documents", "embeddings"):
        # the CPU-dense tables (text array/regex/codec expressions, vector
        # folds): a small file otherwise arrives as one partition and
        # serializes embarrassingly-parallel work
        return parallelized(df)
    return df
