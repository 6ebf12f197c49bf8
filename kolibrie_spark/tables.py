"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Handles the events table's TIMESTAMP(NANOS) parquet type, which Spark's
vectorized reader rejects: ``spark.sql.legacy.parquet.nanosAsLong`` reads it
as BIGINT nanoseconds and ``ts_micros``/``ts_timestamp`` derive the usual
forms (integer ``div`` — not ``/`` — so truncation matches DuckDB's
``epoch_us``).
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # ts arrives as BIGINT nanos; provide both micro-int and timestamp
        return df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
