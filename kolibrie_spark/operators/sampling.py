"""Deterministic sampling for training-data curation.

``df.sample()`` draws a different row set every run (and per partition
layout); a curation pipeline needs the kept set to be a PURE FUNCTION of
the row key so that reruns, backfills, and downstream joins over multiple
sampled tables all agree. The standard trick: hash the key into buckets
and keep buckets below the rate cutoff.

- ``deterministic_sample`` — uniform rate over a key column.
- ``stratified_sample`` — per-stratum rates (e.g. downsample boilerplate
  document classes, keep all rare ones), one CASE over the stratum column.

Both use the cross-engine-reproducible polynomial hash
(operators/hashing.py), so a DuckDB oracle can replay the exact kept set;
at 100 TB swap ``hash_fn="xxhash64"`` for the JVM-native hash (same plan,
no cross-engine contract). Selection is a filter over a scan — pushes
down, no shuffle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators import hashing

BUCKETS = 10_000


def _bucket(key: Column, hash_fn: str) -> Column:
    if hash_fn == "poly":
        return hashing.poly_hash(key.cast("string")) % F.lit(BUCKETS)
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(BUCKETS))


def bucket_duckdb(expr: str) -> str:
    return f"({hashing.poly_hash_duckdb(f'CAST({expr} AS VARCHAR)')} % {BUCKETS})"


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, hash_fn: str = "poly"
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket space —
    the same rows every run, on any cluster."""
    cutoff = int(round(fraction * BUCKETS))
    return df.filter(_bucket(F.col(key_col), hash_fn) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    hash_fn: str = "poly",
) -> DataFrame:
    """Per-stratum deterministic rates: ``fractions`` maps stratum value →
    keep fraction; unlisted strata use ``default``."""
    cutoff = F.lit(int(round(default * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(frac * BUCKETS)))
        ).otherwise(cutoff)
    return df.filter(_bucket(F.col(key_col), hash_fn) < cutoff)
