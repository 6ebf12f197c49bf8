"""Skew-aware join helper (SURVEY "Partitioning & shuffle": salting for
skewed keys when AQE's skew-join splitting isn't enough — e.g. an RDF
predicate/object hub node like rdf:type whose join key holds 10% of a
100 TB fact table).

``salted_join(left, right, key, salt)``: the skewed (left) side gets a
random salt in [0, salt); the small-to-medium (right) side is replicated
``salt`` times with every salt value; the join key becomes (key, salt__),
spreading one hot key over ``salt`` reducers. Exact same multiset result
as a plain inner equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    if how != "inner":
        raise ValueError("salted_join supports inner joins")
    l = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on=on + ["__salt"], how="inner").drop("__salt")
    return out


def top_heavy_keys(df: DataFrame, key: str, threshold: float = 0.01) -> list:
    """Keys holding more than ``threshold`` of the rows — candidates for
    salting or stop-key handling (one aggregate, driver gets a short list)."""
    total = df.count()
    rows = (
        df.groupBy(key)
        .count()
        .filter(F.col("count") > total * threshold)
        .orderBy(F.col("count").desc())
        .collect()
    )
    return [r[key] for r in rows]
