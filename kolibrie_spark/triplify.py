"""Relational → RDF quads ("mechanical triplification", FIXTURES.md §7).

Row R of table T with key k becomes quads ``<urn:T:k> <urn:T#col> "lexical"``
— star-shaped subjects that exercise the same join/filter/agg plans a
relational oracle can validate. Foreign-key columns become IRIs of the
referenced table's subjects so cross-table BGP joins work.

Formatting contract (verified against DuckDB on the driver's data):
- int/bigint → plain digits (CAST AS VARCHAR equal in both engines)
- double → Spark ``cast(string)`` == DuckDB ``CAST(AS VARCHAR)`` for the
  value ranges in these tables (no scientific-notation values)
- timestamp[ms] → 'yyyy-MM-dd HH:mm:ss' (both engines' plain cast)
- strings → as-is

The melt uses one ``stack()`` projection — a single narrow pass over the
source table, no shuffle; at 100 TB this runs as a map-only stage and the
result should be written partitioned by ``p`` for partition-pruned pattern
scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# key column + FK → referenced table for the driver's schema
TABLE_SPEC: dict[str, dict] = {
    "region": {"key": "r_regionkey", "fks": {}},
    "nation": {"key": "n_nationkey", "fks": {"n_regionkey": "region"}},
    "customer": {"key": "c_custkey", "fks": {"c_nationkey": "nation"}},
    "supplier": {"key": "s_suppkey", "fks": {"s_nationkey": "nation"}},
    "part": {"key": "p_partkey", "fks": {}},
    "orders": {"key": "o_orderkey", "fks": {"o_custkey": "customer"}},
    "lineitem": {
        # no natural unique key in the synthetic data (even the 4-column
        # composite collides at sf0.001) — disambiguate with a row_number
        # within the composite group. Identical rows are interchangeable, so
        # the resulting quad set is deterministic.
        "key": ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "dedup_rank": True,
        "fks": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    },
}


def subject_col(table: str, df: DataFrame, key) -> Column:
    if isinstance(key, tuple):
        parts = [F.lit(f"urn:{table}:")]
        for i, k in enumerate(key):
            if i:
                parts.append(F.lit("-"))
            parts.append(F.col(k).cast("string"))
        return F.concat(*parts)
    return F.concat(F.lit(f"urn:{table}:"), F.col(key).cast("string"))


def lex(df: DataFrame, col: str) -> Column:
    """Lexical (string) form of a column, DuckDB-cast-compatible."""
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        return F.date_format(F.col(col), "yyyy-MM-dd HH:mm:ss")
    return F.col(col).cast("string")


def triplify(df: DataFrame, table: str, graph: str | None = None) -> DataFrame:
    """Melt a relational table into quads via one stack() projection."""
    from pyspark.sql.window import Window

    spec = TABLE_SPEC[table]
    cols = df.columns
    if spec.get("dedup_rank"):
        key = spec["key"]
        w = Window.partitionBy(*key).orderBy(*cols)
        df = df.withColumn("__rank", F.row_number().over(w))
        subj = F.concat(
            subject_col(table, df, key),
            F.lit("-r"),
            F.col("__rank").cast("string"),
        )
    else:
        subj = subject_col(table, df, spec["key"])
    pairs: list[Column] = []
    for c in cols:
        pairs.append(F.lit(f"urn:{table}#{c}"))
        ref = spec["fks"].get(c)
        if ref is not None:
            pairs.append(F.concat(F.lit(f"urn:{ref}:"), F.col(c).cast("string")))
        else:
            pairs.append(lex(df, c))
    melted = df.select(
        subj.alias("s"), F.stack(F.lit(len(cols)), *pairs).alias("p", "o")
    )
    out = melted.select("s", "p", "o").filter(F.col("o").isNotNull())
    return out.withColumn("g", F.lit(graph).cast("string"))
