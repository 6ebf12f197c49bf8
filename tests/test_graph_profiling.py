"""Fixed-point PageRank and quantile/histogram profiling operators."""

import pytest
from pyspark.sql import functions as F


def _pagerank_brute(edges, iterations=5, damping_pct=85, scale=10**6):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: scale for n in nodes}
    base = (100 - damping_pct) * scale // 100
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += ranks[s] // deg[s]
        ranks = {n: base + (damping_pct * inc[n]) // 100 for n in nodes}
    return ranks


def test_pagerank_brute_force(spark):
    from kolibrie_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "d"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["rank_int"] for r in pagerank(df, iterations=5).collect()}
    assert out == _pagerank_brute(edges)
    # 'e' has no in-links: floor of the base teleport mass
    assert out["e"] == 150000
    # 'a' receives c's whole rank plus half of d's: highest rank
    assert out["a"] == max(out.values())


def test_pagerank_duckdb_twin(spark):
    import duckdb

    from kolibrie_spark.operators.graph import pagerank, pagerank_duckdb_sql

    import random

    rng = random.Random(11)
    edges = list({(f"n{rng.randint(0, 40)}", f"n{rng.randint(0, 40)}") for _ in range(200)})
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    mine = {
        (r["node"], r["rank_int"]) for r in pagerank(df, iterations=4).collect()
    }
    con = duckdb.connect()
    con.register("e", df.toPandas())
    ref = {
        tuple(r)
        for r in con.execute(
            pagerank_duckdb_sql("SELECT src, dst FROM e", iterations=4)
        ).fetchall()
    }
    assert mine == ref


def test_pagerank_partitioning_invariant(spark):
    """Integer fixed-point: identical ranks under different partitionings
    (floating PageRank would drift in the sum order)."""
    import random

    from kolibrie_spark.operators.graph import pagerank

    rng = random.Random(5)
    edges = [(f"n{rng.randint(0, 30)}", f"n{rng.randint(0, 30)}") for _ in range(150)]
    df1 = spark.createDataFrame(edges, "src string, dst string")
    df2 = df1.repartition(7, "dst")
    a = sorted(map(tuple, pagerank(df1, iterations=3).collect()))
    b = sorted(map(tuple, pagerank(df2, iterations=3).collect()))
    assert a == b


def test_profile_quantiles_exact(spark):
    from kolibrie_spark.operators.profiling import profile_quantiles

    rows = [("g", v) for v in [10, 20, 30, 40, 50]]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = profile_quantiles(df, "grp", "v", [0.25, 0.5, 0.75]).collect()[0]
    assert out["q25"] == 20.0
    assert out["q50"] == 30.0
    assert out["q75"] == 40.0
    # interpolated case
    out2 = profile_quantiles(
        spark.createDataFrame([("g", 0), ("g", 10)], "grp string, v long"),
        "grp", "v", [0.25],
    ).collect()[0]
    assert out2["q25"] == 2.5


def test_profile_histogram(spark):
    from kolibrie_spark.operators.profiling import profile_histogram

    rows = [("a", 5), ("a", 95), ("a", 105), ("b", 250)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        (r["grp"], r["bin_lo"]): r["n"]
        for r in profile_histogram(df, "grp", "v", 100).collect()
    }
    assert out == {("a", 0): 2, ("a", 100): 1, ("b", 200): 1}
