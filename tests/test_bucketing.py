"""Bucketed-table co-located joins: the write-once-shuffle-never join
strategy. Asserts on the PHYSICAL PLAN that joining two tables bucketed
on the same key runs with zero Exchange operators — the property that
makes repeated fact-fact joins viable at 100 TB."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from kolibrie_spark.operators.layout import write_bucketed

    # spark.sql.warehouse.dir is static; a database with an explicit
    # LOCATION keeps test tables out of the repo tree
    loc = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = spark.createDataFrame(
        [(i, i % 100, float(i) * 1.5) for i in range(2000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(i % 2000, i % 7, float(i)) for i in range(6000)],
        "l_orderkey long, l_linenumber long, l_quantity double",
    )
    write_bucketed(
        orders, "bucketdb.b_orders", "o_orderkey", 8, sort_col="o_orderkey"
    )
    write_bucketed(
        lineitem, "bucketdb.b_lineitem", "l_orderkey", 8, sort_col="l_orderkey"
    )
    yield spark.table("bucketdb.b_orders"), spark.table("bucketdb.b_lineitem")
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    # test tables are tiny, so the planner would broadcast and skip the
    # bucketed path entirely; at real fact-fact scale neither side
    # broadcasts, which is the scenario bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_linenumber", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # the join really ran co-located, and results are right
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    """Control: the same join against a plain DataFrame shuffles."""
    orders, _ = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(2000).select(F.col("id").alias("l_orderkey"))
        joined = orders.join(plain, orders.o_orderkey == plain.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
