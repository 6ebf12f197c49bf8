"""Distributed graph analytics over edge DataFrames: PageRank.

Complements reasoner/fixpoint.py (semi-naive closure) and
operators/dedup.py (connected components) with the classic iterative
rank computation, used in curation for link-graph quality signals
(e.g. harvesting a crawl frontier's authority scores).

Determinism: floating PageRank is NOT reproducible distributed (the
per-node contribution sum order varies with partitioning). Ranks here
are integer micro-units (1.0 == 10^6): contributions use integer floor
division, the damping step is integer arithmetic, and BIGINT sums are
exact in any order — so the result is bit-identical across engines,
partitionings, and reruns, and the oracle is plain unrolled SQL.
(The floored remainders leak a bounded ~deg/10^6 of mass per node per
iteration — the standard price of fixed-point PageRank; raise SCALE if
it matters.)

Scale shape (per iteration): edges join ranks on src (shuffle on src,
or none if edges are pre-partitioned by src and reused each round),
one map-side-combined aggregation on dst, a left join back to the node
set for dangling nodes. localCheckpoint per round truncates the plan so
iteration N doesn't recompile N copies of the lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list. Returns
    ``(node, rank_int)`` — rank in micro-units; divide by ``SCALE`` for
    the float rank. ``damping_pct`` is the damping factor in percent
    (integer, to stay in exact arithmetic).

    The node set and the degree-annotated edge list are materialized
    ONCE (localCheckpoint — cluster equivalent: checkpoint/cache); the
    per-iteration plan is then exactly one join + one aggregation + one
    left join, checkpointed per round so lineage stays flat."""
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # pre-join degree once; reused every iteration
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    base = (100 - damping_pct) * SCALE // 100
    ranks = nodes.withColumn("rank_int", F.lit(SCALE).cast("long"))
    for i in range(iterations):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            F.col("dst"), F.expr("rank_int div deg").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            nodes.join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(inc, 0L)) div 100"
                    )
                ).cast("long").alias("rank_int"),
            )
        )
        if i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_duckdb_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: the iteration unrolled as chained CTEs (aggregation
    inside a recursive CTE's recursive term is not portable SQL).
    ``edges_sql`` must yield columns (src, dst)."""
    base = (100 - damping_pct) * SCALE // 100
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank_int FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, CAST({base} + "
            f"({damping_pct} * COALESCE(inc.s, 0)) // 100 AS BIGINT) AS rank_int "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst, SUM(r.rank_int // d.deg) AS s "
            f"FROM edges e JOIN r{i} r ON r.node = e.src "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst"
            f") inc ON inc.dst = n.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank_int FROM r{iterations}"
    )
