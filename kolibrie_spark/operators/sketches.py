"""Distinct-count sketching: KMV (k-minimum-values) estimator.

Why KMV and not HLL here: the whole correctness story of this repo is
cross-engine bit-exactness, and HLL register layouts are engine-internal
(Spark's ``approx_count_distinct`` and DuckDB's are different sketches).
KMV over a deterministic hash is *itself* deterministic: the k smallest
distinct hash values of a set are a pure function of the set, so the
estimate is reproducible across engines, partitionings, and reruns —
a property worth having in a curation report even at scale.

Estimator (Bar-Yossef et al. 2002): with U_(k) the k-th smallest of the
distinct hashes mapped into [0, 1), E[distinct] ~= (k-1) / U_(k); when
fewer than k distinct hashes exist the sketch has seen every element and
the count is exact.

Plan shape (per group): one distinct-aggregation on (group, hash) —
map-side partial dedup then a hash shuffle — followed by a per-group
top-k window (O(k) heap per group, no global sort) and one final fold.
At 100 TB the distinct pre-aggregation is the only heavy stage and it
combines map-side; if the bit contract is not needed, swap the whole
thing for ``approx_count_distinct`` (HLL, no shuffle of distincts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import (
    FAMILY_P,
    derived_hash,
    derived_hash_duckdb,
    hash_family,
    poly_hash,
    poly_hash_duckdb,
)

# The raw character fold is NOT uniform on [0, 2^40) — a 7-char fold never
# exceeds ~2^35, and near-identical strings ("value-17"/"value-18") land
# adjacent — so minima-based estimation needs real mixing. One derived
# round (a*h+b) mod P keeps a < 2^20 to stay inside int64, which is too
# small a multiplier to spread a 3000-wide cluster across a 2^40 modulus;
# CHAINING three rounds composes to an effective multiplier
# a1*a2*a3 mod P (~full width) while every intermediate product stays
# < 2^60 in BOTH engines. Validated: est(3000 distinct, k=64) ~= 2849.
_ROUNDS = hash_family(3, rng_seed=1234)


def _mix(h):
    for a, b in _ROUNDS:
        h = derived_hash(h, a, b)
    return h


def _mix_duckdb(expr: str) -> str:
    for a, b in _ROUNDS:
        expr = derived_hash_duckdb(expr, a, b)
    return expr


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of a string column.

    Returns ``(group, m, kth_hash, est_distinct)`` where ``m`` is the
    number of sketch slots filled (== k unless the group has fewer
    distinct values, in which case the estimate is exact).
    """
    h = _mix(poly_hash(F.col(value_col)))
    hashes = df.select(F.col(group_col), h.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    m = F.count("*")
    kth = F.max("h")
    # both branches are single IEEE ops on integer inputs -> bit-exact
    # in any engine evaluating the same expression
    est = F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(FAMILY_P)) / kth.cast("double")
    )
    return topk.groupBy(group_col).agg(
        m.alias("m"), kth.alias("kth_hash"), est.alias("est_distinct")
    )


def kmv_distinct_duckdb_sql(
    table_expr: str, group_col: str, value_expr: str, k: int = 16
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same estimator)."""
    h = _mix_duckdb(poly_hash_duckdb(value_expr))
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table_expr}
), topk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn
    FROM hashes
  ) WHERE rn <= {k}
)
SELECT g AS {group_col},
       COUNT(*) AS m,
       MAX(h) AS kth_hash,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE CAST({float(k - 1)} AS DOUBLE) * CAST({float(FAMILY_P)} AS DOUBLE)
                 / CAST(MAX(h) AS DOUBLE)
       END AS est_distinct
FROM topk GROUP BY g
"""


# --------------------------------------------------------------- HLL distinct
# Deterministic HyperLogLog (Flajolet et al. 2007) over the SAME mixed
# polynomial hash as KMV — unlike engine-internal HLLs (Spark's
# approx_count_distinct vs DuckDB's differ), registers over a shared
# deterministic hash are a pure function of the value set, so the sketch
# is bit-reproducible across engines, partitionings, and reruns.
HLL_M = 16  # registers (p=4)
_HLL_ALPHA = 0.673  # alpha_16 from the HLL paper
# w = h // m for h in [0, FAMILY_P): w < 2^36 + eps, so the leftmost
# 1-bit position within a 36-bit word is rho = 37 - bitlen(w) (clamped
# to >= 1 for the rare w just past 2^36); w = 0 -> rho = 37
_HLL_MAXRHO = 37
# est = C / S with S an exact int64 (sum of 2^(50-M_j)); precompute the
# whole numerator in Python so both engines evaluate ONE division
_HLL_C = float(_HLL_ALPHA * HLL_M * HLL_M * (1 << 50))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate of a string column.

    Returns ``(group, v_zero, s_scaled, est_distinct)``: ``v_zero`` =
    empty registers, ``s_scaled`` = sum of ``2^(50 - M_j)`` as an exact
    int64 (the register sum scaled so every term is an integer — double
    summation would be add-order-dependent and break bit stability),
    ``est_distinct`` = alpha_m * m^2 / sum(2^-M_j), with the standard
    linear-counting correction ``m * ln(m / V)`` when est <= 2.5m and
    V > 0 (the one branch with a transcendental — libm ln may differ in
    the last ulp across engines; everything else is integer-exact).

    Plan shape: one aggregation to (group, bucket, max rho) — map-side
    combinable, shuffle on (group, bucket) — then a tiny per-group fold
    over <= m rows. No distinct-shuffle at all (KMV's heavy stage), which
    is the reason HLL is the 100 TB default and KMV the bit-exact
    fallback when the estimator itself must cross engines.
    """
    h = _mix(poly_hash(F.col(value_col)))
    bucketed = df.select(
        F.col(group_col),
        (h % HLL_M).alias("bucket"),
        F.floor(h / HLL_M).cast("long").alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_HLL_MAXRHO)).otherwise(
            F.greatest(
                F.lit(1),
                F.lit(_HLL_MAXRHO)
                - F.length(F.conv(F.col("w").cast("string"), 10, 2)),
            )
        ),
    )
    regs = bucketed.groupBy(group_col, "bucket").agg(F.max("rho").alias("M"))
    per_group = regs.groupBy(group_col).agg(
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("v_zero"),
        (
            F.sum(F.pow(F.lit(2.0), F.lit(50) - F.col("M")).cast("long"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << 50)
        ).alias("s_scaled"),
    )
    raw = F.lit(_HLL_C) / F.col("s_scaled").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_zero") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero").cast("double")),
    ).otherwise(raw)
    return per_group.withColumn("est_distinct", est)


def hll_distinct_duckdb_sql(
    table_expr: str, group_col: str, value_expr: str
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same hash, registers, fold)."""
    h = _mix_duckdb(poly_hash_duckdb(value_expr))
    return f"""
WITH bucketed AS (
  SELECT {group_col} AS g, ({h}) % {HLL_M} AS bucket,
         ({h}) // {HLL_M} AS w
  FROM {table_expr}
), rhos AS (
  SELECT g, bucket,
         CASE WHEN w = 0 THEN {_HLL_MAXRHO}
              ELSE GREATEST(1, {_HLL_MAXRHO} - length(bin(w))) END AS rho
  FROM bucketed
), regs AS (
  SELECT g, bucket, MAX(rho) AS M FROM rhos GROUP BY g, bucket
), per_group AS (
  SELECT g,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_zero,
         CAST(SUM(CAST(pow(2.0, 50 - M) AS BIGINT))
              + ({HLL_M} - COUNT(*)) * {1 << 50} AS BIGINT) AS s_scaled
  FROM regs GROUP BY g
)
SELECT g AS {group_col}, v_zero, s_scaled,
       CASE WHEN ({_HLL_C!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M}
                 AND v_zero > 0
            THEN CAST({float(HLL_M)} AS DOUBLE)
                 * ln(CAST({float(HLL_M)} AS DOUBLE) / CAST(v_zero AS DOUBLE))
            ELSE {_HLL_C!r} / CAST(s_scaled AS DOUBLE)
       END AS est_distinct
FROM per_group
"""
