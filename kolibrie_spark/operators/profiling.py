"""Dataset profiling for curation reports: per-group summary statistics of
an integral column (count, distinct, min/max, mean, sample stddev).

Cross-engine exactness: mean and stddev are derived from EXACT integer
sums (Σx and Σx² as BIGINT — no floating accumulation, so partition order
cannot change a bit), then finished with one double division / sqrt each,
which IEEE 754 defines exactly. ``stddev`` uses the textbook
(Σx² - (Σx)²/n)/(n-1) finish — fine for profile-scale magnitudes; at
astronomic Σx² you'd switch to Welford per partition and lose the
cross-engine bit contract.

Plan shape: ONE hash aggregation with map-side partial combine (all six
stats fold in the same groupBy), shuffling |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def profile_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group profile of an integral value column. Returns one row per
    group: n, n_distinct, vmin, vmax, mean, stddev (sample; NULL when
    n == 1)."""
    v = F.col(value_col).cast("long")
    n = F.count(v)
    s1 = F.sum(v)
    s2 = F.sum(v * v)
    mean = s1.cast("double") / n
    # clamp at 0: double rounding of s1*s1 can push a zero-variance group
    # slightly negative, which would be NaN here and a hard sqrt error in
    # the DuckDB twin
    var = F.greatest(
        (s2.cast("double") - s1.cast("double") * s1 / n) / (n - F.lit(1)),
        F.lit(0.0),
    )
    return df.groupBy(group_col).agg(
        n.alias("n"),
        F.count_distinct(v).alias("n_distinct"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        mean.alias("mean"),
        F.when(n > 1, F.sqrt(var)).alias("stddev"),
    )


DEFAULT_QUANTILES = [0.25, 0.5, 0.75, 0.95]


def profile_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float] | None = None,
) -> DataFrame:
    """Per-group exact interpolated quantiles of an integral column.

    Uses Spark's exact ``percentile`` (sort-based, not the approximate
    sketch): on integral inputs the interpolation ``a + frac*(b - a)``
    is the same IEEE arithmetic DuckDB's ``quantile_cont`` performs, so
    results are bit-identical cross-engine (verified empirically,
    including non-binary fractions like 0.95). Exact percentile needs
    the group's values together — one shuffle on the group key; for
    monitoring-grade profiles at 100 TB swap in ``approx_percentile``
    and drop the cross-engine bit contract."""
    qs = DEFAULT_QUANTILES if quantiles is None else quantiles
    v = F.col(value_col).cast("long")
    return df.groupBy(group_col).agg(
        *[
            F.percentile(v, q).alias(f"q{int(q * 100)}")
            for q in qs
        ]
    )


def profile_quantiles_duckdb_sql(
    table_expr: str,
    group_col: str,
    value_expr: str,
    quantiles: list[float] | None = None,
) -> str:
    qs = DEFAULT_QUANTILES if quantiles is None else quantiles
    v = f"CAST({value_expr} AS BIGINT)"
    cols = ", ".join(
        f"quantile_cont({v}, {q}) AS q{int(q * 100)}" for q in qs
    )
    return f"SELECT {group_col}, {cols} FROM {table_expr} GROUP BY {group_col}"


def profile_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Per-group fixed-width histogram: bin = floor(value / width).
    One map-side-combined aggregation shuffling |groups x occupied bins|
    rows — the cheapest distribution profile there is. Returns
    ``(group, bin_lo, n)`` with bin_lo the bin's inclusive lower edge."""
    b = F.floor(F.col(value_col).cast("long") / F.lit(bin_width)).cast("long")
    return (
        df.groupBy(F.col(group_col), (b * bin_width).alias("bin_lo"))
        .agg(F.count("*").alias("n"))
    )


def profile_histogram_duckdb_sql(
    table_expr: str, group_col: str, value_expr: str, bin_width: int
) -> str:
    b = f"(CAST({value_expr} AS BIGINT) // {bin_width})"
    return (
        f"SELECT {group_col}, {b} * {bin_width} AS bin_lo, "
        f"COUNT(*) AS n FROM {table_expr} GROUP BY {group_col}, {b}"
    )


def top_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties by id ascending for
    determinism): one row_number window — a single hash shuffle on the
    group key, no global sort. The per-partition top-k heap keeps memory
    at O(k) per group."""
    from pyspark.sql.window import Window

    ob = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*ob)
    return df.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def top_per_group_duckdb_sql(
    table_expr: str,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str,
    select_cols: str,
    descending: bool = True,
) -> str:
    d = "DESC" if descending else "ASC"
    return f"""
SELECT {select_cols}, rank FROM (
  SELECT {select_cols},
         CAST(row_number() OVER (PARTITION BY {group_col}
           ORDER BY {order_col} {d}, {id_col} ASC) AS INT) AS rank
  FROM {table_expr}
) WHERE rank <= {k}
"""


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two groups'
    distributions of an integral column — the standard drift alarm when a
    new crawl/source shifts the corpus (compare length, score, token-count
    distributions batch-over-batch).

    D = max over values v of |F_a(v) - F_b(v)| with F the empirical CDF.
    Exactness: per-value counts are integers, CDFs are single integer
    divisions, and max is order-independent — bit-identical cross-engine.

    Plan shape: one per-value count aggregation (map-side combined,
    shuffles |distinct values| rows), then a cumulative window over the
    distinct values. The window orders globally — fine because the state
    is one row per DISTINCT value (lengths/scores have bounded
    cardinality, e.g. <=5001 for a 0..5000 length column). For an
    unbounded-cardinality column at 100 TB, bin the values first
    (``profile_histogram``) and compute D over bin edges — the binned D
    brackets the exact D to bin resolution.

    Returns one row ``(n_a, n_b, d_stat)``.
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    counts = (
        df.filter(g.isin([group_a, group_b]))
        .groupBy(v.alias("v"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cb"),
        )
    )
    w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = cum.agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("n_a"),
            F.col("n_b"),
            F.abs(
                F.col("cum_a").cast("double") / F.col("n_a")
                - F.col("cum_b").cast("double") / F.col("n_b")
            ).alias("diff"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").alias("d_stat"))
        .select("n_a", "n_b", "d_stat")
    )


def ks_drift_duckdb_sql(
    table_expr: str,
    group_col: str,
    value_expr: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB twin of :func:`ks_drift` (same integer counts, same
    division shape)."""
    v = f"CAST({value_expr} AS BIGINT)"
    return f"""
WITH counts AS (
  SELECT {v} AS v,
         SUM(CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END) AS cb
  FROM {table_expr}
  WHERE {group_col} IN ('{group_a}', '{group_b}')
  GROUP BY {v}
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY v ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(cb) OVER (ORDER BY v ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM counts
), tot AS (
  SELECT MAX(cum_a) AS n_a, MAX(cum_b) AS n_b FROM cum
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       MAX(ABS(CAST(cum_a AS DOUBLE) / CAST(n_a AS BIGINT)
               - CAST(cum_b AS DOUBLE) / CAST(n_b AS BIGINT))) AS d_stat
FROM cum, tot
GROUP BY n_a, n_b
"""


def token_budget(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Training-run token accounting: per group (source/domain), document
    and whitespace-token counts, the group's share of the corpus, and the
    cumulative share when groups are taken largest-first — the table a
    data-mixing decision reads ("the top 3 sources are 80% of tokens").

    Tokens are counted doc-locally with a split/size expression (no
    explode — the counting never materializes a token row), then ONE
    map-side-combined aggregation shuffles |groups| rows; the share
    window runs over |groups| rows, not data. Ordering ties break by
    group name so the cumulative column is deterministic."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks.cast("long")).alias("n_tokens"),
    )
    w_tot = Window.partitionBy()
    w_cum = Window.orderBy(
        F.col("n_tokens").desc(), F.col(group_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_tot)).alias(
            "token_share"
        ),
        (
            F.sum("n_tokens").over(w_cum).cast("double")
            / F.sum("n_tokens").over(w_tot)
        ).alias("cum_share"),
    )


def token_budget_duckdb_sql(
    table_expr: str, group_col: str, text_expr: str
) -> str:
    """DuckDB twin of :func:`token_budget` (same trim/split token rule,
    same integer-sum-then-divide share arithmetic)."""
    toks = f"len(regexp_split_to_array(trim({text_expr}), '\\s+'))"
    return f"""
WITH agg AS (
  SELECT {group_col} AS g, COUNT(*) AS n_docs,
         CAST(SUM({toks}) AS BIGINT) AS n_tokens
  FROM {table_expr} GROUP BY 1
)
SELECT g AS {group_col}, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS BIGINT)
         AS token_share,
       CAST(CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, g ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE)
         / CAST(SUM(n_tokens) OVER () AS BIGINT) AS cum_share
FROM agg
"""


def profile_stats_duckdb_sql(
    table_expr: str, group_col: str, value_expr: str
) -> str:
    """DuckDB twin of :func:`profile_stats` — the same exact-integer-sum
    finish, NOT DuckDB's built-in stddev (whose accumulation order is
    engine-internal)."""
    v = f"CAST({value_expr} AS BIGINT)"
    return f"""
SELECT {group_col},
       COUNT({v}) AS n,
       COUNT(DISTINCT {v}) AS n_distinct,
       MIN({v}) AS vmin,
       MAX({v}) AS vmax,
       CAST(SUM({v}) AS DOUBLE) / COUNT({v}) AS mean,
       CASE WHEN COUNT({v}) > 1 THEN
         sqrt(GREATEST((CAST(SUM({v} * {v}) AS DOUBLE)
               - CAST(SUM({v}) AS DOUBLE) * SUM({v}) / COUNT({v}))
              / (COUNT({v}) - 1), 0.0))
       END AS stddev
FROM {table_expr}
GROUP BY {group_col}
"""


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Clip an integral column to its per-group [lo_q, hi_q] quantile
    band — the standard outlier guard before averaging/regressing over
    heavy-tailed telemetry. Adds ``{value_col}_wins`` (double: quantile
    interpolation is fractional).

    Plan shape: one exact-percentile aggregation (|groups| rows, the
    same sort-based op as profile_quantiles) broadcast back onto the
    rows — the data itself never shuffles. Cross-engine exact for the
    same reason profile_quantiles is: integral inputs, shared IEEE
    interpolation, clamp is min/max."""
    v = F.col(value_col).cast("long")
    bounds = df.groupBy(group_col).agg(
        F.percentile(v, lo_q).alias("__lo"),
        F.percentile(v, hi_q).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), on=group_col)
        .withColumn(
            f"{value_col}_wins",
            F.least(
                F.greatest(v.cast("double"), F.col("__lo")), F.col("__hi")
            ),
        )
        .drop("__lo", "__hi")
    )


def winsorize_duckdb_sql(
    table_expr: str,
    group_col: str,
    value_expr: str,
    select_cols: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> str:
    """DuckDB twin of :func:`winsorize`."""
    v = f"CAST({value_expr} AS BIGINT)"
    return f"""
WITH bounds AS (
  SELECT {group_col} AS g,
         quantile_cont({v}, {lo_q}) AS lo,
         quantile_cont({v}, {hi_q}) AS hi
  FROM {table_expr} GROUP BY 1
)
SELECT {select_cols},
       LEAST(GREATEST(CAST({v} AS DOUBLE), b.lo), b.hi)
         AS {value_expr}_wins
FROM {table_expr} t JOIN bounds b ON t.{group_col} = b.g
"""


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly detection: flag rows whose deviation from
    the group median exceeds ``k`` scaled MADs (median absolute
    deviation, consistency constant 1.4826 — the standard robust z-score;
    unlike mean/std it is immune to the outliers it hunts).

    Returns ``(id, group, value, robust_z)`` for flagged rows, with
    ``robust_z = |v - med| / (1.4826 * MAD)``; groups with MAD = 0 are
    skipped (every deviation would be infinite).

    Plan shape: two exact-percentile aggregations (median, then median
    of deviations) — each one shuffle on the group key, results are
    |groups|-sized and broadcast back; the data never re-shuffles for
    the final filter. Cross-engine: exact percentile interpolation and
    the single-multiply/divide score are the same IEEE ops in DuckDB
    (the profile_quantiles parity argument). At 100 TB swap exact
    percentile for approx_percentile and drop the bit contract.
    """
    c = 1.4826
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.percentile(v, 0.5).alias("__med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(v - F.col("__med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("__adev"), 0.5).alias("__mad")
    )
    scored = dev.join(F.broadcast(mad), group_col).filter(
        (F.col("__mad") > 0)
        & (F.col("__adev") > F.lit(k) * (F.lit(c) * F.col("__mad")))
    )
    return scored.select(
        F.col(id_col),
        F.col(group_col),
        v.alias(value_col),
        (F.col("__adev") / (F.lit(c) * F.col("__mad"))).alias("robust_z"),
    )


def mad_outliers_duckdb_sql(
    table_expr: str,
    group_col: str,
    value_expr: str,
    id_col: str,
    k: float = 3.5,
) -> str:
    """DuckDB twin of :func:`mad_outliers` (same medians, same ops)."""
    c = 1.4826
    return f"""
WITH med AS (
  SELECT {group_col} AS g, quantile_cont({value_expr}, 0.5) AS med
  FROM {table_expr} GROUP BY 1
), dev AS (
  SELECT t.{id_col} AS id, t.{group_col} AS g, {value_expr} AS v,
         ABS({value_expr} - m.med) AS adev
  FROM {table_expr} t JOIN med m ON t.{group_col} = m.g
), mad AS (
  SELECT g, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY g
)
SELECT d.id AS {id_col}, d.g AS {group_col}, d.v AS {value_expr},
       d.adev / ({c} * a.mad) AS robust_z
FROM dev d JOIN mad a ON d.g = a.g
WHERE a.mad > 0 AND d.adev > {k} * ({c} * a.mad)
"""


def equidepth_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    nbuckets: int = 8,
) -> DataFrame:
    """Per-group EQUI-DEPTH histogram (quantile buckets): each bucket holds
    ~n/nbuckets rows; returns ``(group, bucket, lo, hi, n_rows)``. The
    equi-WIDTH histogram (profile_histogram) answers "what does the
    distribution look like"; equi-depth answers "where are the quantile
    boundaries" — the binning a range-partitioner or a monotonic feature
    bucketizer wants.

    Buckets come from ``ntile`` over the (value, order_col) total order —
    the tiebreak makes the assignment deterministic cross-engine (ntile
    on a non-total order is engine-defined for ties). One shuffle on the
    group key; the per-group sort is the irreducible cost (swap in
    approx_percentile boundaries at 100 TB and drop exactness)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(order_col).asc()
    )
    return (
        df.withColumn("bucket", F.ntile(nbuckets).over(w).cast("long"))
        .groupBy(group_col, "bucket")
        .agg(
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.count("*").alias("n_rows"),
        )
    )


def equidepth_histogram_duckdb_sql(
    table_expr: str,
    group_col: str,
    value_expr: str,
    order_col: str,
    nbuckets: int = 8,
) -> str:
    """DuckDB twin of :func:`equidepth_histogram`."""
    return f"""
SELECT {group_col}, bucket, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n_rows
FROM (
  SELECT {group_col}, {value_expr} AS v,
         ntile({nbuckets}) OVER (PARTITION BY {group_col}
           ORDER BY {value_expr} ASC, {order_col} ASC) AS bucket
  FROM {table_expr}
) GROUP BY 1, 2
"""


def group_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Pearson correlation of two INTEGRAL columns, bit-exact
    cross-engine: all five sums (n, Sx, Sy, Sxx, Syy, Sxy) are exact
    int64 aggregations (shuffle-order invariant), and the final
    ``(n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))`` is
    one shared IEEE expression. NULL when either variance is zero.
    Caller owns the overflow budget: |x|,|y| <= B and n rows per group
    need n*B^2 < 2^63 (scale the inputs down first at 100 TB, or accept
    the float `corr` built-in and drop the bit contract)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    vx = agg.n * agg.sxx - agg.sx * agg.sx
    vy = agg.n * agg.syy - agg.sy * agg.sy
    num = (agg.n * agg.sxy - agg.sx * agg.sy).cast("double")
    corr = F.when(
        (vx > 0) & (vy > 0),
        num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return agg.select(group_col, "n", corr.alias("pearson_r"))


def group_corr_duckdb_sql(
    table_expr: str, group_col: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB twin of :func:`group_corr` (same integer sums, same ops)."""
    x, y = f"CAST({x_expr} AS BIGINT)", f"CAST({y_expr} AS BIGINT)"
    return f"""
WITH s AS (
  SELECT {group_col} AS g, COUNT(*) AS n,
         SUM({x}) AS sx, SUM({y}) AS sy,
         SUM({x} * {x}) AS sxx, SUM({y} * {y}) AS syy,
         SUM({x} * {y}) AS sxy
  FROM {table_expr} GROUP BY 1
)
SELECT g AS {group_col}, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS pearson_r
FROM s
"""
