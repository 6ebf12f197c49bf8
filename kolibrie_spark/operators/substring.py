"""Exact duplicated-substring removal (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") re-expressed for Spark.

The reference algorithm builds a suffix array and removes every repeated
substring of length >= L, keeping one copy. A suffix array is a
single-machine structure; the distributed re-expression works on the
L-char sliding windows directly:

1. every (doc, pos) window of length L is a row;
2. a window whose text occurs at MORE THAN ONE location corpus-wide is a
   duplicate; the globally-first location — smallest (doc_id, pos) —
   keeps its copy, all other locations mark their L chars for removal;
3. per document, marked intervals are unioned (classic running-max merge)
   and the surviving character runs are stitched back together.

This removes every duplicated span of length >= L while keeping one
occurrence, exactly like the suffix-array formulation (a repeat of
length M >= L is covered by its M - L + 1 windows). One divergence,
shared with the oracle: a PERIODIC repeat (e.g. "xx...x" twice in one
doc) self-overlaps, so every window after the globally first is covered
and the kept copy collapses to the first window's uncovered head —
aggressive but deterministic, and exactly what the cover rule states.

Plan shape: the window explode is |chars| rows — the honest cost of
substring-granular dedup (the suffix array is linear in chars too). One
hash shuffle groups window occurrences (keys are near-uniform hashed
content; a hot boilerplate span concentrates its occurrences but the
group does only a rank, no pairwise work). Interval merge + stitching
are windows over per-doc rows. At 100 TB: ship xxhash64(window) instead
of the raw 40-char strings (8-byte shuffle keys, collision-checked by a
second hash), and stride the windows (every k-th position, verify with a
local re-scan) to cut the explode k-fold — same plan, documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 40,
    hash_keys: bool = False,
) -> DataFrame:
    """Corpus-wide duplicated-substring removal. Returns
    ``(id_col, text_clean, n_removed)`` where ``n_removed`` counts
    removed characters (0 for untouched docs, which pass through
    verbatim).

    ``hash_keys=True`` is the 100 TB path: the rank/count shuffle keys
    on ``(xxhash64(g), crc32(g))`` — a 12-byte pair instead of the raw
    L-char string, cutting shuffle bytes ~L/12-fold. The double hash
    makes a false merge require a simultaneous 64+32-bit collision
    (~2^-96 per pair); results are identical to the exact mode on any
    realistic corpus, and the equivalence is test-asserted. The exact
    mode stays the oracle contract."""
    L = span_len
    docs = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty — docs
    # shorter than L must produce no windows, so gate behind a when()
    wins = docs.select(
        "id",
        F.explode(
            F.when(
                F.length("text") >= L,
                F.sequence(F.lit(1), F.length("text") - L + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        "text",
    ).select(
        "id", "pos", F.substring(F.col("text"), F.col("pos"), L).alias("g")
    )
    if hash_keys:
        wins = wins.select(
            "id",
            "pos",
            F.struct(
                F.xxhash64(F.col("g")).alias("h1"),
                F.crc32(F.col("g")).alias("h2"),
            ).alias("g"),
        )
    w_first = Window.partitionBy("g").orderBy(F.col("id").asc(), F.col("pos").asc())
    marked = (
        wins.withColumn("rn", F.row_number().over(w_first))
        .withColumn("n_occ", F.count("*").over(Window.partitionBy("g")))
        .filter((F.col("rn") > 1) & (F.col("n_occ") > 1))
        .select("id", F.col("pos").alias("lo"), (F.col("pos") + L - 1).alias("hi"))
    )
    w_doc = Window.partitionBy("id").orderBy(F.col("lo").asc(), F.col("hi").asc())
    w_prev = w_doc.rowsBetween(Window.unboundedPreceding, -1)
    runs = (
        marked.withColumn("prev_max_hi", F.max("hi").over(w_prev))
        .withColumn(
            "new_run",
            F.when(
                F.col("lo") > F.coalesce(F.col("prev_max_hi"), F.lit(0)), 1
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("new_run").over(w_doc))
        .groupBy("id", "run_id")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
    )
    w_seg = Window.partitionBy("id").orderBy(F.col("lo").asc())
    segs = runs.withColumn(
        "prev_hi", F.coalesce(F.lag("hi").over(w_seg), F.lit(0))
    )
    # docs is joined ONCE (text rides through the aggregation via first());
    # untouched docs fall out of a single left join with coalesce — no
    # anti-join + union branch, two fewer scans/shuffles
    per_doc = segs.join(docs, on="id").groupBy("id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("lo"),
                            F.substring(
                                F.col("text"),
                                F.col("prev_hi") + 1,
                                F.col("lo") - F.col("prev_hi") - 1,
                            ).alias("seg"),
                        )
                    )
                ),
                lambda s: s.getField("seg"),
            ),
        ).alias("head"),
        F.max("hi").alias("max_hi"),
        F.sum(F.col("hi") - F.col("lo") + 1).alias("n_removed"),
        F.first("text").alias("__text"),
    )
    per_doc = per_doc.select(
        "id",
        F.concat(
            F.col("head"), F.expr("substring(__text, max_hi + 1)")
        ).alias("__clean"),
        "n_removed",
    )
    return (
        docs.join(per_doc, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("__clean"), F.col("text")).alias("text_clean"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias(
                "n_removed"
            ),
        )
    )


def remove_duplicate_spans_duckdb_sql(
    table_expr: str, id_col: str, text_col: str, span_len: int = 40
) -> str:
    """DuckDB twin of :func:`remove_duplicate_spans` — identical window,
    first-keeps, interval-union, and stitching rules."""
    L = span_len
    return f"""
WITH docs AS (
  SELECT {id_col} AS id, {text_col} AS text FROM {table_expr}
), wins AS (
  SELECT id, u.i AS pos, substring(text, u.i, {L}) AS g
  FROM docs, LATERAL (
    SELECT unnest(generate_series(1, GREATEST(len(text) - {L} + 1, 0))) AS i
  ) u
), marked AS (
  SELECT id, pos AS lo, pos + {L} - 1 AS hi FROM (
    SELECT id, pos,
           row_number() OVER (PARTITION BY g ORDER BY id ASC, pos ASC) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS n_occ
    FROM wins
  ) WHERE rn > 1 AND n_occ > 1
), runs0 AS (
  SELECT id, lo, hi,
         CASE WHEN lo > COALESCE(MAX(hi) OVER (PARTITION BY id
                ORDER BY lo ASC, hi ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN 1 ELSE 0 END AS new_run
  FROM marked
), runs1 AS (
  SELECT id, lo, hi,
         SUM(new_run) OVER (PARTITION BY id ORDER BY lo ASC, hi ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM runs0
), runs AS (
  SELECT id, run_id, MIN(lo) AS lo, MAX(hi) AS hi
  FROM runs1 GROUP BY id, run_id
), segs AS (
  SELECT id, lo, hi,
         COALESCE(LAG(hi) OVER (PARTITION BY id ORDER BY lo ASC), 0) AS prev_hi
  FROM runs
), per_doc AS (
  SELECT s.id,
         string_agg(substring(d.text, s.prev_hi + 1, s.lo - s.prev_hi - 1),
                    '' ORDER BY s.lo ASC) AS head,
         MAX(s.hi) AS max_hi,
         CAST(SUM(s.hi - s.lo + 1) AS BIGINT) AS n_removed
  FROM segs s JOIN docs d ON s.id = d.id
  GROUP BY s.id
)
SELECT d.id AS {id_col},
       CASE WHEN p.id IS NULL THEN d.text
            ELSE COALESCE(p.head, '') || substring(d.text, p.max_hi + 1)
       END AS text_clean,
       COALESCE(p.n_removed, 0) AS n_removed
FROM docs d LEFT JOIN per_doc p ON d.id = p.id
"""
