"""Blocked fuzzy matching (entity-resolution style) via edit distance.

The use case: vocabulary normalization / typo clustering over a corpus —
find token pairs within Levenshtein distance 1 so near-identical spellings
("colour"/"color", OCR typos) can be canonicalized before counting,
dedup fingerprinting, or LM scoring.

The defining predicate (the operator's CONTRACT, what the oracle brute
forces) is::

    first_char(a) == first_char(b)
    AND |len(a) - len(b)| <= 1
    AND levenshtein(a, b) <= max_dist
    AND a < b

The first two conjuncts are the standard ER *blocking* relaxation: an
edit-distance-1 pair can differ in length by at most 1, and anchoring on
the first character is the usual cheap recall/cost trade (documented, not
hidden). What makes this a Spark-first operator is the PLAN:

- a quadratic theta-join (what naive SQL does, and what the DuckDB oracle
  runs on the small vocab) is O(V^2) Levenshtein calls — dead at scale;
- here the probe side is exploded to candidate lengths
  ``{len-1, len, len+1}`` and the join is a plain EQUI-join on
  ``(first_char, length_bucket)`` — hash-partitioned, no
  BroadcastNestedLoop, Levenshtein only runs inside blocks. Block skew is
  bounded by the alphabet x length grid; a hot block (e.g. 's', len 5)
  can be salted with ``operators.skew`` if profiling shows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vocab(df: DataFrame, text_col: str, min_len: int = 3) -> DataFrame:
    """Distinct lowercase whitespace tokens of at least ``min_len`` chars.
    One distinct-aggregation (map-side combined)."""
    tok = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    return (
        df.select(tok)
        .filter(F.length("word") >= min_len)
        .distinct()
    )


def fuzzy_pairs(
    words: DataFrame, word_col: str = "word", max_dist: int = 1
) -> DataFrame:
    """All pairs (word_a < word_b) satisfying the blocked-match contract
    above. Returns ``(word_a, word_b, dist)``.
    """
    w = F.col(word_col)
    base = words.select(
        w.alias("word"),
        F.substring(w, 1, 1).alias("c1"),
        F.length(w).alias("len"),
    )
    # probe side advertises itself under every candidate length bucket;
    # the build side keeps its true length -> pure equi-join keys
    probe = base.select(
        F.col("word").alias("word_a"),
        "c1",
        F.explode(
            F.array(F.col("len") - 1, F.col("len"), F.col("len") + 1)
        ).alias("len_b"),
    )
    build = base.select(
        F.col("word").alias("word_b"),
        F.col("c1").alias("c1_b"),
        F.col("len").alias("len_b2"),
    )
    return (
        probe.join(
            build,
            (probe.c1 == build.c1_b) & (probe.len_b == build.len_b2),
        )
        .filter(F.col("word_a") < F.col("word_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("word_a"), F.col("word_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .select("word_a", "word_b", "dist")
    )


def fuzzy_vocab_pairs(
    df: DataFrame, text_col: str, min_len: int = 3, max_dist: int = 1
) -> DataFrame:
    """Convenience: tokenize -> distinct vocab -> blocked fuzzy pairs."""
    return fuzzy_pairs(vocab(df, text_col, min_len), max_dist=max_dist)


def fuzzy_vocab_pairs_duckdb_sql(
    table_expr: str, text_expr: str, min_len: int = 3, max_dist: int = 1
) -> str:
    """Brute-force oracle: quadratic self-join evaluating the SAME contract
    predicate (fine on a small vocab; the Spark plan is the scale path)."""
    return f"""
WITH vocab AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(regexp_split_to_array(lower({text_expr}), '\\s+')) AS word
    FROM {table_expr}
  ) WHERE length(word) >= {min_len}
)
SELECT a.word AS word_a, b.word AS word_b,
       CAST(levenshtein(a.word, b.word) AS INT) AS dist
FROM vocab a, vocab b
WHERE a.word < b.word
  AND substring(a.word, 1, 1) = substring(b.word, 1, 1)
  AND abs(length(a.word) - length(b.word)) <= 1
  AND levenshtein(a.word, b.word) <= {max_dist}
"""
