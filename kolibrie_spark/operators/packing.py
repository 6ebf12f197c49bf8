"""Sequence packing for LLM pretraining: lay a document stream out as
fixed-token-budget training sequences (the GPT-style concat-and-chunk
layout — documents are concatenated in a deterministic order and the token
stream is cut every ``budget`` tokens, so documents may straddle sequence
boundaries).

Scale shape: a single global concatenation order would funnel the cumsum
through one task, so the stream is pre-split into ``shards`` by a
deterministic key hash — each shard is an independent token stream (in
practice: one training file per shard). Per shard the layout is one window
cumsum over (shard, id): one shuffle total, shards run in parallel, and
the result is a pure function of (ids, token counts, budget, shards) — the
same layout on every rerun, any cluster, any partitioning.

The reference engine has no packing surface (this is a north-star
training-pipeline operator, like operators/sampling.py); the hash is the
cross-engine-reproducible polynomial fold (operators/hashing.py) so a
DuckDB oracle can replay the exact layout — swap ``hash_fn="xxhash64"``
at 100 TB when no cross-engine contract is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kolibrie_spark.operators import hashing


def _shard(key, shards: int, hash_fn: str):
    if hash_fn == "poly":
        return hashing.poly_hash(key.cast("string")) % F.lit(shards)
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(shards))


def shard_duckdb(expr: str, shards: int) -> str:
    return f"({hashing.poly_hash_duckdb(f'CAST({expr} AS VARCHAR)')} % {shards})"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shards: int = 32,
    hash_fn: str = "poly",
) -> DataFrame:
    """Per-document placement in the packed layout.

    Adds: ``shard``, ``token_start`` (the doc's offset in its shard's token
    stream), ``seq_first``/``seq_last`` (the training sequences the doc's
    tokens land in; integer floor-division — exact in any engine), and
    ``n_seqs``. Zero-token docs occupy no tokens: they sit at their offset
    with ``seq_last = seq_first`` and contribute nothing.
    """
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    toks = F.col(tokens_col).cast("long")
    out = df.withColumn("shard", _shard(F.col(id_col), shards, hash_fn))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "token_start", F.coalesce(F.sum(toks).over(w), F.lit(0)).cast("long")
    )
    seq_first = F.floor(F.col("token_start") / F.lit(budget))
    last_tok = F.col("token_start") + F.greatest(toks, F.lit(1)) - F.lit(1)
    seq_last = F.floor(last_tok / F.lit(budget))
    return (
        out.withColumn("seq_first", seq_first)
        .withColumn("seq_last", seq_last)
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + F.lit(1))
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shards: int = 32,
    hash_fn: str = "poly",
) -> DataFrame:
    """The layout exploded to (sequence, document-slice) rows — the manifest
    a sequence builder consumes: for every training sequence, which docs
    contribute and which token slice of each doc.

    Columns: ``shard``, ``seq``, id, ``doc_tok_start`` (first doc token
    consumed by this sequence), ``n_toks`` (tokens consumed). Zero-token
    docs emit no rows. Explode is ``sequence(seq_first, seq_last)`` —
    doc-local, no extra shuffle beyond pack_sequences' one.
    """
    placed = pack_sequences(df, id_col, tokens_col, budget, shards, hash_fn)
    toks = F.col(tokens_col).cast("long")
    placed = placed.filter(toks > 0).withColumn(
        "seq", F.explode(F.sequence(F.col("seq_first"), F.col("seq_last")))
    )
    seq_start = F.col("seq") * F.lit(budget)  # seq's offset in the stream
    doc_tok_start = F.greatest(seq_start - F.col("token_start"), F.lit(0))
    doc_tok_end = F.least(
        seq_start + F.lit(budget) - F.col("token_start"), toks
    )  # exclusive
    return placed.select(
        "shard",
        "seq",
        F.col(id_col),
        doc_tok_start.cast("long").alias("doc_tok_start"),
        (doc_tok_end - doc_tok_start).cast("long").alias("n_toks"),
    )


def pack_sequences_duckdb_sql(
    table_expr: str, id_col: str, tokens_expr: str, budget: int, shards: int
) -> str:
    """DuckDB twin of pack_sequences (poly hash path), bit-identical."""
    return f"""
WITH s AS (
  SELECT {id_col} AS id, CAST({tokens_expr} AS BIGINT) AS toks,
         {shard_duckdb(id_col, shards)} AS shard
  FROM {table_expr}
), o AS (
  SELECT id, toks, shard,
         CAST(COALESCE(SUM(toks) OVER (
           PARTITION BY shard ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS token_start
  FROM s
)
SELECT id, shard, token_start,
       token_start // {budget} AS seq_first,
       (token_start + GREATEST(toks, 1) - 1) // {budget} AS seq_last,
       (token_start + GREATEST(toks, 1) - 1) // {budget}
         - token_start // {budget} + 1 AS n_seqs
FROM o
"""
