"""Incremental corpus deduplication: new-batch vs historical corpus.

The nightly-crawl shape of dedup: a fresh batch of documents must be
deduplicated AGAINST the already-ingested corpus (not just within
itself). Expressed as a left-anti join of the batch on the corpus's
distinct content fingerprints.

Scale shape (100 TB corpus, ~TB batch): the corpus side reduces to one
row per distinct fingerprint (map-side combine), and the anti-join
shuffles on the 64-bit fingerprint — narrow key, uniform distribution
(it is a hash). Spark's runtime bloom-filter join optimization
(spark.sql.optimizer.runtime.bloomFilter.enabled) applies here
automatically: the batch side gets a bloom filter built from the corpus
keys pushed into its scan, so most non-duplicate batch rows never
shuffle. In practice the corpus fingerprint set is maintained as its own
compact table so the nightly job never rescans corpus text.

No reference counterpart (curation-layer operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import (
    doc_fingerprint,
    fingerprint_duckdb_sql,
)


def corpus_fingerprints(corpus: DataFrame, text_col: str) -> DataFrame:
    """Distinct content fingerprints of the historical corpus — the compact
    state table an incremental pipeline persists between runs."""
    return corpus.select(
        doc_fingerprint(F.col(text_col)).alias("fp")
    ).distinct()


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Rows of ``batch`` whose normalized content fingerprint does NOT
    appear anywhere in ``corpus``. Keeps the batch schema plus the
    fingerprint column (callers append it to the corpus state table)."""
    fps = corpus_fingerprints(corpus, text_col)
    tagged = batch.withColumn("fp", doc_fingerprint(F.col(text_col)))
    return tagged.join(fps, "fp", "left_anti")


def dedup_against_corpus_duckdb_sql(
    table: str,
    id_col: str,
    text_expr: str,
    batch_pred: str,
    corpus_pred: str,
    out_cols: str,
) -> str:
    """DuckDB twin: anti-join of the ``batch_pred`` slice against the
    ``corpus_pred`` slice of the same table, on the shared fingerprint.
    The fingerprint is computed once in a CTE — it contains lambda
    variables, so inlining it into a correlated EXISTS would let the
    outer table alias capture them."""
    fp = fingerprint_duckdb_sql(text_expr)
    return f"""
WITH corpus_fp AS (
  SELECT DISTINCT {fp} AS fp FROM {table} b WHERE {corpus_pred}
), batch AS (
  SELECT {out_cols}, {fp} AS fp FROM {table} b WHERE {batch_pred}
)
SELECT * FROM batch
WHERE NOT EXISTS (SELECT 1 FROM corpus_fp cf WHERE cf.fp = batch.fp)
"""
