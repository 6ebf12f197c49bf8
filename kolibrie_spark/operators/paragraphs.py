"""Paragraph-level (sub-document) deduplication, C4/RefinedWeb style.

Whole-document dedup misses the dominant duplication mode on the web:
boilerplate PARAGRAPHS (cookie banners, license blocks, navigation text)
repeated across millions of otherwise-distinct pages. C4's rule — keep
one occurrence of every exact paragraph corpus-wide, drop the rest — is
what this implements, plus the reassembly of cleaned documents.

Semantics (the contract the oracle replays):

- paragraphs are ``text`` split on ``sep`` (default a literal newline);
  empty paragraphs are preserved as position holders but never deduped
  away (they carry no content and dropping them would merge neighbors);
- the KEPT occurrence of a duplicated paragraph is the one with the
  smallest ``(doc_id, paragraph_index)`` — deterministic, engine- and
  partitioning-independent;
- cleaned documents are the surviving paragraphs re-joined in original
  order; documents whose every paragraph was deduplicated away keep an
  empty string.

Plan shape at 100 TB: posexplode (narrow) -> ONE window over the
paragraph fingerprint ordered by (doc_id, pos) — a single hash shuffle on
the fingerprint, which is near-uniform (hash of content), so no skew
beyond genuinely hot boilerplate; a hot paragraph's rows all land in one
reducer but the window only ranks them (O(n log n) in the group, no
pairwise blowup). Reassembly is one more shuffle back on doc_id with a
positional sort inside the aggregation. Both shuffles are unavoidable for
these semantics (global first-occurrence needs the fingerprint grouped;
reassembly needs the doc grouped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact-paragraph dedup. Returns
    ``(id_col, text_clean, n_paras, n_kept)``."""
    import re

    # Spark's split() takes a REGEX; the contract separator is a LITERAL
    # (DuckDB's string_split is literal), so escape before splitting
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(re.escape(sep)), -1)
        ).alias("pos", "para"),
    )
    w = Window.partitionBy("para").orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    ranked = paras.withColumn(
        "keep",
        (F.length("para") == 0) | (F.row_number().over(w) == 1),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s.getField("para"),
                ),
                sep,
            ).alias("text_clean"),
            F.count("*").alias("n_paras"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
    )


def dedup_paragraphs_duckdb_sql(
    table_expr: str, id_col: str, text_col: str, sep: str = "\n"
) -> str:
    """DuckDB twin of :func:`dedup_paragraphs` (same keep rule, same
    reassembly)."""
    sep_sql = sep.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
    return f"""
WITH split AS (
  SELECT {id_col} AS id, string_split({text_col}, e'{sep_sql}') AS parts
  FROM {table_expr}
), paras AS (
  SELECT id, u.i - 1 AS pos, parts[u.i] AS para
  FROM split, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) u
), ranked AS (
  SELECT id, pos, para,
         (length(para) = 0 OR
          row_number() OVER (PARTITION BY para ORDER BY id ASC, pos ASC) = 1)
           AS keep
  FROM paras
)
SELECT id AS {id_col},
       coalesce(string_agg(CASE WHEN keep THEN para END, e'{sep_sql}'
                           ORDER BY pos ASC), '') AS text_clean,
       COUNT(*) AS n_paras,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ranked
GROUP BY id
"""
