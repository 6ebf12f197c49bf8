"""PII scrubbing for training corpora: redact emails, IPv4 addresses, and
long digit runs (card/account-shaped numbers) from a text column, plus
per-document redaction counts for downstream filtering ("drop docs with
> k PII hits").

Pure JVM column expressions (`regexp_replace` / `regexp_count`) — no
Python in the row path, whole-stage codegen, zero shuffle. The patterns
are written in the common subset of Java regex (Spark) and RE2 (DuckDB)
— character classes, bounded repetition, ``\\b`` — verified equivalent on
both engines, so the DuckDB twin is bit-identical. Replacement order is
fixed (email → ipv4 → number) and mirrored in the twin: an email's
domain digits must be consumed by <EMAIL> before the number pass sees
them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER IS PART OF THE CONTRACT
PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\b\d{13,19}\b", "<NUM>"),
]


def scrub_exprs(text_col: str):
    """(scrubbed_column, [count_columns]) — the raw expressions, for
    callers composing their own projection (e.g. CurationPipeline keeps
    every other column without a join)."""
    text = F.col(text_col)
    scrubbed = text
    counts = []
    for name, pat, repl in PATTERNS:
        counts.append(
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, counts


def scrub_pii(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, scrubbed, n_email, n_ipv4, n_number): the text with each PII
    class replaced by its tag, and per-class match counts measured on the
    ORIGINAL text (so counts are independent of replacement order)."""
    scrubbed, counts = scrub_exprs(text_col)
    return df.select(F.col(id_col), scrubbed.alias("scrubbed"), *counts)


def scrub_pii_duckdb_sql(table_expr: str, id_col: str, text_expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` (RE2 'g' flag = Spark's
    replace-all default)."""

    def q(p: str) -> str:
        # DuckDB single-quoted literals keep backslashes verbatim
        return "'" + p.replace("'", "''") + "'"

    scrubbed = text_expr
    counts = []
    for name, pat, repl in PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({text_expr}, {q(pat)})) AS BIGINT)"
            f" AS n_{name}"
        )
        scrubbed = f"regexp_replace({scrubbed}, {q(pat)}, '{repl}', 'g')"
    return (
        f"SELECT {id_col}, {scrubbed} AS scrubbed, {', '.join(counts)} "
        f"FROM {table_expr}"
    )
