"""Unicode text normalization for training corpora.

Web-crawl text arrives with the same glyph in many byte forms (composed
vs decomposed accents, compatibility ligatures, NBSP vs SPACE, mixed
whitespace runs). Dedup fingerprints, tokenizers, and n-gram stats all
diverge unless the corpus is canonicalized first, so a normalize pass is
the first stage of every real curation pipeline.

Split of labor, chosen for the hot path:

- **Whitespace canonicalization** (collapse ``\\s+`` -> single space,
  trim) is pure JVM ``regexp_replace``/``trim`` — whole-stage codegen,
  no Python.
- **Unicode NFC composition** has no Spark built-in, so it runs as an
  Arrow-batched pandas UDF over ``unicodedata.normalize`` (one C call
  per string, vectorized transfer — never a row-at-a-time Python UDF).
  ASCII-only batches short-circuit: ``str.isascii()`` is a memchr-grade
  scan and ASCII is NFC-invariant, so clean English corpora pay near
  zero Python cost.

Cross-engine exactness: NFC is defined by the Unicode standard —
CPython's ``unicodedata`` and DuckDB's ``nfc_normalize`` implement the
same tables, so outputs are byte-identical; whitespace regexes are in
the Java/RE2 common subset. Zero shuffle end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: x
        if x is None or x.isascii()
        else unicodedata.normalize("NFC", x)
    )


def normalize_expr(col: Column) -> Column:
    """NFC-compose then canonicalize whitespace (any ``\\s`` run -> one
    space, trimmed). NBSP (U+00A0) is normalized to SPACE explicitly —
    it survives NFC and Java's ``\\s`` does not match it."""
    c = _nfc(col)
    c = F.regexp_replace(c, "\u00a0", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text(
    df: DataFrame, text_col: str, out_col: str = "text_norm"
) -> DataFrame:
    return df.withColumn(out_col, normalize_expr(F.col(text_col)))


def normalize_duckdb_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`normalize_expr`."""
    c = f"nfc_normalize({text_expr})"
    c = f"regexp_replace({c}, chr(160), ' ', 'g')"
    c = f"regexp_replace({c}, '\\s+', ' ', 'g')"
    return f"trim({c})"


# decode order is PART OF THE CONTRACT: named/numeric entities first and
# &amp; LAST, so "&amp;lt;" decodes to the literal "&lt;" (one pass, no
# re-scan) exactly like Python's html.unescape does for this basic set
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def strip_html_expr(col: Column) -> Column:
    """Drop HTML/XML tags and decode the basic entity set — the cheap
    boilerplate pass a crawl corpus runs before any text analysis.
    ``<script>``/``<style>`` ELEMENT CONTENT is dropped too (tag-aware),
    since rendering never shows it. Pure JVM ``regexp_replace`` chain —
    whole-stage codegen, zero shuffle, no Python."""
    # non-greedy across-newline script/style bodies, case-insensitive.
    # One pattern per element (no backreference) — RE2, which the DuckDB
    # twin runs on, has no backreferences
    c = col
    for el in ("script", "style"):
        c = F.regexp_replace(
            c, rf"(?is)<{el}\b[^>]*>.*?</{el}[\t\n\r ]*>", " "
        )
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def strip_html_duckdb_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`strip_html_expr` (RE2 's' flag via inline
    modifiers; same entity order)."""
    c = text_expr
    for el in ("script", "style"):
        c = (
            f"regexp_replace({c}, "
            f"'(?is)<{el}\\b[^>]*>.*?</{el}[\\t\\n\\r ]*>', ' ', 'g')"
        )
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    return c
