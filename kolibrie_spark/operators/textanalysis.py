"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure JVM column expressions (whole-stage
codegen; no Python in the row path), each with a DuckDB-reproducible
formulation for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators import hashing

# small deterministic stopword profiles for the n-gram/stopword language
# heuristic; ASCII-only on purpose (the synthetic corpus is ASCII)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "por", "con"],
    "it": ["il", "la", "gli", "e", "che", "un", "una", "per", "con", "del"],
}


def word_array(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(word_array(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token (a BPE-flavored regex)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"\p{Punct}", "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Occurrences (not distinct) of the language's stopwords."""
    words = word_array(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence + mean word length band. Deterministic arithmetic,
    reproducible in SQL."""
    n_chars = F.length(text)
    toks = token_count(text)
    mean_wl = (F.length(F.regexp_replace(text, r"\s+", ""))) / toks
    sw_ratio = stopword_count(text) / toks
    len_ok = F.when((n_chars >= 50) & (n_chars <= 5000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.1, 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    sw_ok = F.when(sw_ratio >= 0.05, 1.0).otherwise(0.0)
    return (len_ok + punct_ok + wl_ok + sw_ok) / F.lit(4.0)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_count(text, lang)) for lang in STOPWORDS]


def lang_id(text: Column) -> Column:
    """argmax of per-language stopword counts; ties resolve in the fixed
    profile order (en, de, fr, es, it); no stopwords at all → 'und'
    (undetermined)."""
    scores = lang_scores(text)
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling fingerprint of the whole document: the
    polynomial fold of hashing.py over the normalized text (lowercased,
    whitespace collapsed). DuckDB twin: fingerprint_duckdb_sql."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return hashing.poly_hash(norm)


def fingerprint_duckdb_sql(expr: str) -> str:
    norm = f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"
    return hashing.poly_hash_duckdb(norm)


def word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams; empty when the doc has fewer
    than ``n`` words (guarded — Spark's ``sequence(1, 0)`` would DESCEND)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def dup_ngram_fraction(text: Column, n: int) -> Column:
    """Gopher-style repetition signal: fraction of a doc's word n-grams that
    are duplicates of an earlier one (1 - distinct/total), 0.0 for docs too
    short to have any. Doc-local array arithmetic — whole-stage codegen, no
    explode, no shuffle; the distinct/total ratio is one IEEE division so
    the double is engine-identical.

    The n-grams are distinct-counted as arrays_zip STRUCTS of n shifted
    word slices, not joined strings — measured 3x faster (no per-gram
    string allocation) and the distinct count is identical (words contain
    no spaces, so the space-joined form is collision-free too)."""
    words = word_array(F.lower(text))
    total = F.size(words) - F.lit(n - 1)
    grams = F.arrays_zip(
        *[F.slice(words, i + 1, total) for i in range(n)]
    )
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetition profile: duplicate fractions for 1/2/3-grams.
    Used to drop boilerplate/spam before training (high dup fraction =
    repeated phrases)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        dup_ngram_fraction(t, 1).alias("dup_word_frac"),
        dup_ngram_fraction(t, 2).alias("dup_2gram_frac"),
        dup_ngram_fraction(t, 3).alias("dup_3gram_frac"),
    )


def dup_ngram_fraction_duckdb(expr: str, n: int) -> str:
    """DuckDB twin of :func:`dup_ngram_fraction` (1-based inclusive list
    slicing; ``range``'s end is exclusive, matching Spark's guarded
    ``sequence``)."""
    words = f"string_split_regex(trim(lower({expr})), '\\s+')"
    grams = (
        f"list_transform(range(1, len({words}) - {n} + 2), "
        f"i -> array_to_string(({words})[i:i+{n - 1}], ' '))"
    )
    return (
        f"(CASE WHEN len({words}) >= {n} THEN "
        f"1.0 - len(list_distinct({grams})) / CAST(len({grams}) AS DOUBLE) "
        f"ELSE 0.0 END)"
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021, Table A1),
    adapted to newline-free corpora (the line-level bullet/ellipsis-prefix
    rules need line structure; the word-level rules carry over):

    - word count within [min_words, max_words]
    - mean word length within [min_mean_wl, max_mean_wl]
    - symbol-to-word ratio ('#' and '...') <= max_symbol_ratio
    - fraction of words containing an alphabetic char >= min_alpha_frac
    - at least min_stopwords DISTINCT English stopwords present

    Pure column expressions (whole-stage codegen, zero shuffle); every
    emitted double is a single integer division, so bit-identical across
    engines. Returns metrics + per-rule flags + the conjunction."""
    t = F.col(text_col)
    words = word_array(t)
    n_words = F.size(words).cast("long")
    mean_wl = F.length(F.regexp_replace(t, r"\s+", "")) / n_words
    hash_cnt = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ell_cnt = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_cnt + ell_cnt) / n_words
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words
    )
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_distinct = F.size(
        F.array_intersect(F.array_distinct(word_array(F.lower(t))), sw)
    ).cast("long")
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "ok_alpha_frac": alpha_frac >= min_alpha_frac,
        "ok_stopwords": sw_distinct >= min_stopwords,
    }
    passed = None
    for c in flags.values():
        passed = c if passed is None else (passed & c)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        sw_distinct.alias("stopwords_distinct"),
        # 0/1 ints, not booleans: engine-neutral under every value-hash
        *[c.cast("int").alias(name) for name, c in flags.items()],
        passed.cast("int").alias("gopher_pass"),
    )


def gopher_rules_duckdb_sql(
    table: str,
    id_col: str,
    text_expr: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_rules`."""
    w = f"string_split_regex(trim({text_expr}), '\\s+')"
    wl = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    sw = "[" + ", ".join(f"'{s}'" for s in STOPWORDS["en"]) + "]"
    n_words = f"CAST(len({w}) AS BIGINT)"
    mean_wl = f"(length(regexp_replace({text_expr}, '\\s+', '', 'g')) / {n_words})"
    sym = (
        f"((length({text_expr}) - length(replace({text_expr}, '#', ''))) + "
        f"(length({text_expr}) - length(replace({text_expr}, '...', ''))) / 3)"
        f" / {n_words}"
    )
    alpha = (
        f"(len(list_filter({w}, x -> regexp_matches(x, '[A-Za-z]'))) / {n_words})"
    )
    swd = f"CAST(len(list_intersect(list_distinct({wl}), {sw})) AS BIGINT)"
    return f"""
SELECT {id_col},
       {n_words} AS n_words,
       {mean_wl} AS mean_word_len,
       {sym} AS symbol_ratio,
       {alpha} AS alpha_frac,
       {swd} AS stopwords_distinct,
       CAST(({n_words} >= {min_words} AND {n_words} <= {max_words}) AS INT) AS ok_word_count,
       CAST(({mean_wl} >= {min_mean_wl} AND {mean_wl} <= {max_mean_wl}) AS INT) AS ok_mean_word_len,
       CAST(({sym} <= {max_symbol_ratio}) AS INT) AS ok_symbol_ratio,
       CAST(({alpha} >= {min_alpha_frac}) AS INT) AS ok_alpha_frac,
       CAST(({swd} >= {min_stopwords}) AS INT) AS ok_stopwords,
       CAST((({n_words} >= {min_words} AND {n_words} <= {max_words})
        AND ({mean_wl} >= {min_mean_wl} AND {mean_wl} <= {max_mean_wl})
        AND ({sym} <= {max_symbol_ratio})
        AND ({alpha} >= {min_alpha_frac})
        AND ({swd} >= {min_stopwords})) AS INT) AS gopher_pass
FROM {table}
"""


def analyze(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All analyses in one narrow projection."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).cast("long").alias("tokens"),
        bpe_ish_token_count(t).cast("long").alias("subword_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
