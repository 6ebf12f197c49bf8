"""Model-based document quality scoring (fasttext/CCNet-style filter).

Modern curation pipelines filter with a learned quality classifier, not
just heuristics: a linear model over cheap text features, trained on
weak labels (known-good vs known-bad sources). Two halves:

- ``quality_features`` / ``linear_quality_score`` — the APPLY side:
  doc-local column expressions (whole-stage codegen, zero shuffle) and
  a logistic score from literal weights. This is the part that runs
  over 100 TB, and it is oracle-checkable: every feature is a ratio of
  exact integers, the weighted sum is a fixed-order double fold, and
  the sigmoid is rounded to 9 dp (the lm_score contract for
  transcendentals).
- ``train_quality_classifier`` — the TRAIN side: MLlib
  LogisticRegression over the same feature columns, returning plain
  (weights, bias) floats that feed straight back into the scorer.
  Training data (weak labels) is tiny relative to the corpus; the
  model is 6 numbers, so "deploy" is a literal expression rebuild —
  no model object crosses the driver boundary.

No reference counterpart (curation-layer operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import (
    STOPWORDS,
    dup_ngram_fraction,
    dup_ngram_fraction_duckdb,
    punct_ratio,
    stopword_count,
    token_count,
    word_array,
)

FEATURE_NAMES = [
    "f_len_sat",  # token count saturating at ~100: n/(n+100)
    "f_punct",  # punctuation character ratio
    "f_stop",  # stopword occurrence ratio
    "f_mean_wl",  # mean word length / 10
    "f_dup2",  # duplicate 2-gram fraction
]


def quality_features(text: Column) -> list[Column]:
    """The five feature expressions, in FEATURE_NAMES order. All are
    single divisions of exact integer counts (plus the doc-local dup
    fraction), so each feature double is bit-identical cross-engine."""
    toks = token_count(text).cast("long")
    return [
        toks / (toks + F.lit(100)).cast("double"),
        punct_ratio(text),
        stopword_count(text).cast("long") / toks,
        F.length(F.regexp_replace(text, r"\s+", "")) / (toks * F.lit(10)).cast("double"),
        dup_ngram_fraction(text, 2),
    ]


def quality_features_duckdb(text_expr: str) -> list[str]:
    w = f"string_split_regex(trim({text_expr}), '\\s+')"
    wl = f"string_split_regex(trim(lower({text_expr})), '\\s+')"
    sw = "[" + ", ".join(f"'{s}'" for s in STOPWORDS["en"]) + "]"
    toks = f"CAST(len({w}) AS BIGINT)"
    stripped = f"regexp_replace({text_expr}, '[[:punct:]]', '', 'g')"
    return [
        f"({toks} / CAST(({toks} + 100) AS DOUBLE))",
        f"((length({text_expr}) - length({stripped})) / length({text_expr}))",
        f"(CAST(len(list_filter({wl}, x -> list_contains({sw}, x))) AS BIGINT) / {toks})",
        f"(length(regexp_replace({text_expr}, '\\s+', '', 'g')) / CAST(({toks} * 10) AS DOUBLE))",
        dup_ngram_fraction_duckdb(text_expr, 2),
    ]


def linear_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
) -> DataFrame:
    """Logistic quality score per doc: sigmoid(bias + w·features),
    rounded to 9 dp, plus a 0/1 keep flag at ``threshold``. Pure column
    expressions — zero shuffle."""
    feats = quality_features(F.col(text_col))
    z = F.lit(float(bias))
    for w, f in zip(weights, feats):
        z = z + F.lit(float(w)) * f
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    return df.select(
        F.col(id_col),
        score.alias("quality_score"),
        (score >= threshold).cast("int").alias("keep"),
    )


def linear_quality_score_duckdb_sql(
    table: str,
    id_col: str,
    text_expr: str,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
) -> str:
    feats = quality_features_duckdb(text_expr)
    z = f"{float(bias)!r}"
    for w, f in zip(weights, feats):
        z = f"({z} + {float(w)!r} * {f})"
    score = f"ROUND(1.0 / (1.0 + exp(-{z})), 9)"
    return (
        f"SELECT {id_col}, {score} AS quality_score, "
        f"CAST(({score} >= {threshold}) AS INT) AS keep FROM {table}"
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> tuple[list[float], float]:
    """Fit MLlib LogisticRegression on the five quality features against
    a 0/1 ``label_col``; returns (weights, bias) for
    :func:`linear_quality_score`. The feature assembly is the same
    distributed column expressions as the apply path, so train and
    serve cannot skew."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(F.col(text_col))
    data = df.select(
        F.col(label_col).cast("double").alias("label"),
        *[f.alias(n) for n, f in zip(FEATURE_NAMES, feats)],
    ).na.fill(0.0)
    assembled = VectorAssembler(
        inputCols=FEATURE_NAMES, outputCol="features"
    ).transform(data)
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(assembled)
    return [float(c) for c in model.coefficients], float(model.intercept)
