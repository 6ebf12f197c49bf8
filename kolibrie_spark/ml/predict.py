"""ML.PREDICT(MODEL "name", INPUT { SELECT ... }, OUTPUT ?var)

Reference: parse parser.rs:2504-2580; execution engine.rs:603-670 and
1162-1374 — run the input sub-select, extract the numeric feature columns,
call the registered model, bind the output variable.

Spark mapping (SURVEY §2.11): the sub-select compiles to a DataFrame and
the model call is an Arrow-batched ``mapInPandas`` — the model sees pandas
blocks of the numeric features, predictions come back as a column. Models
are python callables ``f(features: pandas.DataFrame) -> sequence`` (an
sklearn-style ``.predict`` object also works); registration is per-engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.sparql.parser import ParseError, parse_query

_ML_RE = re.compile(
    r"""^\s*(?P<prefixes>(?:PREFIX\s+\S+\s+<[^>]*>\s*)*)
    ML\.PREDICT\s*\(\s*MODEL\s+"(?P<model>[^"]+)"\s*,\s*
    INPUT\s*\{(?P<input>.*)\}\s*,\s*
    OUTPUT\s+\?(?P<out>\w+)\s*\)\s*$""",
    re.S | re.X | re.I,
)


@dataclass
class MLPredict:
    model: str
    input_select: object  # ast.SelectQuery
    output_var: str


def parse_ml_predict(text: str) -> MLPredict:
    m = _ML_RE.match(text)
    if not m:
        raise ParseError(
            'expected ML.PREDICT(MODEL "name", INPUT { SELECT ... }, OUTPUT ?var)'
        )
    inner = (m.group("prefixes") or "") + m.group("input")
    q = parse_query(inner)
    if q.select is None:
        raise ParseError("ML.PREDICT INPUT must be a SELECT")
    return MLPredict(
        model=m.group("model"), input_select=q.select, output_var=m.group("out")
    )


def numeric_feature_columns(df: DataFrame) -> list[str]:
    """Columns that parse numerically on every non-null sampled row
    (reference extracts numeric features the same lexical way)."""
    probe = df.limit(100)
    agg = probe.agg(
        *[
            F.sum(
                (F.col(c).isNotNull() & F.col(c).try_cast("double").isNull()).cast("int")
            ).alias(c)
            for c in df.columns
        ]
    ).first()
    return [c for c in df.columns if agg[c] == 0]


def run_ml_predict(df: DataFrame, model_fn, output_var: str) -> DataFrame:
    """Append the model's prediction for each input row. Models declaring
    ``output_type = "string"`` (classifiers emitting labels, e.g.
    MLPClassifier for OUTPUT EXCLUSIVE/BINARY) get a string output column;
    everything else stays double (regression)."""
    feats = numeric_feature_columns(df)
    if not feats:
        raise ValueError("ML.PREDICT input has no numeric feature columns")
    cols = list(df.columns)
    out_type = getattr(model_fn, "output_type", "double")
    out_schema = ", ".join(
        [f"`{c}` string" for c in cols] + [f"`{output_var}` {out_type}"]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            X = pdf[feats].astype(float)
            fn = getattr(model_fn, "predict", model_fn)
            preds = fn(X)
            out = pdf[cols].astype(str)
            if out_type == "string":
                out[output_var] = [str(p) for p in preds]
            else:
                out[output_var] = [float(p) for p in preds]
            yield out

    return df.mapInPandas(run, schema=out_schema)
