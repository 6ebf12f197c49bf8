"""Neural relations (reference kolibrie/src/neural_relations.rs:63-553,
execute_ml_train.rs): declared model + feature query + anchor; after
training, the relation materializes as ordinary predicate facts so WHERE
patterns can match it.

The container has no torch/sklearn, so training is a deterministic numpy
MLP (one hidden layer, full-batch gradient descent, seeded init) fit on the
collected feature table — the reference likewise trains driver-side
(Candle). Materialization stays distributed: predictions run through
run_ml_predict's mapInPandas and the derived facts insert into the store.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TinyMLP:
    """Deterministic MLP: in -> hidden (tanh) -> 1 linear (regression) or
    sigmoid (binary). Full-batch GD; seeded init; no dependencies."""

    def __init__(self, hidden: int = 8, lr: float = 0.05, epochs: int = 500,
                 binary: bool = False, seed: int = 42):
        self.hidden, self.lr, self.epochs, self.binary, self.seed = (
            hidden, lr, epochs, binary, seed,
        )
        self._params = None
        self._norm = None

    def fit(self, X, y):
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float).reshape(-1, 1)
        mu, sd = X.mean(axis=0), X.std(axis=0) + 1e-9
        self._norm = (mu, sd)
        Xn = (X - mu) / sd
        rng = np.random.RandomState(self.seed)
        w1 = rng.randn(X.shape[1], self.hidden) * 0.5
        b1 = np.zeros(self.hidden)
        w2 = rng.randn(self.hidden, 1) * 0.5
        b2 = np.zeros(1)
        n = len(X)
        for _ in range(self.epochs):
            h = np.tanh(Xn @ w1 + b1)
            z = h @ w2 + b2
            if self.binary:
                p = 1.0 / (1.0 + np.exp(-z))
                dz = (p - y) / n
            else:
                dz = (z - y) / n
            dw2 = h.T @ dz
            db2 = dz.sum(axis=0)
            dh = dz @ w2.T * (1 - h**2)
            dw1 = Xn.T @ dh
            db1 = dh.sum(axis=0)
            w1 -= self.lr * dw1
            b1 -= self.lr * db1
            w2 -= self.lr * dw2
            b2 -= self.lr * db2
        self._params = (w1, b1, w2, b2)
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=float)
        mu, sd = self._norm
        w1, b1, w2, b2 = self._params
        z = np.tanh(((X - mu) / sd) @ w1 + b1) @ w2 + b2
        if self.binary:
            return (1.0 / (1.0 + np.exp(-z))).ravel()
        return z.ravel()


@dataclass
class NeuralRelation:
    """``NEURAL RELATION pred { features, anchor }`` — after fit(), the
    relation materializes as (anchor, predicate, prediction) facts."""

    predicate: str
    anchor_col: str
    feature_cols: list[str]
    model: TinyMLP = field(default_factory=TinyMLP)

    def train(self, df: DataFrame, label_col: str) -> "NeuralRelation":
        pdf = df.select(self.anchor_col, *self.feature_cols, label_col).toPandas()
        X = pdf[self.feature_cols].astype(float).to_numpy()
        y = pdf[label_col].astype(float).to_numpy()
        self.model.fit(X, y)
        return self

    def materialize(self, store, df: DataFrame) -> int:
        """Insert (anchor, predicate, prediction) facts derived from the
        model over ``df`` (reference materialize_neural_relations,
        neural_relations.rs:539). Predictions run distributed."""
        from kolibrie_spark.ml.predict import run_ml_predict

        scored = run_ml_predict(
            df.select(self.anchor_col, *self.feature_cols), self.model, "__pred"
        )
        facts = scored.select(
            F.col(self.anchor_col).cast("string").alias("s"),
            F.lit(self.predicate).alias("p"),
            F.col("__pred").cast("string").alias("o"),
            F.lit(None).cast("string").alias("g"),
        )
        n = facts.count()
        store.insert(facts)
        return n
