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


class MLPClassifier:
    """Multi-hidden-layer MLP for ``MODEL { ARCH MLP { HIDDEN [...] } }``
    declarations (reference neural_relations.rs:405-470): softmax +
    cross-entropy for ``OUTPUT EXCLUSIVE { labels }``, sigmoid for
    ``OUTPUT BINARY { positive }``. Deterministic seeded init; full-batch
    SGD or Adam; numpy only (the container has no torch — the reference
    likewise trains driver-side with Candle)."""

    output_type = "string"  # run_ml_predict emits label strings

    def __init__(
        self,
        hidden_layers=(16, 8),
        labels: list[str] | None = None,
        positive_literal: str | None = None,
        lr: float = 0.1,
        epochs: int = 80,
        optimizer: str = "adam",
        seed: int = 42,
    ):
        self.hidden_layers = [int(h) for h in hidden_layers]
        self.labels = list(labels) if labels is not None else None
        self.positive_literal = positive_literal
        self.lr, self.epochs, self.optimizer, self.seed = lr, int(epochs), optimizer, seed
        self._params = None
        self._norm = None

    def _forward(self, Xn):
        acts = [Xn]
        h = Xn
        for w, b in self._params[:-1]:
            h = np.tanh(h @ w + b)
            acts.append(h)
        w, b = self._params[-1]
        z = h @ w + b
        return acts, z

    def fit(self, X, y):
        """y: label strings (exclusive) or positives (binary)."""
        X = np.asarray(X, dtype=float)
        mu, sd = X.mean(axis=0), X.std(axis=0) + 1e-9
        self._norm = (mu, sd)
        Xn = (X - mu) / sd
        n = len(X)
        binary = self.labels is None
        if binary:
            Y = np.asarray(
                [1.0 if str(v) == str(self.positive_literal) else 0.0 for v in y]
            ).reshape(-1, 1)
            out_dim = 1
        else:
            idx = {l: i for i, l in enumerate(self.labels)}
            Y = np.zeros((n, len(self.labels)))
            for r, v in enumerate(y):
                Y[r, idx[str(v)]] = 1.0
            out_dim = len(self.labels)
        rng = np.random.RandomState(self.seed)
        dims = [X.shape[1]] + self.hidden_layers + [out_dim]
        self._params = [
            (rng.randn(dims[i], dims[i + 1]) * 0.5, np.zeros(dims[i + 1]))
            for i in range(len(dims) - 1)
        ]
        adam = self.optimizer == "adam"
        if adam:
            mstate = [(np.zeros_like(w), np.zeros_like(b)) for w, b in self._params]
            vstate = [(np.zeros_like(w), np.zeros_like(b)) for w, b in self._params]
            b1, b2, eps = 0.9, 0.999, 1e-8
        for t in range(1, self.epochs + 1):
            acts, z = self._forward(Xn)
            if binary:
                p = 1.0 / (1.0 + np.exp(-z))
            else:
                e = np.exp(z - z.max(axis=1, keepdims=True))
                p = e / e.sum(axis=1, keepdims=True)
            dz = (p - Y) / n  # cross-entropy gradient for both heads
            grads = []
            for li in range(len(self._params) - 1, -1, -1):
                w, _ = self._params[li]
                grads.append((acts[li].T @ dz, dz.sum(axis=0)))
                if li > 0:
                    dz = dz @ w.T * (1 - acts[li] ** 2)
            grads.reverse()
            new_params = []
            for li, ((w, b), (dw, db)) in enumerate(zip(self._params, grads)):
                if adam:
                    mw, mb = mstate[li]
                    vw, vb = vstate[li]
                    mw = b1 * mw + (1 - b1) * dw
                    mb = b1 * mb + (1 - b1) * db
                    vw = b2 * vw + (1 - b2) * dw**2
                    vb = b2 * vb + (1 - b2) * db**2
                    mstate[li], vstate[li] = (mw, mb), (vw, vb)
                    mw_h, mb_h = mw / (1 - b1**t), mb / (1 - b1**t)
                    vw_h, vb_h = vw / (1 - b2**t), vb / (1 - b2**t)
                    w = w - self.lr * mw_h / (np.sqrt(vw_h) + eps)
                    b = b - self.lr * mb_h / (np.sqrt(vb_h) + eps)
                else:
                    w = w - self.lr * dw
                    b = b - self.lr * db
                new_params.append((w, b))
            self._params = new_params
        return self

    def predict_proba(self, X):
        X = np.asarray(X, dtype=float)
        mu, sd = self._norm
        _, z = self._forward((X - mu) / sd)
        if self.labels is None:
            return 1.0 / (1.0 + np.exp(-z))
        e = np.exp(z - z.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    def predict(self, X):
        """Label strings: argmax label (exclusive) or the positive literal /
        '' below threshold (binary; reference materializes only positives)."""
        p = self.predict_proba(X)
        if self.labels is None:
            return [self.positive_literal if v >= 0.5 else "" for v in p.ravel()]
        return [self.labels[i] for i in p.argmax(axis=1)]

    def save(self, path: str) -> None:
        np.savez(
            path,
            **{f"w{i}": w for i, (w, _) in enumerate(self._params)},
            **{f"b{i}": b for i, (_, b) in enumerate(self._params)},
            mu=self._norm[0],
            sd=self._norm[1],
        )


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
