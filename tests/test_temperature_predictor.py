"""Port of the reference's temperature-prediction example — the last
runnable ML example family member (predictor/saving/traffic/fraud are
already ported).

Reference: ml/examples/temperature_predictor.py — three regressors
(LinearRegression, RandomForest, GradientBoosting) trained on seeded
temperature/humidity/occupancy data, each saved as a pickle PLUS an
MLSchema Turtle file via save_with_schema (temperature_predictor.py:63-105),
with predict_proba uncertainty surfaces (LR constant 0.5:157-161, RF
per-tree std:172-177, GB per-stage std:188-192) and a 6-metric evaluation
(mse, r2, training_time, prediction_time, memory_usage_mb,
cpu_usage_percent:74-86).  sklearn/psutil aren't shipped here, so the
models are deterministic stand-ins with the same duck-typed surface; the
data formula is the example's own (temperature_predictor.py:195-209).
"""

import os
import pickle

import numpy as np
import pytest

from kolibrie_spark.ml.mlschema import MLSchema

MLS = "http://www.w3.org/ns/mls#"
EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

FEATURES = ["temperature", "humidity", "occupancy"]


class _BasePredictor:
    """BasePredictor stand-in (temperature_predictor.py:21-127): scaled
    train/predict, stubbed performance counters (psutil isn't shipped —
    deterministic values keep the schema metrics assertable), pickle
    save/load, and the example's save_with_schema flow."""

    def __init__(self, feature_names=None):
        self.feature_names = feature_names or list(FEATURES)

    def train(self, X, y):
        self._mu = X.mean(axis=0)
        self._sd = X.std(axis=0)
        self._fit((X - self._mu) / self._sd, y)
        self.training_time = 0.25

    def predict(self, X):
        self.memory_usage = 64.0
        self.prediction_time = 0.01
        self.cpu_usage = 12.5
        return self._predict_scaled((X - self._mu) / self._sd)

    def predict_proba(self, X):
        return None

    def get_performance_metrics(self):
        return {
            "training_time": getattr(self, "training_time", 0),
            "prediction_time": getattr(self, "prediction_time", 0),
            "memory_usage_mb": getattr(self, "memory_usage", 0),
            "cpu_usage_percent": getattr(self, "cpu_usage", 0),
        }

    def evaluate(self, X_test, y_test):
        pred = self.predict(X_test)
        mse = float(np.mean((y_test - pred) ** 2))
        ss_res = float(np.sum((y_test - pred) ** 2))
        ss_tot = float(np.sum((y_test - y_test.mean()) ** 2))
        self.evaluation_metrics = {"mse": mse, "r2": 1.0 - ss_res / ss_tot}
        return self.evaluation_metrics

    def get(self, attribute_name):
        return getattr(self, attribute_name, None)

    def save(self, filename):
        with open(filename, "wb") as f:
            pickle.dump(self, f)

    def save_with_schema(self, filename, X_train, y_train, X_test, y_test):
        """temperature_predictor.py:63-105 — pickle + sibling .ttl schema
        whose evaluation carries the 6-metric dict."""
        self.save(filename)
        schema = MLSchema()

        def eval_func(model, X_test, y_test):
            metrics = dict(model.evaluate(X_test, y_test))
            metrics.update(model.get_performance_metrics())
            return metrics

        schema.convert_model(
            self,
            X_train,
            y_train,
            X_test,
            y_test,
            feature_names=self.feature_names,
            cpu_time_used=self.get_performance_metrics()["training_time"],
            model_uri=f"http://example.org/models/{os.path.basename(filename)}",
            evaluation_function=eval_func,
        )
        schema_filename = filename.replace(".pkl", ".ttl")
        with open(schema_filename, "w") as f:
            f.write(schema.serialize(format="turtle"))
        return schema_filename

    @classmethod
    def load(cls, filename):
        with open(filename, "rb") as f:
            return pickle.load(f)


class _LinearRegressionPredictor(_BasePredictor):
    """LinearRegressionPredictor (temperature_predictor.py:129-161):
    closed-form OLS on scaled features; predict_proba is the example's
    constant 0.5 uncertainty."""

    def __init__(self, fit_intercept=True, feature_names=None):
        super().__init__(feature_names)
        self.fit_intercept = fit_intercept

    def get_params(self):
        return {"fit_intercept": self.fit_intercept}

    def _fit(self, Xs, y):
        A = np.column_stack([Xs, np.ones(len(Xs))])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        self.coef_ = beta[:-1]
        self.intercept_ = float(beta[-1])

    def _predict_scaled(self, Xs):
        return Xs @ self.coef_ + self.intercept_

    def predict_proba(self, X):
        Xs = (X - self._mu) / self._sd
        return np.ones(Xs.shape[0]) * 0.5


class _RandomForestPredictor(_BasePredictor):
    """RandomForestPredictor (temperature_predictor.py:163-177): an
    ensemble of perturbed OLS 'trees'; predict_proba is the per-tree
    prediction std, importances normalized |corr(feature, y)|."""

    def __init__(self, n_estimators=100, max_depth=10, random_state=42,
                 feature_names=None):
        super().__init__(feature_names)
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.random_state = random_state

    def get_params(self):
        return {
            "n_estimators": self.n_estimators,
            "max_depth": self.max_depth,
            "random_state": self.random_state,
        }

    def _fit(self, Xs, y):
        A = np.column_stack([Xs, np.ones(len(Xs))])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        rng = np.random.RandomState(self.random_state)
        # each "tree" is the OLS fit plus a seeded coefficient perturbation
        self._trees = [
            beta + rng.normal(0, 0.05 * (1 + np.abs(beta))) for _ in range(8)
        ]
        corr = np.array(
            [abs(np.corrcoef(Xs[:, j], y)[0, 1]) for j in range(Xs.shape[1])]
        )
        self.feature_importances_ = corr / corr.sum()

    def _tree_preds(self, Xs):
        A = np.column_stack([Xs, np.ones(len(Xs))])
        return np.stack([A @ t for t in self._trees])

    def _predict_scaled(self, Xs):
        return self._tree_preds(Xs).mean(axis=0)

    def predict_proba(self, X):
        Xs = (X - self._mu) / self._sd
        return self._tree_preds(Xs).std(axis=0)


class _GradientBoostingPredictor(_RandomForestPredictor):
    """GradientBoostingPredictor (temperature_predictor.py:179-192): same
    ensemble surface; distinct hyperparameter set (learning_rate)."""

    def __init__(self, n_estimators=100, learning_rate=0.1, max_depth=3,
                 random_state=42, feature_names=None):
        super().__init__(n_estimators, max_depth, random_state, feature_names)
        self.learning_rate = learning_rate

    def get_params(self):
        return {
            "n_estimators": self.n_estimators,
            "learning_rate": self.learning_rate,
            "max_depth": self.max_depth,
            "random_state": self.random_state,
        }


def _temperature_data():
    """temperature_predictor.py:195-209 — seeded room-sensor features and
    the example's future-temperature formula; deterministic 80/20 split."""
    rng = np.random.RandomState(42)
    n = 1000
    temperature = rng.normal(22, 5, n)
    humidity = rng.normal(50, 15, n)
    occupancy = rng.randint(0, 20, n)
    future_temp = (
        temperature * 0.7
        + (humidity - 50) * 0.02
        + occupancy * 0.1
        + rng.normal(0, 1, n)
    )
    X = np.column_stack([temperature, humidity, occupancy]).astype(float)
    perm = np.random.RandomState(42).permutation(n)
    test = perm[: n // 5]
    train = perm[n // 5 :]
    return X[train], future_temp[train], X[test], future_temp[test]


def _graph_index(schema):
    by_sp = {}
    for s, p, o in schema.triples:
        by_sp.setdefault((s, p), []).append(o)
    return by_sp


def _models():
    return [
        ("lr_temperature_predictor", _LinearRegressionPredictor()),
        ("rf_temperature_predictor", _RandomForestPredictor()),
        ("gb_temperature_predictor", _GradientBoostingPredictor()),
    ]


def test_three_models_train_and_uncertainty():
    X_train, y_train, X_test, y_test = _temperature_data()
    for name, model in _models():
        model.train(X_train, y_train)
        metrics = model.evaluate(X_test, y_test)
        # the formula is nearly linear; every model family fits it well
        assert metrics["r2"] > 0.9, name
        proba = model.predict_proba(X_test)
        assert proba.shape == (len(X_test),)
        if name.startswith("lr"):
            assert np.all(proba == 0.5)
        else:
            assert np.all(proba > 0)  # ensemble spread is positive
        perf = model.get_performance_metrics()
        assert set(perf) == {
            "training_time",
            "prediction_time",
            "memory_usage_mb",
            "cpu_usage_percent",
        }


def test_save_with_schema_writes_pickle_and_turtle(tmp_path):
    X_train, y_train, X_test, y_test = _temperature_data()
    for name, model in _models():
        model.train(X_train, y_train)
        model.predict(X_test)  # run once to get performance metrics
        pkl = str(tmp_path / f"{name}.pkl")
        ttl_file = model.save_with_schema(pkl, X_train, y_train, X_test, y_test)
        assert ttl_file == str(tmp_path / f"{name}.ttl")
        assert os.path.exists(pkl) and os.path.exists(ttl_file)
        # pickle round-trip predicts identically
        loaded = _BasePredictor.load(pkl)
        assert np.allclose(loaded.predict(X_test), model.predict(X_test))


def test_schema_carries_six_metrics_and_hyperparams(spark):
    X_train, y_train, X_test, y_test = _temperature_data()
    model = _GradientBoostingPredictor(feature_names=FEATURES)
    model.train(X_train, y_train)
    model.predict(X_test)
    schema = MLSchema()

    def eval_func(m, Xt, yt):
        metrics = dict(m.evaluate(Xt, yt))
        metrics.update(m.get_performance_metrics())
        return metrics

    schema.convert_model(
        model,
        X_train,
        y_train,
        X_test,
        y_test,
        feature_names=FEATURES,
        cpu_time_used=model.get_performance_metrics()["training_time"],
        model_uri=f"{EX}models/gb_temperature_predictor.pkl",
        evaluation_function=eval_func,
    )
    idx = _graph_index(schema)
    run = f"{EX}run1"
    assert f"{EX}models/gb_temperature_predictor.pkl" in idx[(run, f"{MLS}hasOutput")]
    # all six metric labels present as evaluation-measure labels
    measures = {
        s
        for (s, p), os_ in idx.items()
        if p == RDF_TYPE and f"{MLS}EvaluationMeasure" in os_
    }
    labels = {
        os_[0]
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and s in measures
    }
    assert {
        "mse",
        "r2",
        "training_time",
        "prediction_time",
        "memory_usage_mb",
        "cpu_usage_percent",
    } <= labels
    # the four hyperparameters of the GB model
    for hp in ["n_estimators", "learning_rate", "max_depth", "random_state"]:
        assert idx[(f"{EX}hyperparameter/{hp}", RDF_TYPE)] == [f"{MLS}HyperParameter"]
    # metric values round-trip through the graph lexically
    want = eval_func(model, X_test, y_test)
    got = {}
    for (s, p), os_ in idx.items():
        if p == RDFS_LABEL and s in measures:
            evs = [
                ev
                for (ev, pp), oo in idx.items()
                if pp == f"{MLS}specifiedBy" and s in oo
            ]
            if evs:
                got[os_[0]] = float(idx[(evs[0], f"{MLS}hasValue")][0])
    for k, v in want.items():
        assert got[k] == pytest.approx(float(v)), k

    # the Turtle serialization parses back on the engine (as in the
    # example's saved .ttl being queryable)
    import kolibrie_spark.compat as kolibrie

    db = kolibrie.SparqlDatabase(spark)
    db.parse_turtle(schema.serialize(format="turtle"))
    got_triples = {(r[0], r[1], r[2]) for r in db.query().get_results()}
    assert got_triples == set(schema.triples)
