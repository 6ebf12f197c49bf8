"""Port of the reference's model-metadata-as-RDF surface and the two
predictor examples that drive it.

Reference: ml/src/mlschema.py (MLSchema.convert_model/serialize/query),
ml/examples/saving_predictor.py (income/spending/savings_rate → future
savings; linear + tree regressors saved with a Turtle schema) and
ml/examples/traffic_predictor.py (avgSpeed/vehicleCount → congestion in
[0,1], predictions clipped).  sklearn isn't shipped here, so the models
are deterministic stand-ins with the same duck-typed introspection
surface (get_params / coef_ / intercept_ / feature_importances_); the
data formulas are the examples' own, seeded.
"""

import numpy as np
import pytest

from kolibrie_spark.ml.mlschema import MLSchema

MLS = "http://www.w3.org/ns/mls#"
EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


class _ScaledOLS:
    """LinearRegressionPredictor stand-in (saving_predictor.py:21-45,
    128-155): standard-scale features, closed-form least squares."""

    def __init__(self, fit_intercept=True, feature_names=None):
        self.fit_intercept = fit_intercept
        self.feature_names = feature_names

    def get_params(self):
        return {"fit_intercept": self.fit_intercept}

    def train(self, X, y):
        self._mu = X.mean(axis=0)
        self._sd = X.std(axis=0)
        Xs = (X - self._mu) / self._sd
        A = np.column_stack([Xs, np.ones(len(Xs))])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        self.coef_ = beta[:-1]
        self.intercept_ = float(beta[-1])

    def predict(self, X):
        Xs = (X - self._mu) / self._sd
        return Xs @ self.coef_ + self.intercept_


class _ClippedOLS(_ScaledOLS):
    """Traffic variant: predictions clipped to the congestion range
    [0, 1] (traffic_predictor.py:44-47)."""

    def predict(self, X):
        return np.clip(super().predict(X), 0.0, 1.0)


class _ToyForest:
    """RandomForestPredictor stand-in exposing the tree introspection
    surface (feature_importances_) without sklearn: importances are the
    normalized absolute correlations of each scaled feature with y."""

    def __init__(self, n_estimators=100, max_depth=10, feature_names=None):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.feature_names = feature_names

    def get_params(self):
        return {"n_estimators": self.n_estimators, "max_depth": self.max_depth}

    def train(self, X, y):
        corr = np.array(
            [abs(np.corrcoef(X[:, j], y)[0, 1]) for j in range(X.shape[1])]
        )
        self.feature_importances_ = corr / corr.sum()
        self._mean = float(y.mean())

    def predict(self, X):
        return np.full(len(X), self._mean)


def _eval_regression(model, X_test, y_test):
    """The examples' evaluate(): mse + r2 (saving_predictor.py:104-117)."""
    pred = model.predict(X_test)
    mse = float(np.mean((y_test - pred) ** 2))
    ss_res = float(np.sum((y_test - pred) ** 2))
    ss_tot = float(np.sum((y_test - y_test.mean()) ** 2))
    return {"mse": mse, "r2": 1.0 - ss_res / ss_tot}


def _savings_data():
    """saving_predictor.py:190-213 — seeded financial features."""
    rng = np.random.RandomState(42)
    n = 400
    income = rng.normal(5000, 2000, n)
    spending = rng.normal(3500, 1500, n)
    savings_rate = np.clip(rng.normal(0.15, 0.1, n), 0.01, 0.5)
    future_savings = (
        income * 0.6
        - spending * 0.4
        + savings_rate * income * 5
        + (income - spending) * 0.3
        + rng.normal(0, 500, n)
    )
    X = np.column_stack([income, spending, savings_rate])
    return X[:320], future_savings[:320], X[320:], future_savings[320:]


def _traffic_data():
    """traffic_predictor.py:196-238 — speeds/counts → congestion [0,1]."""
    rng = np.random.RandomState(42)
    n = 300
    third = n // 3
    avg_speed = np.clip(
        np.concatenate(
            [
                rng.normal(100, 15, third),
                rng.normal(45, 10, third),
                rng.normal(25, 8, n - 2 * third),
            ]
        ),
        5,
        150,
    )
    vehicle_count = np.clip(
        np.concatenate(
            [
                rng.normal(150, 30, third),
                rng.normal(80, 20, third),
                rng.normal(120, 40, n - 2 * third),
            ]
        ),
        0,
        300,
    )
    speed_factor = np.maximum(0, (60 - avg_speed) / 60)
    count_factor = np.minimum(1, vehicle_count / 200)
    congestion = np.clip(
        speed_factor * 0.7 + count_factor * 0.3 + rng.normal(0, 0.1, n), 0, 1
    )
    X = np.column_stack([avg_speed, vehicle_count])
    return X[:240], congestion[:240], X[240:], congestion[240:]


def _graph_index(schema):
    by_sp = {}
    for s, p, o in schema.triples:
        by_sp.setdefault((s, p), []).append(o)
    return by_sp


def test_savings_linear_model_schema_structure():
    X_train, y_train, X_test, y_test = _savings_data()
    model = _ScaledOLS(feature_names=["income", "spending", "savings_rate"])
    model.train(X_train, y_train)
    schema = MLSchema()
    schema.convert_model(
        model,
        X_train,
        y_train,
        X_test,
        y_test,
        feature_names=["income", "spending", "savings_rate"],
        cpu_time_used=0.5,
        model_uri=f"{EX}models/lr_money_predictor.pkl",
        evaluation_function=_eval_regression,
    )
    idx = _graph_index(schema)
    run, model_uri = f"{EX}run1", f"{EX}models/lr_money_predictor.pkl"
    # the MLS spine (mlschema.py:75-130)
    assert model_uri in idx[(run, f"{MLS}hasOutput")]
    assert idx[(model_uri, RDF_TYPE)] == [f"{MLS}Model"]
    assert idx[(f"{EX}implementation1", f"{MLS}implements")] == [
        f"{EX}algorithm/_ScaledOLS"
    ]
    assert f"{EX}algorithm/_ScaledOLS" in idx[(run, f"{MLS}realizes")]
    assert f"{EX}data/training" in idx[(run, f"{MLS}hasInput")]
    assert idx[(f"{EX}task1", f"{MLS}definedOn")] == [
        f"{EX}data/training",
        f"{EX}evalspec1",
    ]
    # hyperparameter + setting
    assert idx[(f"{EX}hyperparameter/fit_intercept", RDFS_LABEL)] == ["fit_intercept"]
    settings = [
        s
        for (s, p), os_ in idx.items()
        if p == f"{MLS}specifiedBy" and f"{EX}hyperparameter/fit_intercept" in os_
    ]
    assert len(settings) == 1 and idx[(settings[0], f"{MLS}hasValue")] == ["True"]
    # dataset characteristics carry the real shapes
    labels = {
        (s, tuple(idx[(s, f"{MLS}hasValue")]))
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and os_ == ["Number of Instances"]
    }
    assert {v[0] for _, v in labels} == {"320", "80"}
    # per-feature coefficients + intercept + parameter count
    coef_labels = [
        os_[0]
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and os_[0].startswith("Coefficient for class Class 0")
    ]
    assert sorted(coef_labels) == [
        "Coefficient for class Class 0, feature income",
        "Coefficient for class Class 0, feature savings_rate",
        "Coefficient for class Class 0, feature spending",
    ]
    n_params = [
        idx[(s, f"{MLS}hasValue")][0]
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and os_ == ["Number of Parameters"]
    ]
    assert n_params == ["4"]  # 3 coefficients + 1 intercept
    # evaluation measures: mse + r2 as numbered ModelEvaluations
    assert f"{EX}modelEvaluation1" in idx[(run, f"{MLS}hasOutput")]
    metrics = _eval_regression(model, X_test, y_test)
    got_mse = float(idx[(f"{EX}modelEvaluation1", f"{MLS}hasValue")][0])
    got_r2 = float(idx[(f"{EX}modelEvaluation2", f"{MLS}hasValue")][0])
    assert got_mse == pytest.approx(metrics["mse"])
    assert got_r2 == pytest.approx(metrics["r2"]) and got_r2 > 0.9
    # CPU time quality on the run
    assert any(
        p == f"{MLS}hasQuality" and s == run for (s, p) in idx
    )


def test_traffic_models_clip_and_tree_importances():
    X_train, y_train, X_test, y_test = _traffic_data()
    lr = _ClippedOLS(feature_names=["avgSpeed", "vehicleCount"])
    lr.train(X_train, y_train)
    assert float(lr.predict(X_test).min()) >= 0.0
    assert float(lr.predict(X_test).max()) <= 1.0

    rf = _ToyForest(feature_names=["avgSpeed", "vehicleCount"])
    rf.train(X_train, y_train)
    schema = MLSchema()
    schema.convert_model(
        rf,
        X_train,
        y_train,
        X_test,
        y_test,
        feature_names=["avgSpeed", "vehicleCount"],
        model_uri=f"{EX}models/rf_congestion_predictor.pkl",
        evaluation_function=_eval_regression,
    )
    idx = _graph_index(schema)
    imp_labels = sorted(
        os_[0]
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and os_[0].startswith("Feature importance")
    )
    assert imp_labels == [
        "Feature importance for avgSpeed",
        "Feature importance for vehicleCount",
    ]
    # importances sum to 1 in the graph's lexical values
    values = [
        float(idx[(s, f"{MLS}hasValue")][0])
        for (s, p), os_ in idx.items()
        if p == RDFS_LABEL and os_[0].startswith("Feature importance")
    ]
    assert sum(values) == pytest.approx(1.0)
    # both hyperparameters present
    assert idx[(f"{EX}hyperparameter/n_estimators", RDF_TYPE)] == [
        f"{MLS}HyperParameter"
    ]
    assert idx[(f"{EX}hyperparameter/max_depth", RDF_TYPE)] == [f"{MLS}HyperParameter"]


def test_schema_turtle_roundtrip_and_sparql(spark):
    """serialize('turtle') → engine Turtle parser → SPARQL over the
    metadata runs on the distributed engine (reference queries rdflib)."""
    X_train, y_train, X_test, y_test = _savings_data()
    model = _ScaledOLS(feature_names=["income", "spending", "savings_rate"])
    model.train(X_train, y_train)
    schema = MLSchema()
    schema.convert_model(
        model,
        X_train,
        y_train,
        X_test,
        y_test,
        feature_names=["income", "spending", "savings_rate"],
        evaluation_function=_eval_regression,
    )
    ttl = schema.serialize(format="turtle")
    assert "@prefix mls:" in ttl

    import kolibrie_spark.compat as kolibrie

    db = kolibrie.SparqlDatabase(spark)
    db.parse_turtle(ttl)
    got = {
        (r[0], r[1], r[2])
        for r in db.query().get_results()
    }
    assert got == set(schema.triples)

    # SPARQL directly on the schema: metric label + value per evaluation
    rows = schema.query(
        f"""PREFIX mls: <{MLS}>
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?label ?value WHERE {{
          <{EX}run1> mls:hasOutput ?ev .
          ?ev mls:specifiedBy ?measure .
          ?measure rdfs:label ?label .
          ?ev mls:hasValue ?value
        }}""",
        spark=spark,
    )
    metrics = {label: float(value) for label, value in rows}
    want = _eval_regression(model, X_test, y_test)
    assert metrics["mse"] == pytest.approx(want["mse"])
    assert metrics["r2"] == pytest.approx(want["r2"])

    # n-triples serialization parses back to the same graph too
    nt = schema.serialize(format="ntriples")
    assert nt.count("\n") >= len(schema.triples) - 1
    with pytest.raises(ValueError):
        schema.serialize(format="json-ld")
