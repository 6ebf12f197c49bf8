"""ML surface: ML.PREDICT parsing/execution, neural-relation training and
materialization (reference §2.11 scenarios)."""

import pytest


def seed(engine):
    rows = []
    for i in range(20):
        room = f"ex:room{i}"
        rows += [
            (room, "ex:temp", str(20 + i)),
            (room, "ex:humidity", str(40 + (i % 5))),
            # label: temp + humidity/10 (deterministic linear target)
            (room, "ex:target", str((20 + i) + (40 + (i % 5)) / 10.0)),
        ]
    engine.add_triples(rows)
    return engine


def test_ml_predict_text_form(engine):
    e = seed(engine)
    e.register_model("doubler", lambda X: X.iloc[:, 0] * 2)
    df = e.query(
        'ML.PREDICT(MODEL "doubler", INPUT { '
        "SELECT ?room ?temp WHERE { ?room <ex:temp> ?temp } }, "
        "OUTPUT ?twice)"
    )
    rows = {r.room: r for r in df.collect()}
    assert rows["ex:room0"].twice == pytest.approx(40.0)
    assert rows["ex:room5"].twice == pytest.approx(50.0)
    # non-numeric columns (the room IRI) are carried, not fed to the model
    assert set(df.columns) == {"room", "temp", "twice"}


def test_ml_predict_unknown_model(engine):
    from kolibrie_spark.sparql.compiler import CompileError

    with pytest.raises(CompileError, match="unknown model"):
        engine.ml_predict(
            'ML.PREDICT(MODEL "nope", INPUT { SELECT ?s WHERE { ?s ?p ?o } }, OUTPUT ?x)'
        )


def test_ml_predict_sklearn_style_object(engine):
    e = seed(engine)

    class Model:
        def predict(self, X):
            return X.sum(axis=1)

    e.register_model("summer", Model())
    df = e.ml_predict(
        'ML.PREDICT(MODEL "summer", INPUT { '
        "SELECT ?room ?temp ?hum WHERE { ?room <ex:temp> ?temp . "
        "?room <ex:humidity> ?hum } }, OUTPUT ?score)"
    )
    r = {x.room: x.score for x in df.collect()}
    assert r["ex:room0"] == pytest.approx(60.0)


def test_neural_relation_train_and_materialize(engine):
    """TRAIN NEURAL RELATION: fit on query rows, materialize predictions as
    predicate facts matchable by WHERE patterns (neural_relations.rs:539)."""
    e = seed(engine)
    rel = e.train_neural_relation(
        predicate="ex:predicted",
        data_query=(
            "SELECT ?room ?temp ?hum ?y WHERE { ?room <ex:temp> ?temp . "
            "?room <ex:humidity> ?hum . ?room <ex:target> ?y }"
        ),
        anchor_var="room",
        feature_vars=["temp", "hum"],
        label_var="y",
    )
    # the relation is now ordinary data
    got = e.query(
        "SELECT ?room ?pred WHERE { ?room <ex:predicted> ?pred }"
    ).collect()
    assert len(got) == 20
    preds = {r.room: float(r.pred) for r in got}
    # the linear target is easily fit: predictions land near the truth
    assert preds["ex:room0"] == pytest.approx(24.0, abs=2.0)
    assert preds["ex:room19"] == pytest.approx(43.4, abs=2.0)
    # deterministic across runs
    import numpy as np

    p2 = rel.model.predict(np.array([[20.0, 40.0]]))[0]
    p3 = rel.model.predict(np.array([[20.0, 40.0]]))[0]
    assert p2 == p3
