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


# ---------------- MODEL / NEURAL RELATION / TRAIN query-text grammar
# (reference parser.rs:2219-2503, neural_relations.rs:375-553; scenario
# mirrors examples/sparql_syntax/ml_train/predict_after_train.rs)
def _seed_digit_store(engine):
    for sample, label, x0, x1, x2 in [
        ("s0", "A", "1", "0", "0"),
        ("s1", "A", "1", "0", "0"),
        ("s2", "B", "0", "1", "0"),
        ("s3", "B", "0", "1", "0"),
        ("s4", "C", "0", "0", "1"),
        ("s5", "C", "0", "0", "1"),
    ]:
        engine.add_triples(
            [
                (sample, "http://example.org/x0", x0),
                (sample, "http://example.org/x1", x1),
                (sample, "http://example.org/x2", x2),
                (sample, "http://example.org/gold", label),
            ]
        )


TRAIN_PROGRAM = """
PREFIX ex: <http://example.org/>

MODEL "digit_model" {
    ARCH MLP { HIDDEN [16, 8] }
    OUTPUT EXCLUSIVE { "A", "B", "C" }
}

NEURAL RELATION ex:predictedDigit USING MODEL "digit_model" {
    INPUT {
        ?sample ex:x0 ?x0 .
        ?sample ex:x1 ?x1 .
        ?sample ex:x2 ?x2 .
    }
    FEATURES { ?x0, ?x1, ?x2 }
}

TRAIN NEURAL RELATION ex:predictedDigit {
    DATA { ?sample ex:gold ?label . }
    LABEL ?label
    TARGET { ?sample ex:predictedDigit ?label }
    LOSS cross_entropy
    OPTIMIZER adam
    LEARNING_RATE 0.1
    EPOCHS 80
    BATCH_SIZE 4
}
"""


def test_neural_program_parses_full_grammar():
    from kolibrie_spark.ml.program import parse_neural_program

    prog = parse_neural_program(TRAIN_PROGRAM)
    assert [m.name for m in prog.models] == ["digit_model"]
    assert prog.models[0].hidden_layers == [16, 8]
    assert prog.models[0].labels == ["A", "B", "C"]
    nr = prog.relations[0]
    assert nr.predicate == "http://example.org/predictedDigit"
    assert nr.model_name == "digit_model"
    assert nr.feature_vars == ["x0", "x1", "x2"]
    assert nr.anchor_var == "sample"
    tr = prog.trains[0]
    assert tr.predicate == "http://example.org/predictedDigit"
    assert (tr.label_var, tr.loss, tr.optimizer) == ("?label".lstrip("?"), "cross_entropy", "adam")
    assert (tr.learning_rate, tr.epochs, tr.batch_size) == (0.1, 80, 4)
    assert "ex:predictedDigit" in tr.target_triple


def test_neural_program_train_materializes_and_predicts(engine):
    """execute_query accepts the full TRAIN script, materializes the
    relation as predicate facts, then answers a top-level ML.PREDICT."""
    _seed_digit_store(engine)
    assert engine.execute_query(TRAIN_PROGRAM) is None
    got = dict(
        engine.execute(
            "SELECT ?s ?l WHERE { ?s <http://example.org/predictedDigit> ?l }"
        )
    )
    assert got == {
        "s0": "A", "s1": "A", "s2": "B", "s3": "B", "s4": "C", "s5": "C",
    }
    predict = """
PREFIX ex: <http://example.org/>
ML.PREDICT(MODEL "digit_model",
    INPUT {
        SELECT ?sample ?x0 ?x1 ?x2
        WHERE {
            ?sample ex:x0 ?x0 .
            ?sample ex:x1 ?x1 .
            ?sample ex:x2 ?x2 .
            FILTER (?x0 > 0)
        }
    },
    OUTPUT ?label
)
"""
    rows = engine.execute_query(predict).collect()
    assert {(r.sample, r.label) for r in rows} == {("s0", "A"), ("s1", "A")}


def test_neural_program_binary_output_materializes_positives_only(engine):
    for sample, hot, x in [
        ("m0", "hot", "5"), ("m1", "hot", "6"), ("m2", "cold", "0"),
        ("m3", "cold", "1"), ("m4", "hot", "7"), ("m5", "cold", "0"),
    ]:
        engine.add_triples(
            [
                (sample, "http://example.org/temp", x),
                (sample, "http://example.org/goldTag", hot),
            ]
        )
    program = """
PREFIX ex: <http://example.org/>
MODEL "hot_model" {
    ARCH MLP { HIDDEN [8] }
    OUTPUT BINARY { "hot" }
}
NEURAL RELATION ex:isHot USING MODEL "hot_model" {
    INPUT { ?m ex:temp ?t . }
    FEATURES { ?t }
}
TRAIN NEURAL RELATION ex:isHot {
    DATA { ?m ex:goldTag ?g . }
    LABEL ?g
    TARGET { ?m ex:isHot ?g }
    LOSS cross_entropy
    OPTIMIZER adam
    LEARNING_RATE 0.2
    EPOCHS 200
    BATCH_SIZE 6
}
"""
    engine.execute_query(program)
    got = engine.execute("SELECT ?s ?l WHERE { ?s <http://example.org/isHot> ?l }")
    assert sorted(r[0] for r in got) == ["m0", "m1", "m4"]
    assert {r[1] for r in got} == {"hot"}


def test_neural_program_save_to(engine, tmp_path):
    import numpy as np

    _seed_digit_store(engine)
    path = str(tmp_path / "digit.npz")
    engine.execute_query(
        TRAIN_PROGRAM.replace(
            "    BATCH_SIZE 4\n", f'    BATCH_SIZE 4\n    SAVE_TO "{path}"\n'
        )
    )
    saved = np.load(path)
    assert "w0" in saved and "mu" in saved


def test_neural_program_rejects_garbage_tail():
    from kolibrie_spark.ml.program import parse_neural_program

    with pytest.raises(ValueError, match="only MODEL"):
        parse_neural_program(
            'MODEL "m" { ARCH MLP { HIDDEN [4] } OUTPUT BINARY { "x" } } SELECT ?s'
        )


def test_output_labels_tokenized_not_comma_split():
    """ADVICE r7: a quoted label containing a comma ('"a,b"') must stay
    one label; <IRI> and bare tokens mix freely in the same list."""
    from kolibrie_spark.ml.program import _parse_model_decl

    decl, _ = _parse_model_decl(
        'MODEL "m" { ARCH MLP { HIDDEN [4] } '
        'OUTPUT EXCLUSIVE { "a,b", <http://ex.org/c>, bare } }'
    )
    assert decl.labels == ["a,b", "http://ex.org/c", "bare"]
