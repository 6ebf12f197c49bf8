"""ML surface: ML.PREDICT over sub-selects and neural-relation
materialization (reference kolibrie/src/neural_relations.rs,
execute_ml_train.rs; grammar parser.rs:2219-2580)."""

from kolibrie_spark.ml.predict import MLPredict, parse_ml_predict, run_ml_predict
from kolibrie_spark.ml.neural import NeuralRelation, TinyMLP

__all__ = [
    "MLPredict",
    "parse_ml_predict",
    "run_ml_predict",
    "NeuralRelation",
    "TinyMLP",
]
