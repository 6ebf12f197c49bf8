"""Model metadata as RDF — the reference's MLSchema re-expressed on the
Spark-side store.

Reference: ml/src/mlschema.py (370 LoC) builds an rdflib Graph describing
a trained model with the W3C MLS ontology (http://www.w3.org/ns/mls#):
a Run executes an Implementation of an Algorithm, takes the training /
testing Datasets and HyperParameterSettings as inputs, achieves a Task
defined on an EvaluationSpecification, and outputs the Model plus one
ModelEvaluation per metric; DatasetCharacteristic / ModelCharacteristic /
Quality blank nodes carry shapes, coefficients, importances and CPU time
(mlschema.py:41-364).  The examples (ml/examples/saving_predictor.py:75-103,
traffic_predictor.py) call ``convert_model`` after training and serialize
the graph to Turtle next to the pickled model.

Spark mapping: same graph structure, but triples accumulate as lexical
``(s, p, o)`` rows in the engine's term convention (IRIs plain, literals
as lexical values — datatypes are lexical throughout the engine, compared
numerically-else-lexically), serialized with :mod:`kolibrie_spark.rdfio.
serializers` and queried by loading a :class:`~kolibrie_spark.store.
QuadStore` so SPARQL over model metadata runs on the same distributed
engine as everything else (the reference shells out to rdflib's in-memory
query).  Framework introspection is duck-typed exactly as the reference:
``get_params`` → hyperparameters, ``coef_``/``intercept_`` → linear
characteristics, ``feature_importances_`` → tree characteristics, Keras /
Torch behind import-guards, generic fallback otherwise.
"""

from __future__ import annotations

from typing import Callable, Iterable

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_NAMED_INDIVIDUAL = "http://www.w3.org/2002/07/owl#NamedIndividual"

try:  # framework detection mirrors mlschema.py:16-27
    from torch.nn import Module as _TorchModule  # pragma: no cover
except Exception:  # pragma: no cover - torch not shipped
    _TorchModule = None
try:
    from tensorflow import keras as _keras  # pragma: no cover
except Exception:  # pragma: no cover - tensorflow not shipped
    _keras = None


def _shape(data) -> tuple[int, int]:
    """(instances, features) with numpy duck-typing, list-of-rows fallback."""
    shape = getattr(data, "shape", None)
    if shape is not None:
        return int(shape[0]), int(shape[1]) if len(shape) > 1 else 1
    n = len(data)
    first = data[0] if n else ()
    try:
        width = len(first)
    except TypeError:
        width = 1
    return n, width


def _num(value) -> str:
    """Lexical form for a numeric literal (int stays int-shaped)."""
    f = float(value)
    return str(int(f)) if f.is_integer() and abs(f) < 1e15 else repr(f)


class MLSchema:
    """Accumulate MLS-ontology triples about a trained model.

    API parity with the reference class: ``convert_model(...)``,
    ``serialize(format=...)``, ``query(sparql)``; the graph is also
    exposed as ``triples`` (lexical rows) and ``to_store(spark)``.
    """

    EX = "http://example.org/"
    MLS = "http://www.w3.org/ns/mls#"
    DCTERMS = "http://purl.org/dc/terms/"

    PREFIXES = {
        "ex": EX,
        "mls": MLS,
        "dcterms": DCTERMS,
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "owl": "http://www.w3.org/2002/07/owl#",
    }

    def __init__(self) -> None:
        self.triples: list[tuple[str, str, str]] = []
        self._bnodes = 0
        self.model_eval_counter = 1  # mlschema.py:39 — unique ModelEvaluation ids

    # -- low-level graph ops ------------------------------------------------
    def add(self, s: str, p: str, o: str) -> None:
        self.triples.append((s, p, o))

    def _bnode(self) -> str:
        self._bnodes += 1
        return f"_:mls{self._bnodes}"

    def _mls(self, local: str) -> str:
        return self.MLS + local

    def _ex(self, local: str) -> str:
        return self.EX + local

    # -- conversion (mlschema.py:41-140) -------------------------------------
    def convert_model(
        self,
        model,
        X_train,
        y_train,
        X_test,
        y_test,
        feature_names: list[str] | None = None,
        class_names: list[str] | None = None,
        cpu_time_used: float | None = None,
        model_uri: str | None = None,
        evaluation_function: Callable | None = None,
        evaluation_metrics: list[str] | None = None,
    ) -> None:
        model_uri = model_uri or self._ex("model1")
        run = self._ex("run1")
        self.add(run, RDF_TYPE, self._mls("Run"))
        self.add(run, self._mls("hasOutput"), model_uri)
        self.add(model_uri, RDF_TYPE, self._mls("Model"))

        impl = self._ex("implementation1")
        self.add(impl, RDF_TYPE, self._mls("Implementation"))
        self.add(run, self._mls("executes"), impl)

        algorithm = self._ex(f"algorithm/{type(model).__name__}")
        self.add(algorithm, RDF_TYPE, self._mls("Algorithm"))
        self.add(impl, self._mls("implements"), algorithm)
        self.add(run, self._mls("realizes"), algorithm)

        software_name = (
            model.__module__.split(".")[0] if hasattr(model, "__module__") else "unknown"
        )
        software = self._ex(f"software/{software_name}")
        self.add(software, RDF_TYPE, self._mls("Software"))
        self.add(software, self._mls("hasPart"), impl)

        self._add_hyperparameters(model, impl, run)

        train_data = self._ex("data/training")
        test_data = self._ex("data/testing")
        for d in (train_data, test_data):
            self.add(d, RDF_TYPE, self._mls("Dataset"))
            self.add(run, self._mls("hasInput"), d)
        self._add_dataset_characteristics(train_data, X_train)
        self._add_dataset_characteristics(test_data, X_test)

        task = self._ex("task1")
        self.add(task, RDF_TYPE, self._mls("Task"))
        self.add(run, self._mls("achieves"), task)
        self.add(task, self._mls("definedOn"), train_data)

        eval_spec = self._ex("evalspec1")
        self.add(eval_spec, RDF_TYPE, self._mls("EvaluationSpecification"))
        self.add(task, self._mls("definedOn"), eval_spec)
        self.add(eval_spec, self._mls("defines"), task)

        self._add_evaluation_measures(
            model, X_test, y_test, eval_spec, run, evaluation_function,
            evaluation_metrics, class_names,
        )
        self._add_model_characteristics(model, model_uri, feature_names, class_names)
        if cpu_time_used is not None:
            char = self._bnode()
            self.add(char, RDF_TYPE, self._mls("Quality"))
            self.add(char, RDFS_LABEL, "CPU Time Used")
            self.add(char, self._mls("hasValue"), _num(cpu_time_used))
            self.add(run, self._mls("hasQuality"), char)

    def _add_hyperparameters(self, model, impl: str, run: str) -> None:
        """mlschema.py:142-159 — one HyperParameter + blank
        HyperParameterSetting per ``get_params()`` entry."""
        if not hasattr(model, "get_params"):
            return
        for name, value in model.get_params().items():
            hp = self._ex(f"hyperparameter/{name}")
            self.add(hp, RDF_TYPE, self._mls("HyperParameter"))
            self.add(hp, RDFS_LABEL, name)
            self.add(impl, self._mls("hasHyperParameter"), hp)
            setting = self._bnode()
            self.add(setting, RDF_TYPE, self._mls("HyperParameterSetting"))
            self.add(setting, self._mls("specifiedBy"), hp)
            self.add(setting, self._mls("hasValue"), str(value))
            self.add(run, self._mls("hasInput"), setting)

    def _characteristic(self, owner: str, kind: str, label: str, value: str) -> None:
        char = self._bnode()
        self.add(char, RDF_TYPE, self._mls(kind))
        self.add(char, RDFS_LABEL, label)
        self.add(char, self._mls("hasValue"), value)
        self.add(owner, self._mls("hasQuality"), char)

    def _add_dataset_characteristics(self, data_uri: str, X) -> None:
        """mlschema.py:161-193 — instances / features / bytes / format."""
        n, width = _shape(X)
        size = int(getattr(X, "nbytes", 0))
        self._characteristic(data_uri, "DatasetCharacteristic", "Number of Instances", str(n))
        self._characteristic(data_uri, "DatasetCharacteristic", "Number of Features", str(width))
        self._characteristic(data_uri, "DatasetCharacteristic", "Data Size in Bytes", str(size))
        self._characteristic(data_uri, "DatasetCharacteristic", "Data Format", str(type(X)))

    def _add_evaluation_measures(
        self, model, X_test, y_test, eval_spec, run,
        evaluation_function, evaluation_metrics, class_names,
    ) -> None:
        """mlschema.py:195-227 — user function wins; else the sklearn
        classification-report path (guarded: sklearn is optional here)."""
        if evaluation_function is not None:
            for name, value in evaluation_function(model, X_test, y_test).items():
                self._add_single_evaluation(name, value, eval_spec, run)
            return
        try:
            from sklearn.metrics import classification_report  # pragma: no cover
        except Exception as exc:
            raise ValueError(
                "no evaluation_function given and sklearn is unavailable "
                "for the default classification_report path"
            ) from exc
        report = classification_report(  # pragma: no cover - needs sklearn
            y_test, model.predict(X_test), output_dict=True
        )
        for label, metrics in report.items():  # pragma: no cover
            if label == "accuracy":
                self._add_single_evaluation(
                    "Predictive Accuracy", metrics, eval_spec, run,
                    measure_uri_name="predictiveAccuracy",
                )
            elif label.isdigit() or label in ("macro avg", "weighted avg"):
                ln = label.replace(" ", "_")
                for mname, mval in metrics.items():
                    if isinstance(mval, (int, float)):
                        self._add_single_evaluation(
                            f"{mname} {label}", mval, eval_spec, run,
                            measure_uri_name=f"{mname}_{ln}",
                        )

    def _add_single_evaluation(
        self, metric_name: str, metric_value, eval_spec: str, run: str,
        measure_uri_name: str | None = None,
    ) -> None:
        """mlschema.py:230-248 — EvaluationMeasure + numbered ModelEvaluation."""
        measure = self._ex(measure_uri_name or metric_name.replace(" ", "_"))
        self.add(measure, RDF_TYPE, OWL_NAMED_INDIVIDUAL)
        self.add(measure, RDF_TYPE, self._mls("EvaluationMeasure"))
        self.add(measure, RDFS_LABEL, metric_name)
        self.add(eval_spec, self._mls("hasPart"), measure)
        ev = self._ex(f"modelEvaluation{self.model_eval_counter}")
        self.model_eval_counter += 1
        self.add(ev, RDF_TYPE, OWL_NAMED_INDIVIDUAL)
        self.add(ev, RDF_TYPE, self._mls("ModelEvaluation"))
        self.add(ev, self._mls("specifiedBy"), measure)
        self.add(ev, self._mls("hasValue"), _num(metric_value))
        self.add(run, self._mls("hasOutput"), ev)

    def _add_model_characteristics(self, model, model_uri, feature_names, class_names):
        """mlschema.py:250-357 — linear / tree / keras / torch / generic."""
        if hasattr(model, "coef_"):
            self._add_linear(model, model_uri, feature_names, class_names)
        elif hasattr(model, "feature_importances_"):
            self._add_tree(model, model_uri, feature_names)
        elif _keras is not None and isinstance(model, _keras.Model):  # pragma: no cover
            for i, layer in enumerate(model.layers):
                self._characteristic(
                    model_uri, "ModelCharacteristic",
                    f"Layer {i}: {layer.name} ({type(layer).__name__})",
                    str(int(layer.count_params())),
                )
            self._characteristic(
                model_uri, "ModelCharacteristic", "Number of Parameters",
                str(int(model.count_params())),
            )
        elif _TorchModule is not None and isinstance(model, _TorchModule):  # pragma: no cover
            total = sum(p.numel() for p in model.parameters())
            self._characteristic(
                model_uri, "ModelCharacteristic", "Number of Parameters", str(int(total))
            )
            self._characteristic(
                model_uri, "ModelCharacteristic", "Model Architecture", str(model)
            )
        else:
            self._characteristic(
                model_uri, "ModelCharacteristic", "Generic Model",
                "No specific characteristics extracted",
            )

    def _add_linear(self, model, model_uri, feature_names, class_names) -> None:
        coef = model.coef_
        rows: Iterable
        first = coef[0] if len(coef) else 0.0
        rows = coef if hasattr(first, "__len__") else [coef]
        n_coef = 0
        for ci, vector in enumerate(rows):
            cname = (
                class_names[ci]
                if class_names is not None and ci < len(class_names)
                else f"Class {ci}"
            )
            for fi, value in enumerate(vector):
                fname = (
                    feature_names[fi]
                    if feature_names is not None and fi < len(feature_names)
                    else f"Feature {fi}"
                )
                self._characteristic(
                    model_uri, "ModelCharacteristic",
                    f"Coefficient for class {cname}, feature {fname}", _num(value),
                )
                n_coef += 1
        intercepts = getattr(model, "intercept_", None)
        n_int = 0
        if intercepts is not None:
            if isinstance(intercepts, float):
                intercepts = [intercepts]
            for ci, value in enumerate(intercepts):
                cname = (
                    class_names[ci]
                    if class_names is not None and ci < len(class_names)
                    else f"Class {ci}"
                )
                self._characteristic(
                    model_uri, "ModelCharacteristic",
                    f"Intercept for class {cname}", _num(value),
                )
                n_int += 1
        self._characteristic(
            model_uri, "ModelCharacteristic", "Number of Parameters",
            str(n_coef + max(n_int, 1)),
        )

    def _add_tree(self, model, model_uri, feature_names) -> None:
        importances = model.feature_importances_
        for fi, value in enumerate(importances):
            fname = (
                feature_names[fi]
                if feature_names is not None and fi < len(feature_names)
                else f"Feature {fi}"
            )
            self._characteristic(
                model_uri, "ModelCharacteristic",
                f"Feature importance for {fname}", _num(value),
            )
        self._characteristic(
            model_uri, "ModelCharacteristic", "Number of Parameters",
            str(len(importances)),
        )

    # -- output surfaces ------------------------------------------------------
    def serialize(self, format: str = "turtle") -> str:
        """mlschema.py:366-368 — Turtle by default; also ntriples/rdfxml."""
        from kolibrie_spark.rdfio import serializers as ser

        if format in ("turtle", "ttl"):
            return ser.serialize_turtle(self.triples, prefixes=self.PREFIXES)
        if format in ("nt", "ntriples", "n-triples"):
            return ser.serialize_ntriples(self.triples)
        if format in ("xml", "rdfxml", "rdf/xml"):
            return ser.serialize_rdfxml(self.triples)
        raise ValueError(f"unsupported serialization format: {format}")

    def to_store(self, spark):
        """Load the graph into a distributed QuadStore."""
        from kolibrie_spark.store import QuadStore

        store = QuadStore(spark)
        store.add_quads([(s, p, o, None) for s, p, o in self.triples])
        return store

    def query(self, query_string: str, spark=None):
        """mlschema.py:370-371 — but SPARQL runs on the Spark engine."""
        from kolibrie_spark.engine import SparqlEngine

        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError("pass spark= (no active SparkSession)")
        return SparqlEngine(spark, self.to_store(spark)).execute(query_string)
