"""Drop-in compatibility layer mirroring the reference's Python bindings
(`import kolibrie` → `import kolibrie_spark.compat as kolibrie`), so a
user of the reference can run their existing scripts against this engine
unchanged.  Mirrors the surface of python/src/lib.rs +
py_query_builder.rs + py_knowledge_graph.rs: ``SparqlDatabase`` (triples,
Turtle/file loading, SPARQL query/update, fluent ``query()`` builder with
the streaming variant), ``KnowledgeGraph`` (ABox + datalog rules with the
reference's integer-interned ``Term.Constant`` convention, constraints,
repairs, backward chaining), and the ``Rule`` / ``TriplePattern`` /
``Term`` / ``StreamOperator`` value types the examples construct.

The reference interns every term to a u64 through its dictionary and its
Python examples pass ``Term.Constant(graph.encode_term("hasParent"))``;
this layer keeps a bidirectional interning table so those integer
constants round-trip while the Spark engine itself stays string-keyed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kolibrie_spark.reasoner.rule import FilterCondition
from kolibrie_spark.reasoner.rule import Rule as _EngineRule
from kolibrie_spark.sparql import ast


# --------------------------------------------------------------- value types
class _Variable:
    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return f"Term.Variable({self.name!r})"


class _Constant:
    def __init__(self, value):
        self.value = value

    def __repr__(self):
        return f"Term.Constant({self.value!r})"


class Term:
    """``Term.Variable("X")`` / ``Term.Constant(id_or_string)`` — the
    reference's datalog term constructors."""

    Variable = _Variable
    Constant = _Constant


class TriplePattern:
    def __init__(self, subject=None, predicate=None, object=None, **kw):
        # the examples use both positional and keyword ("object=") forms
        self.subject = subject if subject is not None else kw.get("subject")
        self.predicate = predicate if predicate is not None else kw.get("predicate")
        self.object = object if object is not None else kw.get("object")


class Rule:
    def __init__(self, premise, conclusion, filters=None):
        self.premise = list(premise)
        self.conclusion = list(conclusion)
        self.filters = list(filters or [])


class StreamOperator:
    RSTREAM = "RSTREAM"
    ISTREAM = "ISTREAM"
    DSTREAM = "DSTREAM"


# the reference module also exposes the Tick enum
# (py_query_builder.rs:211-217, lib.rs m.add_class::<PyTick>())
from kolibrie_spark.streaming.s2r import Tick  # noqa: E402

Tick.TimeDriven = Tick.TIME_DRIVEN
Tick.TupleDriven = Tick.TUPLE_DRIVEN
Tick.BatchDriven = Tick.BATCH_DRIVEN

# PeriodicReportStrategy(period).period (py_query_builder.rs:192-209) —
# same object the engine's S2R layer consumes
from kolibrie_spark.streaming.s2r import Periodic as PeriodicReportStrategy  # noqa: E402


class SortDirection:
    """py_query_builder.rs:180-190 enum."""

    Ascending = "Ascending"
    Descending = "Descending"


def _session() -> SparkSession:
    return (
        SparkSession.builder.master("local[*]")
        .appName("kolibrie-compat")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# ------------------------------------------------------------ SparqlDatabase
class SparqlDatabase:
    """Reference ``kolibrie.SparqlDatabase``: triple store + SPARQL text
    query/update + the fluent builder (py_query_builder.rs:52-150)."""

    def __init__(self, spark: SparkSession | None = None):
        from kolibrie_spark.engine import SparqlEngine
        from kolibrie_spark.store import QuadStore

        self.spark = spark or _session()
        self.store = QuadStore(self.spark)
        self.engine = SparqlEngine(self.spark, self.store)

    # ------------------------------------------------------------- loading
    def add_triple(self, subject: str, predicate: str, object: str) -> None:
        self.store.add_quads([(subject, predicate, object, None)])

    def parse_turtle(self, turtle: str) -> None:
        from kolibrie_spark.rdfio import parse_into

        parse_into(self.store, turtle, fmt="turtle")

    def load_file(self, path, format: str | None = None) -> None:
        import os

        from kolibrie_spark.rdfio import load_into

        load_into(self.store, os.fspath(path), fmt=format)

    # ------------------------------------------------------------ querying
    def exec_query(self, query: str) -> list[list[str]]:
        """Rows of projected values as strings — the reference's
        ``execute_query_rayon_parallel2_volcano`` result shape."""
        rows = self.engine.execute(query)
        out = []
        for r in rows:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            out.append(["" if v is None else str(v) for v in d.values()])
        return out

    def update(self, update: str) -> None:
        self.engine.update(update)

    def handle_update(self, update: str) -> str:
        """Legacy status-string contract (sparql_database.rs:2047-2063),
        including the standalone ``INSERT { s p o }`` data alias."""
        return self.engine.handle_update(update)

    def query(self):
        from kolibrie_spark.builder import QueryBuilder

        return QueryBuilder(self.store)

    def register(self, name: str, fn) -> None:
        self.engine.register_udf(name, fn)


# ------------------------------------------------------------ KnowledgeGraph
class KnowledgeGraph:
    """Reference ``kolibrie.KnowledgeGraph`` (py_knowledge_graph.rs):
    ABox facts + datalog rules over integer-interned terms."""

    def __init__(self, spark: SparkSession | None = None):
        from kolibrie_spark.reasoner import Reasoner

        self.spark = spark or _session()
        self.reasoner = Reasoner(self.spark)
        self._encode: dict[str, int] = {}
        self._decode: dict[int, str] = {}
        self._base: set[tuple[str, str, str]] = set()

    # ----------------------------------------------------------- interning
    def encode_term(self, term: str) -> int:
        if term not in self._encode:
            idx = len(self._encode) + 1  # 0 stays free for dummy triples
            self._encode[term] = idx
            self._decode[idx] = term
        return self._encode[term]

    def convert_term(self, term: str) -> int:
        return self.encode_term(term)

    def convert_term_back(self, idx: int) -> str:
        return self._decode.get(idx, str(idx))

    def _term(self, t):
        if isinstance(t, _Variable):
            return ast.Var(t.name)
        if isinstance(t, _Constant):
            v = t.value
            return ast.Iri(self._decode.get(v, str(v)) if isinstance(v, int) else str(v))
        if isinstance(t, str):
            return ast.Iri(t)
        raise TypeError(f"unsupported term {t!r}")

    def _rule(self, rule: Rule) -> _EngineRule:
        def pat(p: TriplePattern) -> ast.TriplePattern:
            return ast.TriplePattern(
                self._term(p.subject), self._term(p.predicate), self._term(p.object)
            )

        return _EngineRule(
            premise=[pat(p) for p in rule.premise],
            conclusion=[pat(c) for c in rule.conclusion],
            filters=[
                f if isinstance(f, FilterCondition) else FilterCondition(*f)
                for f in rule.filters
            ],
        )

    # --------------------------------------------------------------- facts
    def add_abox_triple(self, s: str, p: str, o: str) -> None:
        for t in (s, p, o):
            self.encode_term(t)
        self._base.add((s, p, o))
        self.reasoner.add_triples([(s, p, o)])

    def query_abox(self, subject=None, predicate=None, object=None):
        return self.reasoner.query_abox(subject, predicate, object)

    # --------------------------------------------------------------- rules
    def add_rule(self, rule: Rule) -> None:
        self.reasoner.add_rule(self._rule(rule))

    def add_constraint(self, rule: Rule) -> None:
        self.reasoner.add_constraint(self._rule(rule))

    def _new_facts(self, facts_df) -> list[tuple[str, str, str]]:
        all_facts = {(r.s, r.p, r.o) for r in facts_df.collect()}
        return sorted(all_facts - self._base)

    def infer_new_facts(self) -> list[tuple[str, str, str]]:
        return self._new_facts(self.reasoner.materialize_naive())

    def infer_new_facts_semi_naive(self) -> list[tuple[str, str, str]]:
        return self._new_facts(self.reasoner.materialize())

    def infer_new_facts_semi_naive_with_repairs(self):
        return self._new_facts(self.reasoner.materialize_with_repairs())

    def query_with_repairs(self, pattern: TriplePattern):
        return self.reasoner.query_with_repairs(
            ast.TriplePattern(
                self._term(pattern.subject),
                self._term(pattern.predicate),
                self._term(pattern.object),
            )
        )

    def backward_chaining(self, pattern: TriplePattern):
        return self.reasoner.backward_chain(
            ast.TriplePattern(
                self._term(pattern.subject),
                self._term(pattern.predicate),
                self._term(pattern.object),
            )
        )
