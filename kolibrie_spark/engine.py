"""SparqlEngine — the top-level facade (reference: SparqlDatabase +
QueryEngine, kolibrie/src/sparql_database.rs:172-188 and query_engine.rs:22-163).

Usage::

    engine = SparqlEngine(spark)
    engine.add_triples([("ex:alice", "ex:age", "25")])
    df = engine.query("SELECT ?s WHERE { ?s <ex:age> ?a . FILTER(?a > 20) }")
    rows = engine.execute(...)   # list[list[str]], reference exec_query shape
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from kolibrie_spark.sparql import ast
from kolibrie_spark.sparql.compiler import Compiler, CompileError
from kolibrie_spark.sparql.parser import parse_query
from kolibrie_spark.sparql.update import execute_update
from kolibrie_spark.store import QuadStore


class SparqlEngine:
    def __init__(self, spark: SparkSession, store: QuadStore | None = None):
        self.spark = spark
        self.store = store if store is not None else QuadStore(spark)

    # ------------------------------------------------------------ loading
    def add_triples(self, rows: list[tuple]) -> None:
        """rows of (s,p,o) or (s,p,o,g)."""
        self.store.add_quads(rows)

    def load_file(self, path: str, fmt: str | None = None) -> None:
        from kolibrie_spark import rdfio

        rdfio.load_into(self.store, path, fmt=fmt)

    def parse_data(self, text: str, fmt: str = "turtle") -> None:
        from kolibrie_spark import rdfio

        rdfio.parse_into(self.store, text, fmt=fmt)

    # ------------------------------------------------------------ queries
    def query(self, text: str) -> DataFrame:
        """SPARQL SELECT → DataFrame (lazy; caller collects)."""
        q = parse_query(text)
        if q.select is None:
            raise CompileError("not a SELECT query — use update()")
        return Compiler(self.store).compile_select(q.select)

    def update(self, text: str) -> None:
        q = parse_query(text)
        if q.update is None:
            raise CompileError("not an update — use query()")
        execute_update(self.store, q.update)

    def execute(self, text: str) -> list[list[str]]:
        """Parse + run; SELECT returns rows of strings (reference
        exec_query shape, python/src/py_query_builder.rs:59-136)."""
        q = parse_query(text)
        if q.update is not None:
            execute_update(self.store, q.update)
            return []
        df = Compiler(self.store).compile_select(q.select)
        return [
            ["" if v is None else str(v) for v in row]
            for row in df.collect()
        ]

    def explain(self, text: str) -> str:
        """Our plan + Spark's formatted physical plan (reference
        QueryEngine::explain, query_engine.rs:86-116)."""
        q = parse_query(text)
        if q.select is None:
            return "<update>"
        df = Compiler(self.store).compile_select(q.select)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # --------------------------------------------------------------- UDFs
    def register_udf(self, name: str, fn) -> None:
        """string→string closure callable from BIND (reference
        sparql_database.rs:2130-2135)."""
        self.store.udfs[name] = F.udf(fn, StringType())

    # --------------------------------------------------------------- misc
    def triple_count(self) -> int:
        return self.store.triple_count()

    def builder(self):
        from kolibrie_spark.builder import QueryBuilder

        return QueryBuilder(self.store)
