"""SPARQL Update execution (the reference's six forms).

Reference: execute_query.rs:523-884 — INSERT DATA, DELETE DATA,
INSERT…WHERE, DELETE…WHERE, DELETE…INSERT…WHERE, DELETE WHERE. The WHERE
clause is evaluated once against the pre-mutation store; deletions apply
before insertions; blank-node labels in INSERT templates allocate a fresh
blank node per solution (execute_query.rs:854-865); instantiated quads with
unbound variables are skipped (RDF legality of the instantiated term set).

Spark shape: WHERE → bindings DataFrame (the same compiler as SELECT), each
template quad → a select over the bindings, delete set applied with EXCEPT
(set semantics — the reference's index is a hash set), insert set with
union+distinct. The store swap cuts lineage via localCheckpoint so chained
updates do not stack plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark import rdfstar
from kolibrie_spark.schema import QUADS_SCHEMA
from kolibrie_spark.sparql import ast
from kolibrie_spark.sparql.compiler import Bindings, Compiler, CompileError, DatasetView


def _collect_quoted(term: ast.Term, acc: list[ast.QuotedTriple]) -> None:
    if isinstance(term, ast.QuotedTriple):
        for t in (term.s, term.p, term.o):
            _collect_quoted(t, acc)
        acc.append(term)


def _register_ground_quoted(compiler: Compiler, terms) -> None:
    """Ground quoted triples used as terms must exist in the surrogate table
    (the reference interns them in its QuotedTripleStore on parse)."""
    acc: list[ast.QuotedTriple] = []
    for t in terms:
        _collect_quoted(t, acc)
    rows = []
    for qt in acc:
        s, p, o = (compiler._ground_term_value(x) for x in (qt.s, qt.p, qt.o))
        rows.append((s, p, o))
    if rows:
        rdfstar.register_quoted(compiler.store, rows)


def execute_update(store, op: ast.UpdateOp) -> None:
    compiler = Compiler(store)
    spark = store.spark

    if isinstance(op, (ast.InsertData, ast.DeleteData)):
        terms = [t for (s, p, o, _g) in op.quads for t in (s, p, o)]
        _register_ground_quoted(compiler, terms)
        rows = [
            (
                compiler._ground_term_value(s),
                compiler._ground_term_value(p),
                compiler._ground_term_value(o),
                g,
            )
            for (s, p, o, g) in op.quads
        ]
        df = spark.createDataFrame(rows, QUADS_SCHEMA)
        if isinstance(op, ast.InsertData):
            store.insert(df)
        else:
            store.delete(df)
        return

    if isinstance(op, ast.Modify):
        view = DatasetView(store, [], [])
        bindings = compiler.compile_group(op.where, view, active_graph=None)
        # WHERE evaluated once pre-mutation: materialize now
        bdf = bindings.df.localCheckpoint(eager=True)
        bindings = Bindings(bdf, bindings.maybe_null)

        delete_df = _instantiate(compiler, bindings, op.delete_template, fresh_blanks=False)
        insert_df = _instantiate(compiler, bindings, op.insert_template, fresh_blanks=True)
        if delete_df is not None:
            store.delete(delete_df)
        if insert_df is not None:
            store.insert(insert_df)
        return

    raise CompileError(f"unsupported update {op!r}")


def _instantiate(
    compiler: Compiler,
    bindings: Bindings,
    template: list[ast.TemplateQuad],
    fresh_blanks: bool,
) -> DataFrame | None:
    if not template:
        return None
    for tq in template:
        _register_ground_quoted(
            compiler, [t for t in (tq.s, tq.p, tq.o) if not isinstance(t, ast.Var)]
        )
    df = bindings.df
    if fresh_blanks and any(
        isinstance(t, ast.BlankNode)
        for tq in template
        for t in (tq.s, tq.p, tq.o)
    ):
        # one fresh suffix per solution; the same label within a solution
        # maps to the same blank node (execute_query.rs:854-865)
        df = df.withColumn("__sol_id", F.expr("uuid()"))

    parts: list[DataFrame] = []
    for tq in template:
        cols = []
        for pos, term in (("s", tq.s), ("p", tq.p), ("o", tq.o)):
            if isinstance(term, ast.Var):
                if term.name in df.columns:
                    cols.append(F.col(term.name).alias(pos))
                else:
                    cols.append(F.lit(None).cast("string").alias(pos))
            elif isinstance(term, ast.BlankNode) and fresh_blanks:
                cols.append(
                    F.concat(F.lit(f"_:{term.label}_"), F.col("__sol_id")).alias(pos)
                )
            else:
                cols.append(F.lit(compiler._ground_term_value(term)).alias(pos))
        cols.append(F.lit(tq.g).cast("string").alias("g"))
        part = df.select(*cols)
        # instantiations with unbound components are illegal RDF → skipped
        part = part.filter(
            F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()
