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

from dataclasses import dataclass

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


@dataclass
class UpdateSummary:
    """Actually-changed quad counts (reference execute_query.rs:41-43,
    868-884 — inserts that were new, deletes that existed)."""

    inserted_quads: int = 0
    deleted_quads: int = 0


def execute_update(
    store, op: ast.UpdateOp, with_summary: bool = False
) -> UpdateSummary | None:
    """Apply ``op``.  With ``with_summary`` the store is counted around
    each mutation (set semantics make the count delta exactly the
    reference's changed-quad tally); the default skips those jobs."""
    compiler = Compiler(store)
    spark = store.spark
    before = store.triple_count() if with_summary else 0

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
            if with_summary:
                return UpdateSummary(inserted_quads=store.triple_count() - before)
        else:
            store.delete(df)
            if with_summary:
                return UpdateSummary(deleted_quads=before - store.triple_count())
        return None

    if isinstance(op, ast.Modify):
        view = DatasetView(store, [], [])
        bindings = compiler.compile_group(op.where, view, active_graph=None)
        # WHERE evaluated once pre-mutation: materialize now
        bdf = bindings.df.localCheckpoint(eager=True)
        bindings = Bindings(bdf, bindings.maybe_null)

        delete_df, _del_quoted = _instantiate(
            compiler, bindings, op.delete_template, fresh_blanks=False
        )
        insert_df, ins_quoted = _instantiate(
            compiler, bindings, op.insert_template, fresh_blanks=True
        )
        if delete_df is not None:
            store.delete(delete_df)
        after_delete = store.triple_count() if with_summary else 0
        if ins_quoted is not None:
            store.insert_quoted(ins_quoted)
        if insert_df is not None:
            store.insert(insert_df)
        if with_summary:
            return UpdateSummary(
                inserted_quads=store.triple_count() - after_delete,
                deleted_quads=before - after_delete,
            )
        return None

    raise CompileError(f"unsupported update {op!r}")


def _template_term_col(
    compiler: Compiler,
    df: DataFrame,
    term: ast.Term,
    fresh_blanks: bool,
    quoted_parts: list[DataFrame],
):
    """Column expression instantiating a template term per solution row.

    Quoted triples (possibly nested, possibly containing variables) become
    their deterministic surrogate id, and the corresponding
    (qid, qs, qp, qo) rows are accumulated for insertion into the surrogate
    table — per-solution annotation like
    ``INSERT { << ?s :p ?o >> :certainty "0.9" } WHERE {...}``."""
    if isinstance(term, ast.Var):
        if term.name in df.columns:
            return F.col(term.name)
        return F.lit(None).cast("string")
    if isinstance(term, ast.BlankNode) and fresh_blanks:
        return F.concat(F.lit(f"_:{term.label}_"), F.col("__sol_id"))
    if isinstance(term, ast.QuotedTriple):
        s = _template_term_col(compiler, df, term.s, fresh_blanks, quoted_parts)
        p = _template_term_col(compiler, df, term.p, fresh_blanks, quoted_parts)
        o = _template_term_col(compiler, df, term.o, fresh_blanks, quoted_parts)
        qid = rdfstar.qt_id_col(s, p, o)
        quoted_parts.append(
            df.select(
                qid.alias("qid"), s.alias("qs"), p.alias("qp"), o.alias("qo")
            ).filter(
                F.col("qs").isNotNull()
                & F.col("qp").isNotNull()
                & F.col("qo").isNotNull()
            )
        )
        return qid
    return F.lit(compiler._ground_term_value(term))


def _instantiate(
    compiler: Compiler,
    bindings: Bindings,
    template: list[ast.TemplateQuad],
    fresh_blanks: bool,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Returns (quads_df, quoted_rows_df)."""
    if not template:
        return None, None
    df = bindings.df
    if fresh_blanks and any(
        isinstance(t, ast.BlankNode)
        for tq in template
        for t in (tq.s, tq.p, tq.o)
    ):
        # one fresh suffix per solution; the same label within a solution
        # maps to the same blank node (execute_query.rs:854-865). The ids
        # are materialized once — template quads reference __sol_id from
        # separate selects, and a nondeterministic uuid() must not be
        # re-evaluated per branch under re-optimization/AQE.
        df = df.withColumn("__sol_id", F.expr("uuid()")).localCheckpoint(eager=True)

    parts: list[DataFrame] = []
    quoted_parts: list[DataFrame] = []
    for tq in template:
        cols = []
        for pos, term in (("s", tq.s), ("p", tq.p), ("o", tq.o)):
            col = _template_term_col(compiler, df, term, fresh_blanks, quoted_parts)
            cols.append(col.cast("string").alias(pos))
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
    quoted = None
    if quoted_parts:
        quoted = quoted_parts[0]
        for p in quoted_parts[1:]:
            quoted = quoted.unionByName(p)
        quoted = quoted.dropDuplicates()
    return out.dropDuplicates(), quoted
