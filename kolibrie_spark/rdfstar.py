"""RDF-star (quoted triples) on the surrogate-key plan.

Reference model: terms with bit 31 set index a QuotedTripleStore holding
(s,p,o) <-> id, arbitrarily nested (shared/src/quoted_triple_store.rs:14-33).
Here a quoted triple is a row of the ``quoted_triples(qid, qs, qp, qo)``
DataFrame, with ``qid`` a deterministic sha2-based content hash ("qt:" +
32 hex chars). The same (s,p,o) hashes to the same id on every executor, so
TRIPLE(...) construction needs no coordination, and identity joins work
across datasets — matching the reference's same-triple-same-id semantics.

Builtins (reference engine.rs:508-577 for BIND, types.rs:444-456 for FILTER):
- TRIPLE(s,p,o)  -> the quoted id (pure column expression, sha2)
- SUBJECT/PREDICATE/OBJECT(?t) -> component lookup (broadcast-friendly join
  against the surrogate table)
- isTRIPLE(?t)   -> prefix test on the id
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.schema import QT_PREFIX
from kolibrie_spark.sparql import ast

SEP = "\x00"


def qt_id(s: str, p: str, o: str) -> str:
    h = hashlib.sha256(f"{s}{SEP}{p}{SEP}{o}".encode()).hexdigest()[:32]
    return QT_PREFIX + h


def qt_id_col(s: Column, p: Column, o: Column) -> Column:
    """Column-expression twin of :func:`qt_id` — must stay bit-identical."""
    return F.concat(
        F.lit(QT_PREFIX),
        F.substring(F.sha2(F.concat_ws(SEP, s, p, o), 256), 1, 32),
    )


def is_qt_col(c: Column) -> Column:
    return c.startswith(QT_PREFIX)


def ground_quoted_id(compiler, qt: ast.QuotedTriple) -> str:
    """Recursive id for a fully-ground quoted-triple term in a query."""
    parts = []
    for t in (qt.s, qt.p, qt.o):
        if isinstance(t, ast.QuotedTriple):
            parts.append(ground_quoted_id(compiler, t))
        else:
            parts.append(compiler._ground_term_value(t))
    return qt_id(*parts)


def register_quoted(store, qt_rows: list[tuple[str, str, str]]) -> list[str]:
    """Add quoted triples (already-flattened lexical s,p,o) to the surrogate
    table; returns their qids."""
    rows = [(qt_id(s, p, o), s, p, o) for (s, p, o) in qt_rows]
    if rows:
        store.add_quoted(rows)
    return [r[0] for r in rows]


def match_quoted(compiler, bindings, id_col: str, qt: ast.QuotedTriple):
    """Join ``bindings`` (whose ``id_col`` holds quoted ids) against the
    surrogate table, destructuring ``qt``'s components: constants filter,
    variables bind, nested quoted triples recurse. Returns new Bindings
    without ``id_col``.

    The quoted table is typically small relative to the quad set; Spark's
    AQE will broadcast it. At 100 TB the surrogate table is still tiny
    compared to quads (only annotated facts live there)."""
    from kolibrie_spark.sparql.compiler import Bindings

    q = compiler.store.quoted
    sel: list[Column] = [F.col("qid")]
    conds: list[Column] = []
    nested: list[tuple[str, ast.QuotedTriple]] = []
    seen: dict[str, str] = {}
    for pos, term in (("qs", qt.s), ("qp", qt.p), ("qo", qt.o)):
        if isinstance(term, ast.Var):
            if term.name in seen:
                conds.append(F.col(pos) == F.col(seen[term.name]))
            else:
                seen[term.name] = pos
                sel.append(F.col(pos).alias(term.name))
        elif isinstance(term, ast.QuotedTriple):
            tmp = f"__qt_{pos}"
            nested.append((tmp, term))
            sel.append(F.col(pos).alias(tmp))
        else:
            conds.append(F.col(pos) == F.lit(compiler._ground_term_value(term)))
    for c in conds:
        q = q.filter(c)
    q = q.select(*sel)

    joined = bindings.df.join(q, on=bindings.df[id_col] == q["qid"], how="inner")
    out_cols = [c for c in bindings.df.columns if c != id_col] + [
        c for c in q.columns if c != "qid"
    ]
    df = joined.select(*[F.col(c) for c in dict.fromkeys(out_cols)])
    b = Bindings(df, bindings.maybe_null)
    for tmp, sub_qt in nested:
        b = match_quoted(compiler, b, tmp, sub_qt)
    return b


def bind_component(compiler, bindings, arg_col: str, component: str, out_var: str):
    """BIND(SUBJECT(?t) AS ?v) and friends: left-join the surrogate table.

    Non-quoted inputs bind "" (the reference decodes a failed lookup to an
    empty string at projection time)."""
    from kolibrie_spark.sparql.compiler import Bindings

    comp = {"SUBJECT": "qs", "PREDICATE": "qp", "OBJECT": "qo"}[component]
    q = compiler.store.quoted.select(
        F.col("qid").alias("__qt_lookup"), F.col(comp).alias(out_var)
    )
    df = bindings.df.join(
        q, on=bindings.df[arg_col] == q["__qt_lookup"], how="left"
    ).drop("__qt_lookup")
    return Bindings(df, bindings.maybe_null | {out_var})
