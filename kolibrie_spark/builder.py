"""Fluent QueryBuilder — the reference's Python API skin
(python/src/py_query_builder.rs:59-136, 592-660; kolibrie/src/
query_builder.rs:153-758): each ``with_*`` narrows the triple set, ``get_*``
executes. The streaming variant spawns a C-SPARQL window and re-applies the
same recorded operation chain to each firing's content.

Spark shape: the builder records a chain of DataFrame transformations;
every ``with_*`` is a ``.filter`` (pushed down by Catalyst), ``join_on_*``
a semi-join, and ``get_results`` the only action.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark import compare
from kolibrie_spark.store import QuadStore
from kolibrie_spark.streaming.r2s import make_r2s
from kolibrie_spark.streaming.s2r import CSparqlWindow, Periodic, ReportStrategy, Tick


class QueryBuilder:
    def __init__(self, store: QuadStore):
        self.store = store
        self._ops: list[Callable[[DataFrame], DataFrame]] = []
        self._distinct = False
        self._order: list[tuple[str, bool]] = []
        self._direction: bool | None = None  # asc()/desc() override
        self._limit: int | None = None
        self._offset: int | None = None
        self._window: tuple[int, int] | None = None
        self._report: list = []
        self._stream_op = "RSTREAM"
        self._tick = Tick.TIME_DRIVEN

    def _op(self, fn: Callable[[DataFrame], DataFrame]) -> "QueryBuilder":
        self._ops.append(fn)
        return self

    # ------------------------------------------------------------- filters
    def with_subject(self, s: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("s") == s))

    def with_predicate(self, p: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("p") == p))

    def with_object(self, o: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("o") == o))

    def with_subject_like(self, sub: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("s").contains(sub)))

    def with_subject_starting(self, prefix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("s").startswith(prefix)))

    def with_subject_ending(self, suffix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("s").endswith(suffix)))

    def with_predicate_like(self, sub: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("p").contains(sub)))

    def with_predicate_starting(self, prefix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("p").startswith(prefix)))

    def with_predicate_ending(self, suffix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("p").endswith(suffix)))

    def with_object_like(self, sub: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("o").contains(sub)))

    def with_object_starting(self, prefix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("o").startswith(prefix)))

    def with_object_ending(self, suffix: str) -> "QueryBuilder":
        return self._op(lambda df: df.filter(F.col("o").endswith(suffix)))

    def filter(self, column: str, op: str, value: str) -> "QueryBuilder":
        """Try-numeric comparison on s/p/o (reference filter semantics)."""
        return self._op(
            lambda df: df.filter(compare.compare(F.col(column), op, F.lit(value)))
        )

    # --------------------------------------------------------------- joins
    def join_on_subject(self, other: "QueryBuilder") -> "QueryBuilder":
        """Keep triples whose subject also appears as a subject of the other
        builder's result (semi-join)."""
        keys = other.dataframe().select("s").dropDuplicates()
        return self._op(lambda df: df.join(keys, on="s", how="left_semi"))

    def join_on_object_subject(self, other: "QueryBuilder") -> "QueryBuilder":
        """Keep triples whose object is a subject of the other's result
        (path step)."""
        keys = other.dataframe().select(F.col("s").alias("o")).dropDuplicates()
        return self._op(lambda df: df.join(keys, on="o", how="left_semi"))

    # ----------------------------------------------------------- modifiers
    def distinct(self) -> "QueryBuilder":
        self._distinct = True
        return self

    def order_by(self, column: str, ascending: bool = True) -> "QueryBuilder":
        self._order.append((column, ascending))
        return self

    def asc(self) -> "QueryBuilder":
        """Builder-wide ascending direction (query_builder.rs:316-319,
        py_query_builder.rs:578-583): applies to every recorded sort key
        at execution, like the reference's single sort_direction."""
        self._direction = True
        return self

    def desc(self) -> "QueryBuilder":
        """Builder-wide descending direction (query_builder.rs:310-313)."""
        self._direction = False
        return self

    def limit(self, n: int) -> "QueryBuilder":
        self._limit = n
        return self

    def offset(self, n: int) -> "QueryBuilder":
        self._offset = n
        return self

    # ------------------------------------------------------------- actions
    def _apply_ops(self, df: DataFrame) -> DataFrame:
        for fn in self._ops:
            df = fn(df)
        return df

    def dataframe(self) -> DataFrame:
        df = self._apply_ops(
            self.store.quads.filter(F.col("g").isNull()).select("s", "p", "o")
        )
        if self._distinct:
            df = df.dropDuplicates()
        if self._order:
            keys = []
            for col, asc in self._order:
                if self._direction is not None:
                    asc = self._direction
                keys.extend(compare.order_keys(F.col(col), asc))
            df = df.orderBy(*keys)
        if self._offset:
            df = df.offset(self._offset)
        if self._limit is not None:
            df = df.limit(self._limit)
        return df

    def get_results(self) -> list[tuple[str, str, str]]:
        return [(r.s, r.p, r.o) for r in self.dataframe().collect()]

    # reference python-binding names (py_query_builder.rs:640-730):
    # get_decoded_triples + per-position projections (deduped only when
    # distinct() was called, like the Rust builder) + grouping dicts
    def get_decoded_triples(self) -> list[tuple[str, str, str]]:
        return self.get_results()

    def _position(self, col: str) -> list[str]:
        return [r[0] for r in self.dataframe().select(col).collect()]

    def get_subjects(self) -> list[str]:
        return self._position("s")

    def get_predicates(self) -> list[str]:
        return self._position("p")

    def get_objects(self) -> list[str]:
        return self._position("o")

    def group_by_subject(self) -> dict[str, list[tuple[str, str, str]]]:
        return self._group(0)

    def group_by_predicate(self) -> dict[str, list[tuple[str, str, str]]]:
        return self._group(1)

    def group_by_object(self) -> dict[str, list[tuple[str, str, str]]]:
        return self._group(2)

    def _group(self, pos: int) -> dict[str, list[tuple[str, str, str]]]:
        groups: dict[str, list[tuple[str, str, str]]] = {}
        for t in self.get_results():
            groups.setdefault(t[pos], []).append(t)
        return groups

    def count(self) -> int:
        return self.dataframe().count()

    # ----------------------------------------------------------- streaming
    def window(self, width: int, slide: int | None = None) -> "QueryBuilder":
        self._window = (width, slide if slide is not None else width)
        return self

    def with_report_strategy(self, strategy: str, period: int | None = None) -> "QueryBuilder":
        if strategy.lower() == "periodic":
            self._report.append(Periodic(period or 1))
        else:
            self._report.append(ReportStrategy(strategy))
        return self

    def with_periodic_report(self, period: int) -> "QueryBuilder":
        """Periodic report strategy with its period
        (py_query_builder.rs:606-611)."""
        return self.with_report_strategy("periodic", period)

    def with_stream_operator(self, op: str) -> "QueryBuilder":
        self._stream_op = op.upper()
        return self

    def with_tick_strategy(self, tick) -> "QueryBuilder":
        """Window tick strategy (py_query_builder.rs:614-618): a
        :class:`Tick` member or its name ("TimeDriven"/"TupleDriven"/
        "BatchDriven")."""
        self._tick = tick if isinstance(tick, Tick) else Tick(str(tick))
        return self

    def as_stream(self) -> "StreamingQueryBuilder":
        if self._window is None:
            raise ValueError("call window(width, slide) before as_stream()")
        return StreamingQueryBuilder(self)


class StreamingQueryBuilder:
    """Streaming variant (query_builder.rs:600-758): the recorded filter
    chain runs over each window firing's content; R2S filters emissions."""

    def __init__(self, qb: QueryBuilder):
        self.qb = qb
        width, slide = qb._window
        self.window = CSparqlWindow(
            width,
            slide,
            report=list(qb._report) or None,
            tick=qb._tick,
            uri="builder",
        )
        self.r2s = make_r2s(qb._stream_op)
        self.results: list[list[tuple[str, str, str]]] = []
        self.window.on_fire = self._on_fire

    def add_stream_triple(self, s: str, p: str, o: str, ts: int) -> None:
        self.window.add((s, p, o), ts)

    def _on_fire(self, content, ts: int) -> None:
        triples = content.items()
        rows: list[tuple[str, str, str]] = []
        if triples:
            df = self.qb.store.spark.createDataFrame(
                triples, "s string, p string, o string"
            )
            rows = [(r.s, r.p, r.o) for r in self.qb._apply_ops(df).collect()]
        out = self.r2s.eval(rows, ts)
        if out:
            self.results.append(out)

    def get_stream_results(self) -> list[list[tuple[str, str, str]]]:
        return self.results

    def get_all_stream_results(self) -> list[list[tuple[str, str, str]]]:
        return self.results

    def clear_stream_results(self) -> None:
        self.results = []

    def stop_stream(self) -> None:
        """Flush active windows (reference stop semantics) and stop."""
        self.window.flush()

    # ------------------------------------------- config accessors
    # (py_query_builder.rs:408-439 — ADVICE r6: reference scripts call
    # these on the streaming query object)
    def is_streaming(self) -> bool:
        return True

    def get_window_config(self) -> tuple[int, int] | None:
        return self.qb._window

    def get_stream_operator(self) -> str | None:
        return self.qb._stream_op

    def get_report_strategies(self) -> list[str]:
        out = []
        for r in self.qb._report:
            if isinstance(r, Periodic):
                out.append("Periodic")
            else:
                out.append(r.value if isinstance(r, ReportStrategy) else str(r))
        return out

    def get_periodic_periods(self) -> list[int]:
        return [r.period for r in self.qb._report if isinstance(r, Periodic)]

    def get_tick_strategy(self) -> Tick:
        return self.qb._tick
