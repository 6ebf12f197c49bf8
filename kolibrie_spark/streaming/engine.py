"""RSPEngine: continuous RSP-QL queries (reference kolibrie/src/rsp_engine.rs).

Architecture (Spark-first split):
- *Control plane* (driver): C-SPARQL window bookkeeping (s2r.py), report
  strategies, the multi-window sync coordinator (Wait/Steal/Timeout —
  deterministic, single-threaded port of rsp_engine.rs:539-770), and R2S
  state. All O(active windows + last results) — tiny.
- *Data plane*: window-content query evaluation. Pattern-only window groups
  use an in-process binding matcher (identical bag semantics to the
  compiler's BGP join — the reference's engine is exactly such a matcher,
  engine.rs:376-395); groups with FILTER/BIND/etc. and all static patterns
  run through the full Spark compiler, so there is one semantics source.
  For production-scale streams use structured.py, which compiles the same
  registration to Structured Streaming.

Coordinator semantics (ported from rsp_engine.rs:539-770):
- each firing replaces that window's latest result (last_materialized);
- Wait: emit when every window fired in the current cycle;
- Steal: emit immediately on any firing once every window has fired at
  least once (stale results for the rest);
- Timeout(d, fallback): like Wait, but an open cycle older than d triggers
  fallback = Steal (emit with stale) or Drop (discard cycle). Timeouts are
  checked as events arrive (deterministic with an injectable clock).
- emitted rows = compatible join of all windows' results, then the static
  plan's results, then R2S (RSTREAM/ISTREAM/DSTREAM vs previous emission).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from kolibrie_spark.sparql import ast
from kolibrie_spark.sparql.compiler import Compiler, DatasetView
from kolibrie_spark.store import QuadStore
from kolibrie_spark.streaming.r2s import make_r2s
from kolibrie_spark.streaming.rspql import RSPQLQuery, WindowSpec, parse_rspql
from kolibrie_spark.streaming.s2r import CSparqlWindow, ReportStrategy, Tick


def _normalize_stream_iri(s: str) -> str:
    s = s.strip().removeprefix("<").removesuffix(">")
    return s.removeprefix(":")


def _pattern_only(group: ast.Group) -> bool:
    return all(isinstance(e, ast.TriplePattern) for e in group.elements)


def _match_patterns(patterns: list[ast.TriplePattern], triples) -> list[dict]:
    """In-process BGP matcher with the compiler's bag-join semantics."""
    rows: list[dict] = [{}]
    for pat in patterns:
        nxt: list[dict] = []
        terms = (pat.s, pat.p, pat.o)
        for row in rows:
            for t in triples:
                binding = dict(row)
                ok = True
                for term, val in zip(terms, t):
                    if isinstance(term, ast.Var):
                        if term.name in binding:
                            if binding[term.name] != val:
                                ok = False
                                break
                        else:
                            binding[term.name] = val
                    elif isinstance(term, ast.Iri) or isinstance(term, ast.Lit):
                        if term.value != val:
                            ok = False
                            break
                    else:
                        ok = False
                        break
                if ok:
                    nxt.append(binding)
        rows = nxt
    return rows


def _join_rows(left: list[dict], right: list[dict]) -> list[dict]:
    """Compatible-mapping join of two solution sequences (reference
    engine.rs:1137-1160)."""
    out = []
    for a in left:
        for b in right:
            if all(a[k] == b[k] for k in a.keys() & b.keys()):
                out.append({**a, **b})
    return out


class RSPEngine:
    def __init__(
        self,
        spark,
        query: str,
        static_store: QuadStore | None = None,
        consumer: Callable[[list[tuple[str, str]]], None] | None = None,
        sync_policy: tuple = ("WAIT",),
        report: list | None = None,
        t0: int = 0,
        clock: Callable[[], float] | None = None,
    ):
        self.spark = spark
        self.q: RSPQLQuery = parse_rspql(query)
        self.static_store = static_store or QuadStore(spark)
        self.consumer = consumer or (lambda row: None)
        self.r2s = make_r2s(self.q.operator)
        self.clock = clock or time.monotonic
        self.emissions: list[list[tuple[str, str]]] = []

        # per-window policy overrides the engine default (query.rs:211)
        for w in self.q.windows:
            if w.policy is not None:
                sync_policy = w.policy
                break
        self.sync_policy = sync_policy

        self.runners: dict[str, CSparqlWindow] = {}
        for w in self.q.windows:
            # inline [... REPORT ... TICK ...] clauses on the window spec
            # override the engine-level default (reference window grammar)
            w_report = list(w.report) if getattr(w, "report", None) else (
                list(report) if report else None
            )
            runner = CSparqlWindow(
                w.width, w.slide, report=w_report, uri=w.iri, t0=t0
            )
            runner.on_fire = self._make_on_fire(w)
            self.runners[w.iri] = runner

        # coordinator state
        self.last_materialized: dict[str, list[dict]] = {}
        self.cycle_triggered: set[str] = set()
        self.cycle_start: float | None = None
        self.max_ts = 0
        self._static_cache: list[dict] | None = None

    # ------------------------------------------------------------ ingestion
    def add(self, triple: tuple[str, str, str], ts: int) -> None:
        self.add_to_stream("default", triple, ts)

    def add_to_stream(self, stream_iri: str, triple, ts: int) -> None:
        self._check_timeout()
        name = _normalize_stream_iri(stream_iri)
        for w in self.q.windows:
            if w.stream is None or _normalize_stream_iri(w.stream) == name:
                self.runners[w.iri].add(tuple(triple), ts)

    def add_events(self, events: list[tuple[str, tuple, int]]) -> None:
        """Scripted timeline: [(stream_iri, (s,p,o), ts), ...] in order."""
        for stream, triple, ts in events:
            self.add_to_stream(stream, triple, ts)

    def add_static_triples(self, rows: list[tuple]) -> None:
        self.static_store.add_quads(rows)
        self._static_cache = None

    # ----------------------------------------------------------- evaluation
    def _make_on_fire(self, w: WindowSpec):
        def on_fire(content, ts: int):
            results = self._eval_window(w, content.items())
            self._coordinate(w.iri, results, ts)

        return on_fire

    def _eval_window(self, w: WindowSpec, triples: list[tuple]) -> list[dict]:
        if _pattern_only(w.group):
            return _match_patterns(
                [e for e in w.group.elements if isinstance(e, ast.TriplePattern)],
                triples,
            )
        # full semantics: run the window group through the Spark compiler
        store = QuadStore.from_rows(self.spark, list(triples))
        compiler = Compiler(store)
        bindings = compiler.compile_group(
            w.group, DatasetView(store, [], []), active_graph=None
        )
        return [row.asDict() for row in bindings.df.collect()]

    def _static_results(self) -> list[dict] | None:
        if not self.q.static_group.elements:
            return None
        if self._static_cache is None:
            compiler = Compiler(self.static_store)
            bindings = compiler.compile_group(
                self.q.static_group,
                DatasetView(self.static_store, [], []),
                active_graph=None,
            )
            self._static_cache = [row.asDict() for row in bindings.df.collect()]
        return self._static_cache

    # ---------------------------------------------------------- coordinator
    def _check_timeout(self) -> None:
        if (
            self.sync_policy[0] == "TIMEOUT"
            and self.cycle_start is not None
            and self.cycle_triggered
            and self.clock() - self.cycle_start > self.sync_policy[1]
        ):
            if self.sync_policy[2] == "STEAL" and len(self.last_materialized) == len(
                self.runners
            ):
                self._emit()
            self._reset_cycle()

    def _coordinate(self, window_iri: str, results: list[dict], ts: int) -> None:
        self.max_ts = max(self.max_ts, ts)
        self.last_materialized[window_iri] = results
        if not self.cycle_triggered:
            self.cycle_start = self.clock()
        self.cycle_triggered.add(window_iri)

        if len(self.cycle_triggered) == len(self.runners):
            self._emit()
            self._reset_cycle()
        elif self.sync_policy[0] == "STEAL":
            if len(self.last_materialized) == len(self.runners):
                self._emit()
            self._reset_cycle()

    def _reset_cycle(self) -> None:
        self.cycle_triggered.clear()
        self.cycle_start = None
        self.max_ts = 0

    def _emit(self) -> None:
        joined: list[dict] = [{}]
        for w in self.q.windows:
            joined = _join_rows(joined, self.last_materialized.get(w.iri, []))
        static = self._static_results()
        if static is not None:
            joined = _join_rows(joined, static)
        # final projection (SELECT * keeps everything)
        if not self.q.select.star:
            keep = [v.name for v in self.q.select.select if isinstance(v, ast.Var)]
            joined = [{k: r.get(k, "") for k in keep} for r in joined]
        out = self.r2s.eval(joined, self.max_ts)
        for row in out:
            pairs = sorted(row.items())
            self.emissions.append(pairs)
            self.consumer(pairs)

    # --------------------------------------------------------------- utility
    def stop(self) -> None:
        """Flush all active windows through the pipeline (reference
        rsp_engine.rs:905-915 — each window fires its merged remaining
        content; the scripted R2S tests deliberately never call this)."""
        for runner in self.runners.values():
            runner.flush()
