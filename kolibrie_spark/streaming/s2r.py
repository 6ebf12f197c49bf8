"""S2R: the C-SPARQL window operator (reference kolibrie/src/rsp/s2r.rs).

Event-time sliding windows [o_i, o_i + width) opened every ``slide``; an
item enters every open window covering its timestamp; report strategies
pick at most one firing window per event (the max-close candidate, judged
on pre-event contents); windows no longer covering the event time are
evicted afterwards.

Exact semantics (ported from s2r.rs and pinned by its unit tests
s2r.rs:428-497 — width 10 / slide 2 / ts 0..9 fires exactly 4 times — and
the engine-level ISTREAM timeline, tests/rsp_engine_test.rs:10-100):
- scope(t): c_sup = ceil(|t - t0| / slide) * slide; windows
  [max(0, o_i), o_i + width) for o_i = c_sup - width stepping slide while
  o_i <= t (s2r.rs:298-330; negative opens saturate to 0 like the
  reference's `as usize` cast).
- membership: open <= ts < close (s2r.rs:221).
- OnWindowClose: close <= ts; NonEmptyContent: len > 0; Periodic(n):
  ts % n == 0; OnContentChange mirrors the reference's actual comparison —
  it fires when content EQUALS the last checked content (s2r.rs:76-80;
  arguably a reference bug, kept for parity). All strategies must agree.
- candidates are judged on the pre-event window set with pre-event
  contents; only the max-close candidate fires (s2r.rs:236-244); the
  TimeDriven tick additionally requires strictly-advancing app time, so a
  firing with *empty* content still consumes the timestamp (s2r.rs:246-265)
  and late events re-open past windows but never re-fire them.

Note: the reference's DSTREAM engine test (rsp_engine_test.rs:105-193)
annotates window contents one slide wider than these rules produce and
asserts one emission where the code yields two; it is inconsistent with the
reference's own s2r unit tests, so we follow the code (see
tests/test_streaming.py::test_dstream_scripted_timeline).

This bookkeeping is the *control plane*: per-(query, window) driver-side
state bounded by ceil(width/slide) open windows. Content evaluation is the
engine's job (Spark plans); structured.py swaps this for F.window() +
watermark at production scale.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field


class ReportStrategy(enum.Enum):
    NON_EMPTY_CONTENT = "NonEmptyContent"
    ON_CONTENT_CHANGE = "OnContentChange"
    ON_WINDOW_CLOSE = "OnWindowClose"


@dataclass
class Periodic:
    period: int


class Tick(enum.Enum):
    TIME_DRIVEN = "TimeDriven"
    TUPLE_DRIVEN = "TupleDriven"
    BATCH_DRIVEN = "BatchDriven"


@dataclass(frozen=True)
class Window:
    open: int
    close: int


@dataclass
class Content:
    """Window content: item -> last timestamp (set semantics on items)."""

    elements: dict = field(default_factory=dict)

    def add(self, item, ts: int) -> None:
        self.elements[item] = ts

    def items(self) -> list:
        return list(self.elements.keys())

    def items_with_ts(self) -> list:
        return list(self.elements.items())

    def __len__(self) -> int:
        return len(self.elements)

    def __eq__(self, other) -> bool:
        return set(self.elements.keys()) == set(other.elements.keys())


class CSparqlWindow:
    def __init__(
        self,
        width: int,
        slide: int,
        report: list | None = None,
        tick: Tick = Tick.TIME_DRIVEN,
        uri: str = "",
        t0: int = 0,
    ):
        self.width = width
        self.slide = slide
        self.t0 = t0
        self.uri = uri
        self.tick = tick
        self.report = report or [ReportStrategy.ON_WINDOW_CLOSE]
        self.active: dict[Window, Content] = {}
        self.app_time = 0
        self._last_change = Content()
        self.on_fire = None  # callback(content: Content, ts: int)

    def _scope(self, t: int) -> None:
        c_sup = math.ceil(abs(t - self.t0) / self.slide) * self.slide
        o_i = c_sup - self.width
        while True:
            w = Window(max(0, o_i), o_i + self.width)
            self.active.setdefault(w, Content())
            o_i += self.slide
            if o_i > t:
                break

    def _passes(self, w: Window, content: Content, ts: int) -> bool:
        ok = True
        for s in self.report:
            if s is ReportStrategy.NON_EMPTY_CONTENT:
                ok = ok and len(content) > 0
            elif s is ReportStrategy.ON_CONTENT_CHANGE:
                ok = ok and content == self._last_change
                self._last_change = Content(dict(content.elements))
            elif s is ReportStrategy.ON_WINDOW_CLOSE:
                ok = ok and w.close <= ts
            elif isinstance(s, Periodic):
                ok = ok and ts % s.period == 0
        return ok

    def add(self, item, ts: int) -> None:
        """add_to_window (s2r.rs:210-269): scope → report → fill → evict."""
        self._scope(ts)
        candidates = [
            (w, c) for (w, c) in self.active.items() if self._passes(w, c, ts)
        ]
        fired = max(candidates, key=lambda wc: (wc[0].close, wc[0].open), default=None)
        # snapshot pre-event content: the reference judges and emits the
        # originals while filling clones (s2r.rs:215-244)
        fired_content = Content(dict(fired[1].elements)) if fired is not None else None
        new_active: dict[Window, Content] = {}
        for w, c in self.active.items():
            if w.open <= ts < w.close:
                c.add(item, ts)
                new_active[w] = c
        if fired is not None and self.tick is Tick.TIME_DRIVEN and ts > self.app_time:
            self.app_time = ts
            if self.on_fire is not None:
                self.on_fire(fired_content, ts)
        self.active = new_active

    def flush(self) -> None:
        """Merge all active windows' contents and fire once if non-empty
        (reference s2r.rs:342-362; called by RSPEngine.stop)."""
        merged = Content()
        for c in self.active.values():
            for item, ts in c.items_with_ts():
                merged.add(item, ts)
        if len(merged) > 0 and self.on_fire is not None:
            self.on_fire(merged, self.app_time)
