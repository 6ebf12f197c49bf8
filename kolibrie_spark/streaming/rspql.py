"""RSP-QL REGISTER grammar (reference kolibrie/src/parser.rs:389-433 for the
REGISTER clause, 2594-2676 for window specs, 2700-2763 for sync policies).

Shape::

    REGISTER (RSTREAM|ISTREAM|DSTREAM) <out-iri> AS
    SELECT ...
    FROM NAMED WINDOW :w ON (:stream | ?var) [RANGE n STEP m]
        [WITH POLICY (WAIT | STEAL | TIMEOUT n (STEAL|DROP))]
    ...
    WHERE { WINDOW :w { patterns } ...  static-patterns... }

Durations: plain integers or ISO-8601 (PT10S/PT5M/PT1H — parsed to
seconds). No STEP => slide = width (tumbling, reference builder.rs:247-250).
The ``:name`` prefixed form with no declared prefix resolves to the bare
local name, matching the reference's normalize_stream_iri
(rsp_engine.rs:782-790).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from kolibrie_spark.sparql import ast
from kolibrie_spark.sparql.parser import ParseError, Parser
from kolibrie_spark.streaming.s2r import Periodic, ReportStrategy


@dataclass
class WindowSpec:
    iri: str
    stream: str | None  # None = variable stream (matches any)
    width: int
    slide: int
    group: ast.Group = field(default_factory=ast.Group)
    policy: tuple | None = None  # ("WAIT",) | ("STEAL",) | ("TIMEOUT", n, fb)
    # inline REPORT/TICK clauses (reference window spec grammar,
    # e.g. [SLIDING 10 SLIDE 2 REPORT ON_WINDOW_CLOSE TICK TIME_DRIVEN])
    report: list = field(default_factory=list)
    tick: str | None = None


@dataclass
class RSPQLQuery:
    operator: str  # RSTREAM | ISTREAM | DSTREAM
    output_iri: str
    select: ast.SelectQuery
    windows: list[WindowSpec] = field(default_factory=list)
    static_group: ast.Group = field(default_factory=ast.Group)


_ISO = re.compile(r"^PT(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?$", re.I)


def parse_duration(text: str) -> int:
    if text.isdigit():
        return int(text)
    m = _ISO.match(text)
    if not m:
        raise ParseError(f"bad duration {text!r}")
    h, mi, s = (int(x) if x else 0 for x in m.groups())
    return h * 3600 + mi * 60 + s


class RSPQLParser(Parser):
    """Extends the SPARQL parser with the streaming registration grammar."""

    def resolve_pname(self, text: str) -> str:
        pfx, _, local = text.partition(":")
        if pfx == "" and pfx not in self.prefixes:
            return local  # ':w' with no declared prefix = bare name
        if pfx not in self.prefixes:
            # reference parity: resolve_term_with_prefix (parser.rs:3379)
            # falls back to the RAW prefixed name when the prefix is
            # undeclared — the RSP examples use ssn:/sosa: terms without
            # PREFIX declarations. The core SPARQL parser stays strict
            # (better error reporting), only the streaming grammar is
            # lenient like the reference.
            return text
        return super().resolve_pname(text)

    def _stream_term(self):
        t = self.peek()
        if t is not None and t.kind == "VAR":
            self.i += 1
            return None  # variable stream: matches any stream IRI
        return self._iri_or_colon_name()

    def _iri_or_colon_name(self) -> str:
        t = self.peek()
        if t is not None and t.kind == "OP" and t.text == ":":  # pragma: no cover
            raise ParseError("bad IRI")
        if t is not None and t.kind == "PNAME":
            self.i += 1
            return self.resolve_pname(t.text)
        return self._iri_value()

    def parse_register(self) -> RSPQLQuery:
        while self.at_kw("PREFIX"):
            self.i += 1
            pn = self.next()
            iri = self.next()
            if pn.kind != "PNAME" or iri.kind != "IRI":
                raise ParseError("bad PREFIX")
            self.prefixes[pn.text[:-1]] = iri.text[1:-1]

        self.expect_kw("REGISTER")
        op_tok = self.next()
        operator = op_tok.text.upper()
        if operator not in ("RSTREAM", "ISTREAM", "DSTREAM"):
            raise ParseError(f"bad stream operator {op_tok!r}")
        output_iri = self._iri_or_colon_name()
        self.expect_kw("AS")

        # SELECT projection (reuse core parser up to FROM)
        self.expect_kw("SELECT")
        select = ast.SelectQuery(select=[])
        if self.take_kw("DISTINCT"):
            select.distinct = True
        if self.take_op("*"):
            select.star = True
        else:
            while True:
                item = self.try_parse_projection_item()
                if item is None:
                    break
                select.select.append(item)
            if not select.select:
                raise ParseError("empty SELECT list")

        windows: list[WindowSpec] = []
        while self.at_kw("FROM"):
            self.i += 1
            self.expect_kw("NAMED")
            self.expect_kw("WINDOW")
            wiri = self._iri_or_colon_name()
            self.expect_kw("ON")
            stream = self._stream_term()
            spec_w, spec_s, spec_report, spec_tick = self._parse_window_spec()
            policy = self._parse_policy()
            windows.append(
                WindowSpec(
                    iri=wiri, stream=stream, width=spec_w, slide=spec_s,
                    policy=policy, report=spec_report, tick=spec_tick,
                )
            )
        if not windows:
            raise ParseError("REGISTER requires at least one FROM NAMED WINDOW")

        self.expect_kw("WHERE")
        self.expect_op("{")
        static_group = ast.Group()
        by_iri = {w.iri: w for w in windows}
        while not self.at_op("}"):
            if self.at_kw("WINDOW"):
                self.i += 1
                wiri = self._iri_or_colon_name()
                if wiri not in by_iri:
                    raise ParseError(f"WINDOW block for undeclared window {wiri!r}")
                inner = self.parse_group()
                by_iri[wiri].group = inner
            elif self.at_kw("FILTER"):
                self.i += 1
                self.expect_op("(")
                expr = self.parse_or_expr()
                self.expect_op(")")
                static_group.elements.append(ast.Filter(expr))
            else:
                self.parse_triples_block(static_group)
        self.expect_op("}")

        # trailing solution modifiers
        if self.take_kw("GROUP"):
            self.expect_kw("BY")
            while self.peek() is not None and self.peek().kind == "VAR":
                select.group_by.append(ast.Var(self.next().text[1:]))
        if self.take_kw("LIMIT"):
            select.limit = int(self.next().text)

        if self.peek() is not None:
            raise ParseError(f"trailing tokens at {self.peek()!r}")
        return RSPQLQuery(
            operator=operator,
            output_iri=output_iri,
            select=select,
            windows=windows,
            static_group=static_group,
        )

    def _parse_window_spec(self):
        # [RANGE n STEP m] | [TUMBLING n] | [SLIDING n STEP m]
        if not self.at_op("["):
            # '[' is not in the OP set; it arrives as a lex error otherwise —
            # handle both bracketed and bare forms
            pass
        tok = self.peek()
        if tok is not None and tok.kind == "OP" and tok.text == "[":
            self.i += 1
        kind = self.next().text.upper()
        if kind not in ("RANGE", "TUMBLING", "SLIDING"):
            raise ParseError(f"bad window kind {kind!r}")
        width = parse_duration(self.next().text)
        slide = width
        report: list = []
        tick = None
        while True:
            # SLIDE is the reference RULE-grammar synonym for STEP
            if self.at_kw("STEP") or self.at_kw("SLIDE"):
                self.i += 1
                slide = parse_duration(self.next().text)
            elif self.at_kw("REPORT"):
                self.i += 1
                strat = self.next().text.upper()
                if strat == "PERIODIC":
                    report.append(Periodic(parse_duration(self.next().text)))
                else:
                    try:
                        report.append(
                            ReportStrategy[strat]
                        )
                    except KeyError as e:
                        raise ParseError(f"bad REPORT strategy {strat!r}") from e
            elif self.at_kw("TICK"):
                self.i += 1
                tick = self.next().text.upper()
            else:
                break
        tok = self.peek()
        if tok is not None and tok.kind == "OP" and tok.text == "]":
            self.i += 1
        return width, slide, report, tick

    def _parse_policy(self) -> tuple | None:
        if not self.at_kw("WITH"):
            return None
        self.i += 1
        self.expect_kw("POLICY")
        kind = self.next().text.upper()
        if kind == "WAIT":
            return ("WAIT",)
        if kind == "STEAL":
            return ("STEAL",)
        if kind == "TIMEOUT":
            dur = parse_duration(self.next().text)
            fb = self.next().text.upper()
            if fb not in ("STEAL", "DROP"):
                raise ParseError(f"bad TIMEOUT fallback {fb!r}")
            return ("TIMEOUT", dur, fb)
        raise ParseError(f"bad sync policy {kind!r}")


def parse_rspql(text: str) -> RSPQLQuery:
    return RSPQLParser(text).parse_register()


# ------------------------------------------------------- RETRIEVE clause
@dataclass
class RetrieveClause:
    """``RETRIEVE SOME|EVERY ACTIVE|LATENT STREAM ?s FROM <catalog> WITH
    { patterns }`` — stream discovery against a catalog graph before
    registration (reference parser.rs:3200-3263,
    shared/src/query.rs:325-344)."""

    mode: str  # SOME | EVERY
    state: str  # ACTIVE | LATENT
    variable: str
    from_iri: str
    group: "object"  # ast.Group over the catalog


class _RetrieveParser(RSPQLParser):
    def parse_retrieve(self) -> RetrieveClause:
        self.expect_kw("RETRIEVE")
        mode = self.next().text.upper()
        if mode not in ("SOME", "EVERY"):
            raise ParseError(f"bad RETRIEVE mode {mode!r}")
        state = self.next().text.upper()
        if state not in ("ACTIVE", "LATENT"):
            raise ParseError(f"bad stream state {state!r}")
        self.expect_kw("STREAM")
        v = self.next()
        if v.kind != "VAR":
            raise ParseError("RETRIEVE expects a stream variable")
        self.expect_kw("FROM")
        catalog = self._iri_or_colon_name()
        self.expect_kw("WITH")
        group = self.parse_group()
        return RetrieveClause(
            mode=mode, state=state, variable=v.text[1:], from_iri=catalog, group=group
        )


def parse_retrieve(text: str) -> RetrieveClause:
    return _RetrieveParser(text).parse_retrieve()


def resolve_streams(spark, catalog_store, clause: RetrieveClause) -> list[str]:
    """Evaluate the WITH pattern over the catalog graph and return the
    stream IRIs bound to the clause variable (SOME → first match in sorted
    order, EVERY → all)."""
    from kolibrie_spark.sparql.compiler import Compiler, DatasetView

    compiler = Compiler(catalog_store)
    view = DatasetView(catalog_store, [clause.from_iri] if clause.from_iri else [], [])
    b = compiler.compile_group(clause.group, view, active_graph=None)
    if clause.variable not in b.vars:
        raise ParseError(
            f"RETRIEVE variable ?{clause.variable} is not bound by the WITH pattern"
        )
    names = sorted(
        r[clause.variable]
        for r in b.df.select(clause.variable).dropDuplicates().collect()
    )
    if clause.mode == "SOME":
        return names[:1]
    return names
