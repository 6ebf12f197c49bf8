"""Recursive-descent parser for the reference's SPARQL fragment.

Grammar parity targets (citations into /root/reference):
- SELECT core: kolibrie/src/parser.rs:1770-1838 (PREFIX, SELECT [DISTINCT]
  vars/*/aggregates with optional AS alias, FROM / FROM NAMED, WHERE group,
  GROUP BY, ORDER BY ASC/DESC, LIMIT).
- Group pattern: BGP with ';'-style triples separated by '.', FILTER with
  comparison/arithmetic/&&/||/! (parser.rs:1082-1276), BIND(CONCAT|udf|
  TRIPLE/SUBJECT/PREDICATE/OBJECT AS ?v) (parser.rs:1278-1323), VALUES with
  UNDEF (parser.rs: VALUES forms), GRAPH <iri>|?var {..}, nested { SELECT },
  { A } UNION { B } (parser.rs:1432-1488), RDF-star << >> patterns.
- Updates: the six forms of parser.rs / sparql_update_core (parser.rs:1840+).
- Lexical details the reference tests rely on: '$var' == '?var', '#'
  comments are whitespace, 'a' => rdf:type, literal datatype stripped /
  language tag kept as value@lang (sparql_database.rs:1628-1656 semantics),
  numeric literals kept as their lexical form.

COUNT is accepted even though the reference grammar can't produce it — both
its executors implement it (execute_query.rs:433, engine.rs:761); SURVEY §2.4
calls for supporting it. OFFSET is accepted for QueryBuilder parity.
"""

from __future__ import annotations

import re

from kolibrie_spark.schema import RDF_TYPE
from kolibrie_spark.sparql.ast import (
    Aggregate,
    And,
    Arith,
    AskQuery,
    ConstructQuery,
    DescribeQuery,
    ProjExpr,
    Bind,
    BlankNode,
    Cmp,
    DeleteData,
    Exists,
    Filter,
    FuncCall,
    GraphBlock,
    Group,
    InsertData,
    Iri,
    Lit,
    MinusBlock,
    Modify,
    Not,
    OptionalBlock,
    Or,
    PathAlt,
    PathInverse,
    PathNeg,
    PathOpt,
    PathPattern,
    PathPlus,
    PathSeq,
    PathStar,
    Query,
    QuotedTriple,
    SelectQuery,
    SubSelect,
    TemplateQuad,
    Term,
    TermExpr,
    TriplePattern,
    UnionBlock,
    ValuesBlock,
    Var,
)

AGG_FUNCS = {"SUM", "MIN", "MAX", "AVG", "COUNT", "GROUP_CONCAT", "SAMPLE"}
KEYWORDS = {
    "SELECT", "DISTINCT", "WHERE", "FILTER", "BIND", "VALUES", "UNION",
    "GRAPH", "GROUP", "BY", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET",
    "FROM", "NAMED", "AS", "PREFIX", "INSERT", "DELETE", "DATA", "UNDEF",
    "WITH", "USING", "OPTIONAL", "MINUS", "EXISTS", "NOT",
}


class ParseError(ValueError):
    pass


# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<QT_OPEN><<)
  | (?P<QT_CLOSE>>>)
  | (?P<IRI><[^<>\s{}|^`\\]*>)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<BLANK>_:[A-Za-z0-9_]+)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>(?:[A-Za-z_][A-Za-z0-9_-]*)?:[A-Za-z0-9_.\-/%]*)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\].,;=<>!+\-*/@^|?])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 6 <= len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(body):
                out.append(chr(int(body[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


class Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}({self.text})"


def tokenize(text: str) -> list[Tok]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"lex error at {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        toks.append(Tok(kind, m.group()))
    return toks


# ------------------------------------------------------------------- parser
class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._blank_ctr = 0

    # -- token helpers
    def peek(self, ahead: int = 0) -> Tok | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def at_kw(self, *kws: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind in ("NAME", "PNAME") and t.text.upper() in kws

    def take_kw(self, kw: str) -> bool:
        if self.at_kw(kw):
            self.i += 1
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.take_kw(kw):
            raise ParseError(f"expected {kw} at {self.peek()!r}")

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind == "OP" and t.text in ops

    def take_op(self, op: str) -> bool:
        if self.at_op(op):
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.take_op(op):
            raise ParseError(f"expected {op!r} at {self.peek()!r}")

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input")
        self.i += 1
        return t

    # -- entry point
    def parse(self) -> Query:
        q = Query()
        while self.at_kw("PREFIX"):
            self.i += 1
            pn = self.next()
            if pn.kind != "PNAME" or not pn.text.endswith(":"):
                raise ParseError(f"bad PREFIX name {pn!r}")
            iri = self.next()
            if iri.kind != "IRI":
                raise ParseError(f"bad PREFIX iri {iri!r}")
            self.prefixes[pn.text[:-1]] = iri.text[1:-1]
        q.prefixes = dict(self.prefixes)

        if self.at_kw("SELECT"):
            q.select = self.parse_select()
        elif self.at_kw("CONSTRUCT"):
            self.i += 1
            c = ConstructQuery()
            c.template = self.parse_template()
            while self.at_kw("FROM"):
                self.i += 1
                if self.take_kw("NAMED"):
                    c.from_named.append(self._iri_value())
                else:
                    c.from_graphs.append(self._iri_value())
            self.expect_kw("WHERE")
            c.where = self.parse_group()
            q.construct = c
        elif self.at_kw("ASK"):
            self.i += 1
            a = AskQuery()
            while self.at_kw("FROM"):
                self.i += 1
                if self.take_kw("NAMED"):
                    a.from_named.append(self._iri_value())
                else:
                    a.from_graphs.append(self._iri_value())
            self.take_kw("WHERE")
            a.where = self.parse_group()
            q.ask = a
        elif self.at_kw("DESCRIBE"):
            self.i += 1
            d = DescribeQuery()
            while self.peek() is not None and self.peek().kind in ("IRI", "PNAME"):
                d.iris.append(Iri(self._iri_value()))
            if not d.iris:
                raise ParseError("DESCRIBE expects at least one IRI")
            q.describe = d
        elif self.at_kw("INSERT", "DELETE", "WITH"):
            q.update = self.parse_update()
        else:
            raise ParseError(
                f"expected SELECT/CONSTRUCT/ASK/DESCRIBE or update at {self.peek()!r}"
            )
        if self.peek() is not None:
            raise ParseError(f"trailing tokens at {self.peek()!r}")
        return q

    # -- terms
    def resolve_pname(self, text: str) -> str:
        pfx, _, local = text.partition(":")
        if pfx not in self.prefixes:
            raise ParseError(f"unknown prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def parse_term(self, allow_var: bool = True) -> Term:
        t = self.peek()
        if t is None:
            raise ParseError("expected term, got end of input")
        if t.kind == "VAR":
            if not allow_var:
                raise ParseError(f"variable not allowed here: {t.text}")
            self.i += 1
            return Var(t.text[1:])
        if t.kind == "IRI":
            self.i += 1
            return Iri(t.text[1:-1])
        if t.kind == "PNAME":
            self.i += 1
            return Iri(self.resolve_pname(t.text))
        if t.kind == "BLANK":
            self.i += 1
            return BlankNode(t.text[2:])
        if t.kind == "STRING":
            self.i += 1
            val = _unescape(t.text[1:-1])
            # language tag kept as value@lang; datatype stripped
            # (reference sparql_database.rs:1628-1656)
            if self.at_op("@"):
                self.i += 1
                lang = self.next()
                val = f"{val}@{lang.text}"
            elif self.at_op("^^"):
                self.i += 1
                self.next()  # datatype IRI/PNAME, discarded
            return Lit(val)
        if t.kind == "NUMBER":
            self.i += 1
            return Lit(t.text)
        if t.kind == "QT_OPEN":
            self.i += 1
            s = self.parse_term()
            p = self.parse_term()
            o = self.parse_term()
            if not self.next().kind == "QT_CLOSE":
                raise ParseError("expected >> closing quoted triple")
            return QuotedTriple(s, p, o)
        if t.kind == "NAME" and t.text == "a":
            self.i += 1
            return Iri(RDF_TYPE)
        if t.kind == "NAME" and t.text in ("true", "false"):
            # SPARQL BooleanLiteral; stored by its lexical form like every
            # other literal (the reference's rule/SELECT examples match
            # `true` as a plain term, multiple_conclusions.rs:59-104)
            self.i += 1
            return Lit(t.text)
        raise ParseError(f"expected term at {t!r}")

    # -- SELECT
    def parse_select(self) -> SelectQuery:
        self.expect_kw("SELECT")
        q = SelectQuery(select=[])
        if self.take_kw("DISTINCT"):
            q.distinct = True
        # projection list
        if self.take_op("*"):
            q.star = True
        else:
            while True:
                item = self.try_parse_projection_item()
                if item is None:
                    break
                q.select.append(item)
            if not q.select:
                raise ParseError("empty SELECT list")
        while self.at_kw("FROM"):
            self.i += 1
            if self.take_kw("NAMED"):
                q.from_named.append(self._iri_value())
            else:
                q.from_graphs.append(self._iri_value())
        self.expect_kw("WHERE")
        q.where = self.parse_group()
        # solution modifiers
        if self.take_kw("GROUP"):
            self.expect_kw("BY")
            while self.peek() is not None and self.peek().kind == "VAR":
                q.group_by.append(Var(self.next().text[1:]))
        if self.take_kw("HAVING"):
            # SPARQL 1.1 HAVING (extension beyond the reference grammar):
            # a constraint over aggregates and/or their aliases
            q.having = self.parse_or_expr()
        if self.take_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                asc = True
                if self.take_kw("ASC") or self.at_kw("DESC"):
                    asc = not self.take_kw("DESC")
                    self.expect_op("(")
                    # full expression key (SPARQL 1.1 extension); a bare
                    # variable stays a Var for downstream compatibility
                    e = self.parse_or_expr()
                    self.expect_op(")")
                    if isinstance(e, TermExpr) and isinstance(e.term, Var):
                        q.order_by.append((e.term, asc))
                    else:
                        q.order_by.append((e, asc))
                elif self.peek() is not None and self.peek().kind == "VAR":
                    q.order_by.append((Var(self.next().text[1:]), True))
                else:
                    break
        if self.take_kw("LIMIT"):
            q.limit = int(self.next().text)
        if self.take_kw("OFFSET"):
            q.offset = int(self.next().text)
        # SPARQL 1.1 query-level ValuesClause (trailing VALUES after the
        # solution modifiers — spec §10.2.2; an extension over the
        # reference's current grammar, whose legacy values.rs example
        # uses exactly this placement). Kept on the AST so the compiler
        # can join it per spec §18.2.4.5: AFTER aggregation when the
        # query groups/aggregates, else folded into the WHERE group
        # (identical join semantics there).
        if self.take_kw("VALUES"):
            q.trailing_values = self.parse_values()
        return q

    def _iri_value(self) -> str:
        t = self.next()
        if t.kind == "IRI":
            return t.text[1:-1]
        if t.kind == "PNAME":
            return self.resolve_pname(t.text)
        raise ParseError(f"expected IRI, got {t!r}")

    def try_parse_projection_item(self) -> Var | Aggregate | None:
        t = self.peek()
        if t is None:
            return None
        if t.kind == "VAR":
            self.i += 1
            return Var(t.text[1:])
        # (AGG(?v) AS ?alias)
        if t.kind == "OP" and t.text == "(":
            if self.at_kw(*AGG_FUNCS, ahead=1):
                # try the plain-aggregate form; an aggregate inside a larger
                # expression — (SUM(?a) / COUNT(?a) AS ?m) — backtracks to
                # the expression-projection parse below
                mark = self.i
                try:
                    self.i += 1
                    agg = self._parse_aggregate(require_alias=True)
                    self.expect_op(")")
                    return agg
                except ParseError:
                    self.i = mark
            # (expr AS ?alias) — SPARQL 1.1 expression projection
            self.i += 1
            expr = self.parse_or_expr()
            self.expect_kw("AS")
            a = self.next()
            if a.kind != "VAR":
                raise ParseError(f"AS expects a variable, got {a!r}")
            self.expect_op(")")
            return ProjExpr(expr=expr, alias=a.text[1:])
        # bare AGG(?v) [AS ?alias]
        if t.kind == "NAME" and t.text.upper() in AGG_FUNCS and self.at_op("(", ahead=1):
            return self._parse_aggregate(require_alias=False)
        return None

    def _parse_aggregate(self, require_alias: bool) -> Aggregate:
        func = self.next().text.upper()
        self.expect_op("(")
        distinct = self.take_kw("DISTINCT")
        if self.take_op("*"):
            arg = None
        else:
            v = self.next()
            if v.kind != "VAR":
                raise ParseError(f"aggregate argument must be a variable, got {v!r}")
            arg = Var(v.text[1:])
        separator = " "
        if self.take_op(";"):
            self.expect_kw("SEPARATOR")
            self.expect_op("=")
            s = self.next()
            if s.kind != "STRING":
                raise ParseError(f"SEPARATOR expects a string, got {s!r}")
            separator = _unescape(s.text[1:-1])
        self.expect_op(")")
        alias = None
        if self.take_kw("AS"):
            a = self.next()
            if a.kind != "VAR":
                raise ParseError(f"AS expects a variable, got {a!r}")
            alias = a.text[1:]
        if alias is None:
            if require_alias:
                raise ParseError(f"({func}(...) needs AS ?alias)")
            # reference default alias: the aggregated variable's own name
            alias = arg.name if arg is not None else func.lower()
        return Aggregate(func=func, arg=arg, alias=alias, distinct=distinct, separator=separator)

    # -- group graph pattern
    def parse_group(self) -> Group:
        self.expect_op("{")
        g = Group()
        while not self.at_op("}"):
            if self.peek() is None:
                raise ParseError("unterminated group (missing '}')")
            if self.at_kw("FILTER"):
                self.i += 1
                if self.at_kw("EXISTS") or (self.at_kw("NOT") and self.at_kw("EXISTS", ahead=1)):
                    negated = self.take_kw("NOT")
                    self.expect_kw("EXISTS")
                    g.elements.append(Filter(Exists(self.parse_group(), negated)))
                    continue
                self.expect_op("(")
                expr = self.parse_or_expr()
                self.expect_op(")")
                g.elements.append(Filter(expr))
            elif self.at_kw("OPTIONAL"):
                self.i += 1
                g.elements.append(OptionalBlock(self.parse_group()))
            elif self.at_kw("MINUS"):
                self.i += 1
                g.elements.append(MinusBlock(self.parse_group()))
            elif self.at_kw("BIND"):
                self.i += 1
                self.expect_op("(")
                expr = self.parse_additive_expr()
                self.expect_kw("AS")
                v = self.next()
                if v.kind != "VAR":
                    raise ParseError(f"BIND AS expects a variable, got {v!r}")
                self.expect_op(")")
                g.elements.append(Bind(expr, Var(v.text[1:])))
            elif self.at_kw("VALUES"):
                self.i += 1
                g.elements.append(self.parse_values())
            elif self.at_kw("GRAPH"):
                self.i += 1
                t = self.peek()
                if t.kind == "VAR":
                    self.i += 1
                    graph: Iri | Var = Var(t.text[1:])
                else:
                    graph = Iri(self._iri_value())
                inner = self.parse_group()
                g.elements.append(GraphBlock(graph, inner))
            elif self.at_op("{"):
                # nested group: sub-SELECT or UNION chain head
                if self.at_kw("SELECT", ahead=1):
                    self.i += 1
                    sub = self.parse_select()
                    self.expect_op("}")
                    g.elements.append(SubSelect(sub))
                else:
                    first = self.parse_group()
                    branches = [first]
                    while self.take_kw("UNION"):
                        branches.append(self.parse_group())
                    # a single-branch UnionBlock is a scoped nested group —
                    # keeps FILTER scoping correct (reference evaluates
                    # filters inside their own group: utils.rs:402-517,
                    # tests/sparql_filter_scope_test.rs)
                    g.elements.append(UnionBlock(branches))
            else:
                self.parse_triples_block(g)
        self.expect_op("}")
        return g

    def parse_values(self) -> ValuesBlock:
        t = self.peek()
        if t is not None and t.kind == "VAR":
            # single-var form: VALUES ?x { v1 v2 }
            self.i += 1
            var = Var(t.text[1:])
            self.expect_op("{")
            rows = []
            while not self.at_op("}"):
                rows.append([self._values_term()])
            self.expect_op("}")
            return ValuesBlock([var], rows)
        self.expect_op("(")
        vars_: list[Var] = []
        while not self.at_op(")"):
            v = self.next()
            if v.kind != "VAR":
                raise ParseError(f"VALUES vars must be variables, got {v!r}")
            vars_.append(Var(v.text[1:]))
        self.expect_op(")")
        self.expect_op("{")
        rows = []
        while not self.at_op("}"):
            self.expect_op("(")
            row = []
            while not self.at_op(")"):
                row.append(self._values_term())
            self.expect_op(")")
            if len(row) != len(vars_):
                raise ParseError("VALUES row arity mismatch")
            rows.append(row)
        self.expect_op("}")
        return ValuesBlock(vars_, rows)

    def _values_term(self) -> Term | None:
        if self.take_kw("UNDEF"):
            return None
        return self.parse_term(allow_var=False)

    def parse_triples_block(self, g: Group) -> None:
        """subject (path object (',' object)*) (';' path obj...)* '.'"""
        s = self.parse_term()
        while True:
            p = self.parse_path()
            while True:
                o = self.parse_term()
                if isinstance(p, (PathInverse, PathSeq, PathAlt, PathPlus, PathStar, PathOpt, PathNeg)):
                    g.elements.append(PathPattern(s, p, o))
                else:
                    g.elements.append(TriplePattern(s, p, o))
                if not self.take_op(","):
                    break
            if not self.take_op(";"):
                break
            if self.at_op(".") or self.at_op("}"):  # trailing ';'
                break
        self.take_op(".")

    # -- property paths (predicate position). NOTE: prefixed names may
    # contain '/' in their local part, so sequence paths should be written
    # with bracketed IRIs (<a>/<b>), not pnames.
    def parse_path(self):
        """path_alt := path_seq ('|' path_seq)* ; returns a Term when the
        path is just an IRI/variable (plain triple pattern)."""
        parts = [self._parse_path_seq()]
        while self.take_op("|"):
            parts.append(self._parse_path_seq())
        return parts[0] if len(parts) == 1 else PathAlt(parts)

    def _parse_path_seq(self):
        parts = [self._parse_path_elt()]
        while self.take_op("/"):
            parts.append(self._parse_path_elt())
        return parts[0] if len(parts) == 1 else PathSeq(parts)

    def _parse_path_elt(self):
        if self.take_op("^"):
            inner = self._parse_path_primary()
            elt = PathInverse(inner)
        else:
            elt = self._parse_path_primary()
        while True:
            if self.take_op("+"):
                elt = PathPlus(elt)
            elif self.take_op("*"):
                elt = PathStar(elt)
            elif self.take_op("?"):
                elt = PathOpt(elt)
            else:
                break
        return elt

    def _parse_path_primary(self):
        if self.take_op("!"):
            return self._parse_negated_property_set()
        if self.take_op("("):
            inner = self.parse_path()
            self.expect_op(")")
            return inner
        return self.parse_term()

    def _parse_negated_property_set(self) -> PathNeg:
        """``!iri`` / ``!^iri`` / ``!(iri | ^iri | ...)`` — SPARQL 1.1
        §9.1 PathNegatedPropertySet (spec-ward extension like the rest of
        the property-path block; the reference grammar has no paths)."""
        forward: list = []
        inverse: list = []

        def one() -> None:
            inv = self.take_op("^")
            t = self.parse_term(allow_var=False)
            if not isinstance(t, Iri):
                raise ParseError(
                    "negated property set members must be IRIs"
                )
            (inverse if inv else forward).append(t)

        if self.take_op("("):
            one()
            while self.take_op("|"):
                one()
            self.expect_op(")")
        else:
            one()
        return PathNeg(forward, inverse)

    # -- expressions (FILTER / BIND)
    def parse_or_expr(self):
        left = self.parse_and_expr()
        while self.take_op("||"):
            left = Or(left, self.parse_and_expr())
        return left

    def parse_and_expr(self):
        left = self.parse_unary_expr()
        while self.take_op("&&"):
            left = And(left, self.parse_unary_expr())
        return left

    def parse_unary_expr(self):
        if self.take_op("!"):
            return Not(self.parse_unary_expr())
        return self.parse_rel_expr()

    def parse_rel_expr(self):
        left = self.parse_additive_expr()
        for op in ("<=", ">=", "!=", "=", "<", ">"):
            if self.at_op(op):
                self.i += 1
                right = self.parse_additive_expr()
                return Cmp(left, op, right)
        return left

    def parse_additive_expr(self):
        left = self.parse_mult_expr()
        while self.at_op("+", "-"):
            op = self.next().text
            left = Arith(op, left, self.parse_mult_expr())
        return left

    def parse_mult_expr(self):
        left = self.parse_primary_expr()
        while self.at_op("*", "/"):
            op = self.next().text
            left = Arith(op, left, self.parse_primary_expr())
        return left

    def parse_primary_expr(self):
        t = self.peek()
        if t is None:
            raise ParseError("expected expression, got end of input")
        if t.kind == "OP" and t.text == "(":
            self.i += 1
            # could be a parenthesized boolean or arithmetic subexpression
            expr = self.parse_or_expr()
            self.expect_op(")")
            return expr
        if t.kind in ("NAME", "PNAME") and self.at_op("(", ahead=1) and t.text != "a":
            # function or UDF call: CONCAT, TRIPLE, SUBJECT, ... , myudf
            name = self.next().text
            self.expect_op("(")
            args = []
            while not self.at_op(")"):
                args.append(self.parse_or_expr())
                self.take_op(",")
            self.expect_op(")")
            return FuncCall(
                name.upper()
                if name.upper() in BUILTIN_FUNCS or name.upper() in AGG_FUNCS
                else name,
                tuple(args),
            )
        return TermExpr(self.parse_term())

    # -- updates
    def parse_update(self):
        if self.at_kw("INSERT") and self.at_kw("DATA", ahead=1):
            self.i += 2
            return InsertData(self.parse_quad_data())
        if self.at_kw("DELETE") and self.at_kw("DATA", ahead=1):
            self.i += 2
            return DeleteData(self.parse_quad_data())
        if self.at_kw("DELETE") and self.at_kw("WHERE", ahead=1):
            # DELETE WHERE { patterns }: patterns double as delete template
            self.i += 2
            grp = self.parse_group()
            tmpl = [
                TemplateQuad(e.s, e.p, e.o)
                for e in grp.elements
                if isinstance(e, TriplePattern)
            ] + [
                TemplateQuad(t.s, t.p, t.o, gb.graph.value)
                for gb in grp.elements
                if isinstance(gb, GraphBlock) and isinstance(gb.graph, Iri)
                for t in gb.group.elements
                if isinstance(t, TriplePattern)
            ]
            return Modify(delete_template=tmpl, where=grp)
        m = Modify()
        if self.take_kw("DELETE"):
            m.delete_template = self.parse_template()
        if self.take_kw("INSERT"):
            m.insert_template = self.parse_template()
        if not m.delete_template and not m.insert_template:
            raise ParseError(f"expected update form at {self.peek()!r}")
        self.expect_kw("WHERE")
        m.where = self.parse_group()
        return m

    def parse_quad_data(self) -> list[tuple[Term, Term, Term, str | None]]:
        self.expect_op("{")
        quads: list[tuple[Term, Term, Term, str | None]] = []
        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.i += 1
                gname = self._iri_value()
                self.expect_op("{")
                while not self.at_op("}"):
                    g2 = Group()
                    self.parse_triples_block(g2)
                    for e in g2.elements:
                        quads.append((e.s, e.p, e.o, gname))
                self.expect_op("}")
            else:
                g2 = Group()
                self.parse_triples_block(g2)
                for e in g2.elements:
                    quads.append((e.s, e.p, e.o, None))
        self.expect_op("}")
        return quads

    def parse_template(self) -> list[TemplateQuad]:
        self.expect_op("{")
        tmpl: list[TemplateQuad] = []
        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.i += 1
                gname = self._iri_value()
                self.expect_op("{")
                while not self.at_op("}"):
                    g2 = Group()
                    self.parse_triples_block(g2)
                    tmpl.extend(TemplateQuad(e.s, e.p, e.o, gname) for e in g2.elements)
                self.expect_op("}")
            else:
                g2 = Group()
                self.parse_triples_block(g2)
                tmpl.extend(TemplateQuad(e.s, e.p, e.o) for e in g2.elements)
        self.expect_op("}")
        return tmpl


BUILTIN_FUNCS = {
    "CONCAT", "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ISTRIPLE",
    # SPARQL 1.1 builtins (extensions beyond the reference grammar)
    "STRLEN", "SUBSTR", "UCASE", "LCASE", "CONTAINS", "STRSTARTS",
    "STRENDS", "REPLACE", "REGEX", "COALESCE", "IF", "BOUND", "STR",
    "ABS", "ROUND", "CEIL", "FLOOR",
}


def parse_query(text: str) -> Query:
    return Parser(text).parse()
