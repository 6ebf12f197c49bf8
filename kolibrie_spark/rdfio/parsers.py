"""Parsers for the reference's serialization formats.

Parity targets (citations into /root/reference/kolibrie/src):
- N-Triples(-star): full literal escapes \\t \\n \\" \\u \\U, datatype/lang
  suffixes, 'a' shorthand, nested << >> (sparql_database.rs:1345-1656).
- N-Quads: 3- or 4-part lines (sparql_database.rs:1411-1461).
- Turtle(-star): @prefix/PREFIX, ';' and ',' continuations, << >> terms,
  {| p o |} annotation syntax (sparql_database.rs:965-1247).
- N3: prefix decls + statements — the reference parses the same statement
  subset (sparql_database.rs:1264-1332); we reuse the Turtle machinery.
- RDF/XML: rdf:Description / rdf:about / rdf:resource subset with xmlns
  prefixes (sparql_database.rs:630-963).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from kolibrie_spark.rdfstar import qt_id
from kolibrie_spark.schema import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE

_TOK = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<QTO><<)
  | (?P<QTC>>>)
  | (?P<ANO>\{\|)
  | (?P<ANC>\|\})
  | (?P<IRI><[^<>\s]*>)
  | (?P<STR>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<BLANK>_:[A-Za-z0-9_.\-]+)
  | (?P<DT>\^\^)
  | (?P<LANG>@[A-Za-z][A-Za-z0-9\-]*)
  | (?P<BRO>\[)
  | (?P<BRC>\])
  | (?P<PARO>\()
  | (?P<PARC>\))
  | (?P<PUNCT>[;,.])
  | (?P<NUM>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>(?:[A-Za-z_][\w\-]*)?:(?:[\w.\-/%#~]*[\w\-/%#~])?)
  | (?P<NAME>[A-Za-z_]\w*)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _shed_bom(text: str) -> str:
    """Drop a leading U+FEFF — the RDF serialization grammars allow an
    optional byte-order mark at the start of the document (Turtle spec
    sec 6.2), and Windows-exported dumps routinely carry one.  Only the
    document head can have it, so slice/chunk parsers see it at most on
    their first input."""
    return text[1:] if text.startswith("\ufeff") else text


class RdfParseError(ValueError):
    pass


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


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOK.match(text, pos)
        if not m:
            raise RdfParseError(f"lex error at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup != "WS":
            toks.append((m.lastgroup, m.group()))
    return toks


class _TermReader:
    def __init__(
        self,
        toks,
        prefixes: dict[str, str] | None = None,
        allow_anon: bool = False,
        anon_prefix: str = "",
    ):
        self.toks = toks
        self.i = 0
        self.prefixes = prefixes or {}
        self.quoted: list[tuple[str, str, str, str]] = []
        # triples emitted by nested structures ('[ ... ]' property lists,
        # '( ... )' collection chains) — Turtle only; N-Triples/N-Quads
        # construct the reader without allow_anon, so '[' stays a loud
        # parse error there exactly as the W3C grammar demands
        self.allow_anon = allow_anon
        self.anon_prefix = anon_prefix
        self.emitted: list[tuple[str, str, str]] = []
        self._anon_n = 0

    def _new_bnode(self) -> str:
        """Allocate an anonymous blank-node label.  DOCUMENT-scoped like
        every other blank label, so distributed chunk parses salt
        ``anon_prefix`` per chunk (the rdfxml readers' genid discipline,
        parse_rdfxml docstring) — counters restart per chunk and must
        not collide across chunks of one file."""
        self._anon_n += 1
        return f"_:{self.anon_prefix}anon{self._anon_n}"

    def at(self, kind: str) -> bool:
        return self.i < len(self.toks) and self.toks[self.i][0] == kind

    def at_punct(self, ch: str) -> bool:
        return (
            self.i < len(self.toks)
            and self.toks[self.i][0] == "PUNCT"
            and self.toks[self.i][1] == ch
        )

    def done(self) -> bool:
        return self.i >= len(self.toks)

    def read_term(self) -> str:
        if self.done():
            raise RdfParseError("expected term, found end of input")
        kind, text = self.toks[self.i]
        self.i += 1
        if kind == "IRI":
            return text[1:-1]
        if kind == "BLANK":
            return text
        if kind == "NUM":
            return text
        if kind == "STR":
            val = _unescape(text[1:-1])
            # lang kept as value@lang; datatype stripped
            if self.at("LANG"):
                val = f"{val}{self.toks[self.i][1]}"
                self.i += 1
            elif self.at("DT"):
                self.i += 1
                if self.done():
                    raise RdfParseError("dangling ^^")
                self.i += 1  # datatype IRI/PNAME discarded
            return val
        if kind == "QTO":
            s = self.read_term()
            p = self.read_term()
            o = self.read_term()
            if not self.at("QTC"):
                raise RdfParseError("expected >> closing quoted triple")
            self.i += 1
            qid = qt_id(s, p, o)
            self.quoted.append((qid, s, p, o))
            return qid
        if kind == "PNAME":
            pfx, _, local = text.partition(":")
            if pfx in self.prefixes:
                return self.prefixes[pfx] + local
            return text if pfx else local
        if kind == "NAME":
            if text == "a":
                return RDF_TYPE
            return text
        if kind == "BRO":
            # blank-node property list '[ p o ; ... ]' (Turtle sec 2.7;
            # r12, VERDICT r11 task #4 — beyond reference parity, whose
            # line-based subset rejects these too, but OWL-shaped public
            # dumps open with one): allocate a fresh blank node, emit its
            # predicate-object pairs, return the node as the term
            if not self.allow_anon:
                raise RdfParseError(
                    "anonymous blank node '[' is not legal in this format"
                )
            b = self._new_bnode()
            if self.at("BRC"):  # ANON: '[ ]'
                self.i += 1
                return b
            while True:
                p = self.read_term()
                self.read_po_objects(b, p)
                if self.at_punct(";"):
                    self.i += 1
                    if self.at("BRC"):  # trailing ';' before ']' is legal
                        break
                    continue
                break
            if not self.at("BRC"):
                raise RdfParseError("expected ']' closing property list")
            self.i += 1
            return b
        if kind == "PARO":
            # collection '( e1 e2 ... )' -> rdf:first/rdf:rest chain,
            # '()' -> rdf:nil (Turtle sec 2.8)
            if not self.allow_anon:
                raise RdfParseError(
                    "collection '(' is not legal in this format"
                )
            items = []
            while not self.at("PARC"):
                if self.done():
                    raise RdfParseError("unterminated collection '( ...'")
                items.append(self.read_term())
            self.i += 1
            if not items:
                return RDF_NIL
            head = self._new_bnode()
            cur = head
            for idx, item in enumerate(items):
                self.emitted.append((cur, RDF_FIRST, item))
                nxt = self._new_bnode() if idx + 1 < len(items) else RDF_NIL
                self.emitted.append((cur, RDF_REST, nxt))
                cur = nxt
            return head
        raise RdfParseError(f"unexpected token {text!r}")

    def read_po_objects(self, s: str, p: str) -> None:
        """One objectList for (s, p): object (',' object)* — with the
        same ``{| ... |}`` annotation handling the statement loop uses.
        Shared by the top-level Turtle loop and nested '[ ]' lists so
        annotations and RDF-star ids behave identically at any depth."""
        while True:
            o = self.read_term()
            self.emitted.append((s, p, o))
            if self.at("ANO"):  # {| p2 o2 |} annotates the triple
                self.i += 1
                qid = qt_id(s, p, o)
                self.quoted.append((qid, s, p, o))
                while not self.at("ANC"):
                    p2 = self.read_term()
                    self.read_po_objects(qid, p2)
                    if self.at_punct(";"):
                        self.i += 1
                if self.at("ANC"):
                    self.i += 1
            if self.at_punct(","):
                self.i += 1
                continue
            break


# ------------------------------------------------------------------ formats
_EMPTY_PREFIXES: dict = {}


def parse_ntriples(text: str):
    """→ ([(s,p,o)], [(qid,qs,qp,qo)])

    Lines matching the simple-statement shape take the same fast path as
    Turtle (see ``_SIMPLE_LINE_RE`` below) — N-Triples has no prefixes,
    so conversion needs no deferral and statement order is preserved
    exactly; quoted-triple lines (``<< … >>``) and anything unusual
    decline to the tokenizer+reader per line."""
    text = _shed_bom(text)
    triples, quoted = [], []
    n_fast = n_slow = 0
    for raw in re.split(r"[\r\n]+", text):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        fm = _SIMPLE_LINE_RE.fullmatch(line)
        if fm:
            s, p, o = fm.group(1, 2, 3)
            triples.append(
                (
                    _fast_term(s, _EMPTY_PREFIXES),
                    _fast_term(p, _EMPTY_PREFIXES),
                    _fast_term(o, _EMPTY_PREFIXES),
                )
            )
            n_fast += 1
            continue
        n_slow += 1
        r = _TermReader(_tokenize(line))
        s = r.read_term()
        p = r.read_term()
        o = r.read_term()
        if not r.at_punct("."):
            raise RdfParseError(f"missing terminating '.' in {line!r}")
        triples.append((s, p, o))
        quoted.extend(r.quoted)
    FAST_PATH_STATS["fast"] += n_fast
    FAST_PATH_STATS["slow"] += n_slow
    return triples, quoted


def parse_nquads(text: str):
    """→ ([(s,p,o,g|None)], [(qid,qs,qp,qo)]); simple triple/quad lines
    take the fast path, everything else the tokenizer+reader."""
    text = _shed_bom(text)
    quads, quoted = [], []
    n_fast = n_slow = 0
    for raw in re.split(r"[\r\n]+", text):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        fm = _SIMPLE_LINE_RE.fullmatch(line)
        if fm:
            n_fast += 1
            s, p, o = fm.group(1, 2, 3)
            quads.append(
                (
                    _fast_term(s, _EMPTY_PREFIXES),
                    _fast_term(p, _EMPTY_PREFIXES),
                    _fast_term(o, _EMPTY_PREFIXES),
                    None,
                )
            )
            continue
        fm = _SIMPLE_QUAD_RE.fullmatch(line)
        if fm:
            n_fast += 1
            s, p, o, g = fm.group(1, 2, 3, 4)
            quads.append(
                (
                    _fast_term(s, _EMPTY_PREFIXES),
                    _fast_term(p, _EMPTY_PREFIXES),
                    _fast_term(o, _EMPTY_PREFIXES),
                    _fast_term(g, _EMPTY_PREFIXES),
                )
            )
            continue
        n_slow += 1
        r = _TermReader(_tokenize(line))
        s = r.read_term()
        p = r.read_term()
        o = r.read_term()
        g = None
        if not r.at_punct("."):
            g = r.read_term()
        if not r.at_punct("."):
            raise RdfParseError(f"missing terminating '.' in {line!r}")
        quads.append((s, p, o, g))
        quoted.extend(r.quoted)
    FAST_PATH_STATS["fast"] += n_fast
    FAST_PATH_STATS["slow"] += n_slow
    return quads, quoted


_PREFIX_RE = re.compile(
    r"^\s*(?:@prefix|@?PREFIX)\s+([A-Za-z_][\w\-]*)?:\s*<([^<>\s]*)>\s*\.?\s*$",
    re.IGNORECASE,
)


# One complete simple statement on one line — the overwhelming shape of a
# bulk Turtle dump — matched by a single compiled regex instead of ~8
# tokenizer matches plus reader dispatch (the per-statement constant the
# r9 ingest work left: VERDICT r8 task #2 kept the parser as-is; this is
# a FAST PATH inside it, not a semantics change).  Term alternatives
# mirror _TOK exactly (IRI, STR with optional @lang/^^dt, BLANK, NUM,
# PNAME, NAME); anything else — ';'/',' continuations, quoted triples,
# annotations, inline comments, multi-statement lines, a '.' not
# preceded by whitespace (where _TOK's maximal munch could disagree) —
# declines to the full tokenizer+reader.  A legal mid-statement
# continuation line can never look like this (continuations are (p, o)
# pairs or object lists, never exactly three bare terms plus '.').
_FAST_TERM = (
    r"<[^<>\s]*>"
    r'|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9\-]*'
    r"|\^\^(?:<[^<>\s]*>|(?:[A-Za-z_][\w\-]*)?:(?:[\w.\-/%#~]*[\w\-/%#~])?))?"
    r"|_:[A-Za-z0-9_.\-]+"
    # _TOK tries PUNCT before NUM, so a BARE leading-dot number ('.5')
    # lexes as '.' + '5' there (a parse error mid-statement) — the fast
    # branch must not accept it either; signed '+.5' is fine in both
    r"|(?:[+-](?:\d+\.\d*|\.\d+|\d+)|\d+\.\d*|\d+)(?:[eE][+-]?\d+)?"
    r"|(?:[A-Za-z_][\w\-]*)?:(?:[\w.\-/%#~]*[\w\-/%#~])?"
    r"|[A-Za-z_]\w*"
)
# trailing inline comment allowed: _TOK lexes '#...' to end-of-line as
# whitespace, so '. # c' and '.' are token-identical
_SIMPLE_LINE_RE = re.compile(
    rf"({_FAST_TERM})\s+({_FAST_TERM})\s+({_FAST_TERM})\s+\.(?:\s*#.*)?"
)
# N-Quads: the same shape with a graph term before the '.'
_SIMPLE_QUAD_RE = re.compile(
    rf"({_FAST_TERM})\s+({_FAST_TERM})\s+({_FAST_TERM})\s+({_FAST_TERM})"
    rf"\s+\.(?:\s*#.*)?"
)
_FAST_STR_RE = re.compile(
    r'"((?:[^"\\]|\\.)*)"(@[A-Za-z][A-Za-z0-9\-]*)?(?:\^\^\S+)?'
)

# Long-string ("""...""" / '''...''') support: rather than teaching the
# line loop and tokenizer multi-line state, long strings are INLINED up
# front into ordinary short-string literals with their raw specials
# escaped (newline -> \n, quote -> \", lone backslash -> \\; existing
# escape pairs kept verbatim), so the rest of the parser — fast path
# included — sees plain one-line statements.  The closer is the FIRST
# quote triple after the opener NOT inside an escape pair (a backslash
# consumes two chars — the W3C STRING_LITERAL_LONG_* rule, under which
# serializer output like """abc\"""" closes at the final triple, not
# inside the escaped quote), exactly the boundary rule the chunk
# scanners use (_TTL_STMT's long branch, the slow oracle's escape-aware
# walk — all tightened together in r11, ADVICE r10), so slice
# boundaries and parse agree on the same text.  Token-aware: IRIs,
# comments and short strings are matched (and copied verbatim) so a
# quote triple inside them is never taken for an opener.
_TTL_INLINE_RE = re.compile(
    r"<[^>]*>"
    r"|#[^\n]*"
    r'|"""(?:[^"\\]++|\\[\s\S]|"(?!""))*+"""'
    r"|'''(?:[^'\\]++|\\[\s\S]|'(?!''))*+'''"
    r'|"(?!"")(?:[^"\\]|\\[\s\S])*"'
    r"|'(?!'')(?:[^'\\]|\\[\s\S])*'"
)
_TTL_REQUOTE_RE = re.compile(r'\\[\s\S]|[\\"\n\r]')


def _requote(m: re.Match) -> str:
    g = m.group(0)
    if len(g) == 2:  # an existing escape pair, kept verbatim
        return g
    if g == "\\":  # lone trailing backslash (unreachable since the r11
        return "\\\\"  # escape-aware closer; kept as a safety net)
    if g == '"':
        return '\\"'
    return "\\n" if g == "\n" else "\\r"


def _inline_long_strings(text: str) -> str:
    def repl(m: re.Match) -> str:
        tok = m.group(0)
        if tok[:3] in ('"""', "'''") and len(tok) >= 6:
            return '"' + _TTL_REQUOTE_RE.sub(_requote, tok[3:-3]) + '"'
        return tok

    return _TTL_INLINE_RE.sub(repl, text)

# Line-state scan for the fast path's raw-newline-short-string guard
# (ADVICE r9): tokenize one line from NORMAL state at C speed — ordinary
# runs, COMPLETE short strings (escape-aware), stray escape pairs, a
# comment (ends the line), or a LONE opener quote/backslash.  The
# complete-string branches are tried before the lone-opener branch, so a
# lone match means precisely "no unescaped close quote follows on this
# line" — the line ends inside an unterminated short string.
_LINE_STATE_RE = re.compile(
    r"[^\"'\\#]+"
    r'|"(?:[^"\\]|\\.)*"'
    r"|'(?:[^'\\]|\\.)*'"
    r"|\\."
    r"|#.*"
    r"|[\"'\\]"
)
# Closer for a line ENTERED mid-string: everything up to the first
# unescaped quote of the opening style.
_CLOSE_RE = {
    '"': re.compile(r'(?:[^"\\]|\\.)*"'),
    "'": re.compile(r"(?:[^'\\]|\\.)*'"),
}

# Fast-path hit counters (VERDICT r9 task #6): cumulative statement-level
# tallies so the differential tests (and BASELINE.md) can pin the actual
# hit rate on bulk-dump-shaped corpora — a parser change that silently
# degrades the rate shows up as a failed lower-bound assert, not a
# quiet 2x ingest regression.  Per-process (executor-local) and test-only;
# nothing in the parse hot path reads them per line.
FAST_PATH_STATS = {"fast": 0, "slow": 0}


def _line_open_quote(line: str) -> str | None:
    """Quote char of the unterminated short string ``line`` ends inside
    (scanned from NORMAL state), or None when the line ends outside all
    strings.  Long strings are the caller's concern (``fast_ok`` declines
    the whole text when ``\"\"\"``/``'''`` appear anywhere)."""
    pos, n = 0, len(line)
    while pos < n:
        tok = _LINE_STATE_RE.match(line, pos).group(0)
        if tok == '"' or tok == "'":
            return tok
        if tok[0] == "#":
            return None
        pos += len(tok)
    return None


def _fast_term(tok: str, prefixes: dict[str, str]) -> str:
    """read_term()'s conversion for the fast-path token shapes — kept
    rule-for-rule identical (BLANK before PNAME so a declared '_' prefix
    never captures blank nodes; datatypes dropped; lang kept as
    value@lang; 'a' → rdf:type; unknown prefixes left verbatim, empty
    prefix falls back to the local part)."""
    c0 = tok[0]
    if c0 == "<":
        return tok[1:-1]
    if c0 == '"':
        m = _FAST_STR_RE.fullmatch(tok)
        val = _unescape(m.group(1))
        return f"{val}{m.group(2)}" if m.group(2) else val
    if tok.startswith("_:"):
        return tok
    if ":" in tok:
        pfx, _, local = tok.partition(":")
        if pfx in prefixes:
            return prefixes[pfx] + local
        return tok if pfx else local
    if tok == "a":
        return RDF_TYPE
    return tok  # NUM and bare NAME pass through unchanged


def parse_turtle(
    text: str,
    prefixes: dict[str, str] | None = None,
    anon_prefix: str = "",
):
    """→ ([(s,p,o)], [(qid,qs,qp,qo)], prefixes)

    Statement grammar: subject predicate object (',' object)*
    (';' predicate object...)* '.' with optional ``{| p o |}`` annotations
    after any object (emits ``<< s p o >> p2 o2``), blank-node property
    lists ``[ p o ; ... ]`` and collections ``( e1 e2 )`` (r12; expanded
    to rdf:first/rdf:rest chains, ``()`` → rdf:nil).  ``anon_prefix``
    salts the generated ``_:{prefix}anonN`` labels — blank labels are
    document-scoped, so a chunk-parallel ingest must pass a per-chunk
    salt exactly like the rdfxml readers' genid_prefix discipline.

    Simple one-line statements take the `_SIMPLE_LINE_RE` fast path;
    their term conversion is deferred until all ``@prefix`` lines are
    collected so the prefix map stays file-global (last declaration
    wins) exactly as the tokenizer path applies it.  Triple ORDER is the
    fast-path statements in line order followed by the remaining
    statements — the contract has never promised statement order and
    every consumer treats the result as a set."""
    text = _shed_bom(text)
    prefixes = dict(prefixes or {})
    # long strings would be corrupted by per-line matching (and the
    # tokenizer has no multi-line string state): inline them into
    # escaped short-string literals first, then everything downstream —
    # fast path included — sees one-line statements.  Only degenerate
    # leftovers (unbalanced openers) keep the fast path off.
    fast_ok = '"""' not in text and "'''" not in text
    if not fast_ok:
        text = _inline_long_strings(text)
        fast_ok = '"""' not in text and "'''" not in text
    fast_rows: list[tuple[str, str, str]] = []
    body_lines = []
    open_q: str | None = None  # unterminated raw-newline short string state
    for raw in re.split(r"[\r\n]+", text):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _PREFIX_RE.match(line)
        if m:
            prefixes[m.group(1) or ""] = m.group(2)
            continue
        if open_q is not None:
            # inside a short string opened on an earlier line (raw
            # newline in the literal): this line is string CONTENT — the
            # fast path must never extract a phantom triple from it
            # (ADVICE r9).  Route it to the tokenizer exactly as the
            # fast-disabled parse would, and update the string state.
            body_lines.append(line)
            cm = _CLOSE_RE[open_q].match(line)
            open_q = _line_open_quote(line[cm.end() :]) if cm else open_q
            continue
        if fast_ok:
            fm = _SIMPLE_LINE_RE.fullmatch(line)
            if fm:
                fast_rows.append(fm.group(1, 2, 3))
                continue
            open_q = _line_open_quote(line)
        body_lines.append(line)
    FAST_PATH_STATS["fast"] += len(fast_rows)
    FAST_PATH_STATS["slow"] += len(body_lines)
    triples: list[tuple[str, str, str]] = [
        (
            _fast_term(s, prefixes),
            _fast_term(p, prefixes),
            _fast_term(o, prefixes),
        )
        for (s, p, o) in fast_rows
    ]
    r = _TermReader(
        _tokenize("\n".join(body_lines)),
        prefixes,
        allow_anon=True,
        anon_prefix=anon_prefix,
    )

    while not r.done():
        # subject: any term, including '[ ... ]' property lists and
        # '( ... )' collections (r12) — their interior triples land on
        # r.emitted in reader order
        subj_is_bnpl = r.at("BRO")
        s = r.read_term()
        # a blankNodePropertyList may stand alone as a whole statement:
        # '[ :p :o ] .' (Turtle grammar: blankNodePropertyList
        # predicateObjectList?)
        if subj_is_bnpl and r.at_punct("."):
            r.i += 1
            continue
        while True:
            p = r.read_term()
            r.read_po_objects(s, p)
            if r.at_punct(";"):
                r.i += 1
                if r.at_punct("."):
                    break
                continue
            break
        if r.at_punct("."):
            r.i += 1
        else:
            raise RdfParseError("missing terminating '.' in turtle statement")
    triples.extend(r.emitted)
    return triples, r.quoted, prefixes


def parse_n3(
    text: str,
    prefixes: dict[str, str] | None = None,
    anon_prefix: str = "",
):
    """The reference's N3 subset is prefix decls + turtle-style statements
    (sparql_database.rs:1264-1332)."""
    return parse_turtle(text, prefixes, anon_prefix=anon_prefix)


_RDF_NS = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"


_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"
_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def parse_rdfxml(
    text: str,
    base: str | None = None,
    bnode_prefix: str = "",
    genid_prefix: str | None = None,
) -> list[tuple[str, str, str]]:
    """RDF/XML node-element subset (reference sparql_database.rs:630-804,
    extended spec-ward per VERDICT r4 #9): rdf:about / rdf:ID (resolved
    against xml:base or ``base`` with '#', W3C rdf-syntax §5.3) /
    rdf:nodeID (blank node) subjects; typed node elements emit rdf:type;
    property elements take rdf:resource (base-resolved), rdf:nodeID,
    NESTED node elements (recursing, object = nested subject — anonymous
    nested nodes get deterministic _:genid labels), or text content as
    objects.

    Blank-node scoping (VERDICT r6 item #4): per RDF semantics a blank
    node label is DOCUMENT-scoped, so a multi-document ingest must salt
    labels or two files both writing ``rdf:nodeID="b1"`` (or both
    containing anonymous nested nodes → ``_:genid1``) silently merge into
    one node. ``bnode_prefix`` is inserted after ``_:`` on every
    rdf:nodeID label; ``genid_prefix`` (defaults to ``bnode_prefix``) on
    every generated anonymous label. ``read_rdfxml_df`` passes a per-file
    hash for the former and a per-file-chunk hash for the latter —
    nodeID labels must unify ACROSS chunks of one file while anonymous
    counters, which restart per chunk, must not. The reference scopes
    equivalently: each document's labels pass through its own dictionary
    encoding pass (kolibrie/src/sparql_database.rs:806-963)."""
    from urllib.parse import urljoin

    root = ET.fromstring(_shed_bom(text))
    doc_base = root.get(_XML_BASE) or base or ""
    if genid_prefix is None:
        genid_prefix = bnode_prefix
    triples: list[tuple[str, str, str]] = []
    genid = [0]

    def resolve(iri: str) -> str:
        if doc_base and not _ABS_IRI_RE.match(iri):
            return urljoin(doc_base, iri)
        return iri

    def subject_of(el) -> str:
        about = el.get(f"{_RDF_NS}about")
        if about is not None:
            return resolve(about)
        rid = el.get(f"{_RDF_NS}ID")
        if rid is not None:
            return urljoin(doc_base, "#" + rid) if doc_base else rid
        nid = el.get(f"{_RDF_NS}nodeID")
        if nid is not None:
            return f"_:{bnode_prefix}{nid}"
        genid[0] += 1
        return f"_:{genid_prefix}genid{genid[0]}"

    def node_element(el) -> str:
        s = subject_of(el)
        if el.tag != f"{_RDF_NS}Description":
            triples.append((s, RDF_TYPE, _expand_tag(el.tag)))
        for child in el:  # property elements
            pred = _expand_tag(child.tag)
            res = child.get(f"{_RDF_NS}resource")
            nid = child.get(f"{_RDF_NS}nodeID")
            nested = list(child)
            if res is not None:
                obj = resolve(res)
            elif nid is not None:
                obj = f"_:{bnode_prefix}{nid}"
            elif nested:
                obj = node_element(nested[0])
            else:
                # literal text is VERBATIM per rdf-syntax §7.2.16 — no
                # stripping: ' '/nbsp-only and padded literals survive
                obj = child.text or ""
            triples.append((s, pred, obj))
        return s

    descriptions = list(root) if root.tag == f"{_RDF_NS}RDF" else [root]
    for desc in descriptions:
        node_element(desc)
    return triples


def _expand_tag(tag: str) -> str:
    # ElementTree gives '{namespace}local' — join into a plain IRI
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag
