"""AST for the reference's SPARQL fragment.

Mirrors the *capability* of the reference IR (shared/src/query.rs:363-424,
CombinedQuery/SelectQuery) — SELECT [DISTINCT] with SUM/MIN/MAX/AVG/COUNT
aggregates, WHERE { BGP, FILTER, BIND, VALUES, UNION, GRAPH, sub-SELECT },
GROUP BY / ORDER BY / LIMIT (+ OFFSET for builder parity), FROM / FROM NAMED,
the six SPARQL Update forms, and RDF-star quoted-triple patterns. Terms stay
lexical strings throughout (see schema.py for why there is no dictionary).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ------------------------------------------------------------------- terms
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str  # without angle brackets


@dataclass(frozen=True)
class Lit:
    value: str  # lexical form; datatype stripped, lang kept as "val@lang"


@dataclass(frozen=True)
class BlankNode:
    label: str


@dataclass(frozen=True)
class QuotedTriple:
    """RDF-star << s p o >> — usable as a term in data and in patterns."""

    s: "Term"
    p: "Term"
    o: "Term"


Term = Var | Iri | Lit | BlankNode | QuotedTriple


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term
    o: Term


# -------------------------------------------------------------- expressions
@dataclass(frozen=True)
class TermExpr:
    term: Term


@dataclass(frozen=True)
class Cmp:
    left: "Expr"
    op: str  # = != < <= > >=
    right: "Expr"


@dataclass(frozen=True)
class And:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Or:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Not:
    expr: "Expr"


@dataclass(frozen=True)
class Arith:
    op: str  # + - * /
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class FuncCall:
    name: str  # upper-cased: CONCAT, TRIPLE, SUBJECT, ... or a UDF name
    args: tuple["Expr", ...]


Expr = TermExpr | Cmp | And | Or | Not | Arith | FuncCall


# ------------------------------------------------------------ group pattern
@dataclass
class Bind:
    expr: Expr
    var: Var


@dataclass
class ValuesBlock:
    vars: list[Var]
    rows: list[list[Term | None]]  # None = UNDEF


@dataclass
class GraphBlock:
    graph: Iri | Var
    group: "Group"


@dataclass
class UnionBlock:
    branches: list["Group"]


@dataclass
class Filter:
    expr: "Expr | Exists"


@dataclass
class SubSelect:
    query: "SelectQuery"


# Spark-first extensions beyond the reference's SPARQL fragment (SURVEY
# §2.3/§2.8 mark OPTIONAL/MINUS/EXISTS as absent there) — left-outer /
# anti / semi joins are native Catalyst operators, so we expose them.
@dataclass
class OptionalBlock:
    group: "Group"


@dataclass
class MinusBlock:
    group: "Group"


@dataclass
class Exists:
    """FILTER [NOT] EXISTS { ... } — used as a Filter expression."""

    group: "Group"
    negated: bool = False


# Property paths (also absent from the reference's grammar): ^p inverse,
# p1/p2 sequence, p1|p2 alternative, p+ one-or-more (transitive closure
# via the semi-naive DataFrame fixpoint). Zero-length forms p* and p?
# are supported ONLY with a ground endpoint (seeded BFS / direct edges
# plus the start term): the var-var zero-length semantics — every graph
# term paired with itself — doesn't scale and is rejected at compile.
@dataclass
class PathInverse:
    inner: "Path"


@dataclass
class PathSeq:
    parts: "list[Path]"


@dataclass
class PathAlt:
    parts: "list[Path]"


@dataclass
class PathPlus:
    inner: "Path"


@dataclass
class PathStar:
    inner: "Path"


@dataclass
class PathOpt:
    inner: "Path"


@dataclass
class PathNeg:
    """Negated property set ``!(:p | ^:q | ...)`` (SPARQL 1.1 §9.1,
    PathNegatedPropertySet): matches one edge whose predicate is NOT in
    ``forward`` (subject→object direction) unioned with one REVERSED
    edge whose predicate is not in ``inverse`` (for the ``^``-marked
    members)."""

    forward: list  # list[Iri]
    inverse: list  # list[Iri]


Path = (
    Iri | PathInverse | PathSeq | PathAlt | PathPlus | PathStar | PathOpt
    | PathNeg
)


@dataclass
class PathPattern:
    s: Term
    path: Path
    o: Term


GroupElement = (
    TriplePattern | Filter | Bind | ValuesBlock | GraphBlock | UnionBlock
    | SubSelect | OptionalBlock | MinusBlock | PathPattern
)


@dataclass
class Group:
    elements: list[GroupElement] = field(default_factory=list)


# ------------------------------------------------------------------ queries
@dataclass
class Aggregate:
    func: str  # SUM MIN MAX AVG COUNT GROUP_CONCAT SAMPLE
    arg: Var | None  # None = COUNT(*)
    alias: str
    distinct: bool = False
    separator: str = " "  # GROUP_CONCAT only


@dataclass
class ProjExpr:
    """(expr AS ?alias) projection (SPARQL 1.1 extension)."""

    expr: object
    alias: str


@dataclass
class SelectQuery:
    select: list  # Var | Aggregate | ProjExpr; empty + star=True => SELECT *
    star: bool = False
    distinct: bool = False
    where: Group = field(default_factory=Group)
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)
    group_by: list[Var] = field(default_factory=list)
    having: object | None = None  # post-aggregation constraint (SPARQL 1.1)
    order_by: list[tuple[Var, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None
    # SPARQL 1.1 query-level ValuesClause (trailing VALUES). Spec
    # §18.2.4.5 joins it AFTER grouping/aggregation; the compiler honors
    # that when the query aggregates, else folds it into the WHERE group.
    trailing_values: object | None = None  # ValuesBlock


# ------------------------------------------------------------------ updates
@dataclass
class QuadData:
    """Ground quads from INSERT/DELETE DATA: (s,p,o,g) with g=None default."""

    quads: list[tuple[Term, Term, Term, str | None]]


@dataclass
class InsertData(QuadData):
    pass


@dataclass
class DeleteData(QuadData):
    pass


@dataclass
class TemplateQuad:
    s: Term
    p: Term
    o: Term
    g: str | None = None


@dataclass
class Modify:
    """DELETE {t} INSERT {t} WHERE {g} and its one-sided forms; also
    DELETE WHERE {p} (patterns double as delete template)."""

    delete_template: list[TemplateQuad] = field(default_factory=list)
    insert_template: list[TemplateQuad] = field(default_factory=list)
    where: Group = field(default_factory=Group)


UpdateOp = InsertData | DeleteData | Modify


@dataclass
class ConstructQuery:
    """CONSTRUCT { template } WHERE { group } (SPARQL 1.1 extension —
    the reference only has the RULE :- CONSTRUCT form)."""

    template: list[TemplateQuad] = field(default_factory=list)
    where: Group = field(default_factory=Group)
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


@dataclass
class AskQuery:
    """ASK [WHERE] { group } (SPARQL 1.1 extension)."""

    where: Group = field(default_factory=Group)
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


@dataclass
class DescribeQuery:
    """DESCRIBE <iri>... (SPARQL 1.1 extension; ground IRIs, simple
    subject-outbound description)."""

    iris: list[Term] = field(default_factory=list)


@dataclass
class Query:
    """Top-level parse result: exactly one of select / update /
    construct / ask / describe."""

    prefixes: dict[str, str] = field(default_factory=dict)
    select: SelectQuery | None = None
    update: UpdateOp | None = None
    construct: ConstructQuery | None = None
    ask: AskQuery | None = None
    describe: DescribeQuery | None = None
