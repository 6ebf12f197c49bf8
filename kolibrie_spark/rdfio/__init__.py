"""RDF ingestion/serialization (reference sparql_database.rs:457-1656).

Formats the reference parses: N-Triples(-star), N-Quads, Turtle(-star, with
``{| ... |}`` annotation syntax), N3 (prefix+statement subset), RDF/XML
(rdf:Description subset). Serializers: N-Triples-star, N-Quads, Turtle-star,
RDF/XML.

Term model matches the reference's lexical cleaning
(sparql_database.rs:61-101, 1628-1656): IRIs stored without angle brackets,
literal datatypes stripped, language tags kept as ``value@lang``, blank
nodes as ``_:label``, quoted triples interned as ``qt:`` surrogate ids.

Scale path: the line-oriented formats (N-Triples/N-Quads) parse
embarrassingly parallel — ``read_ntriples_df``/``read_nquads_df`` run the
same parser inside ``mapPartitions`` over ``spark.read.text``, so a 100 TB
dump ingests as a map-only job with no driver involvement.
"""

from kolibrie_spark.rdfio.parsers import (
    _PREFIX_RE,
    parse_n3,
    parse_nquads,
    parse_ntriples,
    parse_rdfxml,
    parse_turtle,
)
from kolibrie_spark.rdfio.serializers import (
    serialize_nquads,
    serialize_ntriples,
    serialize_rdfxml,
    serialize_turtle,
)

FORMAT_ALIASES = {
    "nt": "ntriples",
    "ntriples": "ntriples",
    "n-triples": "ntriples",
    "nq": "nquads",
    "nquads": "nquads",
    "n-quads": "nquads",
    "ttl": "turtle",
    "turtle": "turtle",
    "n3": "n3",
    "rdf": "rdfxml",
    "xml": "rdfxml",
    "rdfxml": "rdfxml",
    "rdf/xml": "rdfxml",
}


def _parse(text: str, fmt: str):
    fmt = FORMAT_ALIASES[fmt.lower()]
    if fmt == "ntriples":
        triples, quoted = parse_ntriples(text)
        return [(s, p, o, None) for (s, p, o) in triples], quoted
    if fmt == "nquads":
        return parse_nquads(text)
    if fmt == "turtle":
        triples, quoted, _ = parse_turtle(text)
        return [(s, p, o, None) for (s, p, o) in triples], quoted
    if fmt == "n3":
        triples, quoted, _ = parse_n3(text)
        return [(s, p, o, None) for (s, p, o) in triples], quoted
    if fmt == "rdfxml":
        triples = parse_rdfxml(text)
        return [(s, p, o, None) for (s, p, o) in triples], []
    raise ValueError(f"unknown format {fmt!r}")


def parse_into(store, text: str, fmt: str = "turtle") -> int:
    """Parse serialized RDF into a QuadStore; returns quad count added."""
    quads, quoted = _parse(text, fmt)
    if quoted:
        store.add_quoted(quoted)
    if quads:
        store.add_quads(quads)
    return len(quads)


def load_into(store, path: str, fmt: str | None = None) -> int:
    if fmt is None:
        ext = path.rsplit(".", 1)[-1].lower()
        fmt = ext
    with open(path, encoding="utf-8") as f:
        return parse_into(store, f.read(), fmt=fmt)


def read_ntriples_df(spark, path: str):
    """Distributed N-Triples ingestion: mapPartitions over text lines →
    quads DataFrame (quoted triples resolved per-partition; ids are
    content-hashed so no cross-partition coordination is needed)."""
    from kolibrie_spark.schema import QUADS_SCHEMA

    lines = spark.read.text(path)

    def run(part):
        for row in part:
            triples, _quoted = parse_ntriples(row.value)
            for s, p, o in triples:
                yield (s, p, o, None)

    return lines.rdd.mapPartitions(lambda it: run(it)).toDF(QUADS_SCHEMA)


def read_nquads_df(spark, path: str):
    from kolibrie_spark.schema import QUADS_SCHEMA

    lines = spark.read.text(path)

    def run(part):
        for row in part:
            quads, _quoted = parse_nquads(row.value)
            yield from quads

    return lines.rdd.mapPartitions(lambda it: run(it)).toDF(QUADS_SCHEMA)


def _turtle_statement_chunks(text: str, per_chunk: int):
    """Split Turtle text into independently-parseable statement chunks —
    the reference's chunk-parallel trick (sparql_database.rs:965-1141)
    done by a single linear scan: a '.' terminates a statement when it is
    outside <IRI> brackets and string literals (short and long, both
    quote styles) and is followed by whitespace/EOF (so decimals like
    1.5 don't split).  @prefix lines are dropped here (the caller
    broadcasts the collected prefix map instead)."""
    body = "\n".join(
        line
        for line in text.splitlines()
        if not (_PREFIX_RE.match(line.strip()) or line.strip().startswith("#"))
    )
    chunks: list[str] = []
    start = 0
    n_stmts = 0
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "<":  # IRI: skip to closing '>'
            j = body.find(">", i + 1)
            i = n if j < 0 else j + 1
            continue
        if c in ('"', "'"):
            if body[i : i + 3] in ('"""', "'''"):  # long string
                j = body.find(c * 3, i + 3)
                i = n if j < 0 else j + 3
            else:
                j = i + 1
                while j < n and body[j] != c:
                    j += 2 if body[j] == "\\" else 1
                i = j + 1
            continue
        if c == "#":  # comment to end of line
            j = body.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "." and (i + 1 >= n or body[i + 1].isspace()):
            n_stmts += 1
            if n_stmts >= per_chunk:
                chunks.append(body[start : i + 1])
                start = i + 1
                n_stmts = 0
        i += 1
    if body[start:].strip():
        chunks.append(body[start:])
    return chunks


def read_rdfxml_df(spark, path: str):
    """Distributed RDF/XML ingestion at FILE granularity: XML has no
    safe mid-document split point (element nesting), so the parallel
    grain is one document per task — the natural shape for the many-file
    corpora RDF/XML ships as; shred giant single documents upstream.
    Blank-node labels (_:genid) are per-document, so no cross-file
    coordination is needed."""
    from kolibrie_spark.schema import QUADS_SCHEMA

    files = spark.read.text(path, wholetext=True)

    def run(part):
        for row in part:
            for s, p, o in parse_rdfxml(row.value):
                yield (s, p, o, None)

    return files.rdd.mapPartitions(run).toDF(QUADS_SCHEMA)


def read_n3_df(spark, path: str, statements_per_chunk: int = 2000):
    """Distributed N3 ingestion — same chunk-parallel scheme as
    :func:`read_turtle_df` (the repo's N3 subset shares Turtle's
    statement syntax; formulas `{ }` are driver-side only)."""
    from kolibrie_spark.schema import QUADS_SCHEMA

    files = spark.read.text(path, wholetext=True)
    prefixes = _collect_prefixes(spark, path)
    par = spark.sparkContext.defaultParallelism

    def chunk(part):
        for row in part:
            for ch in _turtle_statement_chunks(row.value, statements_per_chunk):
                yield (ch,)

    def parse_part(part):
        for (ch,) in part:
            triples, _quoted, _ = parse_n3(ch, prefixes=prefixes)
            for s, p, o in triples:
                yield (s, p, o, None)

    return (
        files.rdd.mapPartitions(chunk).repartition(par).mapPartitions(parse_part)
        .toDF(QUADS_SCHEMA)
    )


def _collect_prefixes(spark, path: str, head_bytes: int = 1 << 16) -> dict:
    """@prefix map for a Turtle/N3 corpus, reading only each file's HEAD
    (``head_bytes``, default 64 KiB) when the path is local — prefix
    headers live at the top of a Turtle file, and re-reading a 100 TB
    corpus end-to-end just to find them would double the ingest IO.
    Falls back to a full line scan for non-listable paths.  A prefix
    declared beyond the head window is missed — the same
    header-broadcast assumption the reference's chunk-parallel parser
    makes (prefixes are file-global here, not declaration-ordered)."""
    import glob as _glob
    import os

    paths: list[str] | None = None
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
    elif os.path.isfile(path):
        paths = [path]
    else:
        hits = sorted(p for p in _glob.glob(path) if os.path.isfile(p))
        paths = hits or None

    if paths:
        sc = spark.sparkContext

        def heads(it):
            for fp in it:
                try:
                    with open(fp, "rb") as f:
                        text = f.read(head_bytes).decode("utf-8", "replace")
                except OSError:
                    continue
                for line in text.splitlines():
                    m = _PREFIX_RE.match(line.strip())
                    if m:
                        yield (m.group(1) or "", m.group(2))

        n = max(1, min(len(paths), sc.defaultParallelism))
        return dict(sc.parallelize(paths, n).mapPartitions(heads).collect())

    lines = spark.read.text(path)

    def prefix_lines(part):
        for row in part:
            m = _PREFIX_RE.match(row.value.strip())
            if m:
                yield (m.group(1) or "", m.group(2))

    return dict(lines.rdd.mapPartitions(prefix_lines).collect())


def read_turtle_df(spark, path: str, statements_per_chunk: int = 2000):
    """Distributed Turtle(-star) ingestion (reference chunk-parallel
    parser, sparql_database.rs:965-1141): one head-only pass collects the
    (tiny) @prefix header from every file and broadcasts it
    (:func:`_collect_prefixes` — 64 KiB per file, not a full re-read); a
    second pass splits each file into statement chunks at top-level '.'
    boundaries and parses the chunks in parallel with the shared prefix
    map — so a multi-file / multi-GB Turtle corpus ingests without the
    driver ever seeing a triple.  Matches ``parse_turtle`` exactly on the
    same input (round-trip tested), with the same documented divergence
    as the reference's parallel path: prefixes apply file-globally, not
    declaration-ordered."""
    from kolibrie_spark.schema import QUADS_SCHEMA

    files = spark.read.text(path, wholetext=True)
    prefixes = _collect_prefixes(spark, path)

    par = spark.sparkContext.defaultParallelism

    def chunk(part):
        for row in part:
            for ch in _turtle_statement_chunks(row.value, statements_per_chunk):
                yield (ch,)

    chunked = files.rdd.mapPartitions(chunk).repartition(par)

    def parse_part(part):
        for (ch,) in part:
            triples, _quoted, _ = parse_turtle(ch, prefixes=prefixes)
            for s, p, o in triples:
                yield (s, p, o, None)

    return chunked.mapPartitions(parse_part).toDF(QUADS_SCHEMA)
