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
