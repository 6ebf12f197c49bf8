"""Ingestion/serialization round trips (FIXTURES.md §8): parse → serialize
→ parse equals the original quad set, in each format the reference parses."""

import pytest

from kolibrie_spark.rdfio.parsers import (
    RdfParseError,
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

NT = """
<http://ex/alice> <http://ex/name> "Alice" .
<http://ex/alice> <http://ex/age> "25"^^<http://www.w3.org/2001/XMLSchema#int> .
<http://ex/alice> <http://ex/motto> "caf\\u00e9 \\"quoted\\""@fr .
<http://ex/alice> a <http://ex/Person> .
_:b1 <http://ex/knows> <http://ex/alice> .
<< <http://ex/alice> <http://ex/age> "25" >> <http://ex/certainty> "0.9" .
"""


def test_parse_ntriples_term_cleaning():
    triples, quoted = parse_ntriples(NT)
    d = {(p): (s, o) for (s, p, o) in triples}
    assert d["http://ex/name"] == ("http://ex/alice", "Alice")
    # datatype stripped, lang kept as value@lang, escapes decoded
    assert d["http://ex/age"][1] == "25"
    assert d["http://ex/motto"][1] == 'café "quoted"@fr'
    assert d["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"][1] == "http://ex/Person"
    assert d["http://ex/knows"][0] == "_:b1"
    # quoted triple interned with stable id
    assert len(quoted) == 1
    qid = quoted[0][0]
    assert d["http://ex/certainty"][0] == qid and qid.startswith("qt:")


def test_ntriples_roundtrip():
    triples, quoted = parse_ntriples(NT)
    text = serialize_ntriples(triples, quoted)
    again, quoted2 = parse_ntriples(text)
    assert sorted(again) == sorted(triples)
    assert sorted(quoted2) == sorted(quoted)


def test_nquads_roundtrip():
    nq = """
<http://ex/a> <http://ex/p> "1" .
<http://ex/a> <http://ex/p> "2" <http://ex/g1> .
<http://ex/b> <http://ex/q> <http://ex/c> <http://ex/g2> .
"""
    quads, quoted = parse_nquads(nq)
    assert quads[0][3] is None and quads[1][3] == "http://ex/g1"
    text = serialize_nquads(quads, quoted)
    again, _ = parse_nquads(text)
    assert sorted(again) == sorted(quads)


TTL = """
@prefix ex: <http://ex/> .
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
ex:alice foaf:name "Alice" ;
    ex:age "25" , "26" ;
    ex:city ex:ghent .
ex:bob ex:age "30" {| ex:certainty "0.8" |} .
<< ex:alice ex:age "25" >> ex:source ex:census .
"""


def test_parse_turtle_continuations_and_annotations():
    triples, quoted, prefixes = parse_turtle(TTL)
    assert prefixes["ex"] == "http://ex/"
    got = set(triples)
    assert ("http://ex/alice", "http://xmlns.com/foaf/0.1/name", "Alice") in got
    assert ("http://ex/alice", "http://ex/age", "25") in got
    assert ("http://ex/alice", "http://ex/age", "26") in got
    assert ("http://ex/alice", "http://ex/city", "http://ex/ghent") in got
    # annotation syntax: << bob age 30 >> certainty 0.8
    ann = [t for t in triples if t[1] == "http://ex/certainty"]
    assert len(ann) == 1 and ann[0][0].startswith("qt:") and ann[0][2] == "0.8"
    # explicit quoted-triple statement
    src = [t for t in triples if t[1] == "http://ex/source"]
    assert src[0][0].startswith("qt:")
    assert len(quoted) == 2


def test_turtle_roundtrip():
    triples, quoted, _ = parse_turtle(TTL)
    text = serialize_turtle(triples, quoted)
    again, quoted2, _ = parse_turtle(text)
    assert sorted(again) == sorted(triples)


def test_rdfxml_parse_and_roundtrip():
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://ex/">
  <rdf:Description rdf:about="http://ex/alice">
    <ex:name>Alice</ex:name>
    <ex:city rdf:resource="http://ex/ghent"/>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(xml)
    assert ("http://ex/alice", "http://ex/name", "Alice") in triples
    assert ("http://ex/alice", "http://ex/city", "http://ex/ghent") in triples
    text = serialize_rdfxml(triples)
    again = parse_rdfxml(text)
    assert sorted(again) == sorted(triples)


def test_parse_errors():
    with pytest.raises(RdfParseError):
        parse_ntriples("<http://ex/a> <http://ex/p> ")
    with pytest.raises(RdfParseError):
        parse_ntriples('<a> <b> "unclosed >>')


def test_engine_integration(engine):
    engine.parse_data(NT, fmt="ntriples")
    got = engine.execute(
        "SELECT ?n WHERE { ?s <http://ex/name> ?n }"
    )
    assert got == [["Alice"]]
    # quoted triple queryable through the SPARQL surface
    got = engine.execute(
        'SELECT ?c WHERE { << <http://ex/alice> <http://ex/age> "25" >> '
        "<http://ex/certainty> ?c }"
    )
    assert got == [["0.9"]]


def test_distributed_ntriples_read(spark, tmp_path):
    from kolibrie_spark.rdfio import read_ntriples_df

    path = tmp_path / "data.nt"
    path.write_text(
        "\n".join(f'<http://ex/s{i}> <http://ex/p> "{i}" .' for i in range(100))
    )
    df = read_ntriples_df(spark, str(path))
    assert df.count() == 100
    assert df.filter("o = '42'").count() == 1


def test_distributed_turtle_read_matches_driver_parse(spark, tmp_path):
    """read_turtle_df (chunk-parallel, VERDICT r4 item #7) must produce the
    same quads the driver-side parse_turtle produces — across multiple
    files, multi-statement lines, `;`/`,` continuations, decimals (whose
    '.' must not split statements), comments, and string literals
    containing dots."""
    from kolibrie_spark.rdfio import parse_turtle, read_turtle_df

    header = "@prefix ex: <http://ex/> .\n@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n"
    bodies = []
    for f in range(3):
        lines = [header, f"# file {f} comment . with a dot\n"]
        for i in range(40):
            k = f * 100 + i
            lines.append(
                f'ex:s{k} foaf:name "N. {k}. dotted" ;\n'
                f"    ex:score 3.5 ,\n"
                f"        4.25 ;\n"
                f"    ex:knows ex:s{k + 1} .\n"
            )
        bodies.append("".join(lines))
    d = tmp_path / "ttl"
    d.mkdir()
    expected = []
    for f, body in enumerate(bodies):
        (d / f"part{f}.ttl").write_text(body)
        triples, _, _ = parse_turtle(body)
        expected.extend((s, p, o, None) for (s, p, o) in triples)
    df = read_turtle_df(spark, str(d), statements_per_chunk=7)
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(expected)
    assert df.rdd.getNumPartitions() > 1  # actually distributed


def test_rdfxml_id_nodeid_nested_and_base():
    """VERDICT r4 #9: rdf:ID resolves against xml:base with '#',
    rdf:about/rdf:resource resolve relative references, rdf:nodeID makes
    blank nodes on both ends, nested node elements recurse (anonymous
    ones get deterministic _:genid labels)."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex/ns#"
         xml:base="http://ex/doc">
  <rdf:Description rdf:ID="alice">
    <ex:name>Alice</ex:name>
    <ex:home rdf:resource="town"/>
    <ex:knows rdf:nodeID="b1"/>
    <ex:pet>
      <ex:Cat>
        <ex:name>Mia</ex:name>
      </ex:Cat>
    </ex:pet>
  </rdf:Description>
  <rdf:Description rdf:nodeID="b1">
    <ex:name>Bob</ex:name>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(xml)
    got = set(triples)
    assert ("http://ex/doc#alice", "http://ex/ns#name", "Alice") in got
    assert ("http://ex/doc#alice", "http://ex/ns#home", "http://ex/town") in got
    assert ("http://ex/doc#alice", "http://ex/ns#knows", "_:b1") in got
    assert ("_:b1", "http://ex/ns#name", "Bob") in got
    # nested typed node: rdf:type + its own property, linked from alice
    pets = [o for (s, p, o) in got if p == "http://ex/ns#pet"]
    assert pets and pets[0].startswith("_:genid")
    assert (pets[0], "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://ex/ns#Cat") in got
    assert (pets[0], "http://ex/ns#name", "Mia") in got


def test_distributed_rdfxml_and_n3_read(spark, tmp_path):
    """File-parallel RDF/XML + chunk-parallel N3 distributed readers
    match their driver-side parsers across multiple files."""
    from kolibrie_spark.rdfio import parse_n3, parse_rdfxml, read_n3_df, read_rdfxml_df

    xdir = tmp_path / "xml"
    xdir.mkdir()
    expected_x = []
    for f in range(3):
        xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://ex/">
  <rdf:Description rdf:about="http://ex/s{f}">
    <ex:name>Doc {f}</ex:name>
    <ex:link rdf:resource="http://ex/t{f}"/>
  </rdf:Description>
</rdf:RDF>"""
        (xdir / f"f{f}.rdf").write_text(xml)
        expected_x.extend((s, p, o, None) for (s, p, o) in parse_rdfxml(xml))
    got_x = sorted(tuple(r) for r in read_rdfxml_df(spark, str(xdir)).collect())
    assert got_x == sorted(expected_x)

    ndir = tmp_path / "n3"
    ndir.mkdir()
    expected_n = []
    for f in range(2):
        n3 = "@prefix ex: <http://ex/> .\n" + "".join(
            f"ex:a{f * 50 + i} ex:p ex:b{i} .\n" for i in range(50)
        )
        (ndir / f"f{f}.n3").write_text(n3)
        triples, _, _ = parse_n3(n3)
        expected_n.extend((s, p, o, None) for (s, p, o) in triples)
    got_n = sorted(tuple(r) for r in read_n3_df(spark, str(ndir), statements_per_chunk=13).collect())
    assert got_n == sorted(expected_n)


def test_turtle_chunker_edges():
    """_turtle_statement_chunks must not split inside long strings,
    IRIs, or comments, and must handle trailing statements without a
    final newline."""
    from kolibrie_spark.rdfio import _turtle_statement_chunks

    text = (
        '@prefix ex: <http://ex/> .\n'
        'ex:a ex:doc """multi. line. literal.\nwith \'quotes\' and . dots""" .\n'
        "# comment with a dot . and \"quotes\"\n"
        "ex:b ex:iri <http://ex/path.with.dots> .\n"
        "ex:c ex:num 3.25 .\n"
        "ex:d ex:esc \"short \\\" escaped. quote\" ."  # no trailing newline
    )
    chunks = _turtle_statement_chunks(text, per_chunk=1)
    assert len(chunks) == 4
    assert 'multi. line. literal.' in chunks[0]
    assert "path.with.dots" in chunks[1]
    assert "3.25" in chunks[2]
    assert "escaped. quote" in chunks[3]
    # prefix lines are stripped (caller broadcasts the map)
    assert all("@prefix" not in c for c in chunks)
    # one big chunk keeps everything
    assert len(_turtle_statement_chunks(text, per_chunk=100)) == 1


def test_multifile_rdfxml_blank_nodes_stay_distinct(spark, tmp_path):
    """VERDICT r6 item #4: two files each containing anonymous nested
    nodes AND the same rdf:nodeID label must yield DISTINCT blank nodes —
    labels are document-scoped in RDF."""
    from kolibrie_spark.rdfio import read_rdfxml_df

    xdir = tmp_path / "xml"
    xdir.mkdir()
    for f in range(2):
        xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://ex/">
  <rdf:Description rdf:about="http://ex/s{f}">
    <ex:pet><ex:Cat><ex:name>Cat{f}</ex:name></ex:Cat></ex:pet>
    <ex:knows rdf:nodeID="b1"/>
  </rdf:Description>
  <rdf:Description rdf:nodeID="b1"><ex:name>Friend{f}</ex:name></rdf:Description>
</rdf:RDF>"""
        (xdir / f"f{f}.rdf").write_text(xml)

    rows = [tuple(r) for r in read_rdfxml_df(spark, str(xdir)).collect()]
    # two files x one anonymous cat each -> 2 distinct genid subjects
    cat_nodes = {s for s, p, o, _ in rows if p == "http://ex/name" and o.startswith("Cat")}
    assert len(cat_nodes) == 2 and all(n.startswith("_:") for n in cat_nodes)
    # the rdf:nodeID="b1" labels must NOT conflate across files: each
    # file's ex:knows object is that file's own Friend node
    friend_of = {}
    name_of = {s: o for s, p, o, _ in rows if p == "http://ex/name"}
    for s, p, o, _ in rows:
        if p == "http://ex/knows":
            friend_of[s] = o
    assert len(set(friend_of.values())) == 2
    assert {name_of[b] for b in friend_of.values()} == {"Friend0", "Friend1"}
    # within one file, the nodeID reference and its definition DO unify
    assert all(b in name_of for b in friend_of.values())


def test_single_file_rdfxml_chunk_parallel_roundtrip(spark, tmp_path):
    """VERDICT r6 item #8: ONE RDF/XML file must split into >1 parse
    chunks and still produce the whole-document triple set (modulo
    blank-node relabeling), with rdf:ID/xml:base resolution and
    rdf:nodeID unification working across chunk boundaries."""
    from kolibrie_spark.rdfio import _rdfxml_chunks, read_rdfxml_df
    from kolibrie_spark.rdfio.parsers import parse_rdfxml

    n = 40
    body = "".join(
        f'<rdf:Description rdf:ID="r{i}"><ex:idx>{i}</ex:idx>'
        f'<ex:next rdf:resource="#r{(i + 1) % n}"/>'
        f"<ex:tag><ex:Tag><ex:val>t{i}</ex:val></ex:Tag></ex:tag>"
        f'<ex:hub rdf:nodeID="hub"/></rdf:Description>'
        for i in range(n)
    )
    xml = (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://ex/" xml:base="http://base/doc">'
        f'{body}<rdf:Description rdf:nodeID="hub"><ex:name>HUB</ex:name>'
        "</rdf:Description></rdf:RDF>"
    )
    f = tmp_path / "one.rdf"
    f.write_text(xml)

    assert len(_rdfxml_chunks(xml, 7)) > 1  # >1 parse tasks from ONE file

    got = [tuple(r) for r in read_rdfxml_df(spark, str(f), elements_per_chunk=7).collect()]
    want = [(s, p, o, None) for s, p, o in parse_rdfxml(xml)]
    assert len(got) == len(want)

    def skeleton(rows):
        # blank labels are arbitrary: canonicalize each bnode by its
        # 1-hop signature (sorted incident predicate/ground-term edges) —
        # unique in this fixture (distinct ex:val per genid node, one hub)
        sig = {}
        for s, p, o, _ in rows:
            if s.startswith("_:") and not o.startswith("_:"):
                sig.setdefault(s, []).append(("out", p, o))
            if o.startswith("_:") and not s.startswith("_:"):
                sig.setdefault(o, []).append(("in", p, s))

        def wipe(t):
            return f"_:{sorted(sig[t])!r}" if t.startswith("_:") else t

        assert len({wipe(b) for b in sig}) == len(sig)  # signatures unique
        return sorted((wipe(s), p, wipe(o), g) for s, p, o, g in rows)

    assert skeleton(got) == skeleton(want)
    # xml:base'd rdf:ID resolution survives chunking
    assert ("http://base/doc#r0", "http://ex/idx", "0", None) in got
    assert ("http://base/doc#r3", "http://ex/next", "http://base/doc#r4", None) in got
    # rdf:nodeID="hub" unifies ACROSS chunks: every element's ex:hub
    # object is the single node that carries ex:name HUB
    hub_objs = {o for s, p, o, _ in got if p == "http://ex/hub"}
    hub_defs = {s for s, p, o, _ in got if o == "HUB"}
    assert len(hub_objs) == 1 and hub_objs == hub_defs


def test_multifile_turtle_prefixes_stay_per_file(spark, tmp_path):
    """VERDICT r6 item #5: two files binding the same @prefix label to
    DIFFERENT IRIs must each expand their own terms in their own
    namespace (no last-file-wins clobbering)."""
    from kolibrie_spark.rdfio import read_n3_df, read_turtle_df

    for reader, ext in [(read_turtle_df, "ttl"), (read_n3_df, "n3")]:
        d = tmp_path / f"corpus_{ext}"
        d.mkdir()
        for f in range(2):
            (d / f"f{f}.{ext}").write_text(
                f"@prefix ex: <http://domain{f}/> .\n"
                f"ex:subj ex:pred ex:obj{f} .\n"
            )
        rows = sorted(tuple(r) for r in reader(spark, str(d)).collect())
        assert rows == [
            ("http://domain0/subj", "http://domain0/pred", "http://domain0/obj0", None),
            ("http://domain1/subj", "http://domain1/pred", "http://domain1/obj1", None),
        ], rows


def test_regex_chunker_matches_percharacter_scan():
    """VERDICT r8 task #2: the compiled-regex statement scan must place
    exactly the same chunk boundaries as the per-character Python loop it
    replaced (kept as _turtle_statement_chunks_slow) — across dots in
    IRIs/literals/comments, decimals, long strings of both quote styles,
    escaped quotes, multi-statement lines, directives, and malformed
    tails."""
    from kolibrie_spark.rdfio import (
        _turtle_statement_chunks,
        _turtle_statement_chunks_slow,
    )

    cases = [
        'ex:a ex:b "dot . inside" .\nex:c ex:d "x" .',
        'ex:a ex:b """long\nstring . with dots.\n""" .\nex:c ex:d ex:e .',
        "ex:a ex:b 'single . quo\\'te' .",
        "ex:a ex:b '''long single ' quote ''' .",
        "ex:a ex:b 1.5 .\nex:c ex:d 2. .",
        '<http://x.org/a.b#c> <http://y.org/p.q> "v" .',
        'ex:a ex:b "v" . # trailing comment with . dots\nex:c ex:d "w" .',
        "@prefix ex: <http://e.org/> .\nex:a ex:b ex:c .\n"
        "# full line comment .\nex:d ex:e ex:f .",
        'ex:a ex:b "multi\nline short string" .',
        'ex:a ex:b "esc \\" quote . here" .',
        "ex:a ex:b ex:c .",
        "ex:a ex:b ex:c . ex:d ex:e ex:f .",
        'ex:a ex:b "café . 日本語" .\nex:c ex:d ex:e .',
        'ex:a ex:b "unterminated',
        "",
        "   \n  ",
    ]
    norm = lambda cs: [" ".join(c.split()) for c in cs]  # noqa: E731
    for i, text in enumerate(cases):
        for per_chunk in (1, 2, 1000):
            fast = norm(_turtle_statement_chunks(text, per_chunk))
            slow = norm(_turtle_statement_chunks_slow(text, per_chunk))
            assert fast == slow, (i, per_chunk, fast, slow)


def test_offset_reader_handles_multibyte_utf8(spark, tmp_path):
    """The offset-based reader scans BYTES and parse tasks do ranged
    reads; multi-byte UTF-8 literals (and a directive line that must be
    dropped per-slice) must survive with exact values."""
    from kolibrie_spark.rdfio import parse_turtle, read_turtle_df

    body = "@prefix ex: <http://ex/> .\n" + "".join(
        f'ex:s{i} ex:name "café 日本語 {i} — üml" .\n'
        for i in range(50)
    )
    d = tmp_path / "utf8"
    d.mkdir()
    (d / "a.ttl").write_text(body, encoding="utf-8")
    expected = sorted(
        (s, p, o, None) for (s, p, o) in parse_turtle(body)[0]
    )
    got = sorted(
        tuple(r)
        for r in read_turtle_df(spark, str(d), statements_per_chunk=7).collect()
    )
    assert got == expected and len(got) == 50


def test_rdfxml_offset_reader_multibyte_split(spark, tmp_path):
    """The r9 byte-offset RDF/XML reader slices raw bytes at top-level
    element boundaries; multi-byte UTF-8 literals inside a FORCED split
    (elements_per_chunk smaller than the element count) must survive
    with exact values, matching the driver-side parse."""
    from kolibrie_spark.rdfio import parse_rdfxml, read_rdfxml_df

    items = "".join(
        f'  <rdf:Description rdf:about="http://ex/s{i}">\n'
        f"    <ex:name>café {i} 日本語 — ünïcode</ex:name>\n"
        f'    <ex:link rdf:resource="http://ex/t{i}"/>\n'
        f"  </rdf:Description>\n"
        for i in range(30)
    )
    xml = (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://ex/">\n' + items + "</rdf:RDF>"
    )
    f = tmp_path / "multibyte.rdf"
    f.write_text(xml, encoding="utf-8")
    expected = sorted(
        (s, p, o, None) for (s, p, o) in parse_rdfxml(xml)
    )
    got = sorted(
        tuple(r)
        for r in read_rdfxml_df(spark, str(f), elements_per_chunk=7).collect()
    )
    assert got == expected and len(got) == 60


def test_turtle_fast_path_matches_tokenizer_path(monkeypatch):
    """The simple-statement fast path (r9) must produce the same triple
    SET as the tokenizer+reader path on the same input — including
    escapes, lang tags, dropped datatypes, 'a', blank nodes, unknown and
    empty prefixes, numbers, declaration-order quirks, and mixed
    simple/complex statements."""
    import re as _re

    import kolibrie_spark.rdfio.parsers as P

    cases = [
        "@prefix ex: <http://e/> .\nex:a ex:b ex:c .",
        'ex:a ex:name "N. \\"q\\" \\u0041"@en .',
        'ex:a ex:n "typed"^^<http://www.w3.org/2001/XMLSchema#int> .',
        'ex:a ex:n "typed"^^xsd:int .',
        "_:b1 a ex:Thing .",
        "unknown:x unknown:y unknown:z .",
        "@prefix : <http://d/> .\n:a :b :c .",
        "ex:a ex:n 2.5 .\nex:b ex:n -3 .\nex:c ex:n +.5 .\nex:d ex:n 1e4 .",
        # mixed: fast lines interleaved with continuations and annotations
        "@prefix ex: <http://e/> .\n"
        "ex:s1 ex:p1 ex:o1 .\n"
        "ex:s2 ex:p2 ex:o2 ;\n    ex:p3 ex:o3 , ex:o4 .\n"
        'ex:s5 ex:p5 "v" {| ex:conf "0.9" |} .\n'
        "ex:s6 ex:p6 ex:o6 .",
        # prefix redeclared mid-file: BOTH paths apply the final map
        "@prefix ex: <http://one/> .\nex:a ex:b ex:c .\n"
        "@prefix ex: <http://two/> .\nex:d ex:e ex:f .",
        # quoted-triple subject (slow only) next to fast lines
        "<< ex:a ex:b ex:c >> ex:says ex:d .\nex:x ex:y ex:z .",
        # no-space-before-dot styles decline to the tokenizer
        "ex:a ex:b ex:c.\nex:d ex:e ex:f .",
    ]
    null_re = _re.compile(r"(?!x)x")  # never matches -> tokenizer path
    for text in cases:
        fast_t, fast_q, fast_px = P.parse_turtle(text)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(P, "_SIMPLE_LINE_RE", null_re)
            slow_t, slow_q, slow_px = P.parse_turtle(text)
        assert sorted(fast_t) == sorted(slow_t), text
        assert sorted(fast_q) == sorted(slow_q), text
        assert fast_px == slow_px, text


def test_turtle_bare_leading_dot_number_raises_on_both_paths():
    """_TOK lexes '.5' as PUNCT '.' + NUM '5' (PUNCT precedes NUM), so a
    bare leading-dot number is a parse error — the fast path must decline
    rather than accept what the tokenizer rejects."""
    import re as _re

    import kolibrie_spark.rdfio.parsers as P

    text = "<http://e/c> <http://e/n> .5 ."
    with pytest.raises(P.RdfParseError):
        P.parse_turtle(text)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(P, "_SIMPLE_LINE_RE", _re.compile(r"(?!x)x"))
        with pytest.raises(P.RdfParseError):
            P.parse_turtle(text)


def test_ntriples_nquads_fast_path_matches_tokenizer_path():
    """Per-line fast path for the line-oriented formats must equal the
    tokenizer path — including quoted-triple lines, lang/datatype
    literals, blanks, and graph terms."""
    import re as _re

    import kolibrie_spark.rdfio.parsers as P

    nt = (
        '<http://e/a> <http://e/p> "v \\"q\\" \\u00e9"@en .\n'
        '<http://e/a> <http://e/n> "5"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
        "_:b1 <http://e/p> _:b2 .\n"
        '<< <http://e/a> <http://e/p> "v" >> <http://e/c> "0.9" .\n'
        "<http://e/x> a <http://e/T> . # trailing comment\n"
    )
    nq = (
        '<http://e/a> <http://e/p> "1" .\n'
        '<http://e/a> <http://e/p> "2" <http://e/g1> .\n'
        "_:b <http://e/q> <http://e/c> <http://e/g2> . # c\n"
    )
    null_re = _re.compile(r"(?!x)x")
    fast_t = P.parse_ntriples(nt)
    fast_q = P.parse_nquads(nq)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(P, "_SIMPLE_LINE_RE", null_re)
        mp.setattr(P, "_SIMPLE_QUAD_RE", null_re)
        slow_t = P.parse_ntriples(nt)
        slow_q = P.parse_nquads(nq)
    assert fast_t == slow_t  # per-line paths preserve exact order
    assert fast_q == slow_q


def test_shuffle_fallback_readers_match_offset_readers(spark, tmp_path):
    """Non-listable paths (hdfs://, s3://) take the text-shuffle fallback
    readers; local tests always take the offsets path, so exercise the
    fallbacks DIRECTLY against the same corpus to keep them from
    rotting."""
    from kolibrie_spark.rdfio import (
        _read_rdfxml_shuffle_df,
        _read_turtle_like_shuffle_df,
        parse_turtle,
        read_rdfxml_df,
        read_turtle_df,
    )

    d = tmp_path / "ttl"
    d.mkdir()
    for f in range(2):
        (d / f"f{f}.ttl").write_text(
            f"@prefix ex: <http://d{f}/> .\n"
            + "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(25))
        )
    main = sorted(tuple(r) for r in read_turtle_df(spark, str(d), statements_per_chunk=7).collect())
    fb = sorted(
        tuple(r)
        for r in _read_turtle_like_shuffle_df(spark, str(d), 7, parse_turtle).collect()
    )
    assert main == fb and len(main) == 50

    x = tmp_path / "xml"
    x.mkdir()
    items = "".join(
        f'  <rdf:Description rdf:about="http://e/s{i}">'
        f"<ex:name>n{i} é</ex:name></rdf:Description>\n"
        for i in range(20)
    )
    (x / "a.rdf").write_text(
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n' + items + "</rdf:RDF>"
    )
    main_x = sorted(tuple(r) for r in read_rdfxml_df(spark, str(x), elements_per_chunk=6).collect())
    fb_x = sorted(
        tuple(r) for r in _read_rdfxml_shuffle_df(spark, str(x), 6).collect()
    )
    assert main_x == fb_x and len(main_x) == 20


def test_turtle_fast_path_raw_newline_short_string():
    """ADVICE r9 (medium): a short string containing RAW newlines must not
    be split by the fast path — the interior line must not be extracted
    as a phantom triple, and the literal must survive intact, exactly as
    the tokenizer-only path parses it."""
    import re as _re

    import kolibrie_spark.rdfio.parsers as P

    cases = [
        # the ADVICE example: interior line LOOKS like a simple statement
        'ex:a ex:b "line1\nex:a ex:b ex:c .\nline3" .',
        # close-and-reopen on the same line
        'ex:a ex:b "one\ntwo" , "three\nfour" .',
        # escaped quote keeps the string open across the newline
        'ex:a ex:b "esc \\" still open\nex:x ex:y ex:z .\nclose" .',
        # '#' inside the open string is content, not a comment
        'ex:a ex:b "has # hash\nex:h ex:i ex:j .\nend" .',
        # string closes, then a REAL simple statement follows
        'ex:a ex:b "open\nmid" .\nex:d ex:e ex:f .',
    ]
    null_re = _re.compile(r"(?!x)x")  # never matches -> tokenizer path
    for text in cases:
        fast_t, fast_q, fast_px = P.parse_turtle(text)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(P, "_SIMPLE_LINE_RE", null_re)
            slow_t, slow_q, slow_px = P.parse_turtle(text)
        assert sorted(fast_t) == sorted(slow_t), text
        assert sorted(fast_q) == sorted(slow_q), text
        assert fast_px == slow_px, text
    # the ADVICE scenario explicitly: no phantom triple, full literal
    t, _, _ = P.parse_turtle(cases[0])
    assert t == [("ex:a", "ex:b", "line1\nex:a ex:b ex:c .\nline3")]
    # single-quoted strings: since the W3C single-quote STR branch landed
    # in _TOK (round 11), BOTH paths must ACCEPT identically — same
    # documented raw-newline divergence as the double-quote short string.
    sq_cases = [
        "ex:a ex:b 'sing\nex:p ex:q ex:r .\nle' .",
        # single-quote close-and-reopen on the same line
        "ex:a ex:b 'one\ntwo' , 'three\nfour' .",
        # escaped single quote keeps the string open across the newline
        "ex:a ex:b 'esc \\' still open\nex:x ex:y ex:z .\nclose' .",
    ]
    for text in sq_cases:
        fast_t, fast_q, fast_px = P.parse_turtle(text)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(P, "_SIMPLE_LINE_RE", null_re)
            slow_t, slow_q, slow_px = P.parse_turtle(text)
        assert sorted(fast_t) == sorted(slow_t), text
        assert sorted(fast_q) == sorted(slow_q), text
        assert fast_px == slow_px, text
    t, _, _ = P.parse_turtle(sq_cases[0])
    assert t == [("ex:a", "ex:b", "sing\nex:p ex:q ex:r .\nle")]


def test_turtle_chunker_crlf_matches_slow_oracle():
    """ADVICE r9: CRLF-terminated @prefix/comment lines must be removed by
    the fast chunker's directive sub so chunk boundaries match the slow
    per-line oracle on CRLF files."""
    from kolibrie_spark.rdfio import (
        _turtle_statement_chunks,
        _turtle_statement_chunks_slow,
    )

    text = (
        "@prefix ex: <http://e.org/> .\r\n"
        "ex:a ex:b ex:c .\r\n"
        "# full line comment .\r\n"
        "ex:d ex:e ex:f .\r\n"
        "@prefix oth: <http://o.org/> .\r\n"
        "oth:g oth:h oth:i .\r\n"
    )
    norm = lambda cs: [" ".join(c.split()) for c in cs]  # noqa: E731
    for per_chunk in (1, 2, 1000):
        fast = norm(_turtle_statement_chunks(text, per_chunk))
        slow = norm(_turtle_statement_chunks_slow(text, per_chunk))
        assert fast == slow, (per_chunk, fast, slow)


def test_offsets_gate_requires_local_master_or_shared_fs(spark, tmp_path, monkeypatch):
    """ADVICE r9: the offset readers have executor tasks open() driver-
    listed paths, so they engage only under a local master unless the
    deployment declares a shared filesystem (SHARED_FS)."""
    import kolibrie_spark.rdfio as R

    class _Ctx:
        def __init__(self, master):
            self.master = master

    class _FakeSpark:
        def __init__(self, master):
            self.sparkContext = _Ctx(master)

    assert R._offsets_usable(_FakeSpark("local[32]"))
    assert R._offsets_usable(_FakeSpark("local"))
    assert not R._offsets_usable(_FakeSpark("spark://host:7077"))
    assert not R._offsets_usable(_FakeSpark("yarn"))
    monkeypatch.setattr(R, "SHARED_FS", True)
    assert R._offsets_usable(_FakeSpark("spark://host:7077"))
    monkeypatch.setattr(R, "SHARED_FS", False)

    # wiring: with the gate forced off, the readers still produce the
    # same triples through the shuffle fallback
    d = tmp_path / "gate"
    d.mkdir()
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:s{i} ex:p "v{i}" .\n' for i in range(10))
    )
    want = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d)).collect())
    monkeypatch.setattr(R, "_offsets_usable", lambda s: False)
    got = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d)).collect())
    assert got == want and len(got) == 10


def test_fast_path_hit_rate_on_bulk_dump_shape():
    """VERDICT r9 task #6: pin the fast-path hit rate on a bulk-dump-
    shaped corpus so a parser change that silently degrades it fails a
    test instead of quietly doubling ingest cost.  The synthetic corpus
    mirrors the scale-probe generator's statement shapes (IRI/pname
    terms, plain/lang/typed literals, decimals)."""
    import kolibrie_spark.rdfio.parsers as P

    ttl = "@prefix ex: <http://example.org/> .\n" + "".join(
        f'ex:s{i} ex:p{i % 7} "value {i} with words"@en .\n'
        f"ex:s{i} ex:num {i}.5 .\n"
        f"ex:s{i} ex:ref <http://example.org/o/{i}> .\n"
        for i in range(500)
    )
    before = dict(P.FAST_PATH_STATS)
    triples, _, _ = P.parse_turtle(ttl)
    d_fast = P.FAST_PATH_STATS["fast"] - before["fast"]
    d_slow = P.FAST_PATH_STATS["slow"] - before["slow"]
    assert len(triples) == 1500
    assert d_fast + d_slow == 1500
    assert d_fast / (d_fast + d_slow) >= 0.99, (d_fast, d_slow)

    nt = "".join(
        f'<http://e/s{i}> <http://e/p> "v {i}" .\n' for i in range(200)
    )
    before = dict(P.FAST_PATH_STATS)
    P.parse_ntriples(nt)
    assert P.FAST_PATH_STATS["fast"] - before["fast"] == 200
    assert P.FAST_PATH_STATS["slow"] - before["slow"] == 0


def test_load_distributed_keeps_rdf_star_mappings(spark, tmp_path):
    """VERDICT r9 #1: a {| |}-annotated multi-file Turtle-star corpus
    loaded through the DISTRIBUTED path must leave the quoted-triple
    qid<->(s,p,o) mappings resolvable — the rdf_star_builtins-shaped
    query (SUBJECT()/OBJECT() destructuring) must return the same rows
    as the driver-side load_file path."""
    from kolibrie_spark.engine import SparqlEngine

    d = tmp_path / "star"
    d.mkdir()
    (d / "f0.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        'ex:s0 ex:bal "100" {| ex:conf "0.9" ; ex:src "a" |} .\n'
        "ex:plain0 ex:p ex:o0 .\n"
    )
    (d / "f1.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        'ex:s1 ex:bal "200" {| ex:conf "0.7" |} .\n'
        '<< ex:s2 ex:bal "300" >> ex:conf "0.5" .\n'
        "ex:plain1 ex:p ex:o1 .\n"
    )
    q = (
        "SELECT ?subj ?obj ?c WHERE { ?t <http://e/conf> ?c . "
        "BIND(SUBJECT(?t) AS ?subj) BIND(OBJECT(?t) AS ?obj) } "
        "ORDER BY ?c"
    )

    drv = SparqlEngine(spark)
    for f in sorted(d.iterdir()):
        drv.load_file(str(f))
    want = [tuple(r) for r in drv.query(q).collect()]
    assert len(want) == 3 and all(r[0] and r[1] for r in want), want

    dist = SparqlEngine(spark)
    dist.load_file(str(d), fmt="turtle", distributed=True)
    got = [tuple(r) for r in dist.query(q).collect()]
    assert got == want, (got, want)
    # the quad sets agree too (annotation triples included)
    assert sorted(map(tuple, dist.store.quads.collect())) == sorted(
        map(tuple, drv.store.quads.collect())
    )
    # and the mapping table itself: one row per distinct quoted triple
    assert dist.store.quoted.count() == 3


def test_load_distributed_ntriples_star_and_nquads_graphs(spark, tmp_path):
    """The tagged line readers keep << >> mappings (N-Triples-star) and
    the store registers named graphs from a distributed N-Quads load."""
    from kolibrie_spark.engine import SparqlEngine
    from kolibrie_spark.rdfio import read_ntriples_tagged_df, split_tagged

    nt = tmp_path / "t.nt"
    nt.write_text(
        '<http://e/a> <http://e/p> "v" .\n'
        '<< <http://e/a> <http://e/p> "v" >> <http://e/conf> "0.9" .\n'
        '<< <http://e/b> <http://e/q> "w" >> <http://e/conf> "0.8" .\n'
    )
    quads, quoted = split_tagged(read_ntriples_tagged_df(spark, str(nt)))
    assert quads.count() == 3
    qrows = {(r.qs, r.qp, r.qo) for r in quoted.collect()}
    assert qrows == {("http://e/a", "http://e/p", "v"), ("http://e/b", "http://e/q", "w")}

    e = SparqlEngine(spark)
    e.load_file(str(nt), distributed=True)
    assert e.store.quoted.count() == 2
    got = [
        tuple(r)
        for r in e.query(
            "SELECT ?s WHERE { ?t <http://e/conf> ?c . BIND(SUBJECT(?t) AS ?s) } ORDER BY ?s"
        ).collect()
    ]
    assert got == [("http://e/a",), ("http://e/b",)]

    nq = tmp_path / "g.nq"
    nq.write_text(
        '<http://e/a> <http://e/p> "1" <http://e/g1> .\n'
        '<http://e/b> <http://e/p> "2" <http://e/g2> .\n'
        '<http://e/c> <http://e/p> "3" .\n'
    )
    e2 = SparqlEngine(spark)
    e2.load_file(str(nq), distributed=True)
    graphs = {r.g for r in e2.store.named_graph_names().collect()}
    assert graphs == {"http://e/g1", "http://e/g2"}
    assert e2.store.triple_count() == 3


def test_load_distributed_infer_format_and_count(spark, tmp_path):
    """Format inference from the path extension (file and directory) and
    the returned parsed-quad count."""
    from kolibrie_spark.rdfio import infer_format
    from kolibrie_spark.store import QuadStore

    d = tmp_path / "corp"
    d.mkdir()
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:a ex:p ex:b .\nex:a ex:p ex:b .\n"
    )
    assert infer_format(str(d / "a.ttl")) == "turtle"
    assert infer_format(str(d)) == "turtle"
    store = QuadStore(spark)
    n = store.load_distributed(str(d))
    assert n == 2  # pre-dedup parse count, like load_into
    assert store.triple_count() == 1  # set semantics after dedup


def test_turtle_stream_bounds_match_whole_file_scan(tmp_path):
    """VERDICT r9 #2: the windowed streaming scan must place EXACTLY the
    whole-file regex scan's boundaries — across statements, short and
    long strings, comments and multi-byte UTF-8 straddling window edges,
    window sizes down to 1 byte, and malformed tails (which defer to the
    EOF window's fallback semantics)."""
    from kolibrie_spark.rdfio import _ttl_chunk_re_bytes, _turtle_stream_bounds

    def whole(raw, per):
        pat = _ttl_chunk_re_bytes(per)
        out, pos, n = [], 0, len(raw)
        while pos < n:
            m = pat.match(raw, pos)
            if m is None:
                break
            out.append((pos, m.end()))
            pos = m.end()
        if raw[pos:].strip():
            out.append((pos, n))
        return out

    cases = [
        "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(200)),
        'ex:a ex:b """long\nstring . with dots.\n""" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b """' + ("x . y\n" * 300) + '""" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "' + "A" * 5000 + '" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "café . 日本語" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "" .\nex:q ex:r """" .\nex:c ex:d ex:e .\n',
        "@prefix ex: <http://e/> .\r\nex:a ex:b ex:c .\r\nex:d ex:e ex:f .\r\n",
        'ex:a <unterm ex:b ex:c .\nex:d ex:e ex:f .\n',
        'ex:a ex:b ex:c . # tail comment',
        'ex:a ex:b "unterminated',
        "",
    ]
    for i, text in enumerate(cases):
        raw = text.encode("utf-8")
        p = tmp_path / f"c{i}.ttl"
        p.write_bytes(raw)
        for per in (1, 7, 1000):
            want = whole(raw, per)
            for win in (1, 17, 64, 1 << 20):
                got = list(_turtle_stream_bounds(str(p), per, window_bytes=win))
                assert got == want, (i, per, win, got[:4], want[:4])


def test_rdfxml_stream_bounds_match_whole_file_scan(tmp_path):
    """Windowed RDF/XML scan == whole-file _rdfxml_spans_bytes-derived
    rows, including fat comments/CDATA with '>' inside straddling window
    edges, self-closing roots, and unsplittable small documents."""
    from kolibrie_spark.rdfio import _rdfxml_spans_bytes, _rdfxml_stream_bounds

    def whole(raw, per):
        root, spans = _rdfxml_spans_bytes(raw, per)
        if root is None:
            return [(0, 0, len(raw), None)]
        return [
            (k, spans[i][0], spans[i : i + per][-1][1], root)
            for k, i in enumerate(range(0, len(spans), per))
        ]

    def doc(n, mid=""):
        items = "".join(
            f'  <rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:n>café {i} 日本語</ex:n></rdf:Description>\n"
            for i in range(n)
        )
        return (
            '<?xml version="1.0"?>\n<rdf:RDF '
            'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:ex="http://e/">\n' + mid + items + "</rdf:RDF>\n"
        )

    cases = [
        doc(1),
        doc(30),
        doc(30, mid="<!-- a > fat . comment\n" + ("pad > x\n" * 50) + "-->\n"),
        doc(12, mid="<ex:x><![CDATA[ raw > < stuff ]]></ex:x>"),
        "<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'/>",
    ]
    for i, text in enumerate(cases):
        raw = text.encode("utf-8")
        p = tmp_path / f"x{i}.rdf"
        p.write_bytes(raw)
        for per in (1, 7, 500):
            want = whole(raw, per)
            for win in (1, 16, 256, 1 << 20):
                got = list(_rdfxml_stream_bounds(str(p), per, window_bytes=win))
                assert got == want, (i, per, win, got[:3], want[:3])


def test_windowed_scan_end_to_end_through_readers(spark, tmp_path, monkeypatch):
    """The readers must produce identical triples with a window far
    smaller than the file (forcing many refills + carries mid-statement)
    as with the default window."""
    import kolibrie_spark.rdfio as R

    d = tmp_path / "win"
    d.mkdir()
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:s{i} ex:p "value {i} — 日本語 é" .\n' for i in range(80))
        # fat single statement (larger than the forced window) with dots
        # and multi-byte chars, so a statement straddles many refills
        + 'ex:big ex:p "'
        + ("fat . value — 日本語 " * 40)
        + '" .\n'
    )
    want = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d), 7).collect())
    monkeypatch.setattr(R, "SCAN_WINDOW_BYTES", 97)
    got = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d), 7).collect())
    assert got == want and len(got) == 81

    x = tmp_path / "winx"
    x.mkdir()
    (x / "a.rdf").write_text(
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        + "".join(
            f'<rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:n>n{i} é</ex:n></rdf:Description>\n"
            for i in range(25)
        )
        + "</rdf:RDF>"
    )
    monkeypatch.undo()
    want_x = sorted(tuple(r) for r in R.read_rdfxml_df(spark, str(x), 6).collect())
    monkeypatch.setattr(R, "SCAN_WINDOW_BYTES", 53)
    got_x = sorted(tuple(r) for r in R.read_rdfxml_df(spark, str(x), 6).collect())
    assert got_x == want_x and len(got_x) == 25


def test_rdfxml_reader_skips_empty_files(spark, tmp_path):
    """A zero-byte file in a corpus directory (marker files, touch
    artifacts) must contribute zero triples, not crash the parse task
    with ET's 'no element found'."""
    from kolibrie_spark.rdfio import read_rdfxml_df

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.rdf").write_text(
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        '<rdf:Description rdf:about="http://e/s"><ex:n>v</ex:n>'
        "</rdf:Description>\n</rdf:RDF>"
    )
    (d / "empty.rdf").write_text("")
    (d / "ws.rdf").write_text("   \n  ")
    got = [tuple(r) for r in read_rdfxml_df(spark, str(d)).collect()]
    assert got == [("http://e/s", "http://e/n", "v", None)]


def test_read_turtle_lines_df_matches_general_reader(spark, tmp_path):
    """The line-safe Turtle reader must equal read_turtle_df on
    one-statement-per-line dumps (incl. same-line continuations and
    annotations, prefix expansion, fast and slow lines), parallelize a
    SINGLE file, and raise its named error on multi-line statements."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kolibrie_spark.rdfio import read_turtle_df, read_turtle_lines_df
    from kolibrie_spark.rdfio.parsers import RdfParseError

    d = tmp_path / "lines"
    d.mkdir()
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        "# comment line\n"
        + "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(50))
        + 'ex:m ex:p1 "a" ; ex:p2 "b" , "c" .\n'
        + 'ex:ann ex:conf "x" {| ex:src "y" |} .\n'
        + "unknown:q unknown:r unknown:t .\n"
    )
    want = sorted(tuple(r) for r in read_turtle_df(spark, str(d)).collect())
    got = sorted(tuple(r) for r in read_turtle_lines_df(spark, str(d)).collect())
    assert got == want and len(got) == 56

    # single-file parallelism: with a small split size, one file becomes
    # multiple input partitions
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        df = read_turtle_lines_df(spark, str(d / "a.ttl"))
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == 56
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # multi-line statement: loud, named error
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:s ex:p\n    ex:o .\n"
    )
    with _pytest.raises(Exception, match="read_turtle_lines_df"):
        read_turtle_lines_df(spark, str(d)).collect()


def test_read_turtle_lines_tagged_keeps_mappings(spark, tmp_path):
    """The line-safe reader's tagged variant must keep annotation-line
    quoted-triple mappings, like every other tagged reader."""
    from kolibrie_spark.rdfio import read_turtle_lines_tagged_df, split_tagged

    f = tmp_path / "ann.ttl"
    f.write_text(
        "@prefix ex: <http://e/> .\n"
        'ex:a ex:bal "1" {| ex:conf "0.9" |} .\n'
        "ex:b ex:p ex:c .\n"
    )
    quads, quoted = split_tagged(read_turtle_lines_tagged_df(spark, str(f)))
    assert quads.count() == 3  # base + annotation + plain
    rows = [(r.qs, r.qp, r.qo) for r in quoted.collect()]
    assert rows == [("http://e/a", "http://e/bal", "1")]


def test_load_distributed_turtle_lines_format(spark, tmp_path):
    """fmt='turtle-lines' routes load_distributed through the in-file-
    parallel line-safe reader, mappings included."""
    from kolibrie_spark.store import QuadStore

    f = tmp_path / "lines.ttl"
    f.write_text(
        "@prefix ex: <http://e/> .\n"
        'ex:a ex:bal "1" {| ex:conf "0.9" |} .\n'
        "ex:b ex:p ex:c .\n"
    )
    store = QuadStore(spark)
    n = store.load_distributed(str(f), fmt="turtle-lines")
    assert n == 3
    assert store.quoted.count() == 1


def test_turtle_parallel_segments_match_sequential_scan(tmp_path):
    """The two-pass parallel in-file scan must place EXACTLY the
    sequential windowed scan's statement boundaries: at per_chunk=1 the
    union of per-segment spans equals the whole-file span list — across
    long/short strings with interior dots spanning range cuts,
    raw-newline short strings, escapes at line ends, IRIs containing
    newlines, comments, decimals, CRLF, multi-byte UTF-8, malformed
    tails, and 250 random token-soup trials at range sizes down to 7
    bytes."""
    import random

    from kolibrie_spark.rdfio import (
        _turtle_parallel_segments_local,
        _turtle_stream_bounds,
    )

    def seq(p):
        return list(_turtle_stream_bounds(p, 1))

    def par(p, rb):
        out = []
        for a, b in _turtle_parallel_segments_local(p, rb):
            out.extend(_turtle_stream_bounds(p, 1, start=a, end=b))
        return out

    cases = [
        "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(50)),
        'ex:a ex:b """long\nstring . with dots.\nmore\n""" .\n'
        "ex:c ex:d ex:e .\n",
        'ex:a ex:b """' + ("x . y\n" * 100) + '""" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "' + "A" * 500 + '" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "café . 日本語" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "" .\nex:q ex:r """" .\nex:c ex:d ex:e .\n',
        "@prefix ex: <http://e/> .\r\nex:a ex:b ex:c .\r\nex:d ex:e ex:f .\r\n",
        "ex:a <unterm ex:b ex:c .\nex:d ex:e ex:f .\n",
        "ex:a ex:b ex:c . # tail comment",
        'ex:a ex:b "unterminated',
        'ex:a ex:b "raw\nnewline . inside\nstill" .\nex:c ex:d ex:e .\n',
        'ex:a ex:b "esc at eol\\\n continued" .\nex:c ex:d ex:e .\n',
        "ex:n ex:v 1.5 .\nex:m ex:w 2.75 .\n",
        "ex:a ex:b <http://iri\nwith/newline> .\nex:c ex:d ex:e .\n",
        "ex:a ex:b '''long sq\n . inside\n''' .\nex:c ex:d 'short . ' .\n",
        '# only a comment with " quote and . dots\n',
        "",
        # r11 escape-aware long-string closer: escaped quote-runs and a
        # trailing escaped quote, with newlines so range cuts land INSIDE
        # the long string (exercises the LDQ/LSQ close regexes)
        'ex:a ex:b """line one\nends with quote\\""""' " .\nex:c ex:d ex:e .\n",
        'ex:a ex:b """a\\"""mid . dot\nmore\\"""tail""" .\nex:c ex:d ex:e .\n',
        "ex:a ex:b '''sq\\'''\nrun . here''' .\nex:c ex:d ex:e .\n",
        'ex:a ex:b """backslashes \\\\"""' " .\nex:c ex:d ex:e .\n",
    ]
    for i, text in enumerate(cases):
        p = tmp_path / f"p{i}.ttl"
        p.write_bytes(text.encode("utf-8"))
        want = seq(str(p))
        for rb in (7, 16, 64, 997, 1 << 20):
            got = par(str(p), rb)
            assert got == want, (i, rb, got[:5], want[:5])

    rng = random.Random(20260816)
    pieces = [
        "ex:s ex:p ex:o .\n", " . ", ". ", '."', '" ', "' ", "<", ">",
        "#c . \n", '"""', "'''", "\\", '\\"', "\n", "\r\n", "1.5 ",
        "café 日本語 ", '"lit . ', 'x" .\n', "@prefix ex: <http://e/> .\n",
        '{| ex:a "1" |}', "<< ex:a ex:b ex:c >>",
        '"""block\n. dots\n""" ', "'sq' ", '""', "''", ". \n", "ex:p",
        " ", ";", ",", '\\"""', "\\'''", '"""e\\"""" ', "\\\\",
    ]
    p = tmp_path / "soup.ttl"
    for t in range(250):
        text = "".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 60))
        )
        p.write_bytes(text.encode("utf-8"))
        want = seq(str(p))
        for rb in (7, 33, 128):
            got = par(str(p), rb)
            assert got == want, (t, rb, repr(text[:120]))


def test_turtle_parallel_scan_through_reader(spark, tmp_path, monkeypatch):
    """read_turtle_df must produce identical triples (and, tagged,
    identical quoted mappings) when the parallel in-file scan is forced
    (threshold 1 byte, tiny ranges so one file becomes many pass-1
    ranges and pass-2 segments) as with the default sequential scan."""
    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio import split_tagged

    d = tmp_path / "par"
    d.mkdir()
    (d / "a.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:s{i} ex:p "value {i} — 日本語 é" .\n' for i in range(60))
        + 'ex:big ex:p """'
        + ("fat . value — 日本語\n" * 30)
        + '""" .\n'
        + 'ex:ann ex:bal "1" {| ex:conf "0.9" |} .\n'
    )
    want = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d), 7).collect())
    wq, wt = split_tagged(R.read_turtle_tagged_df(spark, str(d), 7))
    want_q = sorted(tuple(r) for r in wq.collect())
    want_t = sorted(tuple(r) for r in wt.collect())

    monkeypatch.setattr(R, "PARALLEL_SCAN_MIN_BYTES", 1)
    monkeypatch.setattr(R, "PARALLEL_SCAN_MIN_WIN", 0)  # local[4] test session
    monkeypatch.setattr(R, "PARALLEL_SCAN_RANGE_FLOOR", 256)  # force many ranges
    monkeypatch.setattr(R, "SCAN_WINDOW_BYTES", 256)
    got = sorted(tuple(r) for r in R.read_turtle_df(spark, str(d), 7).collect())
    assert got == want and len(got) == 63
    gq, gt = split_tagged(R.read_turtle_tagged_df(spark, str(d), 7))
    assert sorted(tuple(r) for r in gq.collect()) == want_q
    assert sorted(tuple(r) for r in gt.collect()) == want_t


def test_parse_turtle_long_strings():
    """Long strings — single- and multi-line, both quote styles, with
    interior dots / quotes / escapes / fake directives — are inlined to
    short literals up front, so every downstream path (fast lines,
    tokenizer, annotations, lang tags) sees one-line statements.  The
    closer is the FIRST quote triple (escape-blind), matching the chunk
    scanners' boundary rule so slice boundaries and parse agree."""
    from kolibrie_spark.rdfio.parsers import parse_turtle

    px = {"ex": "http://e/"}

    t, _, _ = parse_turtle('ex:a ex:b """x y""" .', prefixes=px)
    assert t == [("http://e/a", "http://e/b", "x y")]

    t, _, _ = parse_turtle(
        'ex:big ex:p """fat . value\nline2 "q" \\" esc\n""" .', prefixes=px
    )
    assert t == [
        ("http://e/big", "http://e/p", 'fat . value\nline2 "q" " esc\n')
    ]

    t, _, _ = parse_turtle("ex:a ex:b '''sq \"dq\" . \nline''' .", prefixes=px)
    assert t == [("http://e/a", "http://e/b", 'sq "dq" . \nline')]

    t, _, _ = parse_turtle('ex:a ex:b """x"""@en .', prefixes=px)
    assert t == [("http://e/a", "http://e/b", "x@en")]

    t, _, _ = parse_turtle('ex:a ex:b """x"""^^<http://t> .', prefixes=px)
    assert t == [("http://e/a", "http://e/b", "x")]

    # interior lines that LOOK like directives/comments stay content
    t, _, _ = parse_turtle(
        'ex:a ex:b """has @prefix nope: <x> .\n# not a comment\n""" .',
        prefixes=px,
    )
    assert "@prefix" in t[0][2] and "# not a comment" in t[0][2]

    # mixed with fast-path lines and annotations
    t, q, _ = parse_turtle(
        'ex:s1 ex:p "v" .\n'
        'ex:c ex:d """ml\n. inside\n""" .\n'
        'ex:ann ex:bal "1" {| ex:conf "0.9" |} .\n',
        prefixes=px,
    )
    assert ("http://e/c", "http://e/d", "ml\n. inside\n") in t
    assert len(q) == 1


def test_rdfxml_parallel_bounds_match_sequential_scan(tmp_path):
    """The XML two-pass parallel scan must place EXACTLY the sequential
    windowed scan's element spans at per=1 — across comments with fake
    tags inside, CDATA, PIs, DOCTYPE, attributes containing '>' /
    quotes / newlines, nesting, self-closing top-level elements,
    multi-byte UTF-8, and 120 random nested-document fuzz trials at
    range sizes down to 13 bytes."""
    import random

    from kolibrie_spark.rdfio import (
        _rdfxml_parallel_bounds_local,
        _rdfxml_stream_bounds,
    )

    def seq(p, per=1):
        return [(a, b, r) for _, a, b, r in _rdfxml_stream_bounds(p, per)]

    def par(p, rb, per=1):
        return [
            (a, b, r)
            for _, a, b, r in _rdfxml_parallel_bounds_local(p, per, rb)
        ]

    def doc(n, mid="", nest=False, pre=""):
        items = []
        for i in range(n):
            if nest and i % 5 == 2:
                items.append(
                    f'  <rdf:Description rdf:about="http://e/s{i}">'
                    f"<ex:n>café {i} 日本語</ex:n>"
                    f'<ex:inner><ex:d attr="a &gt; b">x</ex:d></ex:inner>'
                    f"</rdf:Description>\n"
                )
            elif nest and i % 7 == 3:
                items.append(
                    f'  <rdf:Description rdf:about="http://e/s{i}"/>\n'
                )
            else:
                items.append(
                    f'  <rdf:Description rdf:about="http://e/s{i}">'
                    f"<ex:n>value {i}</ex:n></rdf:Description>\n"
                )
        return (
            pre + '<?xml version="1.0"?>\n<rdf:RDF '
            'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:ex="http://e/">\n' + mid + "".join(items) + "</rdf:RDF>\n"
        )

    cases = [
        doc(40),
        doc(40, nest=True),
        doc(
            30,
            mid="<!-- a > fat comment\n"
            + ("pad > x</rdf:Description>\n" * 20)
            + "-->\n",
        ),
        doc(12, mid="<ex:x><![CDATA[ raw > < stuff \n more ]]></ex:x>"),
        doc(
            25,
            mid='<ex:w attr="multi\nline > v" other=\'s > q\'>t</ex:w>\n',
        ),
        doc(
            18,
            pre="<!DOCTYPE rdf:RDF SYSTEM 'x.dtd'>\n"
            "<?xml-stylesheet href='y'?>\n",
        ),
        "<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'/>",
        doc(3),  # unsplittable at high per: falls back to sequential
    ]
    for i, text in enumerate(cases):
        p = tmp_path / f"x{i}.rdf"
        p.write_bytes(text.encode("utf-8"))
        want = seq(str(p))
        for rb in (16, 64, 331, 1 << 20):
            got = par(str(p), rb)
            assert got == want, (i, rb, got[:4], want[:4])

    rng = random.Random(42)

    def rand_elem(depth, budget):
        name = rng.choice(["ex:a", "ex:b", "rdf:Description"])
        attrs = ""
        for _ in range(rng.randrange(0, 3)):
            v = rng.choice(
                ["x > y", "multi\nline", "quote ' inside", "café 日本語"]
            )
            q = '"' if "'" in v or rng.random() < 0.7 else "'"
            attrs += f" ex:k{rng.randrange(5)}={q}{v}{q}"
        if budget <= 0 or (depth > 0 and rng.random() < 0.3):
            return (
                f"<{name}{attrs}/>"
                if rng.random() < 0.5
                else f"<{name}{attrs}></{name}>"
            )
        kids = []
        for _ in range(rng.randrange(1, 4)):
            r = rng.random()
            if r < 0.15:
                kids.append("<!-- comment with > and </fake>\nlines -->")
            elif r < 0.25:
                kids.append("<![CDATA[ raw < > \n stuff ]]>")
            elif r < 0.3:
                kids.append("<?pi data > here?>")
            elif r < 0.5:
                kids.append(f"text café {rng.randrange(100)}\n")
            else:
                kids.append(rand_elem(depth + 1, budget - 1))
        return f"<{name}{attrs}>" + "".join(kids) + f"</{name}>"

    p = tmp_path / "fuzz.rdf"
    for t in range(120):
        body = "\n".join(
            rand_elem(1, rng.randrange(0, 4))
            for _ in range(rng.randrange(2, 12))
        )
        p.write_bytes(
            (
                '<?xml version="1.0"?>\n<rdf:RDF '
                'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
                'xmlns:ex="http://e/">\n' + body + "\n</rdf:RDF>\n"
            ).encode("utf-8")
        )
        want = seq(str(p))
        for rb in (13, 47, 256):
            got = par(str(p), rb)
            assert got == want, (t, rb)


def test_rdfxml_parallel_scan_through_reader(spark, tmp_path, monkeypatch):
    """read_rdfxml_df must produce identical triples with the parallel
    in-file scan forced (threshold 1, tiny ranges) as with the default
    sequential scan — including stable (file, chunk)-salted genid blank
    nodes across the ci remap."""
    import kolibrie_spark.rdfio as R

    d = tmp_path / "xpar"
    d.mkdir()
    (d / "a.rdf").write_text(
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        + "".join(
            f'<rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:n>n{i} é 日本語</ex:n></rdf:Description>\n"
            for i in range(60)
        )
        + "<!-- fat > comment\n" + ("x</rdf:Description>\n" * 10) + "-->\n"
        + "</rdf:RDF>"
    )
    want = sorted(
        tuple(r) for r in R.read_rdfxml_df(spark, str(d), 7).collect()
    )
    monkeypatch.setattr(R, "PARALLEL_SCAN_MIN_BYTES", 1)
    monkeypatch.setattr(R, "PARALLEL_SCAN_MIN_WIN", 0)  # local[4] test session
    monkeypatch.setattr(R, "PARALLEL_SCAN_RANGE_FLOOR", 256)  # force many ranges
    monkeypatch.setattr(R, "SCAN_WINDOW_BYTES", 256)
    got = sorted(
        tuple(r) for r in R.read_rdfxml_df(spark, str(d), 7).collect()
    )
    assert got == want and len(got) == 60


def test_rdfxml_parallel_scan_tag_spanning_full_range(tmp_path):
    """Review repro: a tag whose attribute values span MULTIPLE pass-1
    ranges, with a fake '/>' and '>' inside a quoted value straddling a
    range cut.  The quote-blind terminal_state reported OPEN instead of
    OPEN_DQ for the mid-tag ranges, so the next range's close() matched
    the fake '/>' as a self-closing tag and the parallel scan silently
    dropped 7 of 13 top-level elements."""
    from kolibrie_spark.rdfio import (
        _rdfxml_parallel_bounds_local,
        _rdfxml_stream_bounds,
    )

    fat_attr = 'x > y /> z\n' * 40  # many fake closers, raw newlines
    text = (
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        + "".join(
            f'<rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:n>v{i}</ex:n></rdf:Description>\n"
            for i in range(6)
        )
        + f'<ex:w a="1"\nb="{fat_attr}"\nc=\'{fat_attr}\'>t</ex:w>\n'
        + "".join(
            f'<rdf:Description rdf:about="http://e/t{i}">'
            f"<ex:n>w{i}</ex:n></rdf:Description>\n"
            for i in range(6)
        )
        + "</rdf:RDF>\n"
    )
    pth = tmp_path / "fat.rdf"
    pth.write_bytes(text.encode("utf-8"))
    want = [(a, b, r) for _, a, b, r in _rdfxml_stream_bounds(str(pth), 1)]
    assert len(want) == 13
    for rb in (64, 128, 256):  # the tag spans many ranges at these sizes
        got = [
            (a, b, r)
            for _, a, b, r in _rdfxml_parallel_bounds_local(str(pth), 1, rb)
        ]
        assert got == want, (rb, len(got), len(want))


def test_offset_readers_empty_directory(spark, tmp_path):
    """An empty corpus directory must return an empty DataFrame, not
    crash in sc.union([]) (review regression catch)."""
    from kolibrie_spark.rdfio import read_rdfxml_df, read_turtle_df

    d = tmp_path / "empty"
    d.mkdir()
    assert read_turtle_df(spark, str(d)).count() == 0
    assert read_rdfxml_df(spark, str(d)).count() == 0


def test_bom_prefixed_documents(spark, tmp_path):
    """The RDF grammars allow an optional leading U+FEFF (Turtle spec
    sec 6.2) and Windows-exported dumps routinely carry one: every
    parser sheds it, the prefix head pass still collects @prefix from a
    BOM'd first line, and the readers produce identical triples to the
    BOM-less twin files."""
    from kolibrie_spark.rdfio import (
        read_ntriples_df,
        read_rdfxml_df,
        read_turtle_df,
        read_turtle_lines_df,
    )
    from kolibrie_spark.rdfio.parsers import parse_nquads, parse_turtle

    ttl = "@prefix ex: <http://e/> .\nex:a ex:b ex:c .\nex:d ex:e ex:f .\n"
    nt = "<http://e/a> <http://e/b> <http://e/c> .\n"
    xml = (
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        '<rdf:Description rdf:about="http://e/a"><ex:n>v</ex:n>'
        "</rdf:Description>\n</rdf:RDF>\n"
    )
    d1, d2 = tmp_path / "plain", tmp_path / "bom"
    d1.mkdir(), d2.mkdir()
    for name, body in [("a.ttl", ttl), ("a.nt", nt), ("a.rdf", xml)]:
        (d1 / name).write_bytes(body.encode("utf-8"))
        (d2 / name).write_bytes(b"\xef\xbb\xbf" + body.encode("utf-8"))

    for reader, name in [
        (read_turtle_df, "a.ttl"),
        (read_turtle_lines_df, "a.ttl"),
        (read_ntriples_df, "a.nt"),
        (read_rdfxml_df, "a.rdf"),
    ]:
        want = sorted(tuple(r) for r in reader(spark, str(d1 / name)).collect())
        got = sorted(tuple(r) for r in reader(spark, str(d2 / name)).collect())
        assert got == want and len(got) >= 1, (name, got, want)

    # BOM'd prefix line must still resolve prefixed names (head pass)
    rows = sorted(
        tuple(r) for r in read_turtle_df(spark, str(d2 / "a.ttl")).collect()
    )
    assert rows[0][0] == "http://e/a"

    # driver parsers directly
    assert parse_turtle("﻿" + ttl)[0][0] == (
        "http://e/a", "http://e/b", "http://e/c"
    )
    assert parse_nquads(
        "﻿<http://e/a> <http://e/b> <http://e/c> <http://e/g> .\n"
    )[0][0][3] == "http://e/g"


def test_compressed_dumps_route_to_text_fallback(spark, tmp_path):
    """Real dumps ship gzipped: the byte-offset scans cannot see through
    codecs, so compressed corpora route to the Spark-text fallbacks
    (which decompress natively) — including the prefix head pass, which
    previously read codec bytes and silently lost @prefix resolution.
    infer_format strips compression suffixes."""
    import gzip

    from kolibrie_spark.rdfio import (
        infer_format,
        read_ntriples_df,
        read_rdfxml_df,
        read_turtle_df,
    )
    from kolibrie_spark.store import QuadStore

    d = tmp_path / "gz"
    d.mkdir()
    ttl = "@prefix ex: <http://e/> .\nex:a ex:b ex:c .\nex:d ex:e ex:f .\n"
    with gzip.open(d / "a.ttl.gz", "wt") as f:
        f.write(ttl)
    rows = sorted(
        tuple(r) for r in read_turtle_df(spark, str(d / "a.ttl.gz")).collect()
    )
    assert rows == [
        ("http://e/a", "http://e/b", "http://e/c", None),
        ("http://e/d", "http://e/e", "http://e/f", None),
    ]

    x = tmp_path / "gzx"
    x.mkdir()
    with gzip.open(x / "a.rdf.gz", "wt") as f:
        f.write(
            '<?xml version="1.0"?><rdf:RDF '
            'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:ex="http://e/"><rdf:Description rdf:about="http://e/a">'
            "<ex:n>v</ex:n></rdf:Description></rdf:RDF>"
        )
    assert read_rdfxml_df(spark, str(x / "a.rdf.gz")).count() == 1

    n = tmp_path / "gzn"
    n.mkdir()
    with gzip.open(n / "a.nt.gz", "wt") as f:
        f.write("<http://e/a> <http://e/b> <http://e/c> .\n")
    assert read_ntriples_df(spark, str(n / "a.nt.gz")).count() == 1

    assert infer_format(str(d / "a.ttl.gz")) == "turtle"
    assert infer_format(str(d)) == "turtle"
    store = QuadStore(spark)
    assert store.load_distributed(str(d)) == 2


def test_mixed_plain_and_compressed_corpus(spark, tmp_path):
    """Per-file codec routing (review finding): one compressed sidecar
    must not push the plain files onto the wholetext shuffle plan — the
    plain files keep the offsets path, the compressed files take the
    text fallback, results union.  Prefix heads stream through stdlib
    codecs (gzip/bz2) on the driver instead of scanning the whole
    decompressed corpus."""
    import bz2
    import gzip

    from kolibrie_spark.rdfio import read_rdfxml_df, read_turtle_df

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "plain.ttl").write_text(
        "@prefix ex: <http://e/> .\nex:p1 ex:b ex:c .\n"
    )
    with gzip.open(d / "z.ttl.gz", "wt") as f:
        f.write("@prefix ex: <http://e/> .\nex:z1 ex:b ex:c .\n")
    with bz2.open(d / "y.ttl.bz2", "wt") as f:
        f.write("@prefix ex: <http://e/> .\nex:y1 ex:b ex:c .\n")
    rows = sorted(tuple(r)[0] for r in read_turtle_df(spark, str(d)).collect())
    assert rows == ["http://e/p1", "http://e/y1", "http://e/z1"], rows

    x = tmp_path / "mixedx"
    x.mkdir()

    def doc(n):
        return (
            '<?xml version="1.0"?><rdf:RDF '
            'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            f'xmlns:ex="http://e/"><rdf:Description rdf:about="http://e/{n}">'
            "<ex:n>v</ex:n></rdf:Description></rdf:RDF>"
        )

    (x / "p.rdf").write_text(doc("p"))
    with gzip.open(x / "z.rdf.gz", "wt") as f:
        f.write(doc("z"))
    rows = sorted(r.s for r in read_rdfxml_df(spark, str(x)).collect())
    assert rows == ["http://e/p", "http://e/z"]


def test_streaming_compressed_reader_bounded_memory(spark, tmp_path, monkeypatch):
    """Compressed Turtle routes to the STREAMING fallback: one Hadoop
    split per file (split.minsize pinned, so bz2 cannot split), lines
    re-joined into a bounded buffer, strict-scan with carry mid-stream,
    fallback finish at EOF.  Forced 64-byte flushes make statements —
    including a multi-line long string with interior dots, an
    annotation, and a raw-newline short string — straddle many buffer
    flushes; triples must equal the driver parse for both gzip and
    bz2."""
    import bz2
    import gzip

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio.parsers import parse_turtle

    ttl = (
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(60))
        + 'ex:big ex:p """' + ("fat . line\n" * 30) + '""" .\n'
        + 'ex:ann ex:bal "1" {| ex:conf "0.9" |} .\n'
        + 'ex:raw ex:p "multi\nline . string" .\n'
        + "ex:tail ex:q ex:r .\n"
    )
    d = tmp_path / "stream"
    d.mkdir()
    with gzip.open(d / "a.ttl.gz", "wt") as f:
        f.write(ttl)
    with bz2.open(d / "b.ttl.bz2", "wt") as f:
        f.write(ttl)
    monkeypatch.setattr(R, "_STREAM_FLUSH_BYTES", 64)
    want = sorted(parse_turtle(ttl)[0])
    for fn in ("a.ttl.gz", "b.ttl.bz2"):
        got = sorted(
            (r.s, r.p, r.o)
            for r in R.read_turtle_df(spark, str(d / fn)).collect()
        )
        assert got == want, fn

    # tagged twin keeps the quoted mappings through the stream path
    quads, quoted = R.split_tagged(
        R.read_turtle_tagged_df(spark, str(d / "a.ttl.gz"))
    )
    assert quoted.count() == 1


def test_turtle_stream_chunks_match_offset_scanner(tmp_path):
    """The chunk-CONTENT scanner (compressed-stream fallback) must
    yield byte-identical chunks to the offsets scanner's bounds — same
    strict-match-and-carry discipline, token-soup fuzzed at windows
    down to 7 bytes."""
    import io
    import random

    from kolibrie_spark.rdfio import (
        _turtle_stream_bounds,
        _turtle_stream_chunks,
    )

    rng = random.Random(7)
    pieces = [
        "ex:s ex:p ex:o .\n", " . ", ". ", '."', '" ', "' ", "<", ">",
        "#c . \n", '"""', "'''", "\\", '\\"', "\n", "\r\n", "1.5 ",
        "café 日本語 ", '"lit . ', 'x" .\n', "@prefix ex: <http://e/> .\n",
        '{| ex:a "1" |}', '"""block\n. dots\n""" ', "'sq' ", '""', "''",
        ". \n", "ex:p", " ", ";", ",",
    ]
    p = tmp_path / "soup.ttl"
    for t in range(150):
        raw = "".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 80))
        ).encode("utf-8")
        p.write_bytes(raw)
        for per in (1, 3, 17):
            want = [raw[a:b] for a, b in _turtle_stream_bounds(str(p), per)]
            for win in (7, 31, 127):
                got = list(
                    _turtle_stream_chunks(io.BytesIO(raw), per, win)
                )
                assert got == want, (t, per, win)


class _ShortReadIO:
    """File object whose read() legally returns FEWER bytes than asked
    mid-stream (socket-backed shape) — pins the ADVICE r10 fix that a
    short read must not be treated as EOF."""

    def __init__(self, raw, max_read):
        import io

        self._b = io.BytesIO(raw)
        self._max = max_read

    def read(self, n=-1):
        if n is None or n < 0:
            return self._b.read()
        return self._b.read(min(n, self._max))


def test_turtle_stream_chunks_short_reads_not_eof(tmp_path):
    """A read() that returns fewer bytes than requested mid-stream must
    accumulate to a full window, not switch to the EOF regex early
    (which could mis-split statements).  Chunks must be byte-identical
    to the full-read path across pathological max_read sizes."""
    import io
    import random

    from kolibrie_spark.rdfio import _turtle_stream_chunks

    rng = random.Random(11)
    pieces = [
        "ex:s ex:p ex:o .\n", " . ", '."', '"""block\n. dots\n""" ',
        "#c . \n", '{| ex:a "1" |}', '"lit . ', 'x" .\n', "\r\n",
        "@prefix ex: <http://e/> .\n", "'sq' ", ". \n", ";", ",", " ",
    ]
    for t in range(40):
        raw = "".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 60))
        ).encode("utf-8")
        for per in (1, 5):
            for win in (13, 64):
                want = list(_turtle_stream_chunks(io.BytesIO(raw), per, win))
                for max_read in (1, 3, 7):
                    got = list(
                        _turtle_stream_chunks(
                            _ShortReadIO(raw, max_read), per, win
                        )
                    )
                    assert got == want, (t, per, win, max_read)


def test_streaming_hadoop_line_branch_and_xz(spark, tmp_path, monkeypatch):
    """Review follow-ups: (a) .xz routes to the streaming fallback (it
    was missing from _COMPRESSED_EXT_RE, so LZMA bytes hit the raw
    offsets plan — silent garbage); (b) the Hadoop line-rejoin branch
    (the zst/lz4/snappy path) gets real coverage by forcing a .gz file
    through it (Hadoop decompresses gz natively) with 64-byte flushes,
    so statements straddle many buffer flushes."""
    import gzip
    import lzma
    import re as _re

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio.parsers import parse_turtle

    ttl = (
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:s{i} ex:p "v {i} é" .\n' for i in range(40))
        + 'ex:big ex:p """' + ("fat . line\n" * 20) + '""" .\n'
        + "ex:tail ex:q ex:r .\n"
    )
    want = sorted(parse_turtle(ttl)[0])

    d = tmp_path / "xz"
    d.mkdir()
    with lzma.open(d / "a.ttl.xz", "wt") as f:
        f.write(ttl)
    got = sorted(
        (r.s, r.p, r.o)
        for r in R.read_turtle_df(spark, str(d / "a.ttl.xz")).collect()
    )
    assert got == want

    h = tmp_path / "hline"
    h.mkdir()
    with gzip.open(h / "a.ttl.gz", "wt") as f:
        f.write(ttl)
    monkeypatch.setattr(R, "_STDLIB_CODEC_RE", _re.compile(r"(?!x)x"))
    monkeypatch.setattr(R, "_STREAM_FLUSH_BYTES", 64)
    got = sorted(
        (r.s, r.p, r.o)
        for r in R.read_turtle_df(spark, str(h / "a.ttl.gz")).collect()
    )
    assert got == want


def test_long_string_escaped_quote_before_closer(spark, tmp_path):
    """ADVICE r10 fix pin: the long-string closer is the first quote
    triple NOT inside an escape pair (W3C STRING_LITERAL_LONG_*), so
    serializer output for literals ending in a quote (q3 abc backslash
    q4) and escaped-quote-runs mid-string parse to the right values —
    the old escape-blind lazy closer cut these early
    (loud error for the first shape, silent mid-statement re-open risk
    for the second).  Pinned across ALL the boundary engines: driver
    parse, fast chunk scan, slow oracle, windowed offsets scan, stream
    chunker, and the Spark reader."""
    import io

    from kolibrie_spark.rdfio import (
        _turtle_statement_chunks,
        _turtle_statement_chunks_slow,
        _turtle_stream_bounds,
        _turtle_stream_chunks,
        parse_turtle,
        read_turtle_df,
    )

    ttl = (
        '@prefix ex: <http://e/> .\n'
        'ex:s1 ex:p """abc\\"""" .\n'
        'ex:s2 ex:p """a\\"""bc""" .\n'
        "ex:s3 ex:p '''x\\'''' .\n"
        'ex:s4 ex:p """multi\nline ""inner"" q""" .\n'
        'ex:s5 ex:p "plain" .\n'
    )
    want = {
        ("http://e/s1", "abc\""),
        ("http://e/s2", 'a"""bc'),
        ("http://e/s3", "x'"),
        ("http://e/s4", 'multi\nline ""inner"" q'),
        ("http://e/s5", "plain"),
    }
    triples, _, _ = parse_turtle(ttl)
    assert {(s, o) for s, _, o in triples} == want

    # every chunking engine agrees on statement boundaries (5 statements)
    for per in (1, 2, 5):
        fast = _turtle_statement_chunks(ttl, per)
        slow = _turtle_statement_chunks_slow(ttl, per)
        assert [c.strip() for c in fast] == [c.strip() for c in slow], per
        parsed = [t for c in fast for t in parse_turtle(c, {"ex": "http://e/"})[0]]
        assert {(s, o) for s, _, o in parsed} == want, per

    p = tmp_path / "esc.ttl"
    p.write_bytes(ttl.encode("utf-8"))
    raw = p.read_bytes()
    for per in (1, 3):
        bounds_chunks = [raw[a:b] for a, b in _turtle_stream_bounds(str(p), per)]
        for win in (11, 64, 1 << 20):
            stream_chunks = list(
                _turtle_stream_chunks(io.BytesIO(raw), per, win)
            )
            assert stream_chunks == bounds_chunks, (per, win)

    rows = read_turtle_df(spark, str(p)).select("s", "o").collect()
    assert {(r.s, r.o) for r in rows} == want


def _xml_soup(rng, n_pieces):
    pieces = [
        "<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'>",
        "</rdf:RDF>", "<a>", "</a>", "<b x='1'>", "</b>", "<c/>",
        "<d y=\"v>v\">", "</d>", "text ", "< ", "> ", "<!-- c > -->",
        "<![CDATA[ <x> ]]>", "<?pi v?>", "<!DOCTYPE t>", "&amp; ",
        "<e z='q\"q'>", "</e>", "\n", "café ", "<f/>", "<g>", "</g>",
    ]
    return "".join(
        rng.choice(pieces) for _ in range(n_pieces)
    ).encode("utf-8")


def test_rdfxml_stream_chunks_match_bounds_scanner(tmp_path):
    """The XML chunk-CONTENT scanner (compressed-stream path, VERDICT
    r10 task #3) must reproduce the offsets scanner's rows exactly:
    same chunk indices, same root tag, and bodies byte-identical to
    ranged reads of the bounds — structured documents and token soup,
    fuzzed at windows down to 16 bytes."""
    import io
    import random

    from kolibrie_spark.rdfio import (
        _rdfxml_stream_bounds,
        _rdfxml_stream_chunks,
    )

    rng = random.Random(13)
    docs = []
    # structured: splittable documents of varying sizes
    for n in (0, 1, 3, 12, 40):
        body = "".join(
            f'<rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:p xmlns:ex=\"http://e/\">v {i} &lt;&gt; café</ex:p>"
            f"</rdf:Description>\n"
            for i in range(n)
        )
        docs.append(
            (
                '<?xml version="1.0"?>\n<rdf:RDF '
                'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
                + body
                + "</rdf:RDF>\n"
            ).encode("utf-8")
        )
    # soups
    for t in range(60):
        docs.append(_xml_soup(rng, rng.randrange(1, 60)))

    p = tmp_path / "doc.rdf"
    for di, raw in enumerate(docs):
        p.write_bytes(raw)
        for per in (1, 2, 5):
            want = [
                (ci, a, b, root)
                for ci, a, b, root in _rdfxml_stream_bounds(str(p), per)
            ]
            for win in (16, 64, 1 << 20):
                got = list(
                    _rdfxml_stream_chunks(io.BytesIO(raw), per, win)
                )
                assert len(got) == len(want), (di, per, win)
                for (gci, groot, gbody), (wci, wa, wb, wroot) in zip(got, want):
                    assert gci == wci, (di, per, win)
                    assert groot == wroot, (di, per, win)
                    assert gbody == raw[wa:wb], (di, per, win, gci)
                # short-read streams must not change the chunks
                got_sr = list(
                    _rdfxml_stream_chunks(_ShortReadIO(raw, 5), per, win)
                )
                assert got_sr == got, (di, per, win)


def test_rdfxml_compressed_streaming_end_to_end(spark, tmp_path):
    """A gzip-compressed (and a BOM'd bz2) RDF/XML file routes to the
    streaming chunker and produces the same triples as the uncompressed
    offsets plan — the >2 GB-decompressed wholetext ceiling no longer
    applies to stdlib-codec XML dumps."""
    import bz2 as _bz2
    import gzip as _gzip

    from kolibrie_spark.rdfio import read_rdfxml_df

    xml = (
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://e/">\n'
        + "".join(
            f'<rdf:Description rdf:about="http://e/s{i}">'
            f"<ex:p>v {i} café</ex:p></rdf:Description>\n"
            for i in range(25)
        )
        + "</rdf:RDF>\n"
    )
    plain = tmp_path / "plain" / "d.rdf"
    plain.parent.mkdir()
    plain.write_text(xml, encoding="utf-8")
    gz = tmp_path / "gz" / "d.rdf.gz"
    gz.parent.mkdir()
    gz.write_bytes(_gzip.compress(xml.encode("utf-8")))
    bz = tmp_path / "bz" / "d.rdf.bz2"
    bz.parent.mkdir()
    bz.write_bytes(_bz2.compress(b"\xef\xbb\xbf" + xml.encode("utf-8")))

    want = {
        (r.s, r.p, r.o)
        for r in read_rdfxml_df(spark, str(plain), 4).collect()
    }
    assert len(want) == 25
    for comp in (gz, bz):
        got = {
            (r.s, r.p, r.o)
            for r in read_rdfxml_df(spark, str(comp), 4).collect()
        }
        assert got == want, comp


def test_zst_routing_present_vs_absent(monkeypatch, tmp_path):
    """.zst routes to the direct streaming path when EITHER the optional
    zstandard module imports OR the vendored ctypes shim can bind the
    system libzstd (r12); with both absent the Hadoop line fallback
    keeps the file readable-by-design (VERDICT r10 task #4)."""
    import kolibrie_spark.rdfio as R

    import sys

    # force "absent" even if another test planted a fake module or an
    # addPyFile root earlier this session (None blocks the import)
    monkeypatch.setitem(sys.modules, "zstandard", None)
    monkeypatch.setitem(sys.modules, "lz4", None)
    monkeypatch.setitem(sys.modules, "lz4.frame", None)
    R._optional_codec_available.cache_clear()
    # simulate a box with no libzstd / liblz4 either
    monkeypatch.setattr(R, "_ctypes_zstd_available", lambda: False)
    monkeypatch.setattr(R, "_ctypes_lz4_available", lambda: False)
    try:
        # with wheel AND C library absent, .zst/.lz4 keep the line path
        assert not R._codec_direct_streamable("/x/d.ttl.zst")
        assert not R._codec_direct_streamable("/x/d.ttl.lz4")
        # stdlib codecs are always direct
        assert R._codec_direct_streamable("/x/d.ttl.gz")
        assert R._codec_direct_streamable("/x/d.rdf.bz2")
        assert not R._codec_direct_streamable("/x/d.ttl.snappy")
        # C library bindable via the ctypes shims: direct, no wheel
        monkeypatch.setattr(R, "_ctypes_zstd_available", lambda: True)
        assert R._codec_direct_streamable("/x/d.ttl.zst")
        assert not R._codec_direct_streamable("/x/d.ttl.lz4")
        monkeypatch.setattr(R, "_ctypes_lz4_available", lambda: True)
        assert R._codec_direct_streamable("/x/d.ttl.lz4")
        monkeypatch.setattr(R, "_ctypes_zstd_available", lambda: False)
        monkeypatch.setattr(R, "_ctypes_lz4_available", lambda: False)
        # plant a fake module: now .zst goes direct via the wheel route
        fake = tmp_path / "fakemods"
        fake.mkdir()
        (fake / "zstandard.py").write_text("class ZstdDecompressor:\n pass\n")
        monkeypatch.delitem(sys.modules, "zstandard")
        monkeypatch.syspath_prepend(str(fake))
        R._optional_codec_available.cache_clear()
        assert R._codec_direct_streamable("/x/d.ttl.zst")
        assert not R._codec_direct_streamable("/x/d.ttl.lz4")
    finally:
        R._optional_codec_available.cache_clear()


_FAKE_ZSTD_SRC = '''\
"""Identity stand-in for the optional zstandard module (test-only):
lets the .zst direct-streaming route run end-to-end in a container
without the real codec.  stream_reader deliberately returns SHORT
reads to exercise the _read_full discipline."""


class _Reader:
    def __init__(self, fh):
        self._fh = fh

    def read(self, n=-1):
        if n is None or n < 0:
            return self._fh.read()
        return self._fh.read(min(n, 7))  # short reads on purpose

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class ZstdDecompressor:
    def stream_reader(self, fh, closefd=True):
        return _Reader(fh)
'''


def _zstd_compress_bytes(data: bytes, level: int = 3) -> bytes:
    """Test-only one-shot compressor over the same system libzstd the
    vendored shim binds (the product code only ever DEcompresses)."""
    import ctypes

    from kolibrie_spark.rdfio.zstd_ctypes import _load_libzstd

    lib = _load_libzstd()
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(
        ctypes.cast(dst, ctypes.c_void_p), bound, data, len(data), level
    )
    assert not lib.ZSTD_isError(n)
    return dst.raw[:n]


def test_zst_ctypes_shim_real_codec_roundtrip(tmp_path):
    """r12 (VERDICT r11 task #5): the vendored ctypes decoder against the
    REAL system libzstd — single frame, multi-frame (concatenated), and
    corrupt input all behave; short reads respected by construction."""
    from kolibrie_spark.rdfio import zstd_ctypes as Z

    if not Z.available():
        pytest.skip("no libzstd on this box")
    data = ("@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p "v {i} café" .\n' for i in range(5000)
    )).encode("utf-8")

    f = tmp_path / "one.zst"
    f.write_bytes(_zstd_compress_bytes(data))
    r = Z.ZstdDecompressor().stream_reader(open(f, "rb"))
    got = bytearray()
    while True:
        c = r.read(4096)
        if not c:
            break
        got.extend(c)
    r.close()
    assert bytes(got) == data

    # multi-frame: two independently-compressed frames concatenated is a
    # legal .zst file (zstdcat semantics) — the reader must cross the
    # frame boundary
    half = len(data) // 2
    f2 = tmp_path / "two.zst"
    f2.write_bytes(
        _zstd_compress_bytes(data[:half]) + _zstd_compress_bytes(data[half:])
    )
    r2 = Z.ZstdDecompressor().stream_reader(open(f2, "rb"))
    assert r2.read(-1) == data
    r2.close()

    # corrupt input raises loudly, not silently truncates
    f3 = tmp_path / "bad.zst"
    f3.write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00" * 64)  # magic + garbage
    r3 = Z.ZstdDecompressor().stream_reader(open(f3, "rb"))
    with pytest.raises(Z.ZstdError):
        r3.read(-1)
    r3.close()


def test_zst_real_codec_end_to_end_scan(spark, tmp_path):
    """A .ttl.zst written with the real codec reads through the full
    distributed reader via the ctypes shim (no zstandard wheel in this
    container) and matches the plain-text parse."""
    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio import zstd_ctypes as Z

    if not Z.available():
        pytest.skip("no libzstd on this box")
    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p{i % 5} "v {i} café" .\n' for i in range(2000)
    )
    comp = tmp_path / "d.ttl.zst"
    comp.write_bytes(_zstd_compress_bytes(ttl.encode("utf-8")))
    assert R._codec_direct_streamable(str(comp))
    rows = R.read_turtle_df(spark, str(comp)).collect()
    assert {(r.s, r.o) for r in rows} == {
        (f"http://e/s{i}", f"v {i} café") for i in range(2000)
    }


def test_zst_open_never_leaks_fd(monkeypatch, tmp_path):
    """ADVICE r11 (low): the .zst branch of _open_maybe_compressed must
    close the underlying fh (a) on close() even when the old no-closefd
    zstandard API is in play, and (b) when stream_reader construction
    itself raises."""
    import sys
    import types

    import kolibrie_spark.rdfio as R

    f = tmp_path / "x.zst"
    f.write_bytes(b"payload")

    # (a) old API: stream_reader(fh) only — TypeError on closefd kwarg
    class _OldReader:
        def __init__(self, fh):
            self._fh = fh

        def read(self, n=-1):
            return self._fh.read(n)

        def close(self):
            pass  # old readers do NOT close the fh themselves

    class _OldDecomp:
        def stream_reader(self, fh):  # no closefd kwarg
            return _OldReader(fh)

    old_mod = types.ModuleType("zstandard")
    old_mod.ZstdDecompressor = _OldDecomp
    monkeypatch.setitem(sys.modules, "zstandard", old_mod)
    stream = R._open_maybe_compressed(str(f))
    inner_fh = stream._fh
    assert not inner_fh.closed
    stream.close()
    assert inner_fh.closed

    # (b) constructor failure: the already-opened fh must be closed
    opened = []
    real_open = open

    def _spy_open(path, *a, **kw):
        fh = real_open(path, *a, **kw)
        opened.append(fh)
        return fh

    class _BoomDecomp:
        def stream_reader(self, fh, closefd=True):
            raise RuntimeError("corrupt frame header")

    boom_mod = types.ModuleType("zstandard")
    boom_mod.ZstdDecompressor = _BoomDecomp
    monkeypatch.setitem(sys.modules, "zstandard", boom_mod)
    monkeypatch.setattr("builtins.open", _spy_open)
    with pytest.raises(RuntimeError):
        R._open_maybe_compressed(str(f))
    assert opened and all(fh.closed for fh in opened)


_FAKE_CODEC_DRIVER = '''\
import os
import sys

from pyspark.sql import SparkSession

import kolibrie_spark.rdfio as R

path = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
assert R._codec_direct_streamable(path), "fake module not importable"
rows = R.read_turtle_df(spark, path).collect()
got = {(r.s, r.o) for r in rows}
want = {(f"http://e/s{i}", sys.argv[2].format(i=i)) for i in range(int(sys.argv[3]))}
assert got == want, (len(got), len(want))
print("FAKE-CODEC-OK")
'''


def _run_fake_codec_subprocess(tmp_path, fake_dir, codec_path, pattern, n):
    """Run the fake-codec end-to-end read in an ISOLATED SparkSession
    subprocess: a fake module shipped into the shared session via
    addPyFile would shadow the real import for every LATER test reading
    that codec (the landmine the r12 real-codec tests stepped on)."""
    import os
    import subprocess
    import sys as _sys

    drv = tmp_path / "drv.py"
    drv.write_text(_FAKE_CODEC_DRIVER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        f"{fake_dir}{os.pathsep}{repo}{os.pathsep}" + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [_sys.executable, str(drv), str(codec_path), pattern, str(n)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FAKE-CODEC-OK" in proc.stdout


def test_zst_direct_stream_end_to_end(tmp_path):
    """With a (fake, identity) zstandard module importable on driver and
    executors (via PYTHONPATH in an isolated session), a .ttl.zst file
    takes the direct streaming chunker and parses identically to the
    plain file."""
    fake = tmp_path / "fakemods"
    fake.mkdir()
    (fake / "zstandard.py").write_text(_FAKE_ZSTD_SRC)
    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p "v {i} café" .\n' for i in range(30)
    )
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "d.ttl.zst").write_bytes(ttl.encode("utf-8"))
    _run_fake_codec_subprocess(
        tmp_path, fake, d / "d.ttl.zst", "v {i} café", 30
    )


def test_turtle_lines_reader_splits_bz2_in_file(spark, tmp_path):
    """Hadoop's bz2 codec is block-SPLITTABLE, so the line-safe reader
    gets in-file parallelism even on a COMPRESSED single dump file —
    the cheapest plan for the machine-export shape at dump scale
    (gzip stays one split per file; bz2 and plain text split).  Pinned:
    a .ttl.bz2 under a small maxPartitionBytes reads with >1 input
    partition and matches the general reader on the plain text."""
    import bz2 as _bz2

    import kolibrie_spark.rdfio as R

    # compresslevel=1 -> 100 KB bz2 blocks; ~2 MB uncompressed gives
    # several blocks so byte-range splits can land between them
    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p{i % 3} "v {i} café padding {i * 7}" .\n'
        for i in range(40_000)
    )
    plain = tmp_path / "d.ttl"
    plain.write_text(ttl, encoding="utf-8")
    comp = tmp_path / "d.ttl.bz2"
    comp.write_bytes(_bz2.compress(ttl.encode("utf-8"), 1))

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    old_ocb = spark.conf.get("spark.sql.files.openCostInBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try:
        df = R.read_turtle_lines_df(spark, str(comp))
        assert df.rdd.getNumPartitions() > 1  # the split actually happened
        got = {(r.s, r.p, r.o) for r in df.collect()}
    finally:
        if old_mpb is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        if old_ocb is not None:
            spark.conf.set("spark.sql.files.openCostInBytes", old_ocb)
    want = {
        (r.s, r.p, r.o)
        for r in R.read_turtle_df(spark, str(plain)).collect()
    }
    assert got == want and len(want) == 40_000


_FAKE_LZ4_FRAME_SRC = '''\
"""Identity stand-in for lz4.frame (test-only)."""


class _F:
    def __init__(self, fh):
        self._fh = fh

    def read(self, n=-1):
        if n is None or n < 0:
            return self._fh.read()
        return self._fh.read(min(n, 11))  # short reads on purpose

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def open(fp, mode="rb"):
    import builtins

    return _F(builtins.open(fp, "rb"))
'''


def test_lz4_direct_stream_end_to_end(tmp_path):
    """lz4 twin of the zst end-to-end: a fake identity lz4.frame package
    importable on driver and executors (PYTHONPATH, isolated session)
    routes .ttl.lz4 through the direct streaming chunker."""
    pkg = tmp_path / "fakepkg" / "lz4"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "frame.py").write_text(_FAKE_LZ4_FRAME_SRC)
    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p "w {i}" .\n' for i in range(20)
    )
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "d.ttl.lz4").write_bytes(ttl.encode("utf-8"))
    _run_fake_codec_subprocess(
        tmp_path, tmp_path / "fakepkg", d / "d.ttl.lz4", "w {i}", 20
    )


def test_single_quoted_short_strings(spark, tmp_path):
    """W3C Turtle STRING_LITERAL_SINGLE_QUOTE ('lit'): the chunk
    scanners always handled its boundaries, but the tokenizer had no
    single-quote branch, so any dump using the alternate quote style
    failed with a lex error (r11 gap found while tightening the
    long-string closers).  Pinned through the driver parse AND the
    distributed reader, with escapes, lang tags, and datatypes."""
    from kolibrie_spark.rdfio import parse_turtle, read_turtle_df

    ttl = (
        "@prefix ex: <http://e/> .\n"
        "ex:s1 ex:p 'plain sq' .\n"
        "ex:s2 ex:p 'it\\'s escaped' .\n"
        "ex:s3 ex:p 'has \"dq\" inside'@en .\n"
        "ex:s4 ex:p 'typed'^^<http://www.w3.org/2001/XMLSchema#string> .\n"
        "ex:s5 ex:p '' .\n"
    )
    want = {
        ("http://e/s1", "plain sq"),
        ("http://e/s2", "it's escaped"),
        ("http://e/s3", 'has "dq" inside@en'),
        ("http://e/s4", "typed"),
        ("http://e/s5", ""),
    }
    triples, _, _ = parse_turtle(ttl)
    assert {(s, o) for s, _, o in triples} == want
    p = tmp_path / "sq.ttl"
    p.write_text(ttl, encoding="utf-8")
    rows = read_turtle_df(spark, str(p)).select("s", "o").collect()
    assert {(r.s, r.o) for r in rows} == want


# --------------------------------------------------------------- r12: [ ] ( )
def _canon_bnodes(triples):
    """Label-insensitive canonical form for the bracket/collection tests:
    blank nodes in the generated docs form TREES, so each node's
    signature is the recursive hash of its outgoing (p, o) edges."""
    out = {}
    for s, p, o in triples:
        out.setdefault(s, []).append((p, o))
    memo = {}

    def sig(term, depth=0):
        if not isinstance(term, str) or not term.startswith("_:") or depth > 50:
            return term
        if term in memo:
            return memo[term]
        memo[term] = "•cycle"
        memo[term] = "•(" + "|".join(
            sorted(f"{p}→{sig(o, depth + 1)}" for p, o in out.get(term, []))
        ) + ")"
        return memo[term]

    return sorted((sig(s), p, sig(o)) for s, p, o in triples)


def test_turtle_bnode_property_lists_and_collections():
    """VERDICT r11 task #4: '[ p o ; ... ]' property lists and '( ... )'
    collections — beyond reference parity (its line-based subset,
    sparql_database.rs:965-1141, rejects them too) but line one of every
    OWL-shaped public dump."""
    import kolibrie_spark.rdfio.parsers as P
    from kolibrie_spark.schema import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE

    pre = "@prefix ex: <http://e/> .\n"
    # object property list, nested, multi-line (the OWL restriction shape)
    t, _, _ = P.parse_turtle(
        pre + "ex:a ex:p [\n  ex:q ex:v ;\n  ex:r \"x\" , \"y\"\n] ."
    )
    b = [o for s, p, o in t if s == "http://e/a"][0]
    assert b.startswith("_:")
    assert (b, "http://e/q", "http://e/v") in t
    assert (b, "http://e/r", "x") in t and (b, "http://e/r", "y") in t
    # standalone subject form '[ ... ] .' and subject-with-POs form
    t2, _, _ = P.parse_turtle(pre + "[ ex:q ex:v ] .")
    assert len(t2) == 1 and t2[0][1:] == ("http://e/q", "http://e/v")
    t3, _, _ = P.parse_turtle(pre + "[ ex:q ex:v ] ex:p ex:o .")
    assert len(t3) == 2 and {x[1] for x in t3} == {"http://e/q", "http://e/p"}
    # collection -> first/rest chain; () -> rdf:nil
    t4, _, _ = P.parse_turtle(pre + 'ex:a ex:list ( ex:x 1 "two" ) .')
    firsts = [o for s, p, o in t4 if p == RDF_FIRST]
    assert firsts == ["http://e/x", "1", "two"]
    rests = [o for s, p, o in t4 if p == RDF_REST]
    assert rests[-1] == RDF_NIL and len(rests) == 3
    t5, _, _ = P.parse_turtle(pre + "ex:a ex:list () .")
    assert t5 == [("http://e/a", "http://e/list", RDF_NIL)]
    # empty anon '[]' as object
    t6, _, _ = P.parse_turtle(pre + "ex:b ex:p [] .")
    assert len(t6) == 1 and t6[0][2].startswith("_:")
    # 'a' shorthand inside brackets; distinct anon labels per bracket
    t7, _, _ = P.parse_turtle(
        pre + "ex:a ex:p [ a ex:T ] .\nex:b ex:p [ a ex:T ] ."
    )
    bn = {s for s, p, o in t7 if p == RDF_TYPE}
    assert len(bn) == 2
    # anon_prefix salts the labels (chunk scoping)
    t8, _, _ = P.parse_turtle("ex:a ex:p [ ex:q ex:v ] .", anon_prefix="p1c2.")
    assert any(s.startswith("_:p1c2.anon") for s, _, _ in t8)
    # N-Triples / N-Quads stay strict: '[' is a loud error
    for fn in (P.parse_ntriples, P.parse_nquads):
        with pytest.raises(P.RdfParseError):
            fn("<urn:a> <urn:p> [ ] .")
    # unterminated forms fail loudly
    for bad in ("ex:a ex:p [ ex:q ex:v .", "ex:a ex:p ( ex:x ."):
        with pytest.raises(P.RdfParseError):
            P.parse_turtle(pre + bad)


def test_turtle_bracket_chunker_differential_and_fuzz():
    """The strict scanners must be boundary-safe on '.' inside brackets
    (pname locals with dots, decimals): fast chunker == slow per-line
    oracle on bracket-bearing text, and chunked parse == whole-doc parse
    (label-insensitively) across randomized docs."""
    import random

    import kolibrie_spark.rdfio as R
    import kolibrie_spark.rdfio.parsers as P

    rng = random.Random(42)

    def rand_statement(i):
        kind = rng.randrange(5)
        if kind == 0:
            return f"ex:s{i} ex:p ex:o{i} ."
        if kind == 1:  # brackets with dotted pname locals and decimals
            return (
                f"ex:s{i} ex:p [ ex:q ex:v.{i} ; ex:num 1.{i} ;"
                f' ex:lit "dot . inside {i}" ] .'
            )
        if kind == 2:  # multi-line bracket
            return f"ex:s{i} ex:p [\n  ex:q ex:v{i} ;\n  ex:r {i}.5\n] ."
        if kind == 3:  # collection with nested bracket
            return f'ex:s{i} ex:list ( ex:x{i} {i} [ ex:in "n{i}" ] ) .'
        return f"[ ex:q ex:v{i} ] ex:p ex:o{i} ."

    for trial in range(8):
        body = "\n".join(rand_statement(i) for i in range(rng.randrange(3, 30)))
        text = "@prefix ex: <http://e/> .\n" + body + "\n"
        # chunker differential: fast == slow oracle at several chunk sizes
        norm = lambda cs: [" ".join(c.split()) for c in cs]  # noqa: E731
        for per in (1, 2, 7):
            fast = norm(R._turtle_statement_chunks(text, per))
            slow = norm(R._turtle_statement_chunks_slow(text, per))
            assert fast == slow, (trial, per)
        # chunked parse == whole-doc parse, label-insensitively
        whole, _, pfx = P.parse_turtle(text)
        per_chunk = []
        for ci, ch in enumerate(R._turtle_statement_chunks(text, 2)):
            ch = R._TTL_DIRECTIVE_LINE_RE.sub("", ch)
            t, _, _ = P.parse_turtle(ch, prefixes=pfx, anon_prefix=f"c{ci}.")
            per_chunk.extend(t)
        assert _canon_bnodes(per_chunk) == _canon_bnodes(whole), trial


def test_turtle_bracket_distributed_roundtrip(spark, tmp_path, monkeypatch):
    """Distributed-reader round-trip with '[ ]' statements spanning chunk
    and stream-flush boundaries: plain dir scan, tiny scan window, and
    the compressed streaming path all produce the whole-doc parse
    (label-insensitively), with anon labels DISTINCT across chunks."""
    import gzip

    import kolibrie_spark.rdfio as R
    import kolibrie_spark.rdfio.parsers as P
    from kolibrie_spark.schema import RDF_FIRST

    stmts = []
    for i in range(40):
        stmts.append(
            f"ex:s{i} ex:p [\n  ex:q ex:v.{i} ;\n  ex:num {i}.25 ;\n"
            f'  ex:lit "dot . in {i}"\n] .'
        )
        stmts.append(f"ex:s{i} ex:list ( ex:x{i} {i} ) .")
    text = "@prefix ex: <http://e/> .\n" + "\n".join(stmts) + "\n"
    whole, _, _ = P.parse_turtle(text)
    want = _canon_bnodes(whole)

    d = tmp_path / "br"
    d.mkdir()
    (d / "a.ttl").write_text(text)

    got_plain = [
        (r.s, r.p, r.o) for r in R.read_turtle_df(spark, str(d), 3).collect()
    ]
    assert _canon_bnodes(got_plain) == want
    # 80 anon-bearing statements over per_chunk=3 chunks: every bracket's
    # node must stay distinct (the cross-chunk collision the salt fixes)
    anon = {t for tr in got_plain for t in tr if t.startswith("_:")}
    assert len(anon) == len(
        {t for tr in whole for t in tr if isinstance(t, str) and t.startswith("_:")}
    )

    # tiny windows: brackets straddle scan-window refills
    monkeypatch.setattr(R, "SCAN_WINDOW_BYTES", 128)
    got_win = [
        (r.s, r.p, r.o) for r in R.read_turtle_df(spark, str(d), 3).collect()
    ]
    monkeypatch.undo()
    assert _canon_bnodes(got_win) == want

    # compressed streaming path with a tiny flush: brackets straddle
    # stream-chunk boundaries
    g = tmp_path / "brgz"
    g.mkdir()
    with gzip.open(g / "a.ttl.gz", "wt") as fh:
        fh.write(text)
    monkeypatch.setattr(R, "_STREAM_FLUSH_BYTES", 256)
    got_gz = [
        (r.s, r.p, r.o)
        for r in R.read_turtle_df(spark, str(g / "a.ttl.gz"), 3).collect()
    ]
    assert _canon_bnodes(got_gz) == want
    # structural sanity: collection chains intact end-to-end
    firsts = [o for s, p, o in got_gz if p == RDF_FIRST]
    assert len(firsts) == 80


def test_lz4_ctypes_shim_real_codec_roundtrip(tmp_path):
    """lz4 twin of the zstd shim test: real liblz4 streaming decode —
    single frame via the CLI compressor, truncation raises loudly."""
    import shutil
    import subprocess

    from kolibrie_spark.rdfio import lz4_ctypes as L

    if not L.available():
        pytest.skip("no liblz4 on this box")
    lz4_bin = shutil.which("lz4")
    if lz4_bin is None:
        pytest.skip("no lz4 CLI to compress the fixture")
    data = ("@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p "v {i} café" .\n' for i in range(5000)
    )).encode("utf-8")
    plain = tmp_path / "d.ttl"
    plain.write_bytes(data)
    comp = tmp_path / "d.ttl.lz4"
    subprocess.run([lz4_bin, "-f", "-q", str(plain), str(comp)], check=True)

    r = L.open_stream(open(comp, "rb"))
    got = bytearray()
    while True:
        c = r.read(4096)
        if not c:
            break
        got.extend(c)
    r.close()
    assert bytes(got) == data

    # truncated mid-frame: loud error, not silent short data
    blob = comp.read_bytes()
    trunc = tmp_path / "t.lz4"
    trunc.write_bytes(blob[: len(blob) // 2])
    r2 = L.open_stream(open(trunc, "rb"))
    with pytest.raises(L.Lz4Error):
        r2.read(-1)
    r2.close()


def test_lz4_real_codec_end_to_end_scan(spark, tmp_path):
    """A .ttl.lz4 written with the real codec reads through the full
    distributed reader via the ctypes shim (no lz4 wheel here)."""
    import shutil
    import subprocess

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio import lz4_ctypes as L

    if not L.available():
        pytest.skip("no liblz4 on this box")
    lz4_bin = shutil.which("lz4")
    if lz4_bin is None:
        pytest.skip("no lz4 CLI to compress the fixture")
    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p{i % 5} "v {i} café" .\n' for i in range(2000)
    )
    plain = tmp_path / "d.ttl"
    plain.write_text(ttl)
    comp = tmp_path / "d.ttl.lz4"
    subprocess.run([lz4_bin, "-f", "-q", str(plain), str(comp)], check=True)
    plain.unlink()  # only the compressed file in the scan dir
    assert R._codec_direct_streamable(str(comp))
    rows = R.read_turtle_df(spark, str(comp)).collect()
    assert {(r.s, r.o) for r in rows} == {
        (f"http://e/s{i}", f"v {i} café") for i in range(2000)
    }


def test_load_into_compressed_files(spark, tmp_path):
    """r12: the driver-side interactive load decompresses and infers the
    format from the extension UNDER the codec suffix (it used to hand
    raw gzip bytes to the parser and KeyError on fmt='gz')."""
    import gzip

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.store import QuadStore

    ttl = '@prefix ex: <http://e/> .\nex:a ex:p "v café" .\nex:b ex:p "w" .\n'
    g = tmp_path / "d.ttl.gz"
    with gzip.open(g, "wt") as fh:
        fh.write(ttl)
    store = QuadStore(spark)
    assert R.load_into(store, str(g)) == 2
    assert store.quads.count() == 2

    from kolibrie_spark.rdfio import zstd_ctypes as Z

    if Z.available():
        nt = '<http://e/x> <http://e/p> "1" .\n<http://e/y> <http://e/p> "2" .\n'
        z = tmp_path / "d.nt.zst"
        z.write_bytes(_zstd_compress_bytes(nt.encode()))
        store2 = QuadStore(spark)
        assert R.load_into(store2, str(z)) == 2
        assert {r.s for r in store2.quads.collect()} == {
            "http://e/x", "http://e/y"
        }
