"""Frame-index split planning for multi-frame .zst/.lz4 line dumps
(kolibrie_spark.rdfio.framesplit) — the in-file parallel scan path for
the codecs Hadoop cannot split (its ZStandardCodec is stream-only).

Fixtures are built with the REAL system codecs: zstd frames via a
test-only ctypes one-shot compressor over the same libzstd the vendored
decoder binds; lz4 frames via the CLI.  Every differential asserts the
group-owned line union equals the single-stream read — including frame
boundaries that land mid-line, mid-CRLF, and exactly on terminators."""

import ctypes
import random
import shutil
import subprocess

import pytest

from kolibrie_spark.rdfio import framesplit as FS


def _zstd_available():
    from kolibrie_spark.rdfio import zstd_ctypes as Z

    return Z.available()


def _lz4_cli():
    from kolibrie_spark.rdfio import lz4_ctypes as L

    if not L.available():
        return None
    return shutil.which("lz4")


def _zstd_compress_frame(data: bytes, level: int = 3) -> bytes:
    """One complete zstd frame (test-only; product code only decodes)."""
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


def _zstd_skippable(payload: bytes = b"seek-table") -> bytes:
    return (
        (0x184D2A50).to_bytes(4, "little")
        + len(payload).to_bytes(4, "little")
        + payload
    )


def _write_multiframe_zst(path, data: bytes, cuts, skippable_after=()):
    """Compress ``data`` as one frame per piece split at byte offsets
    ``cuts`` (NOT line-aligned), optionally inserting a skippable frame
    after the given piece indexes.  Returns the pieces."""
    bounds = [0] + sorted(cuts) + [len(data)]
    pieces = [data[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
    blob = b""
    for i, piece in enumerate(pieces):
        blob += _zstd_compress_frame(piece)
        if i in skippable_after:
            blob += _zstd_skippable()
    path.write_bytes(blob)
    return pieces


def _write_multiframe_lz4(path, data: bytes, cuts, tmp_path):
    lz4_bin = _lz4_cli()
    bounds = [0] + sorted(cuts) + [len(data)]
    blob = b""
    for i in range(len(bounds) - 1):
        pf = tmp_path / f"_piece{i}"
        pf.write_bytes(data[bounds[i] : bounds[i + 1]])
        cf = tmp_path / f"_piece{i}.lz4"
        subprocess.run(
            [lz4_bin, "-f", "-q", str(pf), str(cf)], check=True
        )
        blob += cf.read_bytes()
    path.write_bytes(blob)


def _expected_lines(data: bytes) -> list[bytes]:
    """Text-source line semantics: split on \\n, strip trailing \\r, no
    phantom line after a trailing terminator."""
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    return [ln[:-1] if ln.endswith(b"\r") else ln for ln in lines]


def _group_lines(fp, target_bytes) -> list[bytes]:
    import os

    size = os.path.getsize(str(fp))
    out = []
    for i, (start, end) in enumerate(FS.frame_groups(str(fp), target_bytes)):
        out.extend(
            FS.iter_group_lines(str(fp), start, end, size, first=(i == 0))
        )
    return out


# ---------------------------------------------------------------- walks


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_frame_offsets_walk(tmp_path):
    data = b"".join(b"line %d with some text\n" % i for i in range(2000))
    f = tmp_path / "d.zst"
    _write_multiframe_zst(f, data, cuts=[5000, 17000, 30000],
                          skippable_after=(1,))
    offs = FS.zstd_frame_offsets(str(f))
    assert len(offs) == 4  # the skippable frame is not a data frame
    assert offs[0] == 0
    assert offs == sorted(offs)
    # offsets are exact frame starts: re-derive by compressing the pieces
    import os
    pieces_sizes = []
    bounds = [0, 5000, 17000, 30000, len(data)]
    for i in range(4):
        pieces_sizes.append(
            len(_zstd_compress_frame(data[bounds[i] : bounds[i + 1]]))
        )
    want = [0, pieces_sizes[0],
            pieces_sizes[0] + pieces_sizes[1] + len(_zstd_skippable()),
            pieces_sizes[0] + pieces_sizes[1] + len(_zstd_skippable())
            + pieces_sizes[2]]
    assert offs == want
    assert want[3] + pieces_sizes[3] == os.path.getsize(str(f))


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_frame_walk_rejects_garbage(tmp_path):
    f = tmp_path / "bad.zst"
    f.write_bytes(b"not a zstd file at all, clearly")
    with pytest.raises(FS.FrameWalkError):
        FS.zstd_frame_offsets(str(f))
    # truncated mid-frame: loud, not a silent short plan
    g = tmp_path / "trunc.zst"
    blob = _zstd_compress_frame(b"x" * 100000)
    g.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(FS.FrameWalkError):
        FS.zstd_frame_offsets(str(g))


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_frame_groups_target_bytes(tmp_path):
    data = b"".join(b"row %d\n" % i for i in range(20000))
    f = tmp_path / "d.zst"
    _write_multiframe_zst(f, data, cuts=[30000, 60000, 90000, 120000])
    import os
    size = os.path.getsize(str(f))
    # tiny target: one group per frame
    g1 = FS.frame_groups(str(f), target_bytes=1)
    assert len(g1) == 5
    # huge target: one group
    g2 = FS.frame_groups(str(f), target_bytes=1 << 40)
    assert g2 == [(0, size)]
    # groups tile [0, size) contiguously
    assert g1[0][0] == 0 and g1[-1][1] == size
    for a, b in zip(g1, g1[1:]):
        assert a[1] == b[0]


# --------------------------------------------------------- differentials


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_group_lines_differential(tmp_path):
    """Union of group-owned lines == single-stream lines, with frame cuts
    landing mid-line, mid-CRLF-pair, and exactly on terminators."""
    rows = []
    for i in range(3000):
        if i % 7 == 0:
            rows.append(b"")  # empty lines
        term = b"\r\n" if i % 5 == 0 else b"\n"
        rows.append(b"r%d caf\xc3\xa9 %s" % (i, b"x" * (i % 37)) + term[:-1])
    data = b"\n".join(rows) + b"\n"
    want = _expected_lines(data)

    # cut exactly ON a terminator, one byte after, and mid-line
    nl = data.index(b"\n", 4000)
    f = tmp_path / "d.zst"
    _write_multiframe_zst(f, data, cuts=[nl + 1, nl + 2, 9001, 22222])
    got = _group_lines(f, target_bytes=1)
    assert got == want
    # grouping never changes ownership, only task boundaries
    assert _group_lines(f, target_bytes=10000) == want
    assert _group_lines(f, target_bytes=1 << 40) == want


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_group_lines_no_trailing_newline(tmp_path):
    data = b"alpha\nbeta\ngamma-without-terminator"
    f = tmp_path / "d.zst"
    _write_multiframe_zst(f, data, cuts=[7])
    assert _group_lines(f, 1) == [b"alpha", b"beta",
                                  b"gamma-without-terminator"]


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_group_lines_line_spanning_many_frames(tmp_path):
    """One line longer than several frames: the owner reads FORWARD
    across every frame it spans; the spanned groups yield nothing."""
    data = b"head\n" + b"L" * 50000 + b"\ntail\n"
    f = tmp_path / "d.zst"
    _write_multiframe_zst(f, data, cuts=[100, 10000, 20000, 30000, 40000])
    assert _group_lines(f, 1) == [b"head", b"L" * 50000, b"tail"]


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_group_lines_boundary_fuzz(tmp_path):
    """Seeded fuzz: random text, random byte cuts (never line-aligned by
    construction), every grouping granularity — exactly-once lines."""
    rng = random.Random(0xF5)
    for trial in range(12):
        rows = []
        for i in range(rng.randrange(50, 400)):
            n = rng.randrange(0, 60)
            rows.append(bytes(rng.randrange(32, 127) for _ in range(n)))
        data = b"\n".join(rows) + (b"\n" if rng.random() < 0.7 else b"")
        if len(data) < 10:
            continue
        cuts = sorted(rng.sample(range(1, len(data)), min(6, len(data) - 2)))
        f = tmp_path / f"fz{trial}.zst"
        _write_multiframe_zst(f, data, cuts=cuts)
        want = _expected_lines(data)
        for tb in (1, 4096, 1 << 40):
            assert _group_lines(f, tb) == want, (trial, tb, cuts)


@pytest.mark.skipif(_lz4_cli() is None, reason="no liblz4 / lz4 CLI")
def test_lz4_frame_walk_and_differential(tmp_path):
    data = b"".join(b"lz4 row %d caf\xc3\xa9\n" % i for i in range(4000))
    f = tmp_path / "d.lz4"
    _write_multiframe_lz4(f, data, cuts=[5003, 17011, 39999], tmp_path=tmp_path)
    offs = FS.lz4_frame_offsets(str(f))
    assert len(offs) == 4 and offs[0] == 0 and offs == sorted(offs)
    want = _expected_lines(data)
    assert _group_lines(f, 1) == want
    assert _group_lines(f, 1 << 40) == want

    g = tmp_path / "bad.lz4"
    g.write_bytes(b"definitely not an lz4 frame")
    with pytest.raises(FS.FrameWalkError):
        FS.lz4_frame_offsets(str(g))


# ---------------------------------------------------------- Spark plumb


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_framesplit_lines_df_partitions(spark, tmp_path):
    import kolibrie_spark.rdfio as R

    data = b"".join(b"s%d\n" % i for i in range(30000))
    f = tmp_path / "d.txt.zst"
    _write_multiframe_zst(f, data, cuts=[40000, 80000, 120000])
    df = R._framesplit_lines_df(spark, [str(f)], target_bytes=1)
    # one task per frame — the in-file parallelism bz2 blocks give Hadoop
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 30000


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_turtle_lines_reader_multiframe_zst(spark, tmp_path):
    """read_turtle_lines_df over a multi-frame .ttl.zst == the plain-text
    parse, with cuts landing mid-statement — and a mixed dir where the
    sibling plain file still routes through the text source."""
    import kolibrie_spark.rdfio as R

    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p{i % 5} "v {i} café" .\n' for i in range(4000)
    )
    data = ttl.encode("utf-8")
    d = tmp_path / "mix"
    d.mkdir()
    _write_multiframe_zst(d / "a.ttl.zst", data, cuts=[9001, 33333, 70007])
    (d / "b.ttl").write_text(
        "@prefix ex: <http://e/> .\n"
        + "".join(f'ex:t{i} ex:q "w{i}" .\n' for i in range(500))
    )
    rows = R.read_turtle_lines_df(spark, str(d)).collect()
    got = {(r.s, r.o) for r in rows}
    want = {(f"http://e/s{i}", f"v {i} café") for i in range(4000)} | {
        (f"http://e/t{i}", f"w{i}") for i in range(500)
    }
    assert got == want


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_ntriples_reader_multiframe_zst(spark, tmp_path):
    import kolibrie_spark.rdfio as R

    nt = "".join(
        f'<http://e/s{i}> <http://e/p> "v{i}" .\n' for i in range(3000)
    )
    f = tmp_path / "d.nt.zst"
    _write_multiframe_zst(f, nt.encode(), cuts=[10000, 40000])
    rows = R.read_ntriples_df(spark, str(f)).collect()
    assert {(r.s, r.o) for r in rows} == {
        (f"http://e/s{i}", f"v{i}") for i in range(3000)
    }


@pytest.mark.skipif(_lz4_cli() is None, reason="no liblz4 / lz4 CLI")
def test_turtle_lines_reader_multiframe_lz4(spark, tmp_path):
    import kolibrie_spark.rdfio as R

    ttl = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p "v{i}" .\n' for i in range(2000)
    )
    f = tmp_path / "d.ttl.lz4"
    _write_multiframe_lz4(f, ttl.encode(), cuts=[5000, 20000],
                          tmp_path=tmp_path)
    rows = R.read_turtle_lines_df(spark, str(f)).collect()
    assert {(r.s, r.o) for r in rows} == {
        (f"http://e/s{i}", f"v{i}") for i in range(2000)
    }


def _seek_table_frame(entries) -> bytes:
    """zstd seekable-format seek table: skippable frame (magic 0x184D2A5E)
    of (compressed u32, decompressed u32) entries + 9-byte footer."""
    body = b"".join(
        c.to_bytes(4, "little") + d.to_bytes(4, "little") for c, d in entries
    )
    footer = (
        len(entries).to_bytes(4, "little") + b"\x00"
        + (0x8F92EAB1).to_bytes(4, "little")
    )
    payload = body + footer
    return (
        (0x184D2A5E).to_bytes(4, "little")
        + len(payload).to_bytes(4, "little")
        + payload
    )


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_zstd_seekable_seek_table_shortcut(tmp_path):
    """A seekable-format file plans from the trailing seek table —
    O(frames) reads — and a corrupted table falls back to the header
    walk with identical offsets."""
    data = b"".join(b"row %d seekable\n" % i for i in range(5000))
    bounds = [0, 20000, 45000, len(data)]
    frames = [
        _zstd_compress_frame(data[bounds[i] : bounds[i + 1]])
        for i in range(3)
    ]
    entries = [(len(fr), bounds[i + 1] - bounds[i]) for i, fr in enumerate(frames)]
    f = tmp_path / "s.zst"
    f.write_bytes(b"".join(frames) + _seek_table_frame(entries))

    import os
    size = os.path.getsize(str(f))
    want = [0, len(frames[0]), len(frames[0]) + len(frames[1])]
    want_idx = [
        (off, bounds[i + 1] - bounds[i]) for i, off in enumerate(want)
    ]
    assert FS._zstd_seek_table_index(str(f), size) == want_idx
    assert FS.zstd_frame_offsets(str(f)) == want

    # lines still read correctly with the seek-table frame in the last span
    assert _group_lines(f, 1) == _expected_lines(data)

    # corrupt one cumulative size: the table is rejected, the walk agrees
    bad = tmp_path / "bad.zst"
    bad_entries = [(entries[0][0] + 1, entries[0][1])] + entries[1:]
    bad.write_bytes(b"".join(frames) + _seek_table_frame(bad_entries))
    assert FS._zstd_seek_table_index(str(bad), os.path.getsize(str(bad))) is None
    assert FS.zstd_frame_offsets(str(bad)) == want

    # a checksummed table (descriptor bit 7, 12-byte entries) also parses
    body = b"".join(
        c.to_bytes(4, "little") + d.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        for c, d in entries
    )
    footer = (3).to_bytes(4, "little") + b"\x80" + (0x8F92EAB1).to_bytes(4, "little")
    payload = body + footer
    ck = tmp_path / "ck.zst"
    ck.write_bytes(
        b"".join(frames)
        + (0x184D2A5E).to_bytes(4, "little")
        + len(payload).to_bytes(4, "little")
        + payload
    )
    assert FS._zstd_seek_table_index(str(ck), os.path.getsize(str(ck))) == want_idx


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_leading_skippable_frame_keeps_head_line(tmp_path):
    """A LEADING skippable frame (seekable-format metadata shape) puts
    the first group at start > 0 — it must still own its head line
    (the start==0 heuristic alone would silently drop it)."""
    data = b"first line must survive\nsecond\nthird\n"
    f = tmp_path / "lead.zst"
    f.write_bytes(
        _zstd_skippable(b"leading metadata")
        + _zstd_compress_frame(data[:10])
        + _zstd_compress_frame(data[10:])
    )
    offs = FS.zstd_frame_offsets(str(f))
    assert len(offs) == 2 and offs[0] > 0
    assert _group_lines(f, 1) == _expected_lines(data)


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_frame_index_decompressed_sizes_and_grouping(tmp_path):
    """One-shot frames record Frame_Content_Size: the index reports the
    exact decompressed size per frame, and frame_groups targets
    DECOMPRESSED bytes — a high-ratio dump still yields fine-grained
    groups where compressed-size grouping collapsed to a few huge
    tasks."""
    piece = (b"the same compressible line over and over\n" * 3000)  # ~123 KB
    frames = [_zstd_compress_frame(piece) for _ in range(10)]
    f = tmp_path / "hr.zst"
    f.write_bytes(b"".join(frames))
    idx = FS.zstd_frame_index(str(f))
    assert [d for _, d in idx] == [len(piece)] * 10
    # 123 KB decompressed per frame, 240 KB target: 2 frames per group
    groups = FS.frame_groups(str(f), target_bytes=240_000)
    assert len(groups) == 5
    # compressed the whole file is ~6 KB — a compressed-size reading of
    # the same target would have made ONE group
    import os
    assert os.path.getsize(str(f)) < 240_000
    assert _group_lines(f, 240_000) == _expected_lines(piece * 10)


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_write_rdf_zst_round_trip(spark, tmp_path):
    """Splittable export round trip: quads -> multi-frame part-*.nt.zst
    (one file per partition, >1 frame per file at a small frame_bytes)
    -> read back through the frame-split reader, identical set; the
    files also pass the standard zstd CLI's integrity check."""
    import os

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.schema import QUADS_SCHEMA

    rows = [
        (f"http://e/s{i}", f"http://e/p{i % 3}",
         f'v {i} café "quoted" tab\ttext', None)
        for i in range(9000)
    ]
    df = spark.createDataFrame(rows, QUADS_SCHEMA).repartition(3)
    out = tmp_path / "export"
    manifest = R.write_rdf_zst(df, str(out), frame_bytes=64_000)
    assert 1 <= len(manifest) <= 3
    assert sum(m["rows"] for m in manifest) == 9000
    for m in manifest:
        assert os.path.getsize(m["path"]) == m["bytes"]
        # multi-frame output with content sizes recorded
        idx = FS.zstd_frame_index(m["path"])
        assert len(idx) > 1
        assert all(d is not None for _, d in idx)
    # no torn temp files left behind
    assert all(".inprogress." not in f for f in os.listdir(out))

    zstd_bin = shutil.which("zstd")
    if zstd_bin is not None:
        for m in manifest:
            subprocess.run([zstd_bin, "-t", "-q", m["path"]], check=True)

    got = {(r.s, r.p, r.o) for r in R.read_ntriples_df(spark, str(out)).collect()}
    assert got == {(s, p, o) for s, p, o, _ in rows}


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_write_rdf_zst_nquads_graphs(spark, tmp_path):
    import kolibrie_spark.rdfio as R
    from kolibrie_spark.schema import QUADS_SCHEMA

    rows = [
        (f"http://e/s{i}", "http://e/p", f"v{i}",
         "http://e/g1" if i % 2 else None)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, QUADS_SCHEMA).repartition(2)
    out = tmp_path / "exportq"
    manifest = R.write_rdf_zst(df, str(out), fmt="nquads", frame_bytes=4_000)
    assert sum(m["rows"] for m in manifest) == 500
    got = {
        (r.s, r.o, r.g) for r in R.read_nquads_df(spark, str(out)).collect()
    }
    assert got == {(s, o, g) for s, _, o, g in rows}


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_iter_group_lines_derives_first_past_leading_skippable(tmp_path):
    """Without an explicit ``first``, the default walks leading skippable
    frames — the bare start==0 heuristic would drop the head line."""
    data = b"head line\nsecond\n"
    f = tmp_path / "lead2.zst"
    f.write_bytes(_zstd_skippable(b"meta") + _zstd_compress_frame(data))
    import os
    size = os.path.getsize(str(f))
    (start, end), = FS.frame_groups(str(f), 1 << 40)
    assert start > 0
    got = list(FS.iter_group_lines(str(f), start, end, size))  # no first=
    assert got == [b"head line", b"second"]


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_framesplit_anon_labels_unique_across_groups(spark, tmp_path, monkeypatch):
    """'[ ]' blank nodes minted in DIFFERENT frame groups (and in the
    text stage of a mixed union) must never collide — the salt scopes
    labels per group, not per Spark partition id."""
    import kolibrie_spark.rdfio as R

    d = tmp_path / "mix"
    d.mkdir()
    ttl_zst = "@prefix ex: <http://e/> .\n" + "".join(
        f'ex:s{i} ex:p [ ex:q "v{i}" ] .\n' for i in range(300)
    )
    data = ttl_zst.encode()
    _write_multiframe_zst(d / "a.ttl.zst", data, cuts=[len(data) // 3,
                                                       2 * len(data) // 3])
    (d / "b.ttl").write_text(
        "@prefix ex: <http://e/> .\n" + "".join(
            f'ex:t{i} ex:p [ ex:q "w{i}" ] .\n' for i in range(100)
        )
    )
    # force one group per frame so several groups exist
    orig = R._framesplit_parsed_df
    monkeypatch.setattr(
        R, "_framesplit_parsed_df",
        lambda sp, files, schema, mk, target_bytes=None: orig(
            sp, files, schema, mk, target_bytes=1
        ),
    )
    rows = R.read_turtle_lines_df(spark, str(d)).collect()
    anon = {r.s for r in rows if r.s.startswith("_:")} | {
        r.o for r in rows if r.o.startswith("_:")
    }
    # every bracket a distinct node: 300 zst + 100 plain
    assert len(anon) == 400
    # and the structure survives: each anon node carries its ex:q leaf
    leaves = {r.o for r in rows if r.p == "http://e/q"}
    assert len(leaves) == 400


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_reader_skips_hidden_and_metadata_files(spark, tmp_path):
    """Hadoop-convention hidden names ('.x.crc', '_SUCCESS', in-progress
    temps) in a listed directory are skipped like the text source skips
    them — but an explicitly named hidden file is honored."""
    import kolibrie_spark.rdfio as R

    d = tmp_path / "dir"
    d.mkdir()
    nt = "".join(f'<http://e/s{i}> <http://e/p> "v{i}" .\n' for i in range(50))
    _write_multiframe_zst(d / "a.nt.zst", nt.encode(), cuts=[500])
    (d / ".a.nt.zst.crc").write_bytes(b"\x00\x01binary junk")
    (d / "_SUCCESS").write_text("")
    (d / ".part-00000.nt.zst.inprogress.0").write_bytes(b"\x28\xb5\x2f\xfdtorn")
    rows = R.read_ntriples_df(spark, str(d)).collect()
    assert len(rows) == 50

    # explicit hidden file: honored
    hidden = tmp_path / ".explicit.nt.zst"
    hidden.write_bytes(_zstd_compress_frame(b'<http://e/x> <http://e/p> "1" .\n'))
    got = R.read_ntriples_df(spark, str(hidden)).collect()
    assert len(got) == 1


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_export_zst_preserves_rdf_star(spark, tmp_path):
    """A store holding quoted-triple annotations exports << s p o >>
    (not opaque qt: literals) and round-trips losslessly through the
    distributed tagged reload."""
    from kolibrie_spark import SparqlEngine

    eng = SparqlEngine(spark)
    eng.parse_data(
        "@prefix ex: <urn:x#> .\n"
        'ex:a ex:p "1" {| ex:certainty "0.9" |} .\n'
        'ex:b ex:p "5" .\n'
    )
    out = tmp_path / "stardump"
    manifest = eng.store.export_zst(str(out))
    assert manifest
    # the serialized text carries the quoted triple, not a qt: literal
    import os as _os

    text = b"\n".join(
        ln
        for m in manifest
        for ln in FS.iter_group_lines(
            m["path"], 0, _os.path.getsize(m["path"]),
            _os.path.getsize(m["path"]),
        )
    )
    assert b"<<" in text and b"qt:" not in text

    eng2 = SparqlEngine(spark)
    eng2.load_file(str(out), distributed=True, fmt="ntriples")
    got = eng2.execute(
        "SELECT ?o WHERE { ?t <urn:x#certainty> ?o }"
    )
    assert [list(r) for r in got] == [["0.9"]]


@pytest.mark.skipif(not _zstd_available(), reason="no libzstd")
def test_write_rdf_zst_edge_cases(spark, tmp_path):
    import kolibrie_spark.rdfio as R
    from kolibrie_spark.schema import QUADS_SCHEMA

    # empty store: empty manifest, no files
    empty = spark.createDataFrame([], QUADS_SCHEMA)
    out = tmp_path / "empty"
    assert R.write_rdf_zst(empty, str(out)) == []
    import os
    assert os.listdir(out) == []

    # unsupported serialization: loud
    df = spark.createDataFrame(
        [("http://e/a", "http://e/p", "v", None)], QUADS_SCHEMA
    )
    with pytest.raises(ValueError):
        R.write_rdf_zst(df, str(tmp_path / "x"), fmt="turtle")


def test_write_rdf_lz4_round_trip(spark, tmp_path):
    """codec='lz4' writes multi-frame .nt.lz4 with Content_Size stamped
    (the CLI leaves it off; the split planner needs it) that reads back
    in-file parallel — and the standard lz4 CLI decodes it."""
    import os

    import kolibrie_spark.rdfio as R
    from kolibrie_spark.rdfio import lz4_ctypes as L
    from kolibrie_spark.schema import QUADS_SCHEMA

    if not L.available():
        pytest.skip("no liblz4 on this box")
    rows = [
        (f"http://e/s{i}", "http://e/p", f"v {i}", None) for i in range(6000)
    ]
    df = spark.createDataFrame(rows, QUADS_SCHEMA).repartition(2)
    out = tmp_path / "lzdump"
    manifest = R.write_rdf_zst(df, str(out), frame_bytes=40_000, codec="lz4")
    assert sum(m["rows"] for m in manifest) == 6000
    for m in manifest:
        assert m["path"].endswith(".nt.lz4")
        idx = FS.lz4_frame_index(m["path"])
        assert len(idx) > 1 and all(d is not None for _, d in idx)

    lz4_bin = shutil.which("lz4")
    if lz4_bin is not None:
        for m in manifest:
            subprocess.run([lz4_bin, "-t", "-q", m["path"]], check=True)

    got = {(r.s, r.o) for r in R.read_ntriples_df(spark, str(out)).collect()}
    assert got == {(s, o) for s, _, o, _ in rows}
