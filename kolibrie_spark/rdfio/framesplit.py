"""In-file parallelism for MULTI-FRAME .zst / .lz4 line dumps.

Standard ``zstd``/``lz4`` output is ONE frame — not splittable.  But the
tools people actually use for dump-scale corpora emit MANY independent
frames: ``pzstd`` (one frame per ~N MB window), ``zstd --seekable``,
``t2sz``, and plain frame concatenation (``cat a.zst b.zst`` is a legal
stream).  Each frame decompresses independently, so a frame index turns
one multi-hundred-GB compressed dump into split-plannable ranges the way
bz2 blocks do for Hadoop — except Hadoop has no zstd splitter at all
(its ZStandardCodec is stream-only), so this path beats a real cluster's
plan too.

The index walk reads only FRAME AND BLOCK HEADERS (RFC 8878 for zstd,
the LZ4 frame spec for lz4) — a few bytes per ~128 KB block, no
decompression — so indexing runs at page-cache speed and the driver can
split-plan a 400 GB file in seconds.

Line semantics follow Hadoop text splits exactly: a group owns the
lines that START inside its frame span; the head partial line belongs
to the previous group, which completes its tail line by decompressing
FORWARD into the next frames until the first newline.  This is only
correct when newlines are record boundaries — i.e. under the
``read_turtle_lines_df`` one-statement-per-line contract, which is the
shape machine-generated exports overwhelmingly have.
"""

from __future__ import annotations

import os

_ZSTD_MAGIC = 0xFD2FB528
_LZ4_MAGIC = 0x184D2204
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F


class FrameWalkError(ValueError):
    pass


def _read_exact(fh, n: int, what: str) -> bytes:
    b = fh.read(n)
    if len(b) != n:
        raise FrameWalkError(f"truncated {what} at offset {fh.tell() - len(b)}")
    return b


_SEEKABLE_MAGIC = 0x8F92EAB1  # zstd seekable-format footer magic


def _zstd_seek_table_index(fp: str, size: int):
    """Frame offsets from a zstd SEEKABLE-FORMAT seek table (the trailing
    skippable frame ``zstd --seekable``/``t2sz`` writes): O(frames) reads
    instead of the O(block-headers) walk — the difference between a
    constant-time plan and millions of header reads on a 400 GB dump.
    Returns None (caller falls back to the full walk) unless every
    consistency check holds: footer magic, reserved descriptor bits,
    table-frame bounds and header, and the cumulative compressed sizes
    landing exactly on the table frame's start."""
    if size < 17:  # skippable header (8) + footer (9)
        return None
    with open(fp, "rb") as fh:
        fh.seek(size - 9)
        footer = fh.read(9)
        if int.from_bytes(footer[5:9], "little") != _SEEKABLE_MAGIC:
            return None
        n = int.from_bytes(footer[0:4], "little")
        desc = footer[4]
        if desc & 0x7C:  # reserved bits must be zero
            return None
        entry = 12 if desc & 0x80 else 8
        table_start = size - 9 - n * entry - 8
        if table_start < 0:
            return None
        fh.seek(table_start)
        hdr = fh.read(8)
        magic = int.from_bytes(hdr[0:4], "little")
        if not (_SKIP_LO <= magic <= _SKIP_HI):
            return None
        if int.from_bytes(hdr[4:8], "little") != n * entry + 9:
            return None
        table = fh.read(n * entry)
        if len(table) != n * entry:
            return None
        idx: list[tuple[int, int | None]] = []
        pos = 0
        for i in range(n):
            comp = int.from_bytes(table[i * entry : i * entry + 4], "little")
            decomp = int.from_bytes(
                table[i * entry + 4 : i * entry + 8], "little"
            )
            if decomp != 0:  # zero-decompressed entries are skippable frames
                idx.append((pos, decomp))
            pos += comp
        if pos != table_start:  # inconsistent table: trust the walk instead
            return None
        return idx


def zstd_frame_index(fp: str) -> list[tuple[int, int | None]]:
    """(byte offset, decompressed size | None) of every zstd DATA frame
    in ``fp`` — seekable-format seek table when present and
    self-consistent (decompressed sizes always known), else the RFC 8878
    header walk (Frame_Content_Size parsed when the compressor recorded
    it — one-shot/pzstd frames do; streaming frames may not).  Skippable
    frames are skipped, reserved block types and foreign magics raise
    loudly."""
    idx: list[tuple[int, int | None]] = []
    size = os.path.getsize(fp)
    from_table = _zstd_seek_table_index(fp, size)
    if from_table is not None:
        return from_table
    with open(fp, "rb") as fh:
        pos = 0
        while pos < size:
            fh.seek(pos)
            magic = int.from_bytes(_read_exact(fh, 4, "frame magic"), "little")
            if _SKIP_LO <= magic <= _SKIP_HI:
                sz = int.from_bytes(_read_exact(fh, 4, "skippable size"), "little")
                pos += 8 + sz
                continue
            if magic != _ZSTD_MAGIC:
                raise FrameWalkError(f"not a zstd frame at offset {pos}")
            fhd = _read_exact(fh, 1, "frame header descriptor")[0]
            fcs_code = fhd >> 6
            single_segment = (fhd >> 5) & 1
            has_checksum = (fhd >> 2) & 1
            dictid_code = fhd & 3
            if not single_segment:
                fh.seek(1, 1)  # window descriptor
            fh.seek((0, 1, 2, 4)[dictid_code], 1)
            decomp: int | None = None
            if fcs_code == 0:
                if single_segment:
                    decomp = _read_exact(fh, 1, "frame content size")[0]
            else:
                n = (0, 2, 4, 8)[fcs_code]
                decomp = int.from_bytes(
                    _read_exact(fh, n, "frame content size"), "little"
                )
                if fcs_code == 1:
                    decomp += 256
            idx.append((pos, decomp))
            while True:  # block walk
                bh = int.from_bytes(_read_exact(fh, 3, "block header"), "little")
                last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
                if btype == 3:
                    raise FrameWalkError(f"reserved block type at {fh.tell()}")
                fh.seek(1 if btype == 1 else bsize, 1)  # RLE content is 1 byte
                if last:
                    break
            if has_checksum:
                fh.seek(4, 1)
            pos = fh.tell()
            if pos > size:
                raise FrameWalkError("frame walk ran past end of file")
    return idx


def zstd_frame_offsets(fp: str) -> list[int]:
    """Byte offsets of every zstd DATA frame in ``fp`` (see
    :func:`zstd_frame_index`)."""
    return [off for off, _ in zstd_frame_index(fp)]


def lz4_frame_index(fp: str) -> list[tuple[int, int | None]]:
    """(byte offset, decompressed size | None) of every lz4 DATA frame
    in ``fp`` (LZ4 frame format header walk; Content_Size parsed when
    the flag is set — the CLI defaults it OFF, so lz4 frames usually
    report None.  Legacy-frame magic and foreign magics raise loudly)."""
    idx: list[tuple[int, int | None]] = []
    size = os.path.getsize(fp)
    with open(fp, "rb") as fh:
        pos = 0
        while pos < size:
            fh.seek(pos)
            magic = int.from_bytes(_read_exact(fh, 4, "frame magic"), "little")
            if _SKIP_LO <= magic <= _SKIP_HI:
                sz = int.from_bytes(_read_exact(fh, 4, "skippable size"), "little")
                pos += 8 + sz
                continue
            if magic != _LZ4_MAGIC:
                raise FrameWalkError(f"not an lz4 frame at offset {pos}")
            flg = _read_exact(fh, 1, "FLG byte")[0]
            if (flg >> 6) != 0b01:
                raise FrameWalkError(f"unsupported lz4 frame version at {pos}")
            block_checksum = (flg >> 4) & 1
            content_size = (flg >> 3) & 1
            content_checksum = (flg >> 2) & 1
            dict_id = flg & 1
            fh.seek(1, 1)  # BD byte
            decomp: int | None = None
            if content_size:
                decomp = int.from_bytes(
                    _read_exact(fh, 8, "content size"), "little"
                )
            fh.seek((4 if dict_id else 0) + 1, 1)  # DictID + header checksum
            idx.append((pos, decomp))
            while True:  # data blocks until the 0x00000000 EndMark
                bsz = int.from_bytes(_read_exact(fh, 4, "block size"), "little")
                if bsz == 0:
                    break
                fh.seek((bsz & 0x7FFFFFFF) + (4 if block_checksum else 0), 1)
            if content_checksum:
                fh.seek(4, 1)
            pos = fh.tell()
            if pos > size:
                raise FrameWalkError("frame walk ran past end of file")
    return idx


def lz4_frame_offsets(fp: str) -> list[int]:
    """Byte offsets of every lz4 DATA frame in ``fp`` (see
    :func:`lz4_frame_index`)."""
    return [off for off, _ in lz4_frame_index(fp)]


def frame_index(fp: str) -> list[tuple[int, int | None]]:
    low = fp.lower()
    if low.endswith(".zst"):
        return zstd_frame_index(fp)
    if low.endswith(".lz4"):
        return lz4_frame_index(fp)
    raise FrameWalkError(f"no frame walker for {fp}")


def frame_offsets(fp: str) -> list[int]:
    return [off for off, _ in frame_index(fp)]


# when a frame header does not record its decompressed size, estimate it
# from the compressed span: text dumps commonly compress 4-30x, and
# over-estimating only makes groups finer (more, smaller tasks), which
# is the safe direction for balance
_FALLBACK_RATIO = 8


def estimated_decompressed(idx, size: int) -> int:
    """Total decompressed bytes an index covers (headerless frames
    estimated at ``compressed x _FALLBACK_RATIO``)."""
    total = 0
    bounds = [off for off, _ in idx] + [size]
    for i, (_, decomp) in enumerate(idx):
        comp = bounds[i + 1] - bounds[i]
        total += decomp if decomp is not None else comp * _FALLBACK_RATIO
    return total


def frame_groups_from_index(
    idx, size: int, target_bytes: int = 128 << 20
) -> list[tuple[int, int]]:
    """Split-plan over a precomputed :func:`frame_index`: contiguous
    frame runs of ~``target_bytes`` DECOMPRESSED size each (the Spark
    ``maxPartitionBytes`` convention), as (start_offset, end_offset)
    spans.  Decompressed sizes come from the frame headers / seek table;
    headerless frames estimate ``compressed x 8``.  Grouping by
    compressed size instead would make task granularity swing with the
    compression ratio — a 26x-ratio Turtle dump at a 32 MB compressed
    target yielded ~830 MB tasks.  One group per frame run keeps
    per-task memory bounded by the line-carry buffer, not the span
    (decompression streams)."""
    if not idx:
        return []
    bounds = [off for off, _ in idx] + [size]
    groups: list[tuple[int, int]] = []
    start = bounds[0]
    acc = 0
    for i in range(1, len(bounds)):
        comp = bounds[i] - bounds[i - 1]
        decomp = idx[i - 1][1]
        acc += decomp if decomp is not None else comp * _FALLBACK_RATIO
        if acc >= target_bytes or i == len(bounds) - 1:
            groups.append((start, bounds[i]))
            start = bounds[i]
            acc = 0
    return groups


def frame_groups(
    fp: str, target_bytes: int = 128 << 20
) -> list[tuple[int, int]]:
    return frame_groups_from_index(
        frame_index(fp), os.path.getsize(fp), target_bytes
    )


def _first_data_frame_offset(fp: str) -> int:
    """Offset of the first NON-skippable frame — O(#leading skippable
    frames) header reads, no decompression.  Falls back to 0 on any
    read problem (the subsequent decompression will raise the real
    error loudly)."""
    try:
        size = os.path.getsize(fp)
        with open(fp, "rb") as fh:
            pos = 0
            while pos + 8 <= size:
                fh.seek(pos)
                magic = int.from_bytes(fh.read(4), "little")
                if not (_SKIP_LO <= magic <= _SKIP_HI):
                    return pos
                pos += 8 + int.from_bytes(fh.read(4), "little")
        return pos
    except OSError:
        return 0


class _RangeFile:
    """Read window [start, end) of ``fh`` — hands the decompressor
    exactly one group's compressed bytes, so its stream ends cleanly at
    a frame boundary."""

    def __init__(self, fh, start: int, end: int):
        self._fh = fh
        self._fh.seek(start)
        self._left = end - start

    def read(self, n: int = -1) -> bytes:
        if self._left <= 0:
            return b""
        if n is None or n < 0 or n > self._left:
            n = self._left
        b = self._fh.read(n)
        self._left -= len(b)
        return b

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def close(self) -> None:  # the caller owns the underlying fh
        pass


def _open_decompressor(fp: str, fh, start: int, end: int):
    rf = _RangeFile(fh, start, end)
    low = fp.lower()
    if low.endswith(".zst"):
        try:
            import zstandard
        except ImportError:
            from kolibrie_spark.rdfio import zstd_ctypes as zstandard

            return zstandard.ZstdDecompressor().stream_reader(rf)
        try:
            # a group is SEVERAL concatenated frames; the wheel's reader
            # stops at the first frame end unless told otherwise (and
            # over-reads its input, so naive per-frame chaining would
            # lose the next frame's head bytes)
            return zstandard.ZstdDecompressor().stream_reader(
                rf, read_across_frames=True
            )
        except TypeError:  # ancient wheel without the kwarg
            from kolibrie_spark.rdfio import zstd_ctypes

            return zstd_ctypes.ZstdDecompressor().stream_reader(rf)
    try:
        import lz4.frame as _lz4f

        # LZ4FrameFile handles concatenated frames natively
        return _lz4f.LZ4FrameFile(rf, "rb")
    except ImportError:
        from kolibrie_spark.rdfio import lz4_ctypes

        return lz4_ctypes.open_stream(rf, closefd=False)


def iter_group_lines(
    fp: str, start: int, end: int, file_size: int, first: bool | None = None
):
    """Yield the text lines OWNED by frame span [start, end) of ``fp``
    (Hadoop split semantics: lines starting inside the span; the tail
    line is completed by decompressing forward past ``end``).  Bounded
    memory: one 1 MiB read buffer + one partial-line carry.

    ``first`` marks the FIRST group of the file — it owns its head line
    instead of skipping to the first newline.  When omitted it is
    derived by walking the file's LEADING skippable frames (seekable-
    format metadata can push the first data frame — and so the first
    group — past offset 0; a bare ``start == 0`` test would make that
    group skip to its first newline and silently drop the head line)."""
    if first is None:
        first = start <= _first_data_frame_offset(fp)
    with open(fp, "rb") as fh:
        stream = _open_decompressor(fp, fh, start, end)
        carry = b""
        skipping = not first
        while True:
            buf = stream.read(1 << 20)
            if not buf:
                break
            if skipping:
                nl = buf.find(b"\n")
                if nl < 0:
                    continue  # the whole read is the previous group's line
                buf = buf[nl + 1 :]
                skipping = False
            carry += buf
            if b"\n" in carry:
                lines = carry.split(b"\n")
                carry = lines.pop()
                for ln in lines:
                    yield ln[:-1] if ln.endswith(b"\r") else ln
        stream.close()
        if skipping:
            return  # span ended inside the previous group's line
        # complete the tail partial line by reading forward past `end`.
        # `found_nl` matters for the empty-line-at-boundary case: span
        # ends "...\n" and the next begins "\n..." — carry is empty but
        # the terminator we just consumed IS an owned (empty) line, which
        # the next group will skip; dropping it here would lose it.
        if end < file_size:
            found_nl = False
            fwd = _open_decompressor(fp, fh, end, file_size)
            while True:
                buf = fwd.read(1 << 20)
                if not buf:
                    break
                nl = buf.find(b"\n")
                if nl >= 0:
                    carry += buf[:nl]
                    found_nl = True
                    break
                carry += buf
            fwd.close()
            if carry or found_nl:
                yield carry[:-1] if carry.endswith(b"\r") else carry
        elif carry:  # last group: no phantom empty line at EOF
            yield carry[:-1] if carry.endswith(b"\r") else carry
