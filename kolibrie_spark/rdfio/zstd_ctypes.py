"""Minimal streaming zstd decompressor over the system ``libzstd`` via
ctypes (VERDICT r11 task #5: "vendor a minimal decoder").

The optional ``zstandard`` Python package is the preferred binding, but
many containers (this one included) ship ``libzstd.so.1`` WITHOUT the
Python wheel — the shared library is a dependency of half the system
toolchain.  This shim binds only the stable public streaming API
(``ZSTD_createDStream`` / ``ZSTD_decompressStream``), which has been
ABI-frozen since zstd 1.0, so the direct bounded-memory streaming scan
path (``_rdfxml_stream_chunks`` / the Turtle chunker) works on any node
with the C library present — no pip install required on executors.

Exposes the same surface ``_open_maybe_compressed`` uses from the real
package: ``ZstdDecompressor().stream_reader(fh, closefd=True)`` returning
an object with ``read(n)`` (short reads allowed — every caller goes
through ``_read_full``) and ``close()``.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import io


class _ZstdInBuffer(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


class _ZstdOutBuffer(ctypes.Structure):
    _fields_ = [
        ("dst", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_lib = None


def _load_libzstd():
    """Load and type-annotate libzstd once per process (executor-safe:
    ctypes handles are per-process and the loader is idempotent)."""
    global _lib
    if _lib is not None:
        return _lib
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError as exc:  # pragma: no cover - no libzstd on box
        raise ImportError(f"libzstd not loadable: {exc}") from exc
    try:
        lib.ZSTD_createDStream.restype = ctypes.c_void_p
        lib.ZSTD_initDStream.restype = ctypes.c_size_t
        lib.ZSTD_initDStream.argtypes = [ctypes.c_void_p]
        lib.ZSTD_freeDStream.restype = ctypes.c_size_t
        lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_ZstdOutBuffer),
            ctypes.POINTER(_ZstdInBuffer),
        ]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        lib.ZSTD_DStreamInSize.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
    except AttributeError as exc:  # pragma: no cover - ancient libzstd
        raise ImportError(f"libzstd too old for the streaming API: {exc}") from exc
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_libzstd()
        return True
    except ImportError:
        return False


class ZstdError(OSError):
    pass


class _CtypesZstdReader(io.RawIOBase):
    """Streaming reader: bounded memory (one input chunk + the caller's
    output buffer live at a time), short reads allowed."""

    def __init__(self, fh, closefd: bool = True):
        self._lib = _load_libzstd()
        self._fh = fh
        self._closefd = closefd
        self._dstream = self._lib.ZSTD_createDStream()
        if not self._dstream:  # pragma: no cover - malloc failure
            raise ZstdError("ZSTD_createDStream failed")
        rc = self._lib.ZSTD_initDStream(self._dstream)
        self._check(rc)
        self._in_chunk_size = int(self._lib.ZSTD_DStreamInSize()) or (1 << 17)
        self._in_buf = b""
        self._in_pos = 0
        self._eof = False
        # last ZSTD_decompressStream hint: 0 = at a frame boundary.  EOF
        # from the file while this is nonzero means the stream was
        # TRUNCATED mid-frame — raise, never silently return short data.
        self._last_hint = 0

    def _check(self, rc) -> int:
        if self._lib.ZSTD_isError(rc):
            msg = self._lib.ZSTD_getErrorName(rc).decode("ascii", "replace")
            raise ZstdError(f"zstd: {msg}")
        return int(rc)

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            out = []
            while True:
                chunk = self.read(1 << 20)
                if not chunk:
                    return b"".join(out)
                out.append(chunk)
        if n == 0 or self._eof:
            return b""
        out = ctypes.create_string_buffer(n)
        ob = _ZstdOutBuffer(ctypes.cast(out, ctypes.c_void_p), n, 0)
        while ob.pos == 0:
            if self._in_pos >= len(self._in_buf):
                self._in_buf = self._fh.read(self._in_chunk_size)
                self._in_pos = 0
                if not self._in_buf:
                    self._eof = True
                    if self._last_hint != 0:
                        raise ZstdError(
                            "truncated zstd stream: EOF mid-frame "
                            f"(decoder expected ~{self._last_hint} more bytes)"
                        )
                    return b""
            src = (ctypes.c_char * len(self._in_buf)).from_buffer_copy(
                self._in_buf
            )
            ib = _ZstdInBuffer(
                ctypes.cast(src, ctypes.c_void_p), len(self._in_buf), self._in_pos
            )
            hint = self._check(
                self._lib.ZSTD_decompressStream(
                    self._dstream, ctypes.byref(ob), ctypes.byref(ib)
                )
            )
            self._in_pos = ib.pos
            self._last_hint = hint
            if (
                hint == 0
                and self._in_pos >= len(self._in_buf)
                and ob.pos == 0
            ):
                # frame complete exactly at a chunk boundary; try the next
                # frame (multi-frame files are legal) on the next loop
                continue
        return out.raw[: ob.pos]

    def close(self) -> None:
        if getattr(self, "_dstream", None):
            self._lib.ZSTD_freeDStream(self._dstream)
            self._dstream = None
        if self._closefd and self._fh is not None:
            self._fh.close()
        self._fh = None
        super().close()


class ZstdDecompressor:
    """API-compatible subset of ``zstandard.ZstdDecompressor``."""

    def stream_reader(self, fh, closefd: bool = True):
        return _CtypesZstdReader(fh, closefd=closefd)


def compress_frame(data: bytes, level: int = 3) -> bytes:
    """ONE complete zstd frame for ``data`` (one-shot ``ZSTD_compress``,
    stable API since 1.0; records Frame_Content_Size, so the frame-split
    planner can group the output by decompressed size).  The splittable
    export writer emits one frame per ~window of rows — concatenated
    frames are a legal .zst stream (zstdcat semantics) that any zstd
    tool reads and :mod:`~kolibrie_spark.rdfio.framesplit` splits."""
    lib = _load_libzstd()
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(
        ctypes.cast(dst, ctypes.c_void_p), bound, data, len(data), level
    )
    if lib.ZSTD_isError(n):
        msg = lib.ZSTD_getErrorName(n).decode("ascii", "replace")
        raise ZstdError(f"zstd compress: {msg}")
    return dst.raw[:n]
