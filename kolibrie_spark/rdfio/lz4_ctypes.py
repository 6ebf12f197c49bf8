"""Minimal streaming lz4-frame decompressor over the system ``liblz4``
via ctypes — the lz4 twin of :mod:`kolibrie_spark.rdfio.zstd_ctypes`
(VERDICT r11 task #5's "vendor a minimal decoder" pattern).

Binds only the stable public LZ4F API (``LZ4F_createDecompressionContext``
/ ``LZ4F_decompress``), present since lz4 r128 (2015).  Exposes the same
surface ``_open_maybe_compressed`` uses from the optional ``lz4.frame``
package: ``open_stream(fh)`` returning an object with ``read(n)`` (short
reads allowed — every caller goes through ``_read_full``) and
``close()``.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import io

_LZ4F_VERSION = 100

_lib = None


def _load_liblz4():
    global _lib
    if _lib is not None:
        return _lib
    name = ctypes.util.find_library("lz4") or "liblz4.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError as exc:  # pragma: no cover - no liblz4 on box
        raise ImportError(f"liblz4 not loadable: {exc}") from exc
    try:
        lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_createDecompressionContext.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_uint,
        ]
        lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
        lib.LZ4F_decompress.restype = ctypes.c_size_t
        lib.LZ4F_decompress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p,
        ]
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
        lib.LZ4F_getErrorName.restype = ctypes.c_char_p
        lib.LZ4F_getErrorName.argtypes = [ctypes.c_size_t]
    except AttributeError as exc:  # pragma: no cover - ancient liblz4
        raise ImportError(f"liblz4 too old for the frame API: {exc}") from exc
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_liblz4()
        return True
    except ImportError:
        return False


class Lz4Error(OSError):
    pass


class _CtypesLz4Reader(io.RawIOBase):
    """Streaming reader: bounded memory, short reads allowed; EOF while
    the decoder still expects input raises (truncation must be loud)."""

    _IN_CHUNK = 1 << 17

    def __init__(self, fh, closefd: bool = True):
        self._lib = _load_liblz4()
        self._fh = fh
        self._closefd = closefd
        self._dctx = ctypes.c_void_p()
        rc = self._lib.LZ4F_createDecompressionContext(
            ctypes.byref(self._dctx), _LZ4F_VERSION
        )
        self._check(rc)
        self._in_buf = b""
        self._in_pos = 0
        self._eof = False
        self._last_hint = 0

    def _check(self, rc) -> int:
        if self._lib.LZ4F_isError(rc):
            msg = self._lib.LZ4F_getErrorName(rc).decode("ascii", "replace")
            raise Lz4Error(f"lz4: {msg}")
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
        dst = ctypes.create_string_buffer(n)
        written_total = 0
        while written_total == 0:
            if self._in_pos >= len(self._in_buf):
                self._in_buf = self._fh.read(self._IN_CHUNK)
                self._in_pos = 0
                if not self._in_buf:
                    self._eof = True
                    if self._last_hint != 0:
                        raise Lz4Error(
                            "truncated lz4 stream: EOF mid-frame "
                            f"(decoder expected ~{self._last_hint} more bytes)"
                        )
                    return b""
            src = (ctypes.c_char * len(self._in_buf)).from_buffer_copy(
                self._in_buf
            )
            dst_size = ctypes.c_size_t(n - written_total)
            src_size = ctypes.c_size_t(len(self._in_buf) - self._in_pos)
            src_ptr = ctypes.cast(
                ctypes.addressof(src) + self._in_pos, ctypes.c_void_p
            )
            dst_ptr = ctypes.cast(
                ctypes.addressof(dst) + written_total, ctypes.c_void_p
            )
            hint = self._check(
                self._lib.LZ4F_decompress(
                    self._dctx,
                    dst_ptr,
                    ctypes.byref(dst_size),
                    src_ptr,
                    ctypes.byref(src_size),
                    None,
                )
            )
            self._in_pos += src_size.value
            written_total += dst_size.value
            self._last_hint = hint
            if (
                hint == 0
                and written_total == 0
                and self._in_pos >= len(self._in_buf)
            ):
                # frame complete exactly at a chunk boundary; legal
                # multi-frame files continue on the next loop
                continue
        return dst.raw[:written_total]

    def close(self) -> None:
        if getattr(self, "_dctx", None) and self._dctx.value:
            self._lib.LZ4F_freeDecompressionContext(self._dctx)
            self._dctx = ctypes.c_void_p()
        if self._closefd and self._fh is not None:
            self._fh.close()
        self._fh = None
        super().close()


def open_stream(fh, closefd: bool = True):
    return _CtypesLz4Reader(fh, closefd=closefd)


class _Lz4FrameInfo(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
    ]


class _Lz4Preferences(ctypes.Structure):
    _fields_ = [
        ("frameInfo", _Lz4FrameInfo),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def compress_frame(data: bytes, level: int = 0) -> bytes:
    """ONE complete lz4 frame for ``data`` (one-shot
    ``LZ4F_compressFrame``), with Content_Size RECORDED in the header —
    the CLI defaults it off, but the frame-split planner groups by
    decompressed size, so the export writer always stamps it.
    Concatenated frames are a legal .lz4 stream any lz4 tool reads and
    :mod:`~kolibrie_spark.rdfio.framesplit` splits."""
    lib = _load_liblz4()
    try:
        lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lib.LZ4F_compressFrameBound.argtypes = [
            ctypes.c_size_t,
            ctypes.POINTER(_Lz4Preferences),
        ]
        lib.LZ4F_compressFrame.restype = ctypes.c_size_t
        lib.LZ4F_compressFrame.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(_Lz4Preferences),
        ]
    except AttributeError as exc:  # pragma: no cover - ancient liblz4
        raise Lz4Error(f"liblz4 lacks LZ4F_compressFrame: {exc}") from exc
    prefs = _Lz4Preferences()
    prefs.frameInfo.contentSize = len(data)
    prefs.compressionLevel = level
    bound = lib.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(
        ctypes.cast(dst, ctypes.c_void_p), bound, data, len(data),
        ctypes.byref(prefs),
    )
    if lib.LZ4F_isError(n):
        msg = lib.LZ4F_getErrorName(n).decode("ascii", "replace")
        raise Lz4Error(f"lz4 compress: {msg}")
    return dst.raw[:n]
