"""Pure-Python baseline JPEG codec (grayscale, SOF0) for the multimodal
content-decode path — closes the one decode stub left in
``operators/multimodal.py`` (no image libraries exist in the runtime).

Scope: single-component (luminance) baseline sequential JPEG — the shape
``build_jpeg_baseline`` emits and the common case for thumbnail-scale
training-data probes. Progressive/multi-component scans raise ValueError
with a precise reason, which ``extract_media_features`` surfaces per-row in
``decode_error`` (bad blobs must never kill the Spark task).

All constants are from the public spec (ITU-T T.81): Annex K.1 luminance
quantization table, Annex K.3.1/K.3.2 DC/AC Huffman tables, Figure A.6
zigzag. The zigzag and canonical Huffman code assignment are generated
programmatically from the spec's construction rules rather than typed as
64/162-entry literals. Reference parity: the reference engine has no image
codec at all (multimodal is a north-star extension, SURVEY.md §2 note);
this is Spark-side plumbing + deterministic content math, validated by
encoder↔decoder round-trips under a flat quant table (near-lossless) and
the Annex K table (bounded quantization error).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table, row-major
QTABLE_K1 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QTABLE_FLAT = np.ones((8, 8), dtype=np.int32)

# Annex K.3.1: luminance DC — BITS (code count per length 1..16), HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.2: luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = (
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
)


def zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag order, generated from the diagonal
    walk rule (Figure A.6): even diagonals run bottom-left→top-right, odd
    ones top-right→bottom-left."""
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                out.append((r, c))
    return out


ZIGZAG = zigzag_order()


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length): canonical assignment per Annex C (codes in
    increasing length, within a length in HUFFVAL order)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG: dangling 0xFF in scan")
                nxt = self.data[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    raise ValueError(f"JPEG: unexpected marker FF{nxt:02X} in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    raw = v if v > 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def build_jpeg_baseline(
    width: int,
    height: int,
    pixel_fn=None,
    qtable: np.ndarray | None = None,
    image: np.ndarray | None = None,
) -> bytes:
    """Encode a fully-decodable grayscale baseline JPEG. Content comes from
    ``image`` (H×W ndarray, vectorized path) or ``pixel_fn(x, y) -> 0..255``
    (default zeros); ``qtable`` defaults to Annex K.1 (pass ``QTABLE_FLAT``
    for a near-lossless fixture — block-constant content round-trips
    EXACTLY under it, since only the DC coefficient is nonzero and its
    quantizer is 1)."""
    q = QTABLE_K1 if qtable is None else np.asarray(qtable, dtype=np.int32)
    if image is not None:
        img = np.asarray(image, dtype=np.float64)
        if img.shape != (height, width):
            raise ValueError("image shape must be (height, width)")
    else:
        img = np.zeros((height, width), dtype=np.float64)
        if pixel_fn is not None:
            for y in range(height):
                for x in range(width):
                    img[y, x] = pixel_fn(x, y) & 0xFF
    # pad to 8×8 multiples by edge replication (A.2.4 recommendation)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge")

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            quant = np.round(coef / q).astype(np.int64)
            zz = [int(quant[r, c]) for r, c in ZIGZAG]
            size, raw = _mag_bits(zz[0] - prev_dc)
            prev_dc = zz[0]
            code, length = dc_codes[size]
            w.write(code, length)
            if size:
                w.write(raw, size)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        code, length = ac_codes[0xF0]  # ZRL
                        w.write(code, length)
                        run = 0
                    continue
                size, raw = _mag_bits(zz[i])
                code, length = ac_codes[(run << 4) | size]
                w.write(code, length)
                w.write(raw, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = bytes(int(q[r, c]) & 0xFF for r, c in ZIGZAG)
    dqt = seg(0xDB, b"\x00" + zz_q)
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht_dc = seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + sos + scan + b"\xff\xd9"
    )


def _parse_segments(data: bytes):
    """Yield (marker, payload, scan_start) walking the segment stream;
    stops at SOS (scan_start = offset of entropy data) or EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    while i + 1 < len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > len(data):
            raise ValueError("JPEG: truncated segment header")
        length = struct.unpack(">H", data[i + 2 : i + 4])[0]
        payload = data[i + 4 : i + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG: truncated segment payload")
        yield marker, payload, i + 2 + length
        if marker == 0xDA:
            return
        i += 2 + length


def decode_jpeg(data: bytes) -> dict:
    """Decode a grayscale baseline JPEG to pixels.

    Returns {width, height, pixels (H×W uint8 ndarray)}. Raises ValueError
    (with the unsupported feature named) on progressive (SOF2), arithmetic
    coding, multi-component scans, or restart intervals."""
    q = None
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    scan_start = None
    for marker, payload, nxt in _parse_segments(data):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[j + 1 + k]
                if tq == 0:
                    q = tbl
                j += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: only baseline SOF0 supported (got SOF{marker - 0xC0})"
            )
        elif marker == 0xC0:
            _prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if ncomp != 1:
                raise ValueError("JPEG: only single-component (grayscale) scans")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 0xF
                bits = list(payload[j + 1 : j + 17])
                n = sum(bits)
                vals = list(payload[j + 17 : j + 17 + n])
                codes = _canonical_codes(bits, vals)
                # invert: (length, code) -> value, for the bit-serial reader
                huff[(tc, th)] = {
                    (length, code): v for v, (code, length) in codes.items()
                }
                j += 17 + n
        elif marker == 0xDD:
            raise ValueError("JPEG: restart intervals unsupported")
        elif marker == 0xDA:
            if payload[0] != 1:
                raise ValueError("JPEG: only single-component scans")
            scan_start = nxt
    if width is None or scan_start is None or q is None:
        raise ValueError("JPEG: missing SOF0/SOS/DQT")
    dc_tbl = huff.get((0, 0))
    ac_tbl = huff.get((1, 0))
    if not dc_tbl or not ac_tbl:
        raise ValueError("JPEG: missing Huffman tables")

    end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[scan_start : end if end != -1 else len(data)])

    def read_code(tbl: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in tbl:
                return tbl[(length, code)]
        raise ValueError("JPEG: invalid Huffman code")

    def receive(size: int) -> int:
        raw = 0
        for _ in range(size):
            raw = (raw << 1) | reader.read_bit()
        return raw

    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    qf = q.astype(np.float64)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = [0] * 64
            size = read_code(dc_tbl)
            prev_dc += _extend(receive(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_code(ac_tbl)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("JPEG: AC index overflow")
                zz[k] = _extend(receive(size), size)
                k += 1
            coef = np.zeros((8, 8))
            for i, (r, c) in enumerate(ZIGZAG):
                coef[r, c] = zz[i]
            block = _DCT.T @ (coef * qf) @ _DCT + 128.0
            out[by : by + 8, bx : bx + 8] = block
    pixels = np.clip(np.round(out[:height, :width]), 0, 255).astype(np.uint8)
    return {"width": width, "height": height, "pixels": pixels}


def jpeg_luminance_stats(data: bytes) -> dict:
    """Mean luminance of a decoded baseline JPEG (content-derived, same
    contract as multimodal.png_luminance_stats)."""
    d = decode_jpeg(data)
    return {
        "width": d["width"],
        "height": d["height"],
        "mean_luminance": float(d["pixels"].mean()),
    }
