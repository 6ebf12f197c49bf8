"""Baseline JPEG codec (operators/jpeg.py): spec-table generation,
encoder↔decoder round trips, error taxonomy, and the Spark content path."""

import numpy as np
import pytest

from kolibrie_spark.operators.jpeg import (
    QTABLE_FLAT,
    ZIGZAG,
    build_jpeg_baseline,
    decode_jpeg,
    jpeg_luminance_stats,
)


def test_zigzag_spec_values():
    # first and last entries of the T.81 Figure A.6 walk
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0),
    ]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(ZIGZAG)) == 64


def test_flat_roundtrip_gradient_lossless():
    fn = lambda x, y: (x * 7 + y * 13) % 256
    for w, h in [(8, 8), (16, 8), (13, 11), (1, 1), (32, 24)]:
        d = decode_jpeg(build_jpeg_baseline(w, h, fn, qtable=QTABLE_FLAT))
        ref = np.array([[fn(x, y) for x in range(w)] for y in range(h)])
        assert np.abs(d["pixels"].astype(int) - ref).max() <= 1, (w, h)


def test_flat_roundtrip_block_constant_exact():
    # block-constant content has only DC coefficients; with quantizer 1 the
    # round trip is bit-exact — this is the property the gate oracle uses
    w, h, d0 = 37, 21, 5
    ys = np.arange(h)[:, None] // 8
    xs = np.arange(w)[None, :] // 8
    img = (d0 + xs + ys) % 256
    blob = build_jpeg_baseline(w, h, qtable=QTABLE_FLAT, image=img)
    d = decode_jpeg(blob)
    assert (d["pixels"] == img).all()
    st = jpeg_luminance_stats(blob)
    assert st["mean_luminance"] == img.mean()
    assert (st["width"], st["height"]) == (w, h)


def test_annexk_roundtrip_bounded_error():
    fn = lambda x, y: 128 + int(60 * np.sin(x / 3) + 50 * np.cos(y / 2))
    blob = build_jpeg_baseline(24, 16, fn)  # default Annex K.1 table
    d = decode_jpeg(blob)
    ref = np.array([[fn(x, y) for x in range(24)] for y in range(16)])
    err = np.abs(d["pixels"].astype(int) - ref)
    assert err.mean() < 4 and err.max() < 30  # quantization-scale error


def test_ac_runs_and_zrl():
    # a single bright pixel per block forces long zero runs (ZRL path)
    fn = lambda x, y: 255 if (x % 8 == 7 and y % 8 == 7) else 0
    d = decode_jpeg(build_jpeg_baseline(16, 16, fn, qtable=QTABLE_FLAT))
    ref = np.array([[fn(x, y) for x in range(16)] for y in range(16)])
    assert np.abs(d["pixels"].astype(int) - ref).max() <= 1


def test_error_taxonomy():
    blob = bytearray(build_jpeg_baseline(8, 8, qtable=QTABLE_FLAT))
    # progressive SOF2
    prog = bytes(blob).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(blob[:10]))  # cut mid-APP0 payload
    # cut at a segment boundary: structurally parseable but scan-less
    with pytest.raises(ValueError, match="missing"):
        decode_jpeg(bytes(blob[:20]))
    # header-only (multimodal.build_jpeg): no DQT/SOS
    from kolibrie_spark.operators.multimodal import build_jpeg

    with pytest.raises(ValueError, match="missing"):
        decode_jpeg(build_jpeg(32, 16))


def test_extract_media_features_jpeg_content(spark):
    from kolibrie_spark.operators.multimodal import extract_media_features

    ys = np.arange(16)[:, None] // 8
    xs = np.arange(24)[None, :] // 8
    img = (3 + xs + ys) % 256
    rows = [
        ("real", "image/jpeg",
         build_jpeg_baseline(24, 16, qtable=QTABLE_FLAT, image=img)),
    ]
    df = spark.createDataFrame(rows, "media_id string, mime string, data binary")
    out = {r.media_id: r for r in extract_media_features(df).collect()}
    assert out["real"].mean_luminance == img.mean()
    assert out["real"].decode_error is None
    assert (out["real"].width, out["real"].height) == (24, 16)
