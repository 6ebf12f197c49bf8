"""Perceptual image hashing and image near-dup pairs."""

import math

import pytest


def _scene(x, y):
    v = 40 + 0.8 * x + 0.5 * y
    v += 120 * math.exp(-((x - 20) ** 2 + (y - 15) ** 2) / 120.0)
    v += 90 * math.exp(-((x - 45) ** 2 + (y - 30) ** 2) / 200.0)
    return int(max(0, min(255, v)))


def _other(x, y):
    v = 200 - 1.5 * x + 0.2 * y + 100 * math.exp(
        -((x - 50) ** 2 + (y - 8) ** 2) / 60.0
    )
    return int(max(0, min(255, v)))


def test_phash_invariances():
    from kolibrie_spark.operators.multimodal import build_png
    from kolibrie_spark.operators.phash import phash64

    base = phash64(build_png(64, 48, _scene))
    noisy = phash64(
        build_png(
            64,
            48,
            lambda x, y: max(0, min(255, _scene(x, y) + ((x * 31 + y * 17) % 3 - 1))),
        )
    )
    bright = phash64(build_png(64, 48, lambda x, y: min(255, _scene(x, y) + 10)))
    resized = phash64(build_png(128, 96, lambda x, y: _scene(x // 2, y // 2)))
    diff = phash64(build_png(64, 48, _other))
    ham = lambda a, b: bin(a ^ b).count("1")
    # perceptual: pixel noise and brightness shifts don't move the hash
    assert ham(base, noisy) == 0
    assert ham(base, bright) == 0
    # 2x upscale of the same scene stays within the near-dup band
    assert ham(base, resized) <= 3
    # a different scene is far away
    assert ham(base, diff) > 10


def test_phash_near_pairs_distributed(spark):
    from kolibrie_spark.operators.multimodal import build_png
    from kolibrie_spark.operators.phash import phash_near_pairs

    imgs = [
        (1, bytearray(build_png(64, 48, _scene))),
        (2, bytearray(build_png(64, 48, lambda x, y: min(255, _scene(x, y) + 10)))),
        (3, bytearray(build_png(128, 96, lambda x, y: _scene(x // 2, y // 2)))),
        (4, bytearray(build_png(64, 48, _other))),
        (5, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(imgs, "img_id long, data binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, "img_id", max_hamming=3).collect()
    }
    # the re-encoded / brightness-shifted / resized family clusters
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    # the different scene matches nobody; corrupt blob is ignored
    assert not any(4 in p or 5 in p for p in pairs)


def test_phash_near_pairs_no_cartesian(spark):
    from kolibrie_spark.operators.multimodal import build_png
    from kolibrie_spark.operators.phash import phash_near_pairs

    df = spark.createDataFrame(
        [(1, bytearray(build_png(16, 16, _scene)))], "img_id long, data binary"
    )
    plan = (
        phash_near_pairs(df, "img_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------- audio fingerprint


def _tone_mix(i):
    """Two sine tones + slow envelope — 'natural' audio content."""
    import math

    t = i / 8000.0
    env = 0.5 + 0.5 * math.sin(2 * math.pi * 0.7 * t)
    v = env * (
        6000 * math.sin(2 * math.pi * 440 * t)
        + 3000 * math.sin(2 * math.pi * 1320 * t + 1.0)
    )
    return int(max(-32768, min(32767, v)))


def _other_mix(i):
    import math

    t = i / 8000.0
    v = 8000 * math.sin(2 * math.pi * 220 * t) * math.sin(2 * math.pi * 3.0 * t)
    return int(max(-32768, min(32767, v)))


def test_audio_fp_invariances():
    from kolibrie_spark.operators.multimodal import build_wav
    from kolibrie_spark.operators.phash import audio_fp64

    n = 8000
    base = audio_fp64(build_wav(n, sample_fn=_tone_mix))
    quiet = audio_fp64(
        build_wav(n, sample_fn=lambda i: int(_tone_mix(i) * 0.5))
    )
    noisy = audio_fp64(
        build_wav(n, sample_fn=lambda i: _tone_mix(i) + ((i * 37) % 21 - 10))
    )
    other = audio_fp64(build_wav(n, sample_fn=_other_mix))
    ham = lambda a, b: bin(a ^ b).count("1")
    # volume invariance by construction (double delta of log energies)
    assert ham(base, quiet) <= 2
    # small additive noise moves few bits
    assert ham(base, noisy) <= 6
    # different audio is far
    assert ham(base, other) > 12


def test_with_audio_fp_distributed(spark):
    from kolibrie_spark.operators.multimodal import build_wav
    from kolibrie_spark.operators.phash import with_audio_fp

    rows = [
        ("a1", bytearray(build_wav(4000, sample_fn=_tone_mix))),
        ("a2", bytearray(build_wav(4000, sample_fn=lambda i: int(_tone_mix(i) * 0.7)))),
        ("bad", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "media_id string, data binary")
    out = {r["media_id"]: r["audio_fp"] for r in with_audio_fp(df).collect()}
    assert out["bad"] is None
    assert out["a1"] is not None and out["a2"] is not None
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out["a1"], out["a2"]) <= 2  # volume-invariant


def test_media_near_dup_pairs_routes_by_modality(spark):
    from kolibrie_spark.operators.multimodal import build_png, build_wav
    from kolibrie_spark.operators.phash import media_near_dup_pairs

    rows = [
        (1, bytearray(build_png(64, 48, _scene))),
        (2, bytearray(build_png(64, 48, lambda x, y: min(255, _scene(x, y) + 10)))),
        (3, bytearray(build_wav(4000, sample_fn=_tone_mix))),
        (4, bytearray(build_wav(4000, sample_fn=lambda i: int(_tone_mix(i) * 0.7)))),
        (5, bytearray(build_png(64, 48, _other))),
        (6, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        (r["id_a"], r["id_b"]): r["modality"]
        for r in media_near_dup_pairs(df, "media_id").collect()
    }
    assert got.get((1, 2)) == "image"
    assert got.get((3, 4)) == "audio"
    # no cross-modality or garbage pairs, different image unmatched
    assert all(p in {(1, 2), (3, 4)} for p in got)


def test_png_text_chunk_is_content_identical():
    """An ancillary tEXt chunk changes bytes, not pixels -> identical
    decode and identical pHash (the third re-encoding variant used by the
    media_phash_pairs gate)."""
    from kolibrie_spark.operators.multimodal import build_png, decode_png
    from kolibrie_spark.operators.phash import phash64

    plain = build_png(40, 30, _scene)
    texty = build_png(40, 30, _scene, extra_text="hello metadata")
    assert plain != texty
    assert decode_png(plain)["pixels"] == decode_png(texty)["pixels"]
    assert phash64(plain) == phash64(texty)


def test_hamming_near_pairs_generic(spark):
    """The shared Manku block join finds exactly the <=k pairs for
    arbitrary 64-bit signatures, including negative (sign-bit-set) longs."""
    from kolibrie_spark.operators.phash import hamming_near_pairs

    sigs = [
        (1, 0x0123456789ABCDEF),
        (2, 0x0123456789ABCDEE),          # hamming 1 from id 1
        (3, 0x0123456789ABCDEF ^ 0b111),  # hamming 3 from id 1
        (4, (0xF123456789ABCDEF) - (1 << 64)),  # negative long, far away
        (5, (0xF123456789ABCDEF) - (1 << 64)),  # exact dup of id 4
    ]
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(df, max_hamming=3).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 3), (2, 3, 2), (4, 5, 0)}


def test_audio_near_pairs_gain_invariance(spark):
    """audio_near_pairs pairs power-of-two gain variants at hamming 0."""
    import pandas as pd

    from kolibrie_spark.operators.multimodal import build_wav
    from kolibrie_spark.operators.phash import audio_near_pairs

    rows = []
    for g in range(4):
        for v, gain in enumerate((1, 2, 4)):
            data = build_wav(
                200,
                sample_fn=lambda i, g=g, gain=gain: (
                    (((5 + 2 * g) * i * i + (29 + 3 * g) * i) % 4001) - 2000
                )
                * gain,
            )
            rows.append((3 * g + v, bytearray(data)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "data"])
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in audio_near_pairs(df, "id", max_hamming=1).collect()
    }
    want = {
        (3 * g + a, 3 * g + b)
        for g in range(4)
        for a, b in ((0, 1), (0, 2), (1, 2))
    }
    assert got == want


def test_hamming_near_pairs_wide_budget_complete_recall(spark):
    """max_hamming > 3 must still find every pair — the block count is
    derived as (max_hamming + 1), so a 4-bit-spread pair that defeats the
    classic 4x16 layout (one flipped bit per 16-bit block) is caught."""
    from kolibrie_spark.operators.phash import hamming_near_pairs

    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)  # one bit per 16-bit block
    df = spark.createDataFrame([(1, a), (2, b)], "id long, sig long")
    got = hamming_near_pairs(df, "id", "sig", max_hamming=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 4)]
    # and the same pair is (correctly) absent under the tighter budget
    assert hamming_near_pairs(df, "id", "sig", max_hamming=3).count() == 0
    # hamming 0 degenerates to exact signature equality
    df0 = spark.createDataFrame([(1, 7), (2, 7), (3, 8)], "id long, sig long")
    got0 = hamming_near_pairs(df0, "id", "sig", max_hamming=0).collect()
    assert [(r.id_a, r.id_b) for r in got0] == [(1, 2)]
    import pytest

    with pytest.raises(ValueError):
        hamming_near_pairs(df, "id", "sig", max_hamming=64)


def test_hash_exact_through_arrow_with_nulls_in_batch(spark):
    """Regression (r5): pandas turns a list of (int | None) into float64,
    rounding hashes above 2^53 whenever a batch contained an undecodable
    blob — the UDFs must deliver the driver-computed value bit-exactly
    even when NULLs share the batch."""
    from kolibrie_spark.operators.multimodal import build_png, build_wav
    from kolibrie_spark.operators.phash import (
        audio_fp64,
        phash64,
        with_audio_fp,
        with_phash,
    )

    png = build_png(64, 48, lambda x, y: (x * 7 + y * 13 + (x * y) % 29) % 256)
    wav = build_wav(2000, sample_fn=lambda i: ((i * i * 11 + 3 * i) % 4001) - 2000)
    rows = [
        (1, bytearray(png)),
        (2, bytearray(b"garbage")),  # NULL in the same batch
        (3, bytearray(wav)),
    ]
    df = spark.createDataFrame(rows, "id long, data binary").coalesce(1)
    got = {r.id: (r.phash, r.audio_fp) for r in
           with_audio_fp(with_phash(df, "data"), "data").collect()}

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    assert got[1][0] == signed(phash64(png))
    assert got[3][1] == signed(audio_fp64(wav))
    assert got[2] == (None, None)


def test_phash_brightness_shift_exact_invariance():
    """r5 integer DCT with zero-sum AC rows: a uniform (non-clipping)
    brightness shift moves ONLY the dropped DC coefficient, so the hash
    is EXACTLY invariant — not just within float noise."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import build_png
    from kolibrie_spark.operators.phash import phash64

    rng = np.random.RandomState(13)
    for trial in range(8):
        w, h = int(rng.randint(8, 120)), int(rng.randint(8, 120))
        a, b, c = int(rng.randint(1, 60)), int(rng.randint(1, 60)), int(rng.randint(0, 40))
        shift = int(rng.randint(1, 50))

        def px(x, y):
            return (x * a + y * b + c) % 200  # <= 199, shift <= 49: no clip

        base = phash64(build_png(w, h, px))
        shifted = phash64(build_png(w, h, lambda x, y: px(x, y) + shift))
        assert shifted == base, (trial, w, h, shift)


def test_audio_fp_gain_exact_invariance():
    """r5 exact-integer fingerprint: ANY integer gain scales every band
    energy by gain^2 and both cross-products by gain^4 — identical bits,
    exactly, for arbitrary (not just power-of-two) gains."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import build_wav
    from kolibrie_spark.operators.phash import audio_fp64

    rng = np.random.RandomState(29)
    for trial in range(6):
        n = int(rng.randint(400, 3000))
        k1, k2 = int(rng.randint(1, 9)), int(rng.randint(11, 37))
        gain = int(rng.randint(2, 7))  # gain*|sample| must stay in int16

        def s(i):
            return ((k1 * i * i + k2 * i) % 4001 - 2000) // 8  # |s| <= 250

        base = audio_fp64(build_wav(n, sample_fn=s))
        scaled = audio_fp64(build_wav(n, sample_fn=lambda i: s(i) * gain))
        assert scaled == base, (trial, n, gain)
