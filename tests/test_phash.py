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
