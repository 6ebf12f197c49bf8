"""Perceptual image hashing (pHash) + image near-duplicate detection.

The image-side counterpart of the text dedup family: re-encoded,
resized, or slightly-edited copies of an image survive exact-byte dedup,
but their PERCEPTUAL hash — a 64-bit signature of the image's coarse
frequency structure — stays within a few bits. The classic pHash recipe
(public domain, as popularized by the pHash project / imagehash):

1. decode to grayscale (real PNG decode from operators/multimodal.py —
   zlib + all five unfilters; RGB collapses via integer-truncated
   Rec.601 luma),
2. resample to 32x32 by box-averaging over integer pixel-index grids
   (deterministic — no float resampling kernels),
3. 2-D DCT-II (numpy float64 matrix product, coefficients from
   ``cos((2i+1) u pi / 64)`` — identical IEEE math everywhere),
4. take the top-left 8x8 low-frequency block minus the DC term,
   threshold each coefficient against the block median -> 64 bits.

Near-dup pairs then reuse the SimHash machinery shape: Hamming-distance
<= k over 64-bit signatures via the 4-block Manku trick (a pair within
distance 3 shares at least one exact 16-bit block), so candidates come
from four equi-joins — never a cross product.

Plan shape: the hash is an Arrow-batched pandas UDF over the binary
column (pure-Python decode + numpy DCT per blob — the honest per-image
cost, embarrassingly parallel); the pair search is block equi-joins +
exact Hamming verify, identical scale story to ``simhash_near_pairs``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

PHASH_SIZE = 32  # resample grid
PHASH_BLOCK = 8  # low-frequency block


def phash64(data: bytes) -> int:
    """64-bit perceptual hash of a PNG blob (deterministic)."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import decode_png

    d = decode_png(data)
    w, h, ch, px = d["width"], d["height"], d["channels"], d["pixels"]
    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w * ch)
    if ch <= 2:
        gray = arr[:, 0::ch].astype(np.float64) if ch == 2 else arr.astype(np.float64)
    else:
        pix = arr.reshape(h, w, ch).astype(np.int64)
        # integer-truncated Rec.601 luma: deterministic, no float rounding
        gray = (
            (299 * pix[:, :, 0] + 587 * pix[:, :, 1] + 114 * pix[:, :, 2])
            // 1000
        ).astype(np.float64)
    # box-average resample over integer index grids, vectorized with two
    # add.reduceat passes.  reduceat's repeated-index rule (indices[i] ==
    # indices[i+1] yields the single element a[indices[i]]) matches the
    # loop's max(end, start+1) one-row/col floor exactly, and the gray
    # values are integers, so block sums are exact in float64 under ANY
    # summation order — the result is bit-identical to the per-cell
    # .mean() loop this replaces (~1024 numpy calls -> 2).
    n = PHASH_SIZE
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    ye = np.maximum((np.arange(1, n + 1) * h) // n, ys + 1)
    xe = np.maximum((np.arange(1, n + 1) * w) // n, xs + 1)
    sums = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    small = sums / np.outer(ye - ys, xe - xs)
    # 2-D DCT-II via the transform matrix
    i = np.arange(n)
    u = i.reshape(-1, 1)
    c = np.cos((2 * i + 1) * u * np.pi / (2 * n))
    dct = c @ small @ c.T
    block = dct[:PHASH_BLOCK, :PHASH_BLOCK].flatten()[1:]  # drop DC
    med = float(np.median(block))
    bits = 0
    for k, v in enumerate(block):
        if v > med:
            bits |= 1 << k
    return bits


def with_phash(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Adds ``phash`` (long; NULL on undecodable blobs) via an
    Arrow-batched pandas UDF."""

    @F.pandas_udf(LongType())
    def _ph(blobs: pd.Series) -> pd.Series:
        def one(b):
            try:
                v = phash64(bytes(b) if b is not None else b"")
                return v - (1 << 64) if v >= 1 << 63 else v  # signed long
            except Exception:  # noqa: BLE001 — corrupt blob -> NULL
                return None

        return blobs.map(one)

    return df.withColumn("phash", _ph(F.col(data_col)))


def hamming_near_pairs(
    sigs: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 3,
) -> DataFrame:
    """Generic 64-bit-signature near-pair search: (id_a < id_b,
    hamming <= max_hamming). Candidates via the Manku block trick with
    the block count DERIVED from max_hamming: the 64 bits split into
    (max_hamming + 1) contiguous blocks, so a pair within the distance
    budget must share at least one exact block (pigeonhole) — complete
    recall for ANY max_hamming, equi-joins only, never a cross product —
    then exact popcount verify.  max_hamming=3 keeps the classic 4x16-bit
    layout.  The shared core under ``phash_near_pairs`` and
    ``media_near_dup_pairs``; same scale story as ``simhash_near_pairs``.
    Note the usual LSH trade-off: a larger max_hamming means fewer/wider-
    matching blocks and therefore more candidates to verify."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63], got {max_hamming}"
        )
    nblk = max_hamming + 1
    bounds = [(i * 64) // nblk for i in range(nblk + 1)]

    def _block_val(lo: int, hi: int):
        width = hi - lo
        shifted = F.shiftrightunsigned(F.col("sig"), lo)
        if width >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    base = sigs.select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("sig")
    ).filter(F.col("sig").isNotNull())
    blocks = base.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        _block_val(bounds[b], bounds[b + 1]).alias("val"),
                    )
                    for b in range(nblk)
                ]
            )
        ).alias("b"),
    ).select("id", "sig", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("sig").alias("s_a"), "blk", "val"
    )
    bb = blocks.select(
        F.col("id").alias("id_b"), F.col("sig").alias("s_b"), "blk", "val"
    )
    return (
        a.join(bb, on=["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def phash_near_pairs(
    df: DataFrame,
    id_col: str,
    data_col: str = "data",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs: (id_a < id_b, hamming <= max_hamming) over
    pHash signatures — ``with_phash`` + the shared Manku block join."""
    hashed = with_phash(df, data_col).filter(F.col("phash").isNotNull())
    return hamming_near_pairs(
        hashed.select(F.col(id_col).alias("id"), "phash"),
        id_col="id",
        sig_col="phash",
        max_hamming=max_hamming,
    )


def audio_near_pairs(
    df: DataFrame,
    id_col: str,
    data_col: str = "data",
    max_hamming: int = 3,
) -> DataFrame:
    """Audio near-dup pairs over Haitsma-Kalker fingerprints —
    ``with_audio_fp`` + the shared Manku block join."""
    hashed = with_audio_fp(df, data_col).filter(F.col("audio_fp").isNotNull())
    return hamming_near_pairs(
        hashed.select(F.col(id_col).alias("id"), "audio_fp"),
        id_col="id",
        sig_col="audio_fp",
        max_hamming=max_hamming,
    )


# ------------------------------------------------------ audio fingerprinting
AUDIO_FRAMES = 17  # -> 16 frame-deltas
AUDIO_BANDS = 5  # -> 4 band-deltas; 16 x 4 = 64 bits


def audio_fp64(data: bytes) -> int:
    """64-bit Haitsma-Kalker-style audio fingerprint of a WAV blob:
    real PCM decode (operators/multimodal.py), mono mixdown, 17 frames x
    5 geometric frequency bands of log energy, bit = sign of the
    time-and-frequency double delta
    ``(E[f,b] - E[f,b+1]) - (E[f-1,b] - E[f-1,b+1])``.

    The double delta cancels any uniform gain (log energy shifts
    equally), so the fingerprint is volume-invariant by construction —
    the audio analogue of pHash's brightness invariance."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import decode_wav_samples

    d = decode_wav_samples(data)
    s = np.asarray(d["samples"], dtype=np.float64)
    ch = d["channels"]
    if ch > 1:
        s = s[: len(s) - len(s) % ch].reshape(-1, ch).mean(axis=1)
    n = len(s)
    if n < AUDIO_FRAMES * 2:
        raise ValueError("audio too short to fingerprint")
    # frame boundaries over integer index grid (deterministic)
    edges = [(f * n) // AUDIO_FRAMES for f in range(AUDIO_FRAMES + 1)]
    energies = np.empty((AUDIO_FRAMES, AUDIO_BANDS), dtype=np.float64)
    for f in range(AUDIO_FRAMES):
        frame = s[edges[f] : max(edges[f + 1], edges[f] + 2)]
        spec = np.abs(np.fft.rfft(frame)) ** 2
        m = len(spec)
        # geometric band edges over the positive spectrum (skip DC)
        be = [1] + [
            max(1, int(round(m ** ((b + 1) / AUDIO_BANDS))))
            for b in range(AUDIO_BANDS)
        ]
        for b in range(AUDIO_BANDS):
            lo, hi = be[b], max(be[b + 1], be[b] + 1)
            energies[f, b] = np.log(spec[lo:hi].sum() + 1e-12)
    bits = 0
    k = 0
    for f in range(1, AUDIO_FRAMES):
        for b in range(AUDIO_BANDS - 1):
            dd = (energies[f, b] - energies[f, b + 1]) - (
                energies[f - 1, b] - energies[f - 1, b + 1]
            )
            if dd > 0:
                bits |= 1 << k
            k += 1
    return bits


def with_audio_fp(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Adds ``audio_fp`` (long; NULL on undecodable blobs)."""

    @F.pandas_udf(LongType())
    def _fp(blobs: pd.Series) -> pd.Series:
        def one(b):
            try:
                v = audio_fp64(bytes(b) if b is not None else b"")
                return v - (1 << 64) if v >= 1 << 63 else v
            except Exception:  # noqa: BLE001
                return None

        return blobs.map(one)

    return df.withColumn("audio_fp", _fp(F.col(data_col)))


def media_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    data_col: str = "data",
    max_hamming: int = 3,
) -> DataFrame:
    """Modality-routed media near-dup: images hash with pHash, audio with
    the spectral fingerprint, and pairs are found WITHIN each modality
    (an image can never pair with an audio clip). One pass computes both
    hash columns (each NULL for the other modality — the per-blob try/
    except does the routing); the Manku block join then runs per
    modality. Returns ``(id_a, id_b, modality, hamming)``."""
    hashed = with_audio_fp(with_phash(df, data_col), data_col)

    def pairs_for(col: str, modality: str) -> DataFrame:
        return hamming_near_pairs(
            hashed.filter(F.col(col).isNotNull()).select(
                F.col(id_col).alias("id"), F.col(col).alias("sig")
            ),
            max_hamming=max_hamming,
        ).select("id_a", "id_b", F.lit(modality).alias("modality"), "hamming")

    return pairs_for("phash", "image").unionAll(pairs_for("audio_fp", "audio"))
