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


_DCT_Q = 1 << 17  # fixed-point scale for the quantized DCT basis
# (2^17 keeps the integer DCT within ~1e-5 of the real one — coarser
# scales produced accidental cross-group near-collisions; overflow
# bound: 32^2 * 2^34 * 255 * 2^10 ~= 4.6e18 < 2^63)
_DCT_CACHE: dict = {}


def _dct_basis_int(n: int):
    """Quantized DCT-II basis (int64, scale _DCT_Q) with every AC row
    adjusted to sum EXACTLY to zero (the rounding excess, at most a few
    quanta, is subtracted from the row's largest-magnitude entry).  Two
    consequences: the int64 matmuls below never touch BLAS (numpy integer
    matmul is a fixed-order C loop), and a uniform brightness shift moves
    ONLY the DC coefficient — exactly, not just up to float noise."""
    import numpy as np

    if n in _DCT_CACHE:
        return _DCT_CACHE[n]
    i = np.arange(n)
    u = i.reshape(-1, 1)
    c = np.round(np.cos((2 * i + 1) * u * np.pi / (2 * n)) * _DCT_Q).astype(np.int64)
    for row in range(1, n):
        excess = int(c[row].sum())
        if excess:
            c[row, int(np.argmax(np.abs(c[row])))] -= excess
    _DCT_CACHE[n] = c
    return c


def phash64(data: bytes) -> int:
    """64-bit perceptual hash of a PNG blob.

    EXACT-INTEGER pipeline — deterministic across processes, executors,
    BLAS builds, and libm versions.  The float-DCT version left the
    hash's last bits at the mercy of GEMM kernel/summation-order choices;
    a 64-bit signature joined across executors must not depend on ANY
    float reassociation, so every step here is integer arithmetic (numpy
    int64 matmul is a fixed-order C loop that never touches BLAS).

    gray (int) → box sums via add.reduceat (int64 exact) → quantized
    mean small_q = (sums << 10) // count → integer DCT
    c_q @ small_q @ c_q.T (int64 matmuls, no BLAS; AC basis rows sum to
    exactly zero so uniform brightness shifts move only the dropped DC
    coefficient) → median of 63 int coefficients → sign bits."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import decode_png

    d = decode_png(data)
    w, h, ch, px = d["width"], d["height"], d["channels"], d["pixels"]
    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w * ch)
    if ch <= 2:
        gray = (arr[:, 0::ch] if ch == 2 else arr).astype(np.int64)
    else:
        pix = arr.reshape(h, w, ch).astype(np.int64)
        # integer-truncated Rec.601 luma: deterministic, no float rounding
        gray = (
            299 * pix[:, :, 0] + 587 * pix[:, :, 1] + 114 * pix[:, :, 2]
        ) // 1000
    # box-average resample over integer index grids: reduceat's
    # repeated-index rule (indices[i] == indices[i+1] yields the single
    # element) matches the max(end, start+1) one-row/col floor exactly
    n = PHASH_SIZE
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    ye = np.maximum((np.arange(1, n + 1) * h) // n, ys + 1)
    xe = np.maximum((np.arange(1, n + 1) * w) // n, xs + 1)
    sums = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    cnt = np.outer(ye - ys, xe - xs)
    small_q = (sums << 10) // cnt  # quantized block mean, exact int64
    c = _dct_basis_int(n)
    # bound: |c|<=2^14, |small_q|<=255*2^10 -> |dct_q| <= 32^2*2^28*255*2^10
    # ~= 7.5e16 < 2^63: no overflow, no intermediate rescale needed
    dct_q = c @ small_q @ c.T
    block = dct_q[:PHASH_BLOCK, :PHASH_BLOCK].flatten()[1:]  # drop DC
    med = int(np.median(block))  # 63 values: the middle element, exact
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

        # Series construction MUST get the dtype up front: pandas turns a
        # list of (int | None) into FLOAT64 (None -> NaN), silently
        # rounding hashes above 2^53 — which bits get rounded depends on
        # whether the batch happens to contain a NULL, i.e.
        # batch-composition-dependent corruption. dtype="Int64" (nullable
        # extension) keeps the integers exact end-to-end through Arrow.
        return pd.Series([one(b) for b in blobs], dtype="Int64")

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
    pHash signatures — ``with_phash`` + the shared Manku block join.
    The (id, phash) table is localCheckpoint'ed so the self-join's two
    sides don't each re-run the blob decode."""
    hashed = (
        with_phash(df, data_col)
        .filter(F.col("phash").isNotNull())
        .select(id_col, "phash")
        .localCheckpoint(eager=False)
    )
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
    ``with_audio_fp`` + the shared Manku block join; (id, fp)
    localCheckpoint'ed as in :func:`phash_near_pairs`."""
    hashed = (
        with_audio_fp(df, data_col)
        .filter(F.col("audio_fp").isNotNull())
        .select(id_col, "audio_fp")
        .localCheckpoint(eager=False)
    )
    return hamming_near_pairs(
        hashed.select(F.col(id_col).alias("id"), "audio_fp"),
        id_col="id",
        sig_col="audio_fp",
        max_hamming=max_hamming,
    )


# ------------------------------------------------------ audio fingerprinting
AUDIO_FRAMES = 17  # -> 16 frame-deltas
AUDIO_BANDS = 5  # -> 4 band-deltas; 16 x 4 = 64 bits


_DFT_CACHE: dict = {}


def _dft_basis_int(length: int):
    """Quantized real-DFT basis (cos/sin rows for bins 0..L//2, int64,
    scale _DCT_Q).  Integer mat-vec = fixed-order C loop, no BLAS/FFT —
    the whole spectrum computation is exact and process-independent.
    O(L^2) per frame instead of FFT's O(L log L): exactness deliberately
    wins for fingerprinting (frames are short); precompute/cache the
    basis per distinct frame length."""
    import numpy as np

    if length in _DFT_CACHE:
        return _DFT_CACHE[length]
    k = np.arange(length // 2 + 1).reshape(-1, 1)
    t = np.arange(length)
    ang = 2.0 * np.pi * k * t / length
    basis = (
        np.round(np.cos(ang) * _DCT_Q).astype(np.int64),
        np.round(np.sin(ang) * _DCT_Q).astype(np.int64),
    )
    _DFT_CACHE[length] = basis
    return basis


def audio_fp64(data: bytes) -> int:
    """64-bit Haitsma-Kalker-style audio fingerprint of a WAV blob:
    real PCM decode (operators/multimodal.py), integer mono mixdown
    (channel sum — a uniform scale, invisible to the ratio comparisons
    below), 17 frames x 5 geometric frequency bands of energy, bit =
    sign of the time-and-frequency double delta of LOG energies
    ``(E[f,b] - E[f,b+1]) - (E[f-1,b] - E[f-1,b+1])``.

    EXACT-INTEGER pipeline — deterministic across processes/executors
    (same rationale as :func:`phash64`): a quantized integer DFT
    (int64 mat-vec per frame) gives exact spectra; band energies are
    exact Python-int sums of squared bins; and the log double-delta sign
    is evaluated WITHOUT logs as the equivalent integer cross-product
    comparison ``A*D > B*C`` (log(A)-log(B)-log(C)+log(D) > 0 iff
    A*D > B*C for positive integers).  Uniform gain g scales every
    energy by g^2 and both products by g^4 — the fingerprint is
    gain-invariant EXACTLY, not just up to float noise."""
    import numpy as np

    from kolibrie_spark.operators.multimodal import decode_wav_samples

    d = decode_wav_samples(data)
    s = np.asarray(d["samples"], dtype=np.int64)
    ch = d["channels"]
    if ch > 1:
        s = s[: len(s) - len(s) % ch].reshape(-1, ch).sum(axis=1)
    n = len(s)
    if n < AUDIO_FRAMES * 2:
        raise ValueError("audio too short to fingerprint")
    # frame boundaries over integer index grid (deterministic)
    edges = [(f * n) // AUDIO_FRAMES for f in range(AUDIO_FRAMES + 1)]
    energies: list[list[int]] = []
    for f in range(AUDIO_FRAMES):
        frame = s[edges[f] : max(edges[f + 1], edges[f] + 2)]
        cos_b, sin_b = _dft_basis_int(len(frame))
        xr = (cos_b @ frame).tolist()
        xi = (sin_b @ frame).tolist()
        m = len(xr)
        # geometric band edges over the positive spectrum (skip DC)
        be = [1] + [
            max(1, int(round(m ** ((b + 1) / AUDIO_BANDS))))
            for b in range(AUDIO_BANDS)
        ]
        row = []
        for b in range(AUDIO_BANDS):
            lo, hi = be[b], max(be[b + 1], be[b] + 1)
            row.append(
                sum(xr[j] * xr[j] + xi[j] * xi[j] for j in range(lo, min(hi, m)))
            )
        energies.append(row)
    bits = 0
    k = 0
    for f in range(1, AUDIO_FRAMES):
        for b in range(AUDIO_BANDS - 1):
            # sign of the log double delta, exactly: A*D > B*C
            a, bb = energies[f][b], energies[f][b + 1]
            c, dd = energies[f - 1][b], energies[f - 1][b + 1]
            if a * dd > bb * c:
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

        # Series construction MUST get the dtype up front: pandas turns a
        # list of (int | None) into FLOAT64 (None -> NaN), silently
        # rounding hashes above 2^53 — which bits get rounded depends on
        # whether the batch happens to contain a NULL, i.e.
        # batch-composition-dependent corruption. dtype="Int64" (nullable
        # extension) keeps the integers exact end-to-end through Arrow.
        return pd.Series([one(b) for b in blobs], dtype="Int64")

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
    modality. Returns ``(id_a, id_b, modality, hamming)``.

    The signature table is localCheckpoint'ed: it fans out into four
    consumers (two modalities x two self-join sides), and without the
    materialization Catalyst re-inlines the blob-decoding fingerprint
    UDFs into every branch — 4x the decode work for a table of
    (id, two longs) per row."""
    hashed = (
        with_audio_fp(with_phash(df, data_col), data_col)
        .select(id_col, "phash", "audio_fp")
        .localCheckpoint(eager=False)
    )

    def pairs_for(col: str, modality: str) -> DataFrame:
        return hamming_near_pairs(
            hashed.filter(F.col(col).isNotNull()).select(
                F.col(id_col).alias("id"), F.col(col).alias("sig")
            ),
            max_hamming=max_hamming,
        ).select("id_a", "id_b", F.lit(modality).alias("modality"), "hamming")

    return pairs_for("phash", "image").unionAll(pairs_for("audio_fp", "audio"))
