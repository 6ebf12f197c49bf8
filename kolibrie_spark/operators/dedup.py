"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (100 TB):
- exact dedup is one hash-shuffle groupBy (map-side combine applies);
- the Jaccard all-pairs path prunes candidates through a shared-shingle
  equi-join (never a cross join) — skew from ultra-common shingles should be
  handled upstream by dropping top-frequency shingles (stop-shingles);
- MinHash+LSH replaces the shared-shingle join with a banded-signature
  bucket join: candidates shrink from O(docs²·overlap) to near-linear,
  the standard web-dedup recipe;
- everything below stays in JVM column expressions (no Python in the
  per-row path) except SimHash, which is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf can eval stringified hints

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators import hashing


# --------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact key — hash groupBy,
    map-side combinable, one shuffle on the key. Fully duplicated input rows
    (same key AND same id) would all survive the keep-set join, so the result
    is deduplicated on key+id."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return keep.join(df, on=key_cols + [id_col], how="inner").dropDuplicates(
        key_cols + [id_col]
    )


# ----------------------------------------------------------------- shingling
def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    words = F.split(F.trim(text), r"\s+")
    count = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(count >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("__sh"),
    )


# ------------------------------------------------------------ n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    heavy_df: int = 64,
    salt: int = 16,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for every pair at
    ``jaccard >= threshold``. Returns (id_a, id_b, jaccard), id_a < id_b.

    r13 (VERDICT r12 task #3): candidates come from PREFIX FILTERING
    (:func:`_prefix_pairs`) instead of the full shared-shingle self-join —
    the same machinery :func:`prefix_jaccard_pairs` proved cuts the
    candidate set ~2.5x on the same corpus, with output bit-identical to
    the shared-shingle formulation (exact re-verification decides every
    pair). ``heavy_df``/``salt`` are retained for API compatibility and
    ignored: the rare-first prefix order keeps stop-shingles out of the
    join keys by construction, which is what the salting guarded."""
    del heavy_df, salt  # prefix filtering makes the salted skew guard moot
    return _prefix_pairs(df, id_col, text_col, n, threshold, score="jaccard")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    heavy_df: int = 64,
    salt: int = 16,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT (overlap
    coefficient): |A∩B| / min(|A|, |B|) over word n-gram shingle sets.
    Catches subset-style duplication — a short document quoted wholesale
    inside a long one scores ~1.0 here but can fall below any symmetric-
    Jaccard threshold (the union is dominated by the long side).
    RefinedWeb/Gopher-style pipelines run this NEXT TO Jaccard, not
    instead of it.

    r13 (VERDICT r12 task #3): candidates via the containment-prefix
    variant of :func:`_prefix_pairs` — the contained (smaller) side
    exposes only its ``|a| - ceil(t*|a|) + 1`` rarest shingles, the larger
    side all of them; C(a,b) >= t with |a| <= |b| forces an overlap of at
    least ``ceil(t*|a|)``, so the prefix lemma guarantees a collision and
    the exact verify keeps the output identical to the old shared-shingle
    join. ``heavy_df``/``salt`` retained for API compatibility, ignored."""
    del heavy_df, salt
    return _prefix_pairs(
        df, id_col, text_col, n, threshold, score="containment"
    )


def containment_pairs_duckdb_sql(
    table: str, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> str:
    """DuckDB oracle computing exactly containment_pairs."""
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH words AS (
  SELECT {id_col} AS id, string_split_regex(trim({text_col}), '\\s+') AS w
  FROM {table}
),
sh AS (
  SELECT DISTINCT id, {gram} AS s
  FROM words, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 1))) t(i)
  WHERE i <= len(w) - {n - 1} OR len(w) < {n}
),
sizes AS (SELECT id, COUNT(*) AS sn FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, c * 1.0 / least(sa.sn, sb.sn) AS containment
FROM shared
JOIN sizes sa ON id_a = sa.id
JOIN sizes sb ON id_b = sb.id
WHERE c * 1.0 / least(sa.sn, sb.sn) >= {threshold}
"""


def ngram_jaccard_pairs_duckdb_sql(
    table: str, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> str:
    """DuckDB oracle computing exactly ngram_jaccard_pairs."""
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH words AS (
  SELECT {id_col} AS id, string_split_regex(trim({text_col}), '\\s+') AS w
  FROM {table}
),
sh AS (
  SELECT DISTINCT id, {gram} AS s
  FROM words, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 1))) t(i)
  WHERE i <= len(w) - {n - 1} OR len(w) < {n}
),
sizes AS (SELECT id, COUNT(*) AS sn FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, c * 1.0 / (sa.sn + sb.sn - c) AS jaccard
FROM shared
JOIN sizes sa ON id_a = sa.id
JOIN sizes sb ON id_b = sb.id
WHERE c * 1.0 / (sa.sn + sb.sn - c) >= {threshold}
"""


# --------------------------------------------------------------- MinHash+LSH
def base_shingle_hashes(text: Column, n: int = 3, hash_fn: str = "xxhash64") -> Column:
    """One hash per distinct shingle → array<long>.

    Default xxhash64: JVM-side, whole-stage-codegen'd — the right choice
    because MinHash internals only affect candidate recall; the emitted
    pairs are exact-Jaccard-verified either way. hash_fn="poly" gives the
    DuckDB-reproducible fold when cross-engine signatures matter."""
    if hash_fn == "xxhash64":
        return F.transform(
            word_ngrams(text, n), lambda s: F.abs(F.xxhash64(s)) % hashing.FAMILY_P
        )
    return F.transform(word_ngrams(text, n), lambda s: hashing.poly_hash(s))


def signature_from_base(base: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from pre-computed base hashes via the derived
    universal family — cheap arithmetic only, no re-hashing.

    Built as ONE zip_with over literal (a_i, b_i) arrays rather than
    num_hashes sibling array_min expressions: the values are identical, but
    the expression tree (and therefore Catalyst analysis + codegen + py4j
    construction time) stays O(1) in num_hashes instead of O(num_hashes) —
    measured ~4x faster end-to-end at 64 hashes."""
    fam = hashing.hash_family(num_hashes)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in fam])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in fam])
    return F.zip_with(
        a_arr,
        b_arr,
        lambda a, b: F.array_min(
            F.transform(base, lambda h: (a * h + b) % F.lit(hashing.FAMILY_P))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded MinHash buckets, exact-Jaccard-verified.

    bands=32/rows=2 gives P(miss | J >= 0.5) = (1 - 0.25)^32 ≈ 1e-4 — and
    the whole pipeline is deterministic, so a found pair set is stable run
    to run. The exact-Jaccard verification keeps precision at 1.0, so with
    full recall the output equals ngram_jaccard_pairs.
    """
    rows = num_hashes // bands
    # the repartition between the base fold and the signature arithmetic is
    # load-bearing twice over: it spreads the compute-dense signature work
    # across the cluster even when a small input arrives as one parquet
    # partition, AND it is a projection-collapse barrier — without it
    # Catalyst inlines `__base` into the zip_with lambda body and the
    # per-shingle character fold re-executes once per signature slot (64x)
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)  # parallelize the shingle fold itself
    base = df.select(
        F.col(id_col).alias("__id"),
        base_shingle_hashes(F.col(text_col), n).alias("__base"),
    ).repartition(par)
    sig = base.select(
        "__id",
        signature_from_base(F.col("__base"), num_hashes).alias("__sig"),
    )
    # one expression computes every band key: xxhash64(band_no, slice) —
    # an 8-byte bucket key instead of the "j-v1-v2-..." string (r12,
    # guide §2.3 narrower types).  A 64-bit collision between different
    # band contents can only ADD a candidate pair, which the exact-
    # Jaccard verification below discards — recall is untouched because
    # equal contents always hash equal.
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(
            j, F.slice(F.col("__sig"), j * F.lit(rows) + F.lit(1), F.lit(rows))
        ),
    )
    # buckets carry ONLY (id, bucket) — never the document text: the bucket
    # self-join shuffles `bands` rows per doc, so keeping the payload out of
    # it is the difference between shuffling 32x ids and 32x the corpus
    buckets = sig.select("__id", F.explode(band_keys).alias("__bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__bucket") == F.col("b.__bucket"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # materialized once (lazily, inside the consuming action): the
        # candidate set feeds the id prefilter below AND both
        # verification joins — without this the whole LSH pipeline would
        # re-execute per reference (r12, guide §2.4)
        .localCheckpoint(eager=False)
    )
    # exact verification on the (few) candidates: re-derive string
    # shingles ONLY for documents that appear in some candidate pair — a
    # candidate-id semi-join prefilter, so the second and third full-
    # corpus shingle folds of the old shape become candidate-only work
    # (r12, guide §2.3/§2.4: don't compute what the join discards).  The
    # candidate id set is pair-bounded and broadcastable at scale.
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .dropDuplicates()
    )
    sh = df.join(cand_ids, on=id_col, how="left_semi").select(
        F.col(id_col).alias("__sid"), word_ngrams(F.col(text_col), n).alias("__sh")
    )
    cand = (
        cand.join(sh.select(F.col("__sid").alias("id_a"), F.col("__sh").alias("__sha")), "id_a")
        .join(sh.select(F.col("__sid").alias("id_b"), F.col("__sh").alias("__shb")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size(F.col("__sha")) + F.size(F.col("__shb")) - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------------- SimHash
def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Arrow-batched pandas UDF —
    per-bit majority voting doesn't vectorize into column expressions).
    Returns (id, simhash BIGINT)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    def _simhash_fn(texts):
        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        toks_per_doc = [(t or "").split() for t in texts]
        lengths = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        all_toks = [tok for toks in toks_per_doc for tok in toks]
        if not all_toks:
            return pd.Series(out)
        # hash only the batch's UNIQUE tokens (the Python char loop is the
        # expensive part; real corpora repeat tokens heavily)
        uniq, inv = np.unique(np.array(all_toks, dtype=object), return_inverse=True)
        mask = (1 << 64) - 1
        pm = np.empty((len(uniq), 64), dtype=np.int64)
        for i, tok in enumerate(uniq):
            # FNV-1a 64-bit, deterministic and portable
            h = 14695981039346656037
            for ch in tok.encode():
                h = ((h ^ ch) * 1099511628211) & mask
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8)
            )
            pm[i] = np.where(bits == 1, 1, -1)
        # per-doc signed bit-count: one bincount per bit over the token list
        doc_idx = np.repeat(np.arange(len(texts)), lengths)
        tok_pm = pm[inv]
        acc = np.stack(
            [
                np.bincount(doc_idx, weights=tok_pm[:, b], minlength=len(texts))
                for b in range(64)
            ],
            axis=1,
        )
        sign = (acc > 0).astype(np.uint8)
        packed = np.packbits(sign, axis=1).view(">i8").ravel()
        nonempty = lengths > 0
        out[nonempty] = packed[nonempty]
        return pd.Series(out)

    _simhash = F.pandas_udf(_simhash_fn, LongType())
    # modest fan-out: Python workers cost ~100ms each to warm, so spreading
    # a small input over every core loses more than it gains; 4 partitions
    # balances worker amortization against parallelism at test scales
    if df.rdd.getNumPartitions() < 4:
        df = df.repartition(4)
    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs where hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate pruning via the Manku block trick (Manku et al., WWW'07)
    with the block count DERIVED from max_hamming: the 64 bits split into
    (max_hamming + 1) contiguous blocks, so two hashes within the budget
    share at least one exact block (pigeonhole) — complete recall for any
    max_hamming, equi-joins only.  The default keeps the classic 4x16-bit
    layout.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    nblk = max_hamming + 1
    bounds = [(i * 64) // nblk for i in range(nblk + 1)]

    def _block_val(lo: int, hi: int):
        shifted = F.shiftrightunsigned(F.col("simhash"), lo)
        if hi - lo >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << (hi - lo)) - 1))

    sh = simhash64(df, id_col, text_col)
    blocks = sh.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        _block_val(bounds[i], bounds[i + 1]).cast("string"),
                    )
                    for i in range(nblk)
                ]
            )
        ).alias("__block"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__block") == F.col("b.__block"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.simhash").alias("__ha"),
            F.col("b.simhash").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- near-dup clustering
def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected pair graph → (id, component)
    with component = min node id reachable. Iterative min-label
    propagation: each round every node takes the min of its own and its
    neighbors' labels; rounds needed = graph diameter (near-dup clusters
    are shallow — a handful of rounds), each round one shuffle on the edge
    key. Scales: state is one (node, label) row per node, no driver-side
    graph.

    Raises RuntimeError if ``max_iter`` rounds pass without reaching the
    fixpoint — silently returning split components would hand the caller
    wrong cluster ids with no signal (a component's diameter exceeding 25
    means the pair graph is a long chain, not a near-dup cluster; raise
    ``max_iter`` explicitly if that topology is intended)."""
    # the pair pipeline feeding `pairs` can be expensive (MinHash, SimHash,
    # shingle joins); the orientation union references it from BOTH
    # branches and Catalyst does not dedupe common subtrees — a lazy
    # localCheckpoint materializes it once and both branches share it
    base = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=False)
    edges = (
        base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    null_own = F.lit(None).cast(dict(labels.dtypes)["component"])
    for _ in range(max_iter):
        # one round = one join + ONE aggregation: each node's new label is
        # min over (own label ∪ neighbors' labels), computed by unioning
        # the label table into the neighbor-contribution stream and
        # grouping once on the node id — identical to the previous
        # groupBy(src)-then-left-join formulation (least(own, min(nbrs)))
        # but two exchanges cheaper per round.  The own rows also carry the
        # OLD label (`__own`: max() keeps the single non-null per group),
        # so convergence is read off the same aggregate instead of a
        # second label-vs-label join.
        contrib = edges.join(
            labels.select(
                F.col("id").alias("dst"), F.col("component").alias("__nl")
            ),
            on="dst",
        ).select(
            F.col("src").alias("id"),
            F.col("__nl").alias("component"),
            null_own.alias("__own"),
        )
        own = labels.select(
            "id", "component", F.col("component").alias("__own")
        )
        # ONE action per round (r12, guide §1.2): mark the round's result
        # for LAZY checkpointing and read convergence off a count() over
        # the changed-rows view — the count computes (and thereby
        # persists) every partition of `merged`, so the checkpoint is
        # complete, and the previous dedicated eager-materialization job
        # disappears.  (take(1) would be wrong here: it computes only the
        # partitions it needs, leaving a marked checkpoint half-built.)
        merged = (
            own.unionByName(contrib)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.max("__own").alias("__old"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = merged.filter(F.col("component") != F.col("__old")).count()
        labels = merged.select("id", "component")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds; component labels would be split — raise max_iter"
        )
    return labels.select("id", "component")


def near_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for every row of ``df``: documents joined by a
    dup pair share a component (min id); untouched documents are singleton
    clusters of themselves. The canonical keep-set is ``component ==
    id`` rows — the standard dedup pipeline tail (pairs → clusters →
    one representative per cluster)."""
    comp = connected_components(pairs, id_a, id_b)
    return df.select(F.col(id_col)).join(
        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
    ).select(
        id_col, F.coalesce(F.col("component"), F.col(id_col)).alias("cluster")
    )


# --------------------------------------------------- embedding cosine near-dup
def _blas_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_rows: int,
    row_count: int | None = None,
) -> DataFrame:
    """All-pairs cosine >= threshold via blocked matrix products.

    Rows are bucketed into B blocks; every unordered block pair (i <= j)
    becomes one applyInPandas group holding both blocks' vectors, scored as
    one BLAS matmul. Total shuffle = B copies of the data (each row joins B
    groups); per-task memory = two blocks. Pick block_rows so a
    (block_rows x dim) matrix is comfortable — the standard all-pairs
    blocking scheme, ~1000x faster than per-pair fold expressions.

    ``row_count``: pass when known to skip the sizing count() job."""
    import pandas as pd

    n = row_count if row_count is not None else df.count()
    b = max(1, -(-n // block_rows))
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.pmod(F.col(id_col).cast("long"), F.lit(b)).alias("__blk"),
    )
    pair_keys = F.array(
        *[
            F.when(
                (F.col("__blk") == i) | (F.col("__blk") == j),
                F.lit(f"{i}-{j}"),
            )
            for i in range(b)
            for j in range(i, b)
        ]
    )
    exploded = base.withColumn(
        "__pk", F.explode(F.filter(pair_keys, lambda x: x.isNotNull()))
    )

    def score(key, pdf):
        import numpy as np

        i, j = (int(x) for x in key[0].split("-"))
        ai = pdf[pdf["__blk"] == i]
        bj = pdf[pdf["__blk"] == j]
        if ai.empty or bj.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        A = np.vstack(ai["__v"].to_numpy())
        B = np.vstack(bj["__v"].to_numpy())
        A = A / np.linalg.norm(A, axis=1, keepdims=True)
        B = B / np.linalg.norm(B, axis=1, keepdims=True)
        S = A @ B.T
        ia, jb = np.nonzero(S >= threshold)
        id_a = ai["__id"].to_numpy()[ia]
        id_b = bj["__id"].to_numpy()[jb]
        if i == j:
            # diagonal: both orientations are present, keep one
            keep = id_a < id_b
            return pd.DataFrame({"id_a": id_a[keep], "id_b": id_b[keep]})
        # off-diagonal: each unordered pair appears ONCE, in whichever
        # orientation the block assignment dictates — normalize instead of
        # filtering (an id_a < id_b filter here silently dropped every
        # cross-block pair whose lower-block row had the larger id; the
        # bug could never fire below n = block_rows, where b == 1)
        return pd.DataFrame(
            {"id_a": np.minimum(id_a, id_b), "id_b": np.maximum(id_a, id_b)}
        )

    return exploded.groupBy("__pk").applyInPandas(score, "id_a long, id_b long")


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    block_rows: int = 2048,
    row_count: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold — a small-n verifier, NOT the
    scale path.  Shuffle volume is quadratic (every row replicates into
    n/block_rows applyInPandas groups), so this is only appropriate for
    corpora that fit a single machine's all-pairs budget; use
    :func:`embedding_lsh_pairs` for large corpora (identical output
    contract, linear shuffle).  Kept because it is the ground-truth
    generator the LSH path is verified against.

    BLAS-blocked candidate generation at (threshold - 1e-6), then exact
    re-scoring of the (few) candidates with the deterministic fold
    expression — so the output is bit-identical to a naive exact all-pairs
    computation (and the DuckDB oracle) while the heavy lifting runs as
    matrix products. Pass ``row_count`` when known to avoid the
    block-sizing count() job."""
    from kolibrie_spark.operators.similarity import cosine_expr

    cand = _blas_candidate_pairs(
        df, id_col, vec_col, threshold - 1e-6, block_rows, row_count
    )
    e = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__v")
    )
    a = e.withColumnRenamed("__id", "id_a").withColumnRenamed("__v", "__va")
    b = e.withColumnRenamed("__id", "id_b").withColumnRenamed("__v", "__vb")
    cos = cosine_expr(F.col("__va"), F.col("__vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    threshold: float = 0.4,
    bits: int = 4,
    tables: int = 80,
    seed: int = 42,
) -> DataFrame:
    """Scale-safe near-dup pairs by cosine similarity: hyperplane-LSH
    candidate generation + exact verify.  Same output contract as
    :func:`embedding_cosine_pairs` (``(id_a, id_b, cosine)``, ``id_a <
    id_b``, bit-exact cosine) but LINEAR shuffle volume — the scale path
    for large corpora.  Mirrors the reference's LSH-bucketed similarity
    design (kolibrie/src/ml/embeddings rather than all-pairs scoring).

    Plan shape:

    1. SIGNATURES — one Arrow-batched ``mapInPandas`` computes all
       ``tables`` b-bit signatures per row as a single (batch x dim) @
       (dim x tables*bits) matrix product (same sign convention as
       :func:`~kolibrie_spark.operators.similarity.signature_expr`,
       same :func:`~kolibrie_spark.operators.similarity.hyperplanes`
       stream), exploding each row into ``tables`` (table, sig, id, vec)
       rows — the only stage whose shuffle carries vectors, and its
       volume is exactly ``tables`` copies of the input (LINEAR in n; the
       standard LSH-table cost).
    2. BUCKET SCORE — ``applyInPandas`` per (table, sig) bucket: one
       BLAS matmul scores the bucket's members all-pairs and emits only
       the id-pairs at cosine >= (threshold - 1e-6); the 1e-6 margin
       covers numpy-pairwise vs sequential-fold summation drift.  No
       candidate-pair materialization — buckets are scored where they
       land, survivors are a few id-pairs per bucket.
    3. DEDUP + EXACT VERIFY — global ``distinct`` on the (few)
       survivors (a pair colliding in k tables must appear once), join
       the two vectors back by id, and re-score with the deterministic
       sequential-fold ``cosine_expr`` (bit-identical to the DuckDB
       oracle's list_sum order), final filter at ``threshold``.

    Determinism note: bucket ASSIGNMENT uses float projections (numpy
    GEMM), so a vector lying within float noise of a hyperplane could
    bucket differently across runs — harmless, because the OUTPUT is the
    exactly-verified pair set, which is run-independent as long as every
    true pair collides somewhere (the recall bound below); the exact
    verify uses the deterministic sequential fold.

    Recall: per-pair miss probability at cosine exactly 0.4 is
    (1 - p^bits)^tables with p = 1 - acos(0.4)/pi = 0.631 → ~1e-6 at the
    defaults; pairs meaningfully above threshold are exponentially safer.
    Defaults verified to yield ZERO misses vs the exact oracle on the test
    corpora (oracle equality is the recall proof, as with
    :func:`minhash_lsh_pairs`).  At 100 TB, grow ``bits`` ~ log2(n) so
    bucket sizes stay bounded (the per-bucket matmul is quadratic IN THE
    BUCKET), and run exact dedup first so identical vectors don't form a
    degenerate bucket — same guidance as MinHash-LSH.
    """
    import numpy as np

    from kolibrie_spark.operators.similarity import cosine_expr, hyperplanes

    H = np.asarray(hyperplanes(dim, bits * tables, seed)).T  # dim x (T*b)
    weights = 1 << np.arange(bits)
    # r12 (guide §2.3, narrower types): the signature stage is the only
    # one shuffling vectors, `tables` copies of the corpus — it now ships
    # them as float32 (half the bytes).  Bucket scoring is candidate
    # GENERATION only; the margin below absorbs float32 drift (bounded
    # ~1e-5 for unit 64-dim dots, 10x slack) so no pair at or above the
    # threshold can be pruned before the float64 exact verify decides.
    eps = threshold - 1e-4
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)  # single-file reads: spread the matmul

    def _sigs(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["__v"].to_numpy())
            P = (V @ H) >= 0
            S = (P.reshape(len(pdf), tables, bits) * weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    "__t": np.tile(np.arange(tables, dtype=np.int32), len(pdf)),
                    "__sig": S.reshape(-1).astype(np.int64),
                    "__id": pdf["__id"].to_numpy().repeat(tables),
                    "__v": pdf["__v"].to_numpy().repeat(tables),
                }
            )

    sig = base.mapInPandas(
        _sigs, "__t int, __sig long, __id long, __v array<float>"
    )

    def _bucket_score(pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        V = np.vstack(pdf["__v"].to_numpy())
        ids = pdf["__id"].to_numpy()
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        ia, jb = np.nonzero(np.triu(S >= eps, k=1))
        id_a = np.minimum(ids[ia], ids[jb])
        id_b = np.maximum(ids[ia], ids[jb])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b})

    survivors = (
        sig.groupBy("__t", "__sig")
        .applyInPandas(_bucket_score, "id_a long, id_b long")
        .distinct()
    )
    av = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    bv = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        survivors.join(av, "id_a")
        .join(bv, "id_b")
        .withColumn("cosine", cosine_expr(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------- prefix-filtered exact joins
def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard >= ``threshold`` self-join via PREFIX FILTERING —
    same output contract as :func:`ngram_jaccard_pairs` (``(id_a, id_b,
    jaccard)``, ``id_a < id_b``); see :func:`_prefix_pairs`."""
    return _prefix_pairs(df, id_col, text_col, n, threshold, score="jaccard")


def _prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    score: str,
) -> DataFrame:
    """Exact set-similarity self-join via PREFIX FILTERING
    (AllPairs/PPJoin family, Bayardo et al. WWW'07 / Xiao et al. ICDE'08)
    over word n-gram shingle sets, ``score`` picking the predicate:

    - ``"jaccard"``: |A∩B| / |A∪B| >= t,
    - ``"containment"`` (overlap coefficient): |A∩B| / min(|A|,|B|) >= t.

    Instead of joining on EVERY shared shingle, each document exposes only
    a prefix of its globally-rarest shingles (rare-first total order) and
    only prefix collisions become candidates; exact verification of the
    candidates makes the output identical to the full shared-shingle join.

    Prefix bounds (per-pair roles assigned by SIZE: small doc = probe
    side, large doc = index side; ceil(t*s) in exact integer arithmetic
    via Fraction, immune to float jitter):

    - jaccard: overlap >= alpha = ceil(t/(1+t)*(na+nb)) — probe prefix
      ``na - ceil(2t/(1+t)*na) + 1`` (alpha >= ceil(2t/(1+t)*na) when
      na <= nb), index prefix ``nb - ceil(t*nb) + 1`` (alpha >=
      ceil(t*nb)), plus the size filter ceil(t*nb) <= na;
    - containment: overlap >= alpha = ceil(t*na) (na = min side by role
      order) — probe prefix ``na - ceil(t*na) + 1``; the index side
      exposes ALL tokens (a tiny contained doc constrains its container's
      size not at all, so no index prefix or size filter is sound).

    An overlap of o forces the length-(|x|-o+1) prefixes to intersect
    under ANY shared total order, so no qualifying pair is pruned; the
    positional filter (a collision at 0-based positions (pa, pb) witnesses
    at most 1 + min(na-pa-1, nb-pb-1) overlapping tokens) keeps every
    qualifying pair because its FIRST common token in the shared order
    always passes it.

    Scale shape (100 TB): the rare-first order concentrates prefix tokens
    in the low-frequency tail, so prefix-join keys are near-unique and the
    salted skew guard the old shared-shingle join needed is moot by
    construction. For containment the index side does carry hot tokens;
    the probe side still almost never does, and AQE skew-join can split
    the shuffle join's oversized partitions at scale. The document-
    frequency table is a partial-aggregated groupBy over the shingle
    table joined back on the same key (r13, VERDICT r12 task #2: the
    previous ``Window.partitionBy(shingle)`` count buffered a hot
    shingle's whole group in one task and AQE cannot split windows — a
    stop-shingle at corpus scale is a straggler/spill machine; the
    groupBy holds one row per key and the join-back streams).
    Verification ships each candidate pair's two shingle arrays once,
    never a quadratic structure; tokens ride as xxhash64 longs (§2.3)."""
    from fractions import Fraction

    if score not in ("jaccard", "containment"):
        raise ValueError(f"unknown score {score!r}")
    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator

    def int_ceil_t(s: Column) -> Column:
        # ceil(t*s) in exact integer arithmetic
        return F.floor((s * num + den - 1) / den).cast("long")

    def int_ceil_2t(s: Column) -> Column:
        # ceil(2t/(1+t) * s): t = num/den => 2*num*s / (den+num)
        return F.floor((s * (2 * num) + (den + num) - 1) / (den + num)).cast(
            "long"
        )

    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)  # spread the shingle explode itself
    # one shingle explode feeds both the document-frequency aggregate and
    # the join-back probe (lazy checkpoint; materialized inside the first
    # consuming action). The groupBy partial-aggregates map-side before
    # its (tiny, one-row-per-key) exchange; the join back streams the
    # occurrence rows against the built count table — per-task memory is
    # bounded by the per-partition vocabulary, not by any hot shingle's
    # occurrence count.
    sh = (
        _shingle_table(df, id_col, text_col, n)
        .select("__id", F.xxhash64("__sh").alias("__sh"))
        .localCheckpoint(eager=False)
    )
    counts = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    # explicit partition count on the probe side (checkpoint scans report
    # UnknownPartitioning): byte-light but CPU-dense, so AQE must not
    # coalesce it onto a handful of tasks
    sh = sh.repartition(par, "__sh").join(counts.hint("shuffle_hash"), "__sh")
    # per-doc shingles sorted rare-first: array_sort on (df, token) structs
    ordered = (
        sh.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__df"), F.col("__sh")))
                ),
                lambda x: x["__sh"],
            ).alias("__toks")
        )
        .withColumn("__n", F.size("__toks"))
        .withColumn(
            "__pmid",  # probe prefix (small-role side)
            F.slice(
                F.col("__toks"),
                1,
                (
                    F.col("__n")
                    - (
                        int_ceil_2t(F.col("__n"))
                        if score == "jaccard"
                        else int_ceil_t(F.col("__n"))
                    )
                    + 1
                ).cast("int"),
            ),
        )
        .withColumn(
            "__plong",  # index side: prefix (jaccard) or all tokens
            F.slice(
                F.col("__toks"),
                1,
                (F.col("__n") - int_ceil_t(F.col("__n")) + 1).cast("int"),
            )
            if score == "jaccard"
            else F.col("__toks"),
        )
    )
    # the prefix join and pair-dedup run over (id, size, prefix-token)
    # ONLY — shipping each doc's full token array per candidate pair would
    # multiply shuffle bytes by the candidate fan-out; arrays re-attach
    # once per SURVIVING pair side below
    ordered = ordered.localCheckpoint(eager=False)  # feeds 3 branches once
    # explicit partition counts on the join key: like the shared-shingle
    # join, this stage is CPU-dense but byte-light and AQE would coalesce
    # it onto a handful of tasks (it optimizes for bytes, not compute);
    # explicit repartition is exempt from AQE coalescing
    a = ordered.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        F.posexplode("__pmid").alias("__pa", "__ptok"),
    ).repartition(par, "__ptok")
    b = ordered.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.posexplode("__plong").alias("__pb", "__ptok"),
    ).repartition(par, "__ptok")
    # exact per-pair overlap requirement
    if score == "jaccard":
        # alpha = ceil(t/(1+t)*(na+nb))
        alpha = F.floor(
            ((F.col("__na") + F.col("__nb")) * num + (den + num) - 1)
            / (den + num)
        ).cast("long")
    else:
        # alpha = ceil(t*min) = ceil(t*na) under the role order
        alpha = int_ceil_t(F.col("__na"))
    role_order = (F.col("__na") < F.col("__nb")) | (
        (F.col("__na") == F.col("__nb")) & (F.col("id_a") < F.col("id_b"))
    )
    # positional filter (PPJoin): this collision can witness at most
    # 1 + min(remaining-a, remaining-b) overlapping tokens
    positional = (
        F.lit(1)
        + F.least(
            F.col("__na") - F.col("__pa") - 1,
            F.col("__nb") - F.col("__pb") - 1,
        )
        >= alpha
    )
    cond = role_order & positional
    if score == "jaccard":
        # size filter: J >= t needs t*|b| <= |a|
        cond = cond & (int_ceil_t(F.col("__nb")) <= F.col("__na"))
    # build side: jaccard keeps the r12-measured build on b (index
    # prefixes); containment builds on a (the probe prefixes — the b side
    # exposes every token, including hot ones, and must stream)
    joined = (
        a.join(b.hint("shuffle_hash"), on="__ptok")
        if score == "jaccard"
        else a.hint("shuffle_hash").join(b, on="__ptok")
    )
    cand = (
        joined.filter(cond)
        .select("id_a", "id_b", "__na", "__nb")
        .dropDuplicates(["id_a", "id_b"])
        .repartition(par, "id_a", "id_b")
    )
    ta = ordered.select(F.col("__id").alias("id_a"), F.col("__toks").alias("__ta"))
    tb = ordered.select(F.col("__id").alias("id_b"), F.col("__toks").alias("__tb"))
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    if score == "jaccard":
        value = inter / (F.col("__na") + F.col("__nb") - inter)
    else:
        value = inter / F.least(F.col("__na"), F.col("__nb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(score, value)
        .filter(F.col(score) >= threshold)
        # roles were size-ordered; the output contract is id-ordered
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            score,
        )
    )
