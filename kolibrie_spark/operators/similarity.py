"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact top-k for one query vector: a single
  narrow map + TakeOrdered (no shuffle of the vectors); the correctness
  baseline and perfectly scalable for one-off queries (scan-bound).
- ``lsh_bucket_topk`` — random-hyperplane LSH: vectors carry a signature
  bucket; a query probes its own bucket plus the ``nprobe`` nearest buckets
  by signature hamming distance. At 100 TB the table should be written
  partitioned by bucket so a probe is a partition-pruned scan, turning
  top-k from a full scan into reading nprobe/2^bits of the data.
- ``ivf_topk`` — inverted-file partitioning: every vector is assigned to
  its nearest of ``ncells`` centroids (argmin L2); a query brute-forces
  only the ``nprobe`` nearest cells. Centroid seeding here is
  deterministic (the first ``ncells`` vectors by id) so the DuckDB oracle
  can replicate the exact cell assignment; at scale you'd fit centroids
  with MLlib KMeans on a sample instead — the assignment/probe plan is
  unchanged. Like LSH, the cell filter is a pushable IN-list, so a
  cell-partitioned table layout turns a probe into reading
  nprobe/ncells of the data.

Dot products use ``zip_with`` + ``aggregate`` — JVM column expressions with
left-to-right accumulation, bit-reproducible against DuckDB's
list_dot_product for the oracle checks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    # widen to double BEFORE multiplying — float32 products then summed
    # would diverge from the all-double oracle computation
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_prenorm_expr(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine_expr`` with both norms hoisted to per-row columns: compute
    ``norm_expr`` once per row BEFORE a pair join instead of once per PAIR
    (r12, guide §2 — less work per shuffled pair; 1 array fold per pair
    instead of 3).  Bit-identical to ``cosine_expr``: the hoisted norm is
    the same fold over the same data, and the ``dot / (na * nb)`` operand
    order is unchanged."""
    return dot_expr(a, b) / (na * nb)


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec]).cast("array<double>")


def dot_duckdb_sql(a: str, b: str) -> str:
    """DuckDB twin of dot_expr — an explicit left fold, because DuckDB's
    list_dot_product uses a different accumulation order (observed ~1e-9
    divergence) while this matches Spark bit-for-bit."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def l2sq_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance as a left fold over squared element diffs —
    accumulation order matches ``l2sq_py``/``l2sq_duckdb_sql`` bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"), b.cast("array<double>"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2sq_py(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def l2sq_duckdb_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, x) -> acc + x)"
    )


def cosine_duckdb_sql(a: str, b: str) -> str:
    return (
        f"({dot_duckdb_sql(a, b)} / "
        f"(sqrt({dot_duckdb_sql(a, a)}) * sqrt({dot_duckdb_sql(b, b)})))"
    )


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``: one map over the
    vectors + TakeOrdered(k). Ties broken by id for determinism."""
    q = _vec_lit(query_vec)
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        (dot_expr(v, q) / (norm_expr(v) * norm_expr(q))).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


# ------------------------------------------------------- hyperplane LSH index
def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, broadcast as literals)."""
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).round(6).tolist()


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-signature: sign of the projection on each hyperplane, packed into
    a BIGINT (bits <= 63)."""
    bits = []
    for i, p in enumerate(planes):
        proj = dot_expr(vec.cast("array<double>"), _vec_lit(p))
        bits.append(F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vectorized: bool = False,
) -> DataFrame:
    """``dim`` is required and KEYWORD-ONLY (as are bits/seed): a positional
    caller from the pre-``dim`` signature would silently build wrong-sized
    hyperplanes.  Inferring dim would run a hidden one-row Spark job inside
    a library function (every call site knows its embedding dim).

    ``vectorized=True`` (r13, guide §4.2): the ``bits`` projection folds
    run as one Arrow-batched numpy pass with an explicit dimension-
    ascending accumulation loop — per (row, plane) the double additions
    happen in exactly ``dot_expr``'s order, so the projection signs and
    the packed bucket are BIT-IDENTICAL to the expression path (pinned by
    test_lsh_bucket_vectorized_matches_expression)."""
    planes = hyperplanes(dim, bits, seed)
    if vectorized:
        import numpy as np

        P = np.array(planes, dtype=np.float64)  # bits x dim
        W = 1 << np.arange(P.shape[0], dtype=np.int64)
        out_schema = df.withColumn("lsh_bucket", F.lit(0).cast("bigint")).schema

        def sig(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.vstack(
                    pdf[vec_col]
                    .map(lambda x: np.asarray(x, dtype=np.float64))
                    .to_numpy()
                )
                acc = np.zeros((V.shape[0], P.shape[0]), dtype=np.float64)
                for i in range(P.shape[1]):
                    acc += V[:, i, None] * P[None, :, i]
                pdf = pdf.copy()
                pdf["lsh_bucket"] = ((acc >= 0) * W).sum(axis=1)
                yield pdf

        return df.mapInPandas(sig, out_schema)
    return df.withColumn("lsh_bucket", signature_expr(F.col(vec_col), planes))


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    bits: int = 8,
    nprobe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature is within the
    ``nprobe`` nearest buckets (by hamming distance to the query signature).

    Recall grows with nprobe; nprobe = 2^bits degenerates to exact. The
    probed-bucket filter is a pushable IN-list, so a bucket-partitioned
    layout prunes partitions instead of scanning."""
    planes = hyperplanes(len(query_vec), bits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) >= 0:
            qsig |= 1 << i
    buckets = sorted(range(1 << bits), key=lambda b: bin(b ^ qsig).count("1"))[:nprobe]
    # r13 (guide §4.2): exact vectorized signatures — bit-identical
    # buckets, the interpreted per-row projection folds gone
    bucketed = with_lsh_bucket(
        df, vec_col, dim=len(query_vec), bits=bits, seed=seed, vectorized=True
    )
    probed = bucketed.filter(F.col("lsh_bucket").isin(buckets))
    return cosine_topk(probed, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------- IVF index
def seed_centroids(df: DataFrame, id_col: str, vec_col: str, ncells: int):
    """Deterministic centroid seeds: the first ``ncells`` vectors by id.
    Swap for MLlib KMeans centers at scale — the rest of the plan is
    identical (centroids are always a tiny driver-side list)."""
    rows = df.orderBy(F.col(id_col).asc()).select(id_col, vec_col).limit(ncells).collect()
    return [(int(r[0]), [float(v) for v in r[1]]) for r in rows]


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    ncells: int,
    seed: int = 42,
    max_iter: int = 20,
):
    """MLlib KMeans centroid provider (initMode='k-means||') — the scale
    path for IVF: real cluster centers give balanced cells and better
    probe recall than first-N seeds.  Same return shape as
    :func:`seed_centroids` ((cid, vector) list, driver-side and tiny), so
    the two are drop-in interchangeable via ``ivf_topk``'s
    ``centroid_provider``.  Seeded: same data + seed → same centers.
    ``id_col`` is unused (cells are numbered 0..ncells-1) but kept so the
    provider signature is uniform."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=ncells, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feats)
    return [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]


def with_ivf_cell(
    df: DataFrame, vec_col: str, centroids, vectorized: bool = False
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmin squared-L2, ties
    to the lowest cell id). One pass, no shuffle.

    Default (expression) path: the centroid list is a literal
    array-of-structs folded per row — each distance is computed exactly
    once (transform), then reduced to the argmin (aggregate);
    sequential-fold accumulation is bit-matchable by the DuckDB oracles.

    ``vectorized=True``: one Arrow batch at a time, distances accumulated
    by an EXPLICIT dimension-ascending loop of vectorized numpy ops —
    per (row, cell) the double additions happen in exactly
    ``l2sq_py``/``l2sq_expr``'s order, so the distances (and therefore
    the argmin with its first-minimum = lowest-cid tie-break) are
    BIT-IDENTICAL to the expression path, and the oracle gates can use
    it (r13; the previous GEMM decomposition ||v||²-2v·c+||c||²
    reassociated the sum and could flip boundary assignments, which kept
    it off the gates). Still vectorized across the batch: the expression
    path generates O(ncells * dim) interpreted higher-order-function
    work per row and collapses past ~tens of centroids (measured r5:
    ncells=80 on 20k rows ran 100x slower; measured r13: ncells=16 on
    2k rows costs ~1ms/row)."""
    if vectorized:
        import numpy as np
        import pandas as pd

        cents = sorted(centroids, key=lambda cv: cv[0])  # argmin tie → lowest cid
        cids = np.array([cid for cid, _ in cents], dtype=np.int64)
        C = np.array([list(map(float, vec)) for _, vec in cents], dtype=np.float64)
        out_schema = df.withColumn("ivf_cell", F.lit(0).cast("bigint")).schema

        def assign(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.vstack(
                    pdf[vec_col].map(lambda x: np.asarray(x, dtype=np.float64)).to_numpy()
                )
                acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
                for i in range(C.shape[1]):
                    d = V[:, i, None] - C[None, :, i]
                    acc += d * d
                pdf = pdf.copy()
                pdf["ivf_cell"] = cids[np.argmin(acc, axis=1)]
                yield pdf

        return df.mapInPandas(assign, out_schema)

    v = F.col(vec_col).cast("array<double>")
    cent_arr = F.array(*[
        F.struct(F.lit(cid).cast("bigint").alias("cid"), _vec_lit(vec).alias("cvec"))
        for cid, vec in centroids
    ])
    dists = F.transform(
        cent_arr,
        lambda c: F.struct(c["cid"].alias("cid"), l2sq_expr(v, c["cvec"]).alias("dist")),
    )
    best = F.aggregate(
        dists,
        F.struct(
            F.lit(-1).cast("bigint").alias("cid"),
            F.lit(float("inf")).cast("double").alias("dist"),
        ),
        lambda acc, d: F.when(d["dist"] < acc["dist"], d).otherwise(acc),
        lambda acc: acc["cid"],
    )
    return df.withColumn("ivf_cell", best)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    ncells: int = 16,
    nprobe: int = 4,
    centroid_provider=None,
) -> DataFrame:
    """Approximate top-k via IVF: brute-force cosine only inside the
    ``nprobe`` cells whose centroids are nearest the query. nprobe=ncells
    degenerates to exact. The cell filter is a pushable IN-list — with the
    table written ``partitionBy('ivf_cell')`` a probe reads nprobe/ncells
    of the data instead of scanning.

    ``centroid_provider(df, id_col, vec_col, ncells)`` picks the cell
    centers: default :func:`seed_centroids` (deterministic first-N, the
    DuckDB-oracle-matched path); pass :func:`kmeans_centroids` for real
    clustering at scale (higher recall at equal nprobe)."""
    provider = centroid_provider or seed_centroids
    centroids = provider(df, id_col, vec_col, ncells)
    qd = [float(x) for x in query_vec]
    probe = sorted(centroids, key=lambda c: (l2sq_py(qd, c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probe]
    # r13 (guide §4.2): the assignment scan uses the exact vectorized
    # Arrow path — bit-identical cells (see with_ivf_cell), ~1ms/row of
    # interpreted fold work gone; the probed cosine keeps the JVM fold
    # (oracle-matched accumulation, few surviving rows)
    assigned = with_ivf_cell(df, vec_col, centroids, vectorized=True)
    probed = assigned.filter(F.col("ivf_cell").isin(cells))
    return cosine_topk(probed, query_vec, k, id_col, vec_col)


def ivf_topk_duckdb_sql(
    table: str,
    query_vec_sql: str,
    k: int,
    id_col: str,
    vec_col: str,
    ncells: int = 16,
    nprobe: int = 4,
) -> str:
    """DuckDB twin of ``ivf_topk`` (same seeds, same argmin tie-break, same
    fold accumulation order) — value-exact differential oracle."""
    l2_assign = l2sq_duckdb_sql("e.v", "c.cvec")
    l2_probe = l2sq_duckdb_sql("cvec", "qv")
    cos = cosine_duckdb_sql("v", "qv")
    return f"""
WITH q AS (SELECT {query_vec_sql} AS qv),
e AS (SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}),
cent AS (SELECT {id_col} AS cid, v AS cvec FROM e ORDER BY {id_col} LIMIT {ncells}),
assign AS (
  SELECT e.{id_col}, e.v, c.cid,
         row_number() OVER (PARTITION BY e.{id_col}
                            ORDER BY {l2_assign} ASC, c.cid ASC) AS rn
  FROM e CROSS JOIN cent c),
cells AS (SELECT {id_col}, v, cid AS ivf_cell FROM assign WHERE rn = 1),
probe AS (SELECT cid FROM cent, q ORDER BY {l2_probe} ASC, cid ASC LIMIT {nprobe})
SELECT {id_col}, {cos} AS cosine
FROM cells, q WHERE ivf_cell IN (SELECT cid FROM probe)
ORDER BY cosine DESC, {id_col} ASC LIMIT {k}"""


# ------------------------------------------------ product quantization (PQ)
def pq_seed_codebooks(
    df: DataFrame, id_col: str, vec_col: str, m: int, ksub: int
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: subspace j's ``ksub`` codewords are the
    j-th subvectors of the first ``ksub`` vectors by id (the same
    determinism contract as :func:`seed_centroids`, so the DuckDB oracle
    replicates training exactly). At scale you'd k-means each subspace on
    a sample; the code-assignment/ADC plan below is unchanged — codebooks
    are always an m×ksub×(dim/m) driver-side constant (KBs)."""
    rows = (
        df.orderBy(F.col(id_col).asc()).select(vec_col).limit(ksub).collect()
    )
    vecs = [[float(x) for x in r[0]] for r in rows]
    if len(vecs) < ksub:
        raise ValueError(f"need at least {ksub} vectors to seed codebooks")
    dim = len(vecs[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)
    ]


def _pq_code_pos(v: Column, j: int, dsub: int, codebook: list[list[float]]) -> Column:
    """1-based position of subspace j's nearest codeword (first-occurrence
    tie-break, same rule as DuckDB's list_position).

    The codebook folds through ONE transform over an array-of-arrays
    literal rather than ksub sibling l2sq expressions — identical values,
    but the expression tree (analysis + codegen time) stays O(1) in ksub
    instead of O(ksub), the same trick as signature_from_base."""
    sub = F.slice(v, j * dsub + 1, dsub)
    cb_lit = F.array(*[_vec_lit(cw) for cw in codebook])
    dists = F.transform(cb_lit, lambda cw: l2sq_expr(sub, cw))
    return F.array_position(dists, F.array_min(dists))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    m: int = 4,
    ksub: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC, the FAISS-style
    memory-scale path): each vector is represented by m sub-space codes
    (m·log2(ksub) bits instead of dim·32), and the query's distance to a
    vector is the sum of m precomputed query→codeword distances — the
    scan reads codes, not floats, an ~(32·dim)/(m·log2 ksub)× IO cut at
    100 TB. Returns (id, adc) ascending (smaller = closer), ties by id.

    Deterministic end to end: seeded codebooks + first-occurrence argmin
    + a literal query distance table shared with the DuckDB twin, so the
    ADC scores are bit-identical cross-engine.

    ``vectorized=True`` (default, r13 — guide §4.2): code assignment and
    the ADC sum run as one Arrow-batched numpy pass with EXPLICIT
    dimension-ascending accumulation loops, so every per-(row, codeword)
    distance, the first-minimum argmin, and the subspace-ascending ADC
    sum happen in exactly the expression path's order — BIT-IDENTICAL
    output (pinned by test_pq_vectorized_matches_expression). The
    expression path evaluated m*ksub interpreted higher-order folds per
    row (~1ms/row at m=8, ksub=16); only the id and vector columns cross
    the Python boundary."""
    cbs = codebooks or pq_seed_codebooks(df, id_col, vec_col, m, ksub)
    dim = len(query_vec)
    dsub = dim // m
    qd = [float(x) for x in query_vec]
    # query→codeword distance table, driver-side, inlined as literals
    qtab = [
        [l2sq_py(qd[j * dsub : (j + 1) * dsub], cw) for cw in cbs[j]]
        for j in range(m)
    ]
    if vectorized:
        import numpy as np

        CBS = [np.array(cb, dtype=np.float64) for cb in cbs]  # m x (ksub x dsub)
        QT = [np.array(row, dtype=np.float64) for row in qtab]
        slim = df.select(id_col, vec_col)
        out_schema = slim.select(id_col).withColumn(
            "adc", F.lit(0.0).cast("double")
        ).schema

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.vstack(
                    pdf[vec_col]
                    .map(lambda x: np.asarray(x, dtype=np.float64))
                    .to_numpy()
                )
                adc = np.zeros(V.shape[0], dtype=np.float64)
                for j in range(m):
                    sub = V[:, j * dsub : (j + 1) * dsub]
                    CB = CBS[j]
                    acc = np.zeros((V.shape[0], CB.shape[0]), dtype=np.float64)
                    for i in range(dsub):
                        d = sub[:, i, None] - CB[None, :, i]
                        acc += d * d
                    codes = np.argmin(acc, axis=1)  # first min = list_position
                    adc = adc + QT[j][codes]  # subspace-ascending sum order
                out = pdf[[id_col]].copy()
                out["adc"] = adc
                yield out

        scored = slim.mapInPandas(score, out_schema)
        return scored.orderBy(F.col("adc").asc(), F.col(id_col).asc()).limit(k)
    v = F.col(vec_col).cast("array<double>")
    adc = F.lit(0.0)
    for j in range(m):
        pos = _pq_code_pos(v, j, dsub, cbs[j]).cast("int")
        adc = adc + F.element_at(
            F.array(*[F.lit(float(d)) for d in qtab[j]]), pos
        )
    scored = df.select(F.col(id_col), adc.alias("adc"))
    return scored.orderBy(F.col("adc").asc(), F.col(id_col).asc()).limit(k)


def pq_topk_duckdb_sql(
    table: str,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    m: int = 4,
    ksub: int = 16,
    codebooks: list[list[list[float]]] | None = None,
) -> str:
    """DuckDB twin of :func:`pq_topk`. ``codebooks`` must be the SAME
    constants the Spark side used (pass the pq_seed_codebooks result);
    when omitted the SQL re-derives first-``ksub``-by-id seeds inline —
    only valid against the default provider."""
    dim = len(query_vec)
    dsub = dim // m
    qd = [float(x) for x in query_vec]

    def lst(xs: list[float]) -> str:
        # ::DOUBLE per element — DuckDB parses bare decimal literals as
        # DECIMAL and mixed scales overflow the cast
        return "[" + ", ".join(f"{float(x)!r}::DOUBLE" for x in xs) + "]"

    if codebooks is None:
        raise ValueError("pass the Spark side's codebooks for a valid twin")
    qtab = [
        [l2sq_py(qd[j * dsub : (j + 1) * dsub], cw) for cw in codebooks[j]]
        for j in range(m)
    ]
    terms = []
    for j in range(m):
        sub = f"(v[{j * dsub + 1}:{j * dsub + dsub}])"
        dists = (
            "["
            + ", ".join(l2sq_duckdb_sql(sub, lst(cw)) for cw in codebooks[j])
            + "]"
        )
        pos = f"list_position({dists}, list_min({dists}))"
        terms.append(f"({lst(qtab[j])})[{pos}]")
    adc = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
)
SELECT {id_col}, (0.0 + {adc}) AS adc
FROM e
ORDER BY adc ASC, {id_col} ASC LIMIT {k}
"""


def pq_topk_duckdb_sql_derived(
    table: str,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int,
    dim: int,
    m: int = 4,
    ksub: int = 16,
) -> str:
    """Self-contained DuckDB twin of :func:`pq_topk` with the DEFAULT
    codebook provider: codebooks (first-``ksub``-by-id subvectors) and the
    query distance table are derived in SQL from the same table, with the
    same l2 fold order as the Spark/Python side, so every ADC double is
    bit-identical. ``query_id`` selects the query vector row."""
    dsub = dim // m
    cb_cols = ", ".join(
        f"list(v[{j * dsub + 1}:{j * dsub + dsub}] ORDER BY c) AS cb{j}"
        for j in range(m)
    )
    terms = []
    for j in range(m):
        sub = f"(e.v[{j * dsub + 1}:{j * dsub + dsub}])"
        qsub = f"(q.qv[{j * dsub + 1}:{j * dsub + dsub}])"
        dists = f"list_transform(cb{j}, cw -> {l2sq_duckdb_sql(sub, 'cw')})"
        qdists = f"list_transform(cb{j}, cw -> {l2sq_duckdb_sql(qsub, 'cw')})"
        terms.append(f"({qdists})[list_position({dists}, list_min({dists}))]")
    adc = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
q AS (SELECT v AS qv FROM e WHERE {id_col} = {query_id}),
seeds AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS c, v
  FROM (SELECT {id_col}, v FROM e ORDER BY {id_col} LIMIT {ksub})
),
cbl AS (SELECT {cb_cols} FROM seeds)
SELECT e.{id_col}, (0.0 + {adc}) AS adc
FROM e, q, cbl
ORDER BY adc ASC, e.{id_col} ASC LIMIT {k}
"""


# ------------------------------------------------- int8 scalar quantization
def with_int8_quantization(df: DataFrame, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = floor(v_i/scale + 0.5) — the storage-side half of quantized ANN
    (4x less IO than float32 at 100 TB; scores are integer dot products
    rescaled by the two scales). floor(x + 0.5) instead of round() keeps
    the rounding rule identical across Spark, Python and DuckDB.

    Adds ``q_scale`` (double) and ``q_vec`` (array<int>)."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30),
    )
    return df.withColumn("q_scale", scale).withColumn(
        "q_vec",
        F.transform(v, lambda x: F.floor(x / F.col("q_scale") + F.lit(0.5)).cast("int")),
    )


def quantized_topk(
    df: DataFrame, query_vec: list[float], k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Top-k by quantized dot product: integer arithmetic per element (no
    float accumulation drift), one multiply by the two scales at the end —
    deterministic and exactly reproducible cross-engine. Returns
    (id, qscore)."""
    qmax = max(abs(float(x)) for x in query_vec)
    qscale = max(qmax / 127.0, 1e-30)
    qq = [int(math_floor(float(x) / qscale + 0.5)) for x in query_vec]
    quant = with_int8_quantization(df, vec_col)
    qlit = F.array(*[F.lit(x) for x in qq])
    int_dot = F.aggregate(
        F.zip_with(F.col("q_vec"), qlit, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = quant.select(
        F.col(id_col),
        (int_dot.cast("double") * F.col("q_scale") * F.lit(qscale)).alias("qscore"),
    )
    return scored.orderBy(F.col("qscore").desc(), F.col(id_col).asc()).limit(k)


def math_floor(x: float) -> int:
    import math

    return int(math.floor(x))


def quantized_topk_duckdb_sql(
    table: str, query_vec_sql: str, k: int, id_col: str, vec_col: str
) -> str:
    """DuckDB twin of quantized_topk: same scale rule, same floor(x+0.5)
    rounding, integer dot, same final two multiplies."""
    return f"""
WITH q AS (
  SELECT list_transform({query_vec_sql}, x -> CAST(x AS DOUBLE)) AS qv
),
qq AS (
  SELECT qv,
    GREATEST(list_max(list_transform(qv, x -> abs(x))) / 127.0, 1e-30) AS qscale
  FROM q
),
qvec AS (
  SELECT qscale,
    list_transform(qv, x -> CAST(floor(x / qscale + 0.5) AS BIGINT)) AS qq
  FROM qq
),
e AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
eq AS (
  SELECT {id_col},
    GREATEST(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-30) AS escale,
    v
  FROM e
),
ev AS (
  SELECT {id_col}, escale,
    list_transform(v, x -> CAST(floor(x / escale + 0.5) AS BIGINT)) AS ev
  FROM eq
)
SELECT {id_col},
  CAST(list_reduce(list_prepend(0::BIGINT,
    list_transform(generate_series(1, len(ev)), i -> ev[i] * qq[i])),
    (acc, x) -> acc + x) AS DOUBLE) * escale * qscale AS qscore
FROM ev, qvec
ORDER BY qscore DESC, {id_col} ASC LIMIT {k}
"""
