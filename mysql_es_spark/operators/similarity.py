"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``          exact brute-force top-k, fully JVM-side
                           (zip_with/aggregate — the correctness baseline)
- ``hyperplane_buckets``   random-hyperplane LSH bucketing (the scale path:
                           a query probes 1 bucket + optional multiprobe
                           neighbors instead of scanning 10^11 vectors)
- ``ann_topk``             LSH-bucketed approximate top-k with exact
                           re-ranking inside the probed buckets
- ``ivf_centroids`` / ``ivf_assign`` / ``ivf_topk``
                           IVF (inverted-file) ANN: spherical k-means
                           coarse quantizer trained on a driver-side
                           sample; cells assigned distributed; a query
                           probes the n_probe nearest cells

The hyperplanes / centroids are seeded numpy — deterministic, shipped to
executors as broadcast-sized literals (a few KB / n_cells × dim doubles).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_expr


def _query_lit(qv: list[float]):
    return F.array(*[F.lit(float(x)) for x in qv])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | None = None,
    min_sim: float | None = None,
) -> DataFrame:
    """Exact cosine top-k: one scan, map-side partial top-k via Spark's
    TakeOrdered (orderBy+limit), no shuffle of the vectors themselves.

    ``where`` is ES's kNN ``filter`` context: a SQL predicate over the
    embedding table's columns applied BEFORE the search (ES pre-filters,
    so the k results all satisfy the filter — never a post-filtered
    short page). A plain column predicate pushes down to the parquet
    scan, so a selective filter prunes row groups before any vector
    math.

    ``min_sim`` is ES's kNN ``similarity`` floor: vectors scoring below
    it are dropped BEFORE the top-k cut, so the page can come back short
    — the contract callers use to mean "only results at least this
    close". Applied to the 4-dp-rounded score (the engine's cross-engine
    score contract), as a filter fused into the same scan stage."""
    if where is not None:
        emb = emb.filter(where)
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    scored = (
        v.withColumn("__q", _query_lit(query_vec))
        .withColumn("cos", F.round(cosine_expr("v", "__q"), 4))
        .drop("__q", "v")
    )
    if min_sim is not None:
        scored = scored.filter(F.col("cos") >= float(min_sim))
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket int, v array<double>) — sign-pattern LSH bucket per
    vector, one Arrow pass (numpy matmul per batch)."""
    P = planes

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(P.shape[0])).astype(np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            signs = (M @ P.T) > 0
            bucket = (signs @ weights).astype(np.int32)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "bucket": bucket, "v": list(M)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, bucket int, v array<double>"
    )


def query_buckets(query_vec: list[float], planes: np.ndarray, multiprobe: int = 1) -> list[int]:
    """Buckets to probe: the query's own bucket plus single-bit flips of
    the ``multiprobe`` hyperplanes with smallest |margin| (the standard
    multiprobe heuristic — the nearly-tied planes are the likely misses)."""
    q = np.asarray(query_vec, dtype=np.float64)
    margins = planes @ q
    signs = margins > 0
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    base = int((signs @ weights))
    out = [base]
    order = np.argsort(np.abs(margins))
    for i in order[:multiprobe]:
        out.append(base ^ int(weights[i]))
    return out


def ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    multiprobe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe LSH buckets, exact cosine inside them.

    At scale the bucketed table is precomputed once (pass ``bucketed``)
    and written partitioned by bucket so a probe is partition pruning —
    touching |probes|/2^n_planes of the data."""
    if planes is None:
        dim = len(query_vec)
        planes = hyperplane_planes(dim, n_planes, seed)
    if bucketed is None:
        bucketed = hyperplane_buckets(emb, planes, id_col, vec_col)
    probes = query_buckets(query_vec, planes, multiprobe)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    scored = (
        cand.withColumn("__q", _query_lit(query_vec))
        .withColumn("cos", F.round(cosine_expr("v", "__q"), 4))
        .select(id_col, "cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + cell-probe search
# ---------------------------------------------------------------------------


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 8,
    sample_rows: int = 20_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train a spherical-k-means coarse quantizer on a bounded sample.

    The sample (≤ ``sample_rows``, deterministic seeded Bernoulli + limit)
    is collected to the driver and clustered in numpy — training cost is
    O(sample) regardless of corpus size; only the (n_cells × dim) centroid
    matrix ships back to executors. Vectors are L2-normalized so cosine
    similarity == dot product (spherical k-means); empty cells respawn on
    the farthest-from-assigned-centroid points (standard repair)."""
    frac_df = emb.select(F.col(vec_col).cast("array<double>").alias("v"))
    n = frac_df.limit(sample_rows * 4).count()
    if n > sample_rows:
        frac_df = frac_df.sample(fraction=min(1.0, sample_rows / n * 1.2), seed=seed)
    rows = frac_df.limit(sample_rows).collect()
    if not rows:
        raise ValueError("ivf_centroids: input embedding table is empty")
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_cells, len(M)), replace=False)].copy()
    for _ in range(iters):
        sim = M @ C.T
        assign = np.argmax(sim, axis=1)
        # worst-assigned points, masked as they're consumed, so multiple
        # empty cells in one iteration respawn on DISTINCT points instead
        # of all cloning the same farthest vector
        own_sim = sim[np.arange(len(M)), assign].copy()
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                mean = members.mean(axis=0)
                C[c] = mean / max(np.linalg.norm(mean), 1e-12)
            else:
                worst = int(np.argmin(own_sim))
                C[c] = M[worst]
                own_sim[worst] = np.inf
    return C


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell int, v array<double>) — nearest-centroid cell per vector,
    one Arrow pass (numpy matmul per batch). At scale this table is
    written once, partitioned by ``cell``, so probes are partition
    pruning (same layout contract as the postings term_bucket dirs)."""
    C = centroids

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Mn @ C.T, axis=1).astype(np.int32)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "cell": cell, "v": list(M)})

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, cell int, v array<double>"
    )


def write_ivf_table(
    emb: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: vectors partitioned by ``cell`` dirs —
    the same partition-pruning contract as the postings ``term_bucket``
    dirs. Built once; every query then reads n_probe/n_cells of the files.
    Centroids are persisted alongside so queries need no retraining."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)
    np.save(f"{path}/_centroids.npy", centroids)


def ivf_topk_from_table(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k against a written cell-partitioned table: probe selection
    is driver-side math on the stored centroids; the scan reads only the
    probed cell directories (partition pruning — verified by plan audit)."""
    centroids = np.load(f"{path}/_centroids.npy")
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(centroids @ qn))[:n_probe]]
    assigned = spark.read.option("basePath", path).parquet(path)
    cand = assigned.filter(F.col("cell").isin(probes))
    scored = (
        cand.withColumn("__q", _query_lit(query_vec))
        .withColumn("cos", F.round(cosine_expr("v", "__q"), 4))
        .select(id_col, "cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells, exact
    cosine re-rank inside them. Scans n_probe/n_cells of the corpus."""
    if centroids is None:
        centroids = ivf_centroids(emb, n_cells=n_cells, seed=seed, vec_col=vec_col)
    if assigned is None:
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(centroids @ qn))[:n_probe]]
    cand = assigned.filter(F.col("cell").isin(probes))
    scored = (
        cand.withColumn("__q", _query_lit(query_vec))
        .withColumn("cos", F.round(cosine_expr("v", "__q"), 4))
        .select(id_col, "cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 10,
    sample_rows: int = 20_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace k-means codebooks → (m, ksub, dim/m) array.

    PQ splits each (L2-normalized) vector into ``m`` subvectors and
    vector-quantizes each subspace independently with ``ksub`` centroids;
    a vector then stores m small codes (m·log2(ksub) bits) instead of dim
    floats — the standard memory-bound ANN representation (FAISS IVFPQ's
    fine quantizer). Training mirrors :func:`ivf_centroids`: bounded
    deterministic driver sample, numpy Lloyd iterations, empty-cell
    respawn on worst-fit points; only the (m × ksub × dsub) codebook
    array ships to executors.
    """
    frac_df = emb.select(F.col(vec_col).cast("array<double>").alias("v"))
    n = frac_df.limit(sample_rows * 4).count()
    if n > sample_rows:
        frac_df = frac_df.sample(fraction=min(1.0, sample_rows / n * 1.2), seed=seed)
    rows = frac_df.limit(sample_rows).collect()
    if not rows:
        raise ValueError("pq_codebooks: input embedding table is empty")
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    dim = M.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = M[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            own = d2[np.arange(len(S)), assign].copy()
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
                else:
                    worst = int(np.argmax(own))
                    C[c] = S[worst]
                    own[worst] = -np.inf
        books.append(C)
    return np.stack(books)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<int>) — per-subspace nearest-centroid codes, one
    Arrow pass (numpy distance argmin per batch). At 10^11 vectors this
    table is the only thing a query scans: m ints per vector instead of
    dim floats (~32x smaller at m=4, dim=32, float32)."""
    B = codebooks
    m, _ksub, dsub = B.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(M), m), dtype=np.int32)
            for j in range(m):
                S = M[:, j * dsub : (j + 1) * dsub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "code": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, code array<int>"
    )


def pq_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    emb: DataFrame | None = None,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (FAISS ADC).

    The query builds an (m × ksub) lookup table of subspace dot products
    driver-side; each vector's approximate cosine is then m table lookups
    + a sum — the scan never touches the original vectors. With
    ``rerank > 0`` the ADC top-``rerank`` candidates (collected: ≤ rerank
    ids) are exactly re-scored against ``emb`` via an In-filter scan —
    compressed-domain recall, exact final ordering.
    Returns (id, score) in BOTH modes — ADC approximate cosine without
    rerank, exact (4-dp rounded) cosine with it — so callers can toggle
    rerank without a schema change.
    """
    B = codebooks
    m, ksub, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    lut = np.stack(
        [B[j] @ qn[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, ksub)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["code"].map(np.asarray).to_numpy())
            score = lut[np.arange(m)[None, :], C].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": score})

    approx = (
        codes.select(id_col, "code")
        .mapInPandas(adc, schema=f"{id_col} long, score double")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    if not rerank:
        return approx.limit(k)
    if emb is None:
        raise ValueError("rerank needs the original embedding table")
    cand = [int(r[id_col]) for r in approx.limit(rerank).collect()]
    exact = emb.filter(F.col(id_col).isin(cand))
    return cosine_topk(exact, query_vec, k=k, id_col=id_col, vec_col=vec_col).select(
        id_col, F.col("cos").alias("score")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (ES's default kNN vector compression)
# ---------------------------------------------------------------------------


def sq_params(
    emb: DataFrame,
    lo_q: float = 0.001,
    hi_q: float = 0.999,
    vec_col: str = "embedding",
) -> tuple[float, float]:
    """(lo, hi) component-value bounds for int8 scalar quantization,
    estimated as distributed quantiles over the L2-normalized corpus —
    the analog of ES's per-segment ``confidence_interval`` for
    ``int8`` quantized dense_vector indexes. One exploded scan with an
    approximate-quantile sketch; only two scalars come back."""
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x)
    )
    comp = emb.select(
        F.explode(
            F.transform(vec_col, lambda x: x / F.greatest(norm, F.lit(1e-12)))
        ).alias("c")
    )
    row = comp.agg(
        F.percentile_approx("c", lo_q, 100_000).alias("lo"),
        F.percentile_approx("c", hi_q, 100_000).alias("hi"),
    ).collect()[0]
    if row.lo is None:
        raise ValueError("sq_params: input embedding table is empty")
    return float(row.lo), float(row.hi)


def sq_encode(
    emb: DataFrame,
    lo: float,
    hi: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<tinyint>) — each L2-normalized component mapped to
    one of 256 levels over [lo, hi]: b = clip(round((x − lo)/Δ), 0, 255),
    stored shifted to signed tinyint (b − 128). Pure Catalyst expressions
    (normalize → quantize per element), no Python in the pass; the code
    table is 4× smaller than float32 vectors and is the only thing a
    query scans."""
    if not hi > lo:
        raise ValueError(f"sq_encode: need hi > lo, got [{lo}, {hi}]")
    delta = (float(hi) - float(lo)) / 255.0
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    code = F.transform(
        vec_col,
        lambda x: (
            F.greatest(
                F.lit(0.0),
                F.least(F.lit(255.0), F.round((x / F.greatest(norm, F.lit(1e-12)) - lo) / delta)),
            )
            - 128.0
        ).cast("tinyint"),
    )
    return emb.select(F.col(id_col), code.alias("code"))


def sq_topk(
    codes: DataFrame,
    query_vec: list[float],
    lo: float,
    hi: float,
    k: int = 10,
    emb: DataFrame | None = None,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8 scalar-quantized codes — the
    query path of an ES ``int8``-quantized kNN index. Each stored
    component is decoded as lo + Δ·(b+128) inside a JVM zip_with/aggregate
    dot product with the normalized query — whole-stage codegen over the
    compact code table, no Python, no shuffle (TakeOrdered).

    With ``rerank > 0`` the approximate top-``rerank`` ids are exactly
    re-scored against ``emb`` (4-dp rounded cosine), mirroring pq_topk's
    contract: rerank = corpus size reproduces cosine_topk exactly.
    Returns (id, score) in both modes."""
    delta = (float(hi) - float(lo)) / 255.0
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    qlit = F.array(*[F.lit(float(x)) for x in qn])
    decoded = F.zip_with(
        "code", qlit, lambda b, qx: qx * (lo + delta * (b.cast("double") + 128.0))
    )
    score = F.aggregate(decoded, F.lit(0.0), lambda a, x: a + x)
    approx = (
        codes.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    if not rerank:
        return approx.limit(k)
    if emb is None:
        raise ValueError("rerank needs the original embedding table")
    cand = [int(r[id_col]) for r in approx.limit(rerank).collect()]
    exact = emb.filter(F.col(id_col).isin(cand))
    return cosine_topk(exact, query_vec, k=k, id_col=id_col, vec_col=vec_col).select(
        id_col, F.col("cos").alias("score")
    )


def bbq_centroid(
    emb: DataFrame, vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension mean of the L2-normalized corpus — the centering
    vector binary quantization thresholds against (ES BBQ quantizes
    residuals around the centroid; the sign-of-centered-component is the
    1-bit version of that idea). One aggregate, dim floats back."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(vec_col, lambda x: x / F.greatest(norm, F.lit(1e-12)))
    # posexplode → per-dimension partial avg: map-side combined, never a
    # whole-corpus array in one aggregation buffer
    rows = (
        emb.select(F.posexplode(unit).alias("d", "x"))
        .groupBy("d")
        .agg(F.avg("x").alias("m"))
        .orderBy("d")
        .collect()
    )
    return [float(r["m"]) for r in rows]


def bbq_encode(
    emb: DataFrame,
    centroid: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bits array<long>) — 1-bit binary quantization (the BBQ idea
    at its simplest honest form): each L2-normalized component keeps only
    sign(x − centroid_d), packed 64 dims per long JVM-side. 32× smaller
    than float32; the bit table is the only thing the approximate query
    phase scans. Pure Catalyst expressions (normalize → center → sign →
    shift/or-fold), no Python in the pass. The or-fold emits one
    conditional per dimension; past ~2k dims Spark falls back from
    whole-stage codegen to interpreted projection (still JVM, still
    columnar) — at embedding dims in common use (≤1536) it stays fused."""
    dim = len(centroid)
    n_words = (dim + 63) // 64
    c = F.array(*[F.lit(float(v)) for v in centroid])
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.zip_with(
        F.col(vec_col),
        c,
        lambda x, m: x / F.greatest(norm, F.lit(1e-12)) - m,
    )
    def word(w: int) -> F.Column:
        # OR-fold of literal bit values (bit positions are static, so the
        # shift amounts are compile-time constants; bit 63 wraps to the
        # signed long's sign bit)
        out = F.lit(0).cast("long")
        for i in range(min(64, dim - w * 64)):
            val = 1 << i
            if val >= 1 << 63:
                val -= 1 << 64
            out = out.bitwiseOR(
                F.when(
                    F.element_at(F.col("_u"), w * 64 + i + 1) > 0,
                    F.lit(val).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
        return out
    return (
        emb.withColumn("_u", unit)
        .select(
            id_col,
            F.array(*[word(w) for w in range(n_words)]).alias("bits"),
        )
    )


def _bbq_query_bits(query_vec: list[float], centroid: list[float]) -> list[int]:
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    u = q - np.asarray(centroid, dtype=np.float64)
    dim = len(centroid)
    words = []
    for w in range((dim + 63) // 64):
        acc = 0
        for i in range(min(64, dim - w * 64)):
            if u[w * 64 + i] > 0:
                acc |= 1 << i
        # to signed 64-bit (Spark longs)
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words


def bbq_topk(
    bits: DataFrame,
    query_vec: list[float],
    centroid: list[float],
    k: int = 10,
    emb: DataFrame | None = None,
    rerank: int = 0,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over 1-bit codes: rank by Hamming
    distance between the query's centered sign bits and each stored code
    — per word one xor + bit_count, whole-stage codegen over the 32×-
    compressed table, TakeOrdered, no shuffle.

    With ``rerank > 0`` the approximate top-``rerank`` shortlist is
    exactly re-scored against ``emb`` (4-dp rounded cosine), the same
    contract as pq_topk/sq_topk: rerank = corpus size reproduces
    cosine_topk exactly. 1-bit codes order poorly WITHIN tight clusters,
    so the honest production path is always shortlist + rerank.
    Returns (id, hamming) approximate or (id, score) reranked."""
    qb = _bbq_query_bits(query_vec, centroid)
    qcol = F.array(*[F.lit(int(w)).cast("long") for w in qb])
    ham = F.aggregate(
        F.zip_with(F.col("bits"), qcol, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    approx = (
        bits.select(id_col, ham.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
    )
    if rerank <= 0:
        return approx.limit(int(k))
    if emb is None:
        raise ValueError("bbq_topk: rerank needs the raw embedding table")
    cand = [int(r[id_col]) for r in approx.limit(int(rerank)).collect()]
    exact = emb.filter(F.col(id_col).isin(cand))
    return cosine_topk(exact, query_vec, k=k, id_col=id_col).select(
        id_col, F.col("cos").alias("score")
    )
