"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine/dot top-k — a single scan with a broadcast
query vector, JVM-side fold (F.aggregate/zip_with), no UDF.
Scale path: random-hyperplane LSH bucketing — signatures computed via a
broadcast plane matrix, candidates from bucket equi-joins, exact rerank on
the (small) candidate set. At 100 TB the brute force is one full scan per
query; LSH turns it into a bucket lookup.

Quantized integer dot product (:func:`quantized_dot`) exists for exact
cross-engine correctness checks: float accumulation order is engine-
dependent, int64 arithmetic is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def quantized_dot(a: Column, b: Column, scale: int = 1000) -> Column:
    """Integer dot product of floor(x*scale) quantized vectors.

    Exact int64 arithmetic — order-independent and engine-portable, unlike
    float sums; this is the oracle-checkable similarity (and mirrors int8
    quantization used by real ANN systems)."""
    qa = F.transform(a, lambda x: F.floor(x.cast("double") * scale))
    qb = F.transform(b, lambda x: F.floor(x.cast("double") * scale))
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, x: s + x
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k against a literal query vector.

    The query vector becomes a literal array (broadcast with the plan); the
    scan computes one double per row JVM-side; top-k is a total orderBy+limit
    which Spark executes as per-partition top-k + single merge (TakeOrdered)
    — no full sort shuffle."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = (
        cosine_similarity_col(F.col(vec_col), q)
        if metric == "cosine"
        else _dot(F.col(vec_col), q)
    )
    return (
        embeddings.select(id_col, sim.alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def rhp_signatures(
    embeddings: DataFrame,
    *,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) signatures.

    Plane weights are deterministic pseudo-randoms derived from (plane, dim)
    via a splitmix-style integer mix — generated as a literal array matrix on
    the driver (n_planes × dim doubles; tiny) and broadcast in the plan, so
    signature computation is a single narrow projection, no join."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig_bits = [
        (
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(w)) for w in planes[p]]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        for p in range(n_planes)
    ]
    sig = sum((b * (2 ** p) for p, b in enumerate(sig_bits)), F.lit(0))
    return embeddings.select(id_col, vec_col, sig.alias("rhp_sig"))


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    n_planes: int = 16,
    band_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band with the query, then
    exact cosine rerank on candidates only.

    Bands of ``band_bits`` bits each → a vector is a candidate if ANY band
    matches the query's (classic OR-amplification). The candidate filter is
    a literal IN-list comparison per band (no join, no shuffle); rerank cost
    is |candidates|, not |corpus|."""
    import numpy as np

    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qsig = 0
    for p in range(n_planes):
        if float(np.dot(planes[p], np.asarray(query_vec, dtype=float))) > 0:
            qsig |= 1 << p

    signed = rhp_signatures(
        embeddings, dim=dim, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col
    )
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1
    band_match = None
    for b in range(n_bands):
        qband = (qsig >> (b * band_bits)) & mask
        cond = (
            F.shiftright(F.col("rhp_sig"), b * band_bits).bitwiseAND(F.lit(mask))
            == F.lit(qband)
        )
        band_match = cond if band_match is None else (band_match | cond)

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        signed.where(band_match)
        .select(id_col, cosine_similarity_col(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
