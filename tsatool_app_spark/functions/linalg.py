"""Distributed linear algebra over embedding columns.

The workhorse is the Gram / second-moment matrix G = Xᵀ X: its (d × d)
size is independent of row count, so the scalable shape is per-partition
partial Gram matrices (one BLAS matmul per Arrow batch inside
``mapInPandas``) reduced by ONE groupBy over d² keys — the shuffle carries
d²·partitions cells, never the vectors.  PCA, whitening, and linear probes
all derive from G driver-side (d × d eigendecomposition is trivial once the
distributed pass is done).

Entries are integer-quantized (floor(x·scale), int64 accumulation) so the
result is exact and engine-portable — the same determinism rule the
similarity kernels use (functions/similarity.quantized_dot).

At 100 TB: one scan, no vector shuffle; int64 partial sums overflow only
past ~9e18, i.e. ~1e10 rows at scale=1000 with unit-norm vectors — at that
volume drop scale to 100 or split the reduce into two tiers.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Upper-triangle quantized Gram matrix: (i, j, g) with
    g = Σ_rows floor(x_i·scale)·floor(x_j·scale), i ≤ j.

    mapInPandas emits ONE d×d partial per Arrow batch (numpy int64
    matmul), so the downstream groupBy reduces d²-keyed partials —
    the standard distributed Xᵀ X decomposition."""

    def _partials(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(m * scale).astype(np.int64)
            g = q.T @ q  # (d, d) int64
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "g": g[iu, ju]}
            )

    partials = emb.select(vec_col).mapInPandas(_partials, "i int, j int, g long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("g").cast("long").alias("g"))
        .orderBy("i", "j")
    )


def gram_to_numpy(gram_rows, dim: int, scale: int = 1000):
    """Reassemble collected (i, j, g) upper-triangle rows into the full
    symmetric float64 Gram matrix, de-quantized (÷ scale²)."""
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"], r["j"]] = r["g"]
        g[r["j"], r["i"]] = r["g"]
    return g / (scale * scale)


def pca_top_components(
    emb: DataFrame,
    k: int = 4,
    *,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 1000,
):
    """Top-k principal directions of the (uncentered) second-moment matrix.

    The distributed pass is :func:`gram_matrix` (one scan); the d × d
    eigendecomposition runs on the driver — the standard split for tall
    matrices.  Returns (eigenvalues desc, components (k, d)), with each
    component's sign fixed so its largest-|coord| entry is positive
    (eigenvectors are sign-ambiguous; pinning makes results comparable)."""
    import numpy as np

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rows = gram_matrix(emb, vec_col=vec_col, scale=scale).collect()
    g = gram_to_numpy(rows, dim, scale)
    vals, vecs = np.linalg.eigh(g)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for c in comps:
        pivot = np.argmax(np.abs(c))
        if c[pivot] < 0:
            c *= -1
    return vals[order], comps


def project_embeddings(
    emb: DataFrame,
    components,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the given (k, d) components — one matmul
    per Arrow batch (vectorized pandas UDF), narrow map, no shuffle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    comp = np.asarray(components, dtype=np.float64)

    def _proj(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(list((m @ comp.T).astype(np.float64)))

    proj_udf = pandas_udf(_proj, "array<double>")
    return emb.withColumn(out_col, proj_udf(F.col(vec_col)))
