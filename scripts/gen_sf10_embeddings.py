#!/usr/bin/env python
"""Generate the sf10 EMBEDDINGS spot-tier for the ANN-family scale
rehearsal (r6 VERDICT next-round #5): 100x the sf0.1 corpus (200k
vectors, dim 64) with PLANTED neighbor structure whose true near-dup
pair set is exactly known — the embedding twin of gen_sf10_docs.py.

Construction (from /root/testdata/sf0.1/embeddings.parquet, 2k vectors):

- 100 replicas r = 0..99 of every base id, vec_id' = base + r*10_000_000,
  partitioned into 10 GROUPS of 10 (g = r // 10) — same id arithmetic as
  the docs tier, so the rehearsal derives truth from vec_id alone.
- Each (base, g) gets one DIRECTION: the natural sf0.1 embedding for
  g = 0, a deterministic seeded Gaussian for g >= 1 (fresh directions,
  NOT perturbations — in dim 64 random directions concentrate near
  cosine 0, so cross-group pairs sit far below any near-dup threshold).
- The 10 members of a group are positive SCALINGS of its direction
  (1 + (j+1)/1000): cosine within a group is exactly 1 in real
  arithmetic (float32 storage perturbs it by < 1e-6), every random-
  hyperplane sign and k-means argmin is preserved, and — the r6
  planted-tie lesson (SCALING.md "r6 full sf1 value certification") —
  NO two rows in the tier are byte-identical, so no construction
  downstream can trip over engine-specific exact-tie ordering.

PREMISE VERIFIED, NOT ASSUMED: ground truth "near-dup pairs (cosine >=
0.9) == exactly the within-group pairs" requires every cross-direction
cosine < 0.9 with margin.  The generator computes the FULL 20k x 20k
direction cosine matrix (blocked float64 BLAS, exact at this scale) and
asserts max off-diagonal |cosine| < 0.85; the measured max is printed
and recorded in SCALING.md.  This is the embedding analogue of the docs
tier's three-attempts filler story — the claim is checked against every
pair, not argued from concentration bounds.

Output: /root/repo/.scratch/sf10emb/embeddings.parquet (gitignored).
Usage: PYTHONPATH=/root/repo python scripts/gen_sf10_embeddings.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
DST = "/root/repo/.scratch/sf10emb"
N_GROUPS = 10
GROUP_SIZE = 10
MAX_NAT_COS = 0.85


def directions(base_ids: np.ndarray, base_vecs: np.ndarray) -> np.ndarray:
    """(n_base * N_GROUPS, dim) float32 direction matrix, group-major:
    row i*N_GROUPS+g is (base i, group g)."""
    n, dim = base_vecs.shape
    out = np.empty((n * N_GROUPS, dim), dtype=np.float32)
    for i in range(n):
        out[i * N_GROUPS] = base_vecs[i]
        for g in range(1, N_GROUPS):
            # Philox-seeded per (base, g): deterministic, order-free.
            rng = np.random.default_rng(
                np.random.SeedSequence([int(base_ids[i]), g, 0x5F10])
            )
            out[i * N_GROUPS + g] = rng.standard_normal(dim).astype(np.float32)
    return out


def max_offdiag_cosine(dirs: np.ndarray, block: int = 4096) -> float:
    """Exact max |cosine| over all direction pairs, blocked float64."""
    d = dirs.astype(np.float64)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    worst = -1.0
    for i0 in range(0, len(d), block):
        gram = d[i0 : i0 + block] @ d.T
        for r in range(gram.shape[0]):
            gram[r, i0 + r] = 0.0  # mask self
        worst = max(worst, float(np.abs(gram).max()))
    return worst


def main() -> None:
    t = pq.read_table(SRC)
    base_ids = np.asarray(t["vec_id"], dtype=np.int64)
    base_vecs = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()]
    )
    labels = np.asarray(t["label"], dtype=np.int32)
    n, dim = base_vecs.shape
    print(f"base: {n} vectors, dim {dim}")

    dirs = directions(base_ids, base_vecs)
    worst = max_offdiag_cosine(dirs)
    print(f"max off-diagonal |cosine| over {len(dirs)} directions: {worst:.4f}")
    assert worst < MAX_NAT_COS, (
        f"cross-direction cosine {worst} >= {MAX_NAT_COS}: planted truth "
        "would not be exact — regenerate with a different seed constant"
    )

    # Expand: group member j gets scale 1 + (j+1)/1000.
    scales = 1.0 + (np.arange(1, GROUP_SIZE + 1, dtype=np.float32)) / 1000.0
    n_rows = n * N_GROUPS * GROUP_SIZE
    vecs = np.empty((n_rows, dim), dtype=np.float32)
    ids = np.empty(n_rows, dtype=np.int64)
    labs = np.empty(n_rows, dtype=np.int32)
    row = 0
    for i in range(n):
        for g in range(N_GROUPS):
            d = dirs[i * N_GROUPS + g]
            for j in range(GROUP_SIZE):
                vecs[row] = d * scales[j]
                ids[row] = base_ids[i] + (g * GROUP_SIZE + j) * 10_000_000
                labs[row] = labels[i]
                row += 1

    os.makedirs(DST, exist_ok=True)
    out = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labs, type=pa.int32()),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet")
    check = pq.read_metadata(f"{DST}/embeddings.parquet")
    print(f"wrote {check.num_rows} vectors to {DST}/embeddings.parquet "
          f"(max natural cosine {worst:.4f})")


if __name__ == "__main__":
    main()
