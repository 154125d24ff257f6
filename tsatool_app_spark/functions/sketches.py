"""Approximate-cardinality sketches with exact twins.

The 100 TB pattern for COUNT(DISTINCT) rollups is NOT a giant exact
distinct (that shuffles every key) but a mergeable sketch: build one small
HLL sketch per partition/day map-side, then union sketches — the shuffle
carries kilobytes per group instead of the key universe.  Spark 4 ships
Apache DataSketches HLL natively (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`), so the whole pipeline stays JVM-side.

Evidence policy (same as the ANN variants): the approximate operator is
pytest-verified against its exact twin within the sketch's error bound;
the exact twin is the driver-visible, hash-checked query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_distinct_by_group(
    df: DataFrame, group_cols: Sequence[str], col: str
) -> DataFrame:
    """Exact per-group distinct count.  Spark plans this as a two-level
    aggregate (partial distinct per partition, then merge), so duplicate
    keys collapse map-side before the shuffle."""
    return (
        df.groupBy(*group_cols)
        .agg(F.count_distinct(F.col(col)).alias("n_distinct"))
        .orderBy(*group_cols)
    )


def hll_distinct_by_group(
    df: DataFrame, group_cols: Sequence[str], col: str, lg_k: int = 14
) -> DataFrame:
    """HLL-sketch per-group distinct estimate (DataSketches, lgConfigK=lg_k,
    relative error ~1.04/sqrt(2^lg_k) ≈ 0.8% at the default).  One
    aggregate; the shuffle carries one ≤2^lg_k-byte sketch per group."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(col), F.lit(lg_k))
            ).alias("n_distinct_est")
        )
        .orderBy(*group_cols)
    )


def hll_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    col: str,
    lg_k: int = 14,
) -> DataFrame:
    """The mergeability property end-to-end: build fine-grain sketches
    (e.g. per day), then UNION them to coarse groups (e.g. per week)
    without touching the raw data again — the continuous-aggregate shape
    for distinct counts.  Returns one row per coarse group with the
    merged estimate."""
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )
    return (
        fine.groupBy(*coarse_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
                "n_distinct_est"
            )
        )
        .orderBy(*coarse_cols)
    )
