"""Data-profiling operators: per-column statistics and value histograms.

A 100 TB ingest needs cheap table profiling (null rates, cardinalities,
ranges) before any modeling decision; the reference's equivalent surface is
the hand-run COUNT/MIN/MAX checks in its analysis notebooks (SURVEY.md §2.4
A-class). Both operators here are single-pass aggregates:

- ``table_profile`` computes every column's stats in ONE hash aggregate
  over the scan (count+min+max are plain partial aggs; the distinct counts
  use Spark's expand-based multi-distinct, which still map-side-combines
  per column before the one shuffle);
- ``fixed_width_histogram`` is floor arithmetic + groupBy on the bucket
  index — one shuffle of (bucket, partial count), output rows = nbins.

Determinism: min/max/strings are rendered with CAST(... AS STRING) on the
native type in both engines; histogram bucket edges use the same IEEE
double arithmetic expression on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: one output row per column with ``n_rows``,
    ``n_nulls``, ``n_distinct`` (exact, nulls excluded), ``min_s``/``max_s``
    (string-rendered extrema).

    One aggregate job produces a single wide row; a tiny literal explode
    (nbins = len(cols), driver-side column list, not data) reshapes it to
    long format — no second pass over the data.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Exact fixed-width histogram: bucket ``i`` covers
    ``[lo + i*w, lo + (i+1)*w)`` with ``w = (hi-lo)/nbins``; values below
    ``lo`` clamp to bucket 0, values ``>= hi`` clamp to ``nbins-1``; NULLs
    are dropped. Returns (bucket, lo_edge, n) sorted by bucket.
    """
    w = (hi - lo) / nbins
    bucket = F.floor((F.col(col) - F.lit(lo)) / F.lit(w))
    bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo_edge", (F.lit(lo) + F.col("bucket") * F.lit(w)).cast("double"))
        .select("bucket", "lo_edge", "n")
        .orderBy("bucket")
    )
