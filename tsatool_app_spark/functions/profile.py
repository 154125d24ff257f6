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


def class_balance(
    df: DataFrame,
    label_col: str,
    *,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-class counts and shares plus each class's term of the Shannon
    entropy and Gini impurity — the label-skew report run before any
    training job.  Totals derive from ONE aggregate (exact integer
    counts); the float share/entropy math is per-ROW at the class-count
    edge (|classes| rows), the same no-float-SUM rule as the chi² cells,
    so every emitted value is engine-portable.  Callers sum the (few)
    per-class terms for total entropy client-side."""
    # Weighted path: SUM the raw weights first, cast the TOTAL — casting
    # each weight to long before summing would truncate fractional weights
    # (0.9 → 0) and skew every share/entropy/Gini term. Decimal accumulator
    # keeps the per-class totals engine-portable.
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        (
            F.count(F.lit(1))
            if weight_col is None
            else F.round(F.sum(F.col(weight_col).cast("decimal(28,9)")))
        )
        .cast("long")
        .alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    share = F.col("n") / F.col("total")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "label",
            "n",
            share.alias("share"),
            (-share * F.log2(share)).alias("entropy_term"),
            (share * (1 - share)).alias("gini_term"),
        )
        .orderBy("label")
    )


def table_checksum(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    *,
    null_token: str = "\x00NULL",
    sep: str = "\x1f",
) -> DataFrame:
    """Order-independent content checksum: SUM over rows of a 32-bit
    integer derived from md5 of the row's column rendering — the
    engine-portable "did the migration copy every row intact" check
    (compare the one checksum per group instead of the rows).

    Portability contract: every column is rendered to text BEFORE
    hashing, so only pass columns whose text form is engine-stable —
    integers, strings, dates, DECIMALs.  Raw DOUBLEs are not ('1.0' vs
    '1'); cast them to DECIMAL first.  NULLs render as a sentinel token
    that cannot collide with real text; a unit separator joins columns
    so ('ab','c') ≠ ('a','bc').

    One narrow projection + one aggregate; sums are exact int64 (2³²-max
    terms × row count stays far inside the 2⁶³ range up to ~2³⁰ rows per
    group — beyond that, compare per-group checksums of finer groups).
    """
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(null_token)) for c in cols
    ]
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws(sep, *rendered)), 1, 8), 16, 10
    ).cast("long")
    agg = [
        F.sum(row_hash).cast("long").alias("checksum"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    ]
    if by:
        return df.groupBy(*by).agg(*agg).orderBy(*by)
    return df.agg(*agg)
