"""Statistical analysis operators: contingency tables with chi-square
contributions and two-proportion z-tests.

Dataset-diagnostics staples (is `lang` independent of `source`? did cohort
A convert better than cohort B?) expressed as exact-integer aggregation
followed by float expressions written identically in the oracle:

- counts are integers (one hash aggregate), so every float input is
  bit-identical across engines;
- the float math is PER ROW (cell contributions, one z statistic) — there
  is deliberately NO float SUM anywhere, because a parallel float sum is
  association-order-dependent and breaks cross-engine equality. Callers
  who want the total chi-square sum the (few) cells client-side or accept
  a rounded comparison.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency_chi2_cells(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Contingency table with expected counts and per-cell chi-square
    contributions: (row, col, observed, expected, contrib) where
    ``expected = row_total · col_total / n`` and
    ``contrib = (observed − expected)² / expected``.

    Plan: one cell aggregate on the pair, then the marginals derive from
    the CELLS (tiny relation — two more aggregates over cells, not over
    the data) and broadcast-join back. The big table is read and shuffled
    once.
    """
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("observed"))
    row_tot = cells.groupBy("r").agg(F.sum("observed").alias("row_total"))
    col_tot = cells.groupBy("c").agg(F.sum("observed").alias("col_total"))
    n = cells.agg(F.sum("observed").alias("n"))
    joined = (
        cells.join(F.broadcast(row_tot), "r")
        .join(F.broadcast(col_tot), "c")
        .crossJoin(F.broadcast(n))
    )
    expected = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("n").cast("double")
    )
    contrib = (
        (F.col("observed").cast("double") - expected)
        * (F.col("observed").cast("double") - expected)
        / expected
    )
    return joined.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        F.col("observed").cast("long").alias("observed"),
        expected.alias("expected"),
        contrib.alias("contrib"),
    )


def two_proportion_ztest(
    df: DataFrame,
    cohort_pred,
    success_pred,
) -> DataFrame:
    """Two-proportion z-test from integer counts: one aggregate computes
    (n1, x1, n2, x2) via conditional counts, then the z statistic

        z = (p1 − p2) / sqrt(p̂(1−p̂)(1/n1 + 1/n2))

    is a single float expression of exact integers — bit-identical in any
    engine. Returns one row: counts, rates, and z.
    """
    counts = df.agg(
        F.count(F.when(cohort_pred, F.lit(1))).alias("n1"),
        F.count(F.when(cohort_pred & success_pred, F.lit(1))).alias("x1"),
        F.count(F.when(~cohort_pred, F.lit(1))).alias("n2"),
        F.count(F.when((~cohort_pred) & success_pred, F.lit(1))).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pooled = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return counts.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("x1").cast("long").alias("x1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("x2").cast("long").alias("x2"),
        p1.alias("rate1"),
        p2.alias("rate2"),
        ((p1 - p2) / se).alias("z"),
    )


def corr_components(
    df: DataFrame, cols: Sequence[str], *, precision: str = "decimal(18,2)"
) -> DataFrame:
    """Exact single-pass correlation/covariance building blocks for every
    column pair: (x_col, y_col, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy).

    Sums are DECIMAL (order-independent, engine-exact) — the float-free
    part of Pearson's r; callers derive r = (n·Σxy − Σx·Σy) /
    sqrt(n·Σxx − Σx²) / sqrt(n·Σyy − Σy²) driver-side or in a final
    select. The scan is ONE pass producing all pairs' moments at once
    (one partial-aggregate, no shuffle beyond the single-row merge), which
    is how a correlation matrix over 100 TB must run — never one job per
    pair."""
    d = {c: F.col(c).cast(precision) for c in cols}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i:]]
    for x, y in pairs:
        aggs.append(F.sum(d[x] * d[y]).alias(f"p_{x}_{y}"))
    wide = df.agg(*aggs)
    out_rows = F.array(*[
        F.struct(
            F.lit(x).alias("x_col"),
            F.lit(y).alias("y_col"),
            F.col("n").cast("long").alias("n"),
            F.col(f"s_{x}").cast("double").alias("sum_x"),
            F.col(f"s_{y}").cast("double").alias("sum_y"),
            F.col(f"p_{x}_{x}").cast("double").alias("sum_xx"),
            F.col(f"p_{y}_{y}").cast("double").alias("sum_yy"),
            F.col(f"p_{x}_{y}").cast("double").alias("sum_xy"),
        )
        for x, y in pairs
    ])
    return (
        wide.select(F.explode(out_rows).alias("r"))
        .select("r.*")
        .orderBy("x_col", "y_col")
    )


def pearson_r(components: DataFrame) -> DataFrame:
    """Derive Pearson's r from corr_components output (float at the very
    edge only)."""
    num = F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    dx = F.sqrt(F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x"))
    dy = F.sqrt(F.col("n") * F.col("sum_yy") - F.col("sum_y") * F.col("sum_y"))
    return components.select(
        "x_col", "y_col", (num / (dx * dy)).alias("r")
    )


def power_sums(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    *,
    max_power: int = 4,
) -> DataFrame:
    """Exact integer power sums Σx, Σx², … Σx^k (+ count) per group — the
    mergeable summary behind mean/variance/skewness/kurtosis.

    The value is cast to BIGINT (callers pre-scale fractional inputs), so
    every sum is exact int64 arithmetic: order-independent, mergeable
    across partitions/batches/days by simple addition, and engine-portable
    — the same reasons the correlation moments (corr_components) avoid
    float sums.  Range contract: |x|^max_power · n must stay inside int64
    (|x| ≲ 55 000 for the default 4th power; ANSI mode raises on
    violation rather than wrapping) — for wide-ranging values use the
    DECIMAL-accumulated variant in operators/incremental.partial_aggregate. ONE map-side-combined hash aggregate; the shuffle carries
    |groups| × (k+1) longs."""
    x = F.col(value_col).cast("long")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    p = x
    for k in range(1, max_power + 1):
        aggs.append(F.sum(p).cast("long").alias(f"s{k}"))
        p = p * x
    out = df.groupBy(*by).agg(*aggs)
    return out.orderBy(*by) if by else out


def moments_from_sums(n: int, s1: int, s2: int, s3: int = 0, s4: int = 0):
    """Derive (mean, variance, skewness, excess kurtosis) from exact power
    sums — the driver-side edge step after :func:`power_sums` (population
    moments; float math happens only here, on one row per group)."""
    n = float(n)
    mean = s1 / n
    m2 = s2 / n - mean**2
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean**3
    m4 = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean**2 * (s2 / n)
        - 3 * mean**4
    )
    var = m2
    skew = m3 / m2**1.5 if m2 > 0 else float("nan")
    kurt = m4 / m2**2 - 3.0 if m2 > 0 else float("nan")
    return mean, var, skew, kurt
