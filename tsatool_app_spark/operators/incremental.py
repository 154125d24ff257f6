"""Incremental aggregate maintenance: mergeable partial aggregates.

At 100 TB you never re-aggregate the world because a day of data arrived;
you keep per-partition PARTIAL aggregates (count / decimal sum / min / max)
and fold new deltas in. This is the continuous-aggregate idea the
reference's TimescaleDB backend ships as `CREATE MATERIALIZED VIEW ...
WITH (timescaledb.continuous)` (the reference app itself recomputes; see
SURVEY.md §2.4) — here it is an explicit, engine-portable operator pair:

- :func:`partial_aggregate` reduces a (possibly huge) slice to one row per
  key: one hash aggregate, map-side combined, shuffle carries only
  (key, 4 numbers).
- :func:`merge_partials` unions any number of partial snapshots and folds
  them: count adds, DECIMAL sums add (order-independent — this is why the
  partial keeps DECIMAL, not DOUBLE), min/max fold. Cost is proportional
  to the number of PARTIAL rows (keys × snapshots), never the raw data.
- :func:`finalize_aggregate` renders user-facing columns (DOUBLE sum,
  exact mean) — the only place precision is narrowed.

Associativity note: every statistic kept is a commutative monoid, so any
split of the input (daily deltas, backfills, out-of-order chunks) folds to
bit-identical results — asserted against a full recompute by both the unit
tests and the DuckDB oracle of the `incremental_rollup` driver query.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    moments_scale: int | None = None,
) -> DataFrame:
    """Reduce a slice to mergeable per-key partials:
    (keys..., p_count, p_sum [decimal], p_min, p_max).

    With ``moments_scale`` set, also keeps exact power sums p_s1..p_s4
    of q = floor(value·scale) — the mergeable summary behind
    incrementally-maintained variance/skewness/kurtosis (see
    functions/stats.power_sums for the int64 batch form).  The powers
    accumulate in DECIMAL, not int64: q⁴ overflows a long already at
    |q| ≈ 55 000 (i.e. |value| ≈ 55 at scale 1000 — found by a test
    outlier of 99.0), while decimal(8,0)→(35,0) powers stay exact for
    any |q| < 10⁸ and sum without order dependence.  Contract:
    |value|·scale must stay below 10⁸ (ANSI mode raises rather than
    silently wrapping if it doesn't).  Like every other partial these
    are plain sums, so the monoid property (batch-boundary
    independence) is preserved."""
    aggs = [
        F.count(F.lit(1)).alias("p_count"),
        F.sum(F.col(value_col).cast("decimal(20,6)")).alias("p_sum"),
        F.min(value_col).alias("p_min"),
        F.max(value_col).alias("p_max"),
    ]
    if moments_scale is not None:
        q = (
            F.floor(F.col(value_col).cast("double") * moments_scale)
            .cast("long")
            .cast("decimal(8,0)")
        )
        p = q
        for k in range(1, 5):
            aggs.append(F.sum(p).alias(f"p_s{k}"))
            p = p * q
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Fold partial snapshots (same schema) into one: counts, sums, and
    power sums add; extrema fold. Generic over whichever p_* columns the
    snapshot carries (each summed column is cast back to its stored type
    so repeated merges don't widen decimals round-over-round). Input rows
    ≈ keys × snapshots — tiny next to the raw data they summarize."""
    unioned = reduce(DataFrame.unionByName, parts)
    keys = [c for c in unioned.columns if not c.startswith("p_")]
    dtypes = dict(unioned.dtypes)
    aggs = []
    for c in unioned.columns:
        if c in keys:
            continue
        if c == "p_min":
            aggs.append(F.min(c).alias(c))
        elif c == "p_max":
            aggs.append(F.max(c).alias(c))
        else:
            aggs.append(F.sum(c).cast(dtypes[c]).alias(c))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_aggregate(partials: DataFrame) -> DataFrame:
    """User-facing view of a partial snapshot: DOUBLE sum and exact mean
    (decimal total / count — identical in any engine). When the snapshot
    carries moment partials (p_s1..p_s4), also derives population
    variance / skewness / excess kurtosis — float math only here, at the
    one-row-per-key edge, de-quantized from the exact integer sums."""
    keys = [c for c in partials.columns if not c.startswith("p_")]
    out = [
        *keys,
        F.col("p_count").cast("long").alias("n"),
        F.col("p_sum").cast("double").alias("sum_val"),
        F.col("p_min").alias("min_val"),
        F.col("p_max").alias("max_val"),
        (F.col("p_sum").cast("double") / F.col("p_count")).alias("avg_val"),
    ]
    if "p_s2" in partials.columns:
        n = F.col("p_count").cast("double")
        m1 = F.col("p_s1") / n
        r2 = F.col("p_s2") / n
        r3 = F.col("p_s3") / n
        r4 = F.col("p_s4") / n
        m2 = r2 - m1 * m1
        m3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
        m4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
        # quantized-unit moments; variance scales by scale², but skew and
        # kurtosis are scale-free ratios, so no de-quantization needed.
        out.extend(
            [
                m2.alias("var_q"),
                F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5))).alias("skewness"),
                F.when(m2 > 0, m4 / (m2 * m2) - 3.0).alias("kurtosis_excess"),
            ]
        )
    return partials.select(*out)


def join_view_delta(
    a_old: DataFrame | None,
    a_delta: DataFrame | None,
    b_old: DataFrame | None,
    b_delta: DataFrame | None,
    on: list[str],
) -> DataFrame | None:
    """Delta rule for incremental JOIN-view maintenance:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    — the rows the materialized inner-join view gains when insert-only
    deltas ΔA/ΔB arrive.  Each term joins a DELTA against a snapshot (or
    the other delta), so maintenance cost is driven by |Δ|, never
    |A|·|B| — the reason warehouses maintain join views instead of
    recomputing them.  Insert-only semantics (append streams); deletes
    need counted multisets, deliberately out of scope here.

    Returns None when both deltas are empty/None."""
    terms = []
    if a_delta is not None and b_old is not None:
        terms.append(a_delta.join(b_old, on))
    if b_delta is not None and a_old is not None:
        terms.append(a_old.join(b_delta, on))
    if a_delta is not None and b_delta is not None:
        terms.append(a_delta.join(b_delta, on))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def maintain_join_view(
    view_old: DataFrame | None,
    a_old: DataFrame | None,
    a_delta: DataFrame | None,
    b_old: DataFrame | None,
    b_delta: DataFrame | None,
    on: list[str],
) -> DataFrame:
    """Fold one maintenance step: the updated materialized view
    ``view_old ∪ Δ(A ⋈ B)``.  Callers persist the result (and the updated
    base snapshots) through the snapshot store; the
    two-batch-equals-recompute property is pinned in tests."""
    delta = join_view_delta(a_old, a_delta, b_old, b_delta, on)
    if view_old is None:
        return delta
    if delta is None:
        return view_old
    return view_old.unionByName(delta)
