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
) -> DataFrame:
    """Reduce a slice to mergeable per-key partials:
    (keys..., p_count, p_sum [decimal], p_min, p_max)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(F.col(value_col).cast("decimal(20,6)")).alias("p_sum"),
        F.min(value_col).alias("p_min"),
        F.max(value_col).alias("p_max"),
    )


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Fold partial snapshots (same schema) into one: counts and decimal
    sums add, extrema fold. Input rows ≈ keys × snapshots — tiny next to
    the raw data they summarize."""
    unioned = reduce(DataFrame.unionByName, parts)
    keys = [c for c in unioned.columns if not c.startswith("p_")]
    return unioned.groupBy(*keys).agg(
        F.sum("p_count").alias("p_count"),
        F.sum("p_sum").alias("p_sum"),
        F.min("p_min").alias("p_min"),
        F.max("p_max").alias("p_max"),
    )


def finalize_aggregate(partials: DataFrame) -> DataFrame:
    """User-facing view of a partial snapshot: DOUBLE sum and exact mean
    (decimal total / count — identical in any engine)."""
    keys = [c for c in partials.columns if not c.startswith("p_")]
    return partials.select(
        *keys,
        F.col("p_count").cast("long").alias("n"),
        F.col("p_sum").cast("double").alias("sum_val"),
        F.col("p_min").alias("min_val"),
        F.col("p_max").alias("max_val"),
        (F.col("p_sum").cast("double") / F.col("p_count")).alias("avg_val"),
    )
