"""General interval-overlap join (the J4 operator in its general form).

The reference's only non-trivial join is ``master_ranges LEFT JOIN block ON
valid_r && valid_r`` (/root/reference/tsa/condition.py:381-391) — a theta join
on tstzrange overlap. combine_blocks rewrites the *alignment* special case
shuffle-free; this module keeps the GENERAL operator for arbitrary interval
overlap, with a scale path:

- naive: conditional join ``l.vfrom < r.vuntil AND r.vfrom < l.vuntil`` —
  Spark plans BroadcastNestedLoopJoin; fine when one side broadcasts.
- bucketed: both sides exploded onto fixed time buckets, equi-join on
  (key?, bucket) + residual overlap predicate, dedup — turns O(n·m) into a
  shuffled hash join on bucket ids (the published range-join optimization
  Databricks/Flink use; SURVEY §4 "custom rules needed: none ... bucketed
  range-join ... defer unless benchmarks demand"). At 100 TB the bucketed
  plan is the only viable one; bucket width should approximate median
  interval length to bound duplication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _overlap(l_from: Column, l_until: Column, r_from: Column, r_until: Column) -> Column:
    # Half-open [from, until) overlap ≡ Postgres tstzrange &&.
    return (l_from < r_until) & (r_from < l_until)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    how: str = "inner",
    on_keys: list[str] | None = None,
    left_cols: tuple[str, str] = ("vfrom", "vuntil"),
    right_cols: tuple[str, str] = ("vfrom", "vuntil"),
    broadcast_right: bool = False,
) -> DataFrame:
    """Naive conditional interval join; optional equi-keys tighten it to a
    hash join with a range residual (Spark plans SortMergeJoin on the keys
    with the overlap as a post-join filter — already shuffle-bounded)."""
    lf, lu = (F.col(f"l.{c}") for c in left_cols)
    rf, ru = (F.col(f"r.{c}") for c in right_cols)
    cond = _overlap(lf, lu, rf, ru)
    for k in on_keys or []:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    r = right.alias("r")
    if broadcast_right:
        r = F.broadcast(r)
    return left.alias("l").join(r, cond, how)


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    bucket_seconds: int,
    on_keys: list[str] | None = None,
    left_cols: tuple[str, str] = ("vfrom", "vuntil"),
    right_cols: tuple[str, str] = ("vfrom", "vuntil"),
) -> DataFrame:
    """Scale path: explode intervals onto fixed buckets, equi-join on bucket
    (+keys), keep the residual overlap, and emit each pair ONLY in the first
    bucket the overlap covers (bucket == floor(greatest(l.from, r.from) /
    bucket_seconds)) — dedup-free, so legitimate duplicate input rows keep
    their join multiplicity and no wide distinct-exchange is needed.

    Shuffles on (keys, bucket) — a plain hash join Catalyst/AQE can size and
    skew-split; no nested-loop anywhere.
    """
    def with_buckets(df: DataFrame, cols: tuple[str, str], side: str) -> DataFrame:
        f, u = cols
        return df.withColumn(
            f"_{side}bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(f).cast("long") / bucket_seconds),
                    # until is exclusive: last covered bucket is (until-1s)'s
                    F.floor((F.col(u).cast("long") - 1) / bucket_seconds),
                )
            ),
        )

    lb = with_buckets(left, left_cols, "l").alias("l")
    rb = with_buckets(right, right_cols, "r").alias("r")
    first_overlap_bucket = F.floor(
        F.greatest(
            F.col(f"l.{left_cols[0]}").cast("long"),
            F.col(f"r.{right_cols[0]}").cast("long"),
        )
        / bucket_seconds
    )
    cond = (
        (F.col("l._lbucket") == F.col("r._rbucket"))
        & _overlap(
            F.col(f"l.{left_cols[0]}"),
            F.col(f"l.{left_cols[1]}"),
            F.col(f"r.{right_cols[0]}"),
            F.col(f"r.{right_cols[1]}"),
        )
        # Emit the pair only in the first bucket its overlap covers — every
        # overlapping pair shares that bucket by construction, so coverage is
        # complete without a distinct pass.
        & (F.col("l._lbucket") == first_overlap_bucket)
    )
    for k in on_keys or []:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return lb.join(rb, cond, "inner").drop("_lbucket", "_rbucket")


def concurrency_curve(
    intervals: DataFrame,
    *,
    start_col: str = "vfrom",
    end_col: str = "vuntil",
) -> DataFrame:
    """How many intervals are active at each moment: the sweep-line
    +1/−1 prefix sum.  Each interval contributes a +1 event at its start
    and a −1 at its (exclusive) end; sorting events by time and running
    a cumulative sum yields ``n_active`` on [t, next_t).

    NO JOIN — the naive "count intervals covering each boundary" is a
    quadratic theta-join; the sweep is one explode + one aggregate + one
    ordered window over |distinct timestamps| rows.  Same-timestamp
    events collapse to their NET delta before the running sum, so seam
    ties (one interval ending exactly where another starts) are handled
    by construction.  The single-partition window is bounded by run
    counts, not raw readings — the combiner's boundary-timeline argument
    (operators/combine.py) applies unchanged."""
    from pyspark.sql import Window

    events = intervals.select(
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select("e.t", "e.delta")
    net = events.groupBy("t").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        net.withColumn("n_active", F.sum("d").over(w).cast("long"))
        .select("t", "n_active")
        .orderBy("t")
    )
