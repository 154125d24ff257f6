"""Streaming distinct counts via mergeable HLL sketch state.

Exact streaming COUNT(DISTINCT) needs unbounded per-key state (every id
ever seen).  The scalable design is the sketch fold: each micro-batch is
reduced to one HLL sketch per key (functions/sketches.py rationale), and
the persistent snapshot stores (key, sketch) — kilobytes per key forever,
independent of the id universe.  HLL register state is a per-register max
over hashed items, so the fold is a commutative, idempotent monoid:
estimates are independent of micro-batch boundaries, arrival order, AND
re-delivery (at-least-once safe — re-folding the same rows cannot inflate
the estimate, unlike a count-based fold).

Durability: snapshots publish through the versioned pointer-file store
(streaming/snapshot_store.py) — crash-safe at every instant; see that
module for the protocol and why a two-rename directory swap is not it.

The sketch parameter ``lg_k`` is recorded IN the snapshot rows and
validated on every fold: DataSketches refuses to union sketches of
different lgConfigK, and without the explicit check a config change
between runs would surface as an opaque mid-stream union error instead
of a clear message.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsatool_app_spark.streaming.snapshot_store import (
    publish_snapshot,
    read_snapshot,
)


def sketch_batch(
    batch_df: DataFrame, keys: list[str], id_col: str, lg_k: int = 14
) -> DataFrame:
    return batch_df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch"),
        F.lit(lg_k).alias("lg_k"),
    )


def fold_sketches_into_snapshot(
    batch_df: DataFrame,
    snapshot_path: str,
    keys: list[str],
    id_col: str,
    lg_k: int = 14,
) -> None:
    """Union this batch's per-key sketches into the snapshot."""
    spark = batch_df.sparkSession
    batch_sketches = sketch_batch(batch_df, keys, id_col, lg_k)
    current = read_snapshot(spark, snapshot_path)
    if current is not None:
        stored = current.select(F.min("lg_k"), F.max("lg_k")).first()
        if stored[0] is not None and not (stored[0] == stored[1] == lg_k):
            raise ValueError(
                f"snapshot at {snapshot_path} holds lg_k={stored[0]} sketches; "
                f"refusing to fold lg_k={lg_k} (HLL unions require equal "
                "lgConfigK — restart with the original lg_k or a fresh path)"
            )
        merged = (
            current.unionByName(batch_sketches)
            .groupBy(*keys)
            .agg(
                F.hll_union_agg(F.col("sketch")).alias("sketch"),
                F.min("lg_k").alias("lg_k"),
            )
        )
    else:
        merged = batch_sketches
    publish_snapshot(merged, snapshot_path)


def read_distinct_estimates(spark, snapshot_path: str, keys: list[str]) -> DataFrame:
    """Point-in-time view: estimate per key from the sketch snapshot."""
    snap = read_snapshot(spark, snapshot_path)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {snapshot_path}")
    return snap.select(
        *keys,
        F.hll_sketch_estimate(F.col("sketch")).alias("n_distinct_est"),
    ).orderBy(*keys)


def streaming_distinct_counts(
    stream_df: DataFrame,
    snapshot_path: str,
    *,
    keys: list[str],
    id_col: str,
    checkpoint: str,
    lg_k: int = 14,
):
    """Start a foreachBatch query maintaining per-key HLL sketches at
    ``snapshot_path``.  Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_sketches_into_snapshot(batch_df, snapshot_path, keys, id_col, lg_k)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
