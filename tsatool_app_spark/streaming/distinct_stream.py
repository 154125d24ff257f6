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

Same atomic-swap snapshot contract as incremental_stream.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_batch(batch_df: DataFrame, keys: list[str], id_col: str, lg_k: int = 14) -> DataFrame:
    return batch_df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch")
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
    if os.path.isdir(snapshot_path):
        current = spark.read.parquet(snapshot_path)
        merged = (
            current.unionByName(batch_sketches)
            .groupBy(*keys)
            .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
        )
    else:
        merged = batch_sketches
    tmp = snapshot_path + "._new"
    merged.write.mode("overwrite").parquet(tmp)
    old = snapshot_path + "._old"
    if os.path.isdir(snapshot_path):
        os.rename(snapshot_path, old)
    os.rename(tmp, snapshot_path)
    shutil.rmtree(old, ignore_errors=True)


def read_distinct_estimates(spark, snapshot_path: str, keys: list[str]) -> DataFrame:
    """Point-in-time view: estimate per key from the sketch snapshot."""
    return (
        spark.read.parquet(snapshot_path)
        .select(
            *keys,
            F.hll_sketch_estimate(F.col("sketch")).alias("n_distinct_est"),
        )
        .orderBy(*keys)
    )


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
