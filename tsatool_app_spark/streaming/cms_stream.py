"""Streaming frequency tracking via a count-min sketch snapshot.

The companion to streaming/distinct_stream.py, for COUNTs instead of
COUNT(DISTINCT): each micro-batch reduces to depth×width counter cells
(functions/sketches.cms_build), and cells merge into the persistent
snapshot by plain SUM — state is O(depth·width) forever, point-lookups
for ANY key (not just pre-declared ones), never-undercount guarantees,
mergeable across streams/days by the same cell SUM.

One property does NOT carry over from the HLL fold and has to be
engineered instead: HLL's register max is idempotent, so re-delivered
batches are harmless there; a CMS fold is a SUM, and re-adding a
batch WOULD double-count.  foreachBatch gives at-least-once side-effect
semantics, so the snapshot records the highest folded ``batch_id`` and
``fold_cms_into_snapshot`` refuses batches it has already seen — the
standard transactional-sink trick (Structured Streaming replays with the
SAME batch id on recovery, which is what makes the guard sufficient).

Sketch geometry (width, depth) is stored in the snapshot and validated on
every fold: cells from differently-shaped sketches must never be summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsatool_app_spark.functions.sketches import cms_build, cms_estimate
from tsatool_app_spark.streaming.snapshot_store import (
    publish_snapshot,
    read_snapshot,
)


def fold_cms_into_snapshot(
    batch_df: DataFrame,
    snapshot_path: str,
    col: str,
    *,
    width: int = 256,
    depth: int = 4,
    batch_id: int = 0,
) -> bool:
    """Sum this batch's sketch cells into the snapshot.  Returns False (and
    folds nothing) when ``batch_id`` was already folded — the re-delivery
    guard that makes the SUM fold safe under at-least-once replay."""
    spark = batch_df.sparkSession
    cells = cms_build(batch_df, col, width=width, depth=depth).select(
        "row",
        "bucket",
        "cnt",
        F.lit(width).alias("width"),
        F.lit(depth).alias("depth"),
        F.lit(batch_id).cast("long").alias("last_batch_id"),
    )
    current = read_snapshot(spark, snapshot_path)
    if current is not None:
        meta = current.select(
            F.min("width"), F.max("width"), F.min("depth"), F.max("depth"),
            F.max("last_batch_id"),
        ).first()
        if not (meta[0] == meta[1] == width and meta[2] == meta[3] == depth):
            raise ValueError(
                f"snapshot at {snapshot_path} holds {meta[0]}x{meta[2]} sketch "
                f"cells; refusing to fold {width}x{depth} (cell sums require "
                "identical geometry — restart with the original shape or a "
                "fresh path)"
            )
        if meta[4] is not None and batch_id <= meta[4]:
            return False  # re-delivered batch: already folded
        merged = (
            current.unionByName(cells)
            .groupBy("row", "bucket")
            .agg(
                F.sum("cnt").cast("long").alias("cnt"),
                F.min("width").alias("width"),
                F.min("depth").alias("depth"),
                F.max("last_batch_id").alias("last_batch_id"),
            )
        )
    else:
        merged = cells
    publish_snapshot(merged, snapshot_path)
    return True


def read_cms_counts(
    spark: SparkSession,
    snapshot_path: str,
    probes: DataFrame,
    col: str,
) -> DataFrame:
    """Point frequency estimates for the probe keys from the snapshot
    (est >= true count; geometry read from the snapshot itself)."""
    snap = read_snapshot(spark, snapshot_path)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {snapshot_path}")
    meta = snap.select(F.min("width"), F.min("depth")).first()
    return cms_estimate(
        snap.select("row", "bucket", "cnt"),
        probes,
        col,
        width=int(meta[0]),
        depth=int(meta[1]),
    )


def streaming_cms_counts(
    stream_df: DataFrame,
    snapshot_path: str,
    *,
    col: str,
    checkpoint: str,
    width: int = 256,
    depth: int = 4,
):
    """Start a foreachBatch query maintaining the CMS snapshot at
    ``snapshot_path``.  Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_cms_into_snapshot(
            batch_df, snapshot_path, col, width=width, depth=depth,
            batch_id=batch_id,
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
