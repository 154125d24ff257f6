"""Stream-stream interval join with watermark-bounded state.

The attribution shape: match each purchase to the same user's most recent
qualifying click within an attribution window.  Executed as Spark's
native stream-stream inner join — both sides watermarked, the join
condition carrying the time-range predicate so the state store can EVICT:
clicks older than (purchase watermark − window) and purchases older than
the click watermark are dropped, keeping state proportional to the
window, not the stream history.  Without the range predicate the same
join would be legal but its state unbounded — the difference between a
demo and something that survives week 2 of production.

The join emits ALL (click, purchase) pairs inside the window;
``attribute_purchases`` then reduces to last-click attribution.  In
streaming mode the pair join is the incremental operator; the last-click
reduction runs per micro-batch downstream (foreachBatch) or over the
emitted pair log, because a global argmax over an append stream is only
final once the watermark passes the purchase — the same reasoning as the
runner's summary refresh (streaming/condition_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Watermarked stream-stream join: purchase ⋈ click on user within
    (purchase_ts − window, purchase_ts].  Works identically on batch
    DataFrames (watermarks become no-ops), which is how the
    batch-equivalence test pins the semantics.

    ``keep_unmatched=True`` preserves purchases with NO qualifying click
    (left-outer, null click columns) — without it the attribution report
    silently under-counts revenue by exactly the unattributed purchases.
    Streaming left-outer is supported by Spark for this exact shape
    (watermarks both sides + event-time range in the condition): the null
    row for an unmatched purchase is emitted once the watermark passes
    the end of its match window."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    how = "leftOuter" if keep_unmatched else "inner"
    return p.join(c, cond, how).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "amount",
        "click_id",
        "click_ts",
    )


def attribute_purchases(pairs: DataFrame) -> DataFrame:
    """Last-click attribution over the pair log: for each purchase, the
    latest qualifying click (tie → highest click_id).  One struct-max
    aggregate — no window, no self-join (operators/funnel.py pattern)."""
    best = F.max(F.struct("click_ts", "click_id")).alias("best")
    return (
        pairs.groupBy("user_id", "purchase_id", "purchase_ts", "amount")
        .agg(best)
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts",
            "amount",
            F.col("best.click_id").alias("attributed_click_id"),
            F.col("best.click_ts").alias("attributed_click_ts"),
        )
    )
