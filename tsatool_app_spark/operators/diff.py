"""Keyed snapshot diff: what changed between two versions of a table.

Dataset curation at 100 TB is iterative — filters get retuned, dedup
thresholds move, upstream dumps refresh — and every iteration needs the
audit question answered: which rows appeared, vanished, or changed, and in
which columns?  This is ONE full-outer join on the key (the unavoidable
shuffle) plus pure Column comparisons; the changed-column list is built
with array/filter higher-order functions, no UDF.

The CDC module (operators/cdc.py) APPLIES a change stream to a table;
this operator DERIVES the change stream from two materialized versions —
the two directions of the same maintenance loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a schema.

    Returns (key_cols..., change, changed_cols) where change ∈
    {'added', 'removed', 'changed'} and changed_cols lists the differing
    columns (empty for added/removed; identical rows are not emitted).
    NULL-safe: a NULL→value or value→NULL transition counts as a change
    (eqNullSafe), so nullable columns diff correctly.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    reserved = {"change", "changed_cols"} & set(key_cols) | (
        {"change", "changed_cols"} & set(compare_cols)
    )
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with the diff output; "
            "rename them before diffing"
        )
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *key_cols,
            "change",
            F.when(F.col("change") == "changed", diffs)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
