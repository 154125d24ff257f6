"""Change-data-capture operators: MERGE-style upsert application and
slowly-changing-dimension (type 2) history construction.

The reference app's only mutation surface is the INSERT ... ON CONFLICT
DO NOTHING bulk loader (db_config.sql / tsa/tsabatch.py — covered by
sources/csv_ingest S5); a warehouse user replacing it needs the rest of
the mutation family: apply a keyed change stream onto a base snapshot
(MERGE / SCD1) and build validity-interval history from the same stream
(SCD2). Both are expressed as pure DataFrame plans so Catalyst handles
them like any other join/window — no driver-side row loops.

Scale notes:

- ``apply_changes`` reduces the change stream FIRST (one hash aggregate on
  the key picks the terminal change per key), then outer-joins the compact
  result against the base. The join shuffles on the key unless the reduced
  change set is broadcast-able — at 100 TB base + small daily delta, AQE's
  dynamic broadcast turns this into a map-side merge of the base scan.
- ``scd2_history`` is one window (lead over per-key event time): a single
  shuffle on the key, state bounded by one partition's rows, no
  cross-partition carry.

Determinism: the terminal change per key is chosen by (seq, then a stable
tiebreak column) so Spark and the SQL oracle pick the same row even when a
key has two changes with equal seq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
    *,
    delete_op: str = "D",
) -> DataFrame:
    """MERGE a keyed change stream into a base snapshot (SCD type 1).

    ``changes`` rows carry the full new image of the record plus ``op_col``
    (``delete_op`` → drop the key; anything else → upsert) and ``seq_col``
    (monotone change order; the LAST change per key wins). Output schema =
    base schema.

    Plan shape: window row_number on (key / seq DESC) reduces changes to one
    terminal row per key; a full outer join on the key then applies it:

    - base only        → keep base row
    - change only      → insert (unless terminal op is delete)
    - both             → replace with change image (unless delete)
    """
    cols = base.columns
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    b = base.alias("b")
    c = latest.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    is_change = F.col(f"c.{key}").isNotNull()
    is_delete = is_change & (F.col(f"c.{op_col}") == delete_op)
    return joined.where(~is_delete).select(
        *[
            F.when(is_change, F.col(f"c.{col}"))
            .otherwise(F.col(f"b.{col}"))
            .alias(col)
            for col in cols
        ]
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a type-2 history table from a change stream: one row per
    change with ``valid_from`` = its timestamp, ``valid_to`` = the next
    change's timestamp for the same key (NULL on the current row), and
    ``is_current``.

    Ties on ``ts_col`` within a key are ordered by the first attr column as
    a stable tiebreak so both engines pick the same chain.
    """
    order = [F.col(ts_col)] + [F.col(attr_cols[0])] if attr_cols else [F.col(ts_col)]
    w = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        *[F.col(a) for a in attr_cols],
    )


def point_in_time_join(
    probes: DataFrame,
    history: DataFrame,
    key: str,
    probe_ts: str,
    attr_cols: list[str],
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (feature-store) lookup against an SCD2 history: for
    each probe (key, ts), the attribute values whose validity interval
    contains ts — the primitive that keeps training features leak-free
    (never read a value that only became true AFTER the example's time).

    Built on the carry-forward as-of machinery (operators/timeseries.py):
    ONE shuffle on the key, no inequality join, per-key state O(1). The
    as-of pick (latest valid_from ≤ ts) IS the containing interval when
    the history's intervals partition time (scd2_history guarantees
    this); rows probing before the key's first interval get NULLs.
    """
    from tsatool_app_spark.operators.timeseries import asof_join

    out = asof_join(
        probes,
        history.select(key, valid_from, *attr_cols),
        on_keys=[key],
        left_time=probe_ts,
        right_time=valid_from,
        value_cols=attr_cols,
    )
    return out.drop("asof_time")
