"""Partitioned parquet/ORC layout tests (sources/columnar.py): round-trip
fidelity, partition pruning visible in the plan, predicate pushdown in ORC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsatool_app_spark.sources.columnar import (
    read_columnar,
    scan_partition_filters,
    write_partitioned,
)


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_partitioned_round_trip_and_pruning(spark, sf_dir, tmp_path, fmt):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / f"events_{fmt}")
    write_partitioned(events, path, ["event_type"], fmt=fmt)

    back = read_columnar(spark, path, fmt=fmt)
    # full fidelity (partition col round-trips through directory names)
    orig = sorted(
        events.select("event_id", "event_type", "user_id").collect(),
        key=lambda r: r.event_id,
    )
    got = sorted(
        back.select("event_id", "event_type", "user_id").collect(),
        key=lambda r: r.event_id,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in orig]

    # a partition-column predicate must prune directories, not filter rows
    q = back.where(F.col("event_type") == "purchase").select("event_id")
    pf = scan_partition_filters(q)
    assert "event_type" in pf, f"no partition pruning in plan: {pf!r}"
    assert q.count() == events.where(F.col("event_type") == "purchase").count()


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "events_flat_orc")
    events.write.mode("overwrite").format("orc").save(path)
    q = (
        read_columnar(spark, path, fmt="orc")
        .where(F.col("user_id") == 9)
        .select("event_id", "user_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters", 1)[1].split("]")[0]
    assert q.count() == events.where(F.col("user_id") == 9).count()


def test_write_partitioned_rejects_unknown_format(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError):
        write_partitioned(df, str(tmp_path / "x"), ["id"], fmt="avro")
