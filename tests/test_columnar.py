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


def test_compact_small_files_preserves_content(spark, tmp_path):
    """64 tiny files compact to far fewer; row content identical."""
    from pyspark.sql import functions as F

    from tsatool_app_spark.sources.columnar import compact_small_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 20000).select(
        "id", (F.col("id") * 2).alias("v")
    )
    df.repartition(64).write.parquet(src)
    n_in = spark.read.parquet(src).select(F.input_file_name()).distinct().count()
    assert n_in >= 32
    n_out = compact_small_files(spark, src, dst, target_mb=128)
    assert n_out == 1  # 20k rows is far below one target file
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(20000))
    assert spark.read.parquet(dst).agg(F.sum("v")).first()[0] == sum(
        2 * i for i in range(20000)
    )


def test_read_evolving_schemas(spark, tmp_path):
    """Three schema epochs in one directory: added column, dropped
    column, int->long widening — one read, latest unioned schema."""
    from pyspark.sql import functions as F

    from tsatool_app_spark.sources.columnar import read_evolving

    root = str(tmp_path / "evolving")
    # epoch 1: (k int, a string)
    spark.createDataFrame([(1, "x"), (2, "y")], "k int, a string").write.parquet(
        root + "/e1"
    )
    # epoch 2: adds b, k still int
    spark.createDataFrame([(3, "z", 30)], "k int, a string, b long").write.parquet(
        root + "/e2"
    )
    # epoch 3: k widened to long, a dropped
    spark.createDataFrame([(4000000000, 40)], "k long, b long").write.parquet(
        root + "/e3"
    )

    df = read_evolving(spark, root, type_widening={"k": "long"})
    rows = {r["k"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows == {
        1: ("x", None),
        2: ("y", None),
        3: ("z", 30),
        4000000000: (None, 40),
    }
    assert dict(df.dtypes)["k"] == "bigint"


def test_read_evolving_empty_dir_raises(spark, tmp_path):
    """type_widening reads must FAIL on an empty/missing listing instead of
    silently issuing the read with an empty schema (the remote-path trap)."""
    import pytest

    from tsatool_app_spark.sources.columnar import read_evolving

    root = str(tmp_path / "nothing")
    (tmp_path / "nothing").mkdir()
    with pytest.raises(Exception, match="no data files|does not exist"):
        read_evolving(spark, root, type_widening={"k": "long"})
