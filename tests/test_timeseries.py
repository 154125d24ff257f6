"""Timeseries operator tests: as-of join (incl. tolerance) and time-bucket
rollup (the oracle covers the no-tolerance and hourly cases)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from tsatool_app_spark.operators.timeseries import asof_join, time_bucket, time_bucket_rollup

T0 = datetime(2018, 3, 1)


def t(m):
    return T0 + timedelta(minutes=m)


def test_asof_basic_and_left_nulls(spark):
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(30)), (3, 2, t(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(8), 100.0), (1, t(25), 200.0), (3, t(1), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r.event_id: (r.v, r.asof_time)
        for r in asof_join(
            left, right, on_keys=["user_id"], left_time="ts",
            right_time="ts", value_cols=["v"],
        ).collect()
    }
    assert out[1] == (100.0, t(8))
    assert out[2] == (200.0, t(25))
    assert out[3] == (None, None)  # user 2 has no right rows ≤ t


def test_asof_same_instant_matches(spark):
    left = spark.createDataFrame([(1, 1, t(10))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(1, t(10), 7.0)], "user_id long, ts timestamp, v double")
    out = asof_join(
        left, right, on_keys=["user_id"], left_time="ts", right_time="ts", value_cols=["v"]
    ).collect()[0]
    assert out.v == 7.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(120))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame([(1, t(5), 3.0)], "user_id long, ts timestamp, v double")
    out = {
        r.event_id: r.v
        for r in asof_join(
            left, right, on_keys=["user_id"], left_time="ts", right_time="ts",
            value_cols=["v"], tolerance_seconds=1800,
        ).collect()
    }
    assert out[1] == 3.0       # 5 min gap, inside tolerance
    assert out[2] is None      # 115 min gap, outside 30 min tolerance


def test_time_bucket_edges(spark):
    df = spark.createDataFrame(
        [(datetime(2018, 3, 1, 10, 59, 59),), (datetime(2018, 3, 1, 11, 0, 0),)],
        "ts timestamp",
    )
    got = [r.b for r in df.select(time_bucket(F.col("ts"), 3600).alias("b")).collect()]
    assert got == [datetime(2018, 3, 1, 10, 0), datetime(2018, 3, 1, 11, 0)]


def test_time_bucket_rollup(spark):
    rows = [(t(m), 1, 3, float(m)) for m in (0, 10, 50, 70)]
    df = spark.createDataFrame(rows, "tfrom timestamp, statid int, seid int, seval float")
    out = {r.bucket: r for r in time_bucket_rollup(df, 3600).collect()}
    b0 = out[T0]
    assert (b0.n_obs, b0.min_val, b0.max_val) == (3, 0.0, 50.0)
    assert abs(b0.avg_val - 20.0) < 1e-12
    assert out[T0 + timedelta(hours=1)].n_obs == 1


def test_gapfill_locf_dense_grid(spark):
    from tsatool_app_spark.operators.timeseries import gapfill_locf
    from pyspark.sql import functions as F

    # key 1: obs at buckets 0 and 3600*3 (gap of two buckets); key 2: one obs
    rows = [(1, 100.0, 1.5), (1, 120.0, 2.5), (1, 3 * 3600 + 5.0, 9.0),
            (2, 7200.0, 4.0)]
    df = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in rows], "statid long, t double, seval double"
    ).select("statid", F.timestamp_seconds("t").alias("tfrom"), "seval")
    out = {(r.statid, r.bucket): (r.value, r.is_gap)
           for r in gapfill_locf(df, 3600).collect()}
    assert out[(1, 0)] == (2.5, False)        # latest-in-bucket wins (t=120)
    assert out[(1, 3600)] == (2.5, True)      # gap carried forward
    assert out[(1, 7200)] == (2.5, True)
    assert out[(1, 10800)] == (9.0, False)
    assert out[(2, 7200)] == (4.0, False)     # single-obs key: 1-cell grid
    assert len(out) == 5                      # dense grid, nothing beyond hi


def test_counter_deltas_reset(spark):
    from tsatool_app_spark.operators.timeseries import counter_deltas
    from pyspark.sql import functions as F

    rows = [(1, 0, 10.0), (1, 1, 15.0), (1, 2, 3.0), (1, 3, 4.0), (2, 0, 7.0)]
    df = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in rows], "statid long, t double, seval double"
    ).select("statid", F.timestamp_seconds("t").alias("tfrom"), "seval")
    out = {(r.statid, r.tfrom.timestamp()): (r.delta, r.is_reset)
           for r in counter_deltas(df).collect()}
    assert out[(1, 0.0)] == (None, False)   # no baseline
    assert out[(1, 1.0)] == (5.0, False)    # normal increment
    assert out[(1, 2.0)] == (3.0, True)     # reset: raw value as delta
    assert out[(1, 3.0)] == (1.0, False)
    assert out[(2, 0.0)] == (None, False)


def test_gapfill_interpolate_linear(spark):
    from tsatool_app_spark.operators.timeseries import gapfill_interpolate
    from pyspark.sql import functions as F

    # obs at bucket 0 (v=10) and bucket 3 (v=40): gaps at 1,2 interpolate
    rows = [(1, 10.0, 10.0), (1, 3 * 3600 + 2.0, 40.0)]
    df = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in rows], "statid long, t double, seval double"
    ).select("statid", F.timestamp_seconds("t").alias("tfrom"), "seval")
    out = {r.bucket: (r.value, r.is_gap)
           for r in gapfill_interpolate(df, 3600).collect()}
    assert out[0] == (10.0, False)
    assert out[3600] == (20.0, True)
    assert out[7200] == (30.0, True)
    assert out[10800] == (40.0, False)


def test_time_weighted_avg_durations(spark):
    from tsatool_app_spark.operators.timeseries import time_weighted_avg
    from pyspark.sql import functions as F

    # v=10 for 30s, v=20 for 10s, final obs unweighted
    rows = [(1, 0.0, 10.0), (1, 30.0, 20.0), (1, 40.0, 99.0)]
    df = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in rows], "statid long, t double, seval double"
    ).select("statid", F.timestamp_seconds("t").alias("tfrom"), "seval")
    r = time_weighted_avg(df).collect()[0]
    assert r.total_seconds == 40
    assert r.twa == (10.0 * 30 + 20.0 * 10) / 40  # 12.5


def test_asof_join_null_value_wins_race(spark):
    """A right row whose value is NULL still wins the as-of race: the
    output pairs its time with NULL, never a stale older value."""
    import datetime as dt

    from tsatool_app_spark.operators.timeseries import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    right = spark.createDataFrame(
        [(1, t(10), 5.0), (1, t(20), None)],
        "statid int, rt timestamp, v double",
    )
    left = spark.createDataFrame([(1, t(25))], "statid int, lt timestamp")
    out = asof_join(
        left, right, on_keys=["statid"], left_time="lt", right_time="rt",
        value_cols=["v"],
    ).collect()
    assert len(out) == 1
    assert out[0].asof_time == t(20)
    assert out[0].v is None  # NOT the stale 5.0


def test_asof_join_rejects_colliding_value_col(spark):
    import datetime as dt

    import pytest as _pytest

    from tsatool_app_spark.operators.timeseries import asof_join

    t0 = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame([(1, t0, 1.0)], "statid int, rt timestamp, v double")
    left = spark.createDataFrame([(1, t0, 9.0)], "statid int, lt timestamp, v double")
    with _pytest.raises(ValueError, match="collides"):
        asof_join(left, right, on_keys=["statid"], left_time="lt",
                  right_time="rt", value_cols=["v"])
