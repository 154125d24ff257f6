"""pack_ranges unit + property tests.

Pins the reference code behavior from 01_init_db.sql:121-202 (SURVEY §2.5),
including the gap-bridging run merge (W5 note: merging compares value only,
not continuity) and end-of-run truncation (W2).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from tsatool_app_spark.operators.ranges import (
    pack_ranges,
    pack_ranges_all_keys,
    predicate_column,
)

T0 = datetime(2018, 3, 1, 0, 0, 0)


def mk_obs(spark, rows):
    """rows: (minutes_offset, statid, seid, seval)"""
    data = [(T0 + timedelta(minutes=m), s, se, float(v)) for m, s, se, v in rows]
    return spark.createDataFrame(data, "tfrom timestamp, statid int, seid int, seval float")


def collect_ranges(df):
    return [
        (int((r.vfrom - T0).total_seconds() // 60), int((r.vuntil - T0).total_seconds() // 60), r.istrue)
        for r in df.orderBy("vfrom").collect()
    ]


def test_basic_runs_merge(spark):
    # 5-min cadence, values flip across the >= 0.5 threshold.
    obs = mk_obs(
        spark,
        [(0, 1, 3, 1.0), (5, 1, 3, 1.0), (10, 1, 3, 0.2), (15, 1, 3, 0.2), (20, 1, 3, 1.0)],
    )
    out = collect_ranges(pack_ranges(obs, 30, 1, 3, ">=", 0.5))
    # last observation dropped (lead NULL, W1); runs merged (W5)
    assert out == [(0, 10, True), (10, 20, False)]


def test_last_observation_dropped(spark):
    obs = mk_obs(spark, [(0, 1, 3, 1.0)])
    assert collect_ranges(pack_ranges(obs, 30, 1, 3, ">=", 0.5)) == []


def test_gap_truncation_at_run_end(spark):
    # 90-min gap: validity capped at 30 min (W2). Value changes across the
    # gap so the truncation survives at the run end.
    obs = mk_obs(spark, [(0, 1, 3, 1.0), (90, 1, 3, 0.1), (95, 1, 3, 0.1)])
    out = collect_ranges(pack_ranges(obs, 30, 1, 3, ">=", 0.5))
    assert out == [(0, 30, True), (90, 95, False)]


def test_gap_bridging_same_value(spark):
    # ⚠ Reference behavior W5: same value on both sides of an uncovered gap
    # merges ACROSS the gap (value-only run comparison, 01_init_db.sql:157-199
    # vs its own comment at :99-101 — the code wins).
    obs = mk_obs(spark, [(0, 1, 3, 1.0), (90, 1, 3, 1.0), (95, 1, 3, 1.0)])
    out = collect_ranges(pack_ranges(obs, 30, 1, 3, ">=", 0.5))
    assert out == [(0, 95, True)]


def test_all_keys_partitioning(spark):
    # Two keys packed in one pass, independent windows per key.
    obs = mk_obs(
        spark,
        [(0, 1, 3, 1.0), (5, 1, 3, 1.0), (0, 2, 3, 0.0), (5, 2, 3, 0.0)],
    )
    out = pack_ranges_all_keys(obs, 30, ">=", 0.5)
    rows = {(r.statid, r.istrue) for r in out.collect()}
    assert rows == {(1, True), (2, False)}


def test_operators(spark):
    obs = mk_obs(spark, [(0, 1, 3, 2.0), (5, 1, 3, 2.0)])
    for op, val, expected in [
        ("=", 2.0, True),
        ("<>", 2.0, False),
        (">", 1.0, True),
        ("<", 1.0, False),
        (">=", 2.0, True),
        ("<=", 1.9, False),
        ("in", (1.0, 2.0), True),
    ]:
        out = collect_ranges(pack_ranges(obs, 30, 1, 3, op, val))
        assert out == [(0, 5, expected)], (op, val)


def test_unsupported_operator_rejected(spark):
    with pytest.raises(ValueError):
        predicate_column(F.col("x"), "between", 1)
    with pytest.raises(ValueError):
        predicate_column(F.col("x"), "==", 1)
    with pytest.raises(ValueError):
        predicate_column(F.col("x"), "in", 3.0)


def test_invariants_on_testdata(spark, sf_dir):
    """Property tests (SURVEY §5c) on real driver testdata: output ranges
    ordered + disjoint per key; adjacent ranges differ in istrue."""
    from tsatool_app_spark.model import load_observations_from_events

    obs = load_observations_from_events(spark, sf_dir)
    packed = pack_ranges_all_keys(
        obs, 30, ">=", 50.0, key_cols=("statid", "seid")
    )
    rows = packed.orderBy("statid", "seid", "vfrom").collect()
    assert rows, "expected non-empty packing on testdata"
    prev = {}
    for r in rows:
        key = (r.statid, r.seid)
        assert r.vfrom < r.vuntil
        if key in prev:
            pv, pi = prev[key]
            assert r.vfrom >= pv, "ranges must be disjoint and ordered"
            if r.vfrom == pv:
                assert r.istrue != pi, "adjacent equal-boundary ranges must differ"
        prev[key] = (r.vuntil, r.istrue)
