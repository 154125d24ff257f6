"""Condition combiner tests: boundary segmentation, alignment, Kleene master.

Pins the reference behavior of tsa/condition.py:317-414 (SURVEY §2.5 W6,
§2.3 J4, §2.8) including three-valued logic edges (README.md:39 contract).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from tsatool_app_spark.operators.combine import boundary_segmentation, combine_blocks

T0 = datetime(2018, 3, 1)


def mk_ranges(spark, rows):
    """rows: (from_min, until_min, istrue)"""
    data = [
        (T0 + timedelta(minutes=a), T0 + timedelta(minutes=b), t) for a, b, t in rows
    ]
    return spark.createDataFrame(data, "vfrom timestamp, vuntil timestamp, istrue boolean")


def rel(rows):
    def m(ts):
        return int((ts - T0).total_seconds() // 60)

    return [tuple(r) for r in rows]


def collect(df):
    out = []
    for r in df.orderBy("vfrom").collect():
        d = r.asDict()
        d["vfrom"] = int((d["vfrom"] - T0).total_seconds() // 60)
        d["vuntil"] = int((d["vuntil"] - T0).total_seconds() // 60)
        out.append(d)
    return out


def test_boundary_segmentation(spark):
    a = mk_ranges(spark, [(0, 10, True), (20, 30, False)])
    segs = [
        (int((r.vfrom - T0).total_seconds() // 60), int((r.vuntil - T0).total_seconds() // 60))
        for r in boundary_segmentation(a).orderBy("vfrom").collect()
    ]
    assert segs == [(0, 10), (10, 20), (20, 30)]


def test_single_block_shortcut(spark):
    a = mk_ranges(spark, [(0, 10, True), (10, 20, False)])
    out = collect(combine_blocks({"a1": a}, "a1"))
    assert out == [
        {"vfrom": 0, "vuntil": 10, "vdiff_s": 600, "a1": True, "master": True},
        {"vfrom": 10, "vuntil": 20, "vdiff_s": 600, "a1": False, "master": False},
    ]


def test_two_block_and(spark):
    a = mk_ranges(spark, [(0, 20, True)])
    b = mk_ranges(spark, [(10, 30, True)])
    out = collect(combine_blocks({"a1": a, "a2": b}, "a1 AND a2"))
    # timeline points {0,10,20,30} → 3 master ranges; NULL where uncovered;
    # Kleene: TRUE AND NULL = NULL, NULL AND TRUE = NULL
    assert out == [
        {"vfrom": 0, "vuntil": 10, "vdiff_s": 600, "a1": True, "a2": None, "master": None},
        {"vfrom": 10, "vuntil": 20, "vdiff_s": 600, "a1": True, "a2": True, "master": True},
        {"vfrom": 20, "vuntil": 30, "vdiff_s": 600, "a1": None, "a2": True, "master": None},
    ]


def test_kleene_null_and_false_is_false(spark):
    # NULL AND FALSE → FALSE; NOT NULL → NULL (README.md:39 contract)
    a = mk_ranges(spark, [(0, 10, None)])
    b = mk_ranges(spark, [(0, 10, False)])
    out = collect(combine_blocks({"a1": a, "a2": b}, "a1 AND a2"))
    assert out == [
        {"vfrom": 0, "vuntil": 10, "vdiff_s": 600, "a1": None, "a2": False, "master": False}
    ]
    out2 = collect(combine_blocks({"a1": a, "a2": b}, "NOT a1 OR a2"))
    assert out2[0]["master"] is None  # NOT NULL=NULL; NULL OR FALSE=NULL


def test_unknown_inside_block_range(spark):
    # A block whose packed range carries istrue=NULL stays NULL when aligned
    # (distinct from "uncovered", which also decodes NULL — same as the
    # reference's LEFT JOIN).
    a = mk_ranges(spark, [(0, 10, True), (10, 20, None), (20, 30, True)])
    b = mk_ranges(spark, [(0, 30, True)])
    out = collect(combine_blocks({"a1": a, "a2": b}, "a1 AND a2"))
    assert [o["a1"] for o in out] == [True, None, True]
    assert [o["master"] for o in out] == [True, None, True]


def test_adjacent_handover(spark):
    # End+start at the same instant: the starting range wins the boundary.
    a = mk_ranges(spark, [(0, 10, True), (10, 20, False)])
    b = mk_ranges(spark, [(0, 20, True)])
    out = collect(combine_blocks({"a1": a, "a2": b}, "a1 OR a2"))
    assert [o["a1"] for o in out] == [True, False]


def test_nested_parens_expression(spark):
    a = mk_ranges(spark, [(0, 10, True)])
    b = mk_ranges(spark, [(0, 10, False)])
    c = mk_ranges(spark, [(0, 10, True)])
    out = collect(combine_blocks({"a1": a, "a2": b, "a3": c}, "(a1 AND a2) OR a3"))
    assert out[0]["master"] is True


def test_interval_join_bucketed_matches_naive(spark):
    from tsatool_app_spark.operators.intervals import interval_join, interval_join_bucketed

    a = mk_ranges(spark, [(0, 10, True), (15, 30, False), (40, 45, True)])
    b = mk_ranges(spark, [(5, 20, True), (25, 50, False)])
    naive = interval_join(
        a.selectExpr("vfrom", "vuntil"), b.selectExpr("vfrom as bvfrom", "vuntil as bvuntil"),
        right_cols=("bvfrom", "bvuntil"),
    )
    bucketed = interval_join_bucketed(
        a.selectExpr("vfrom", "vuntil"),
        b.selectExpr("vfrom as bvfrom", "vuntil as bvuntil"),
        bucket_seconds=600,
        right_cols=("bvfrom", "bvuntil"),
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, bucketed.collect()))


def test_interval_join_bucketed_keeps_duplicate_multiplicity(spark):
    """Legitimate duplicate input rows must keep their join multiplicity —
    the first-overlap-bucket emission rule replaces the old full-row
    dropDuplicates(), which silently collapsed them."""
    from tsatool_app_spark.operators.intervals import interval_join, interval_join_bucketed

    # Two identical left rows spanning several buckets, one right row.
    a = mk_ranges(spark, [(0, 3000, True), (0, 3000, True)])
    b = mk_ranges(spark, [(100, 200, True)])
    naive = interval_join(
        a.selectExpr("vfrom", "vuntil"),
        b.selectExpr("vfrom as bvfrom", "vuntil as bvuntil"),
        right_cols=("bvfrom", "bvuntil"),
    )
    bucketed = interval_join_bucketed(
        a.selectExpr("vfrom", "vuntil"),
        b.selectExpr("vfrom as bvfrom", "vuntil as bvuntil"),
        bucket_seconds=600,
        right_cols=("bvfrom", "bvuntil"),
    )
    assert naive.count() == 2
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, bucketed.collect()))
    # and the plan is dedup-free (no Deduplicate node above the join)
    assert "Deduplicate" not in bucketed._jdf.queryExecution().analyzed().toString()


def test_combine_multi_quoted_cond_id(spark):
    """combine_blocks_multi / combine_tagged are public APIs taking
    arbitrary cond_id strings; a quote or backslash in the id must be
    escaped Spark-style (backslash escapes, NOT SQL doubled quotes) in
    the master CASE literal — r7 ADVICE."""
    from tsatool_app_spark.operators.combine import combine_blocks_multi

    a = mk_ranges(spark, [(0, 10, True), (10, 20, False)])
    cid = "it's\\odd"
    out = combine_blocks_multi({cid: {"a1": a}}, {cid: "a1"})
    rows = collect(out)
    assert [r["cond_id"] for r in rows] == [cid, cid]
    assert [r["master"] for r in rows] == [True, False]
