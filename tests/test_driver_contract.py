"""Local mirror of the driver's t2 gate: run each Spark query and its DuckDB
oracle side-by-side at sf0.01 and compare values exactly."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tsatool_app_spark.model import TESTDATA_TABLES
from tsatool_app_spark.plans.driver_queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

ORACLE_QUERIES = [(n, q) for n, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY_QUERIES = [(n, q) for n, q in QUERIES.items() if q.oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(rows, colnames):
    """Column-name-sorted, row-sorted value matrix (the driver's compare is
    column-name sorted and order-insensitive)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(row):
        return tuple(
            (v is None, str(type(v)), str(v)) for v in (row[i] for i in order)
        )

    out = []
    for row in sorted(rows, key=key):
        out.append(tuple(row[i] for i in order))
    return [c for _, c in sorted(zip(range(len(colnames)), colnames), key=lambda p: colnames[p[0]])], out


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name,q", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_oracle_match(spark, duck, name, q):
    sdf = q.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"

    _, snorm = normalize(srows, scols)
    _, dnorm = normalize(drows, dcols)
    mismatches = [
        (i, sa, da)
        for i, (sa, da) in enumerate(zip(snorm, dnorm))
        if not all(values_equal(x, y) for x, y in zip(sa, da))
    ]
    assert not mismatches, f"{len(mismatches)} mismatched rows, first: {mismatches[:3]}"


def test_no_complex_output_types(spark):
    """Registry-wide guard (r5 VERDICT next-round #1): the driver's pandas
    canonicalizer hashes scalar values only — an Array/Map/Struct output
    column fails with "unhashable type: 'list'" and burns the window slot
    (array_funcs r4, snapshot_diff r5).  Assert NO registry query's output
    schema contains a complex type, so the class cannot recur a third time.
    Schema inspection only (no job run), so this covers all 150 queries in
    seconds."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, q in QUERIES.items():
        schema = q.fn(spark, "/root/testdata/sf0.001").schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, (
        "driver-unhashable complex output columns (flatten with "
        f"F.array_join / to_json before returning): {bad}"
    )


def test_rows_only_queries_run(spark):
    """Weaker rows-only check for registry entries WITHOUT an oracle.
    Currently every query has a DuckDB oracle, so this is expected to be
    an explicit no-op — iterating (instead of parametrizing) avoids
    pytest's empty-parameter-set auto-skip, which read as an unexplained
    skipped test in full-suite runs (r3 VERDICT next-round #8)."""
    for name, q in ROWS_ONLY_QUERIES:
        df = q.fn(spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.columns, name
