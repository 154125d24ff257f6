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


#: The pre-r6 BRUTE-FORCE forms of the near-dup oracle family — all-pairs
#: list_intersect joins, O(n^2) in documents.  They are ground truth but
#: blow the bench oracle budget at every sf >= 0.1, so the registry now
#: carries candidate-restricted equivalents (_neardup_pairs_ctes: identical-
#: text grouping + length filter + multi-prefix filter + exact verify, each
#: step a lossless necessary condition).  This test pins the equivalence at
#: sf0.01 where brute force is still feasible.
_BRUTE_CHAR_PAIRS = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                                      i -> text[i:i+4])) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s))
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.85"""

_BRUTE_WORD_PAIRS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sets AS (
  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
         i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS s
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_size,
       CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT)
         AS union_size
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 5
        >= 3 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"""


def test_candidate_restricted_oracles_match_brute_force(duck):
    """The five rewritten near-dup-family oracles must return EXACTLY the
    brute-force all-pairs answer.  The char-gram brute join runs once
    (~25 s at sf0.01); minhash_pairs / incremental_minhash_dedup /
    dedup_components / leakage_safe_split all derive from it, setsim_pairs
    from the word-gram brute join."""
    import hashlib

    brute = duck.sql(_BRUTE_CHAR_PAIRS).fetchall()

    got = sorted(duck.sql(QUERIES["minhash_pairs"].oracle).fetchall())
    assert got == sorted(brute)

    got = sorted(duck.sql(QUERIES["incremental_minhash_dedup"].oracle).fetchall())
    assert got == sorted(
        (a, b, j) for a, b, j in brute if (a + b) % 2 == 1
    )

    # union-find over the brute edge set == the closure oracles
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in brute:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}

    got = duck.sql(QUERIES["dedup_components"].oracle).fetchall()
    assert sorted(got) == sorted(comp.items())

    def split_of(cluster):
        bucket = int(hashlib.md5(str(cluster).encode()).hexdigest()[:4], 16) % 100
        return "train" if bucket < 80 else ("val" if bucket < 90 else "test")

    all_ids = [r[0] for r in duck.sql("SELECT doc_id FROM documents").fetchall()]
    expect = sorted(
        (d, comp.get(d, d), split_of(comp.get(d, d))) for d in all_ids
    )
    got = sorted(duck.sql(QUERIES["leakage_safe_split"].oracle).fetchall())
    assert got == expect

    got = sorted(duck.sql(QUERIES["setsim_pairs"].oracle).fetchall())
    assert got == sorted(duck.sql(_BRUTE_WORD_PAIRS).fetchall())


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
