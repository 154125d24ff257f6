#!/usr/bin/env python
"""Local emulation of the driver's correctness gate: run every registered
driver query's Spark plan AND its DuckDB oracle at sf0.01 and compare
row counts, schemas (column names), and values (columns sorted by name,
rows sorted, exact equality after normalizing timestamps/floats the way
the driver's value-hash would see them).

Usage: python scripts/selfcheck.py [query ...]   # default: all
"""

from __future__ import annotations

import math
import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None  # pandas renders SQL NULL in numeric/bool cols as NaN
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def main() -> None:
    import duckdb

    from tsatool_app_spark.model import TESTDATA_TABLES
    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # driver testdata is one file per table; generated tiers
        # (scripts/gen_sf1.py) are directories of part files
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    bad = []
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            bad.append(name)
            continue
        if not q.oracle:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {str(e)[:160]}")
            bad.append(name)
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            bad.append(name)
            continue
        srows = sorted(
            (tuple(_norm(v) for v in r) for r in sdf[scols].itertuples(index=False)),
            key=repr,
        )
        orows = sorted(
            (tuple(_norm(v) for v in r) for r in odf[ocols].itertuples(index=False)),
            key=repr,
        )
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            bad.append(name)
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {diff}:")
            print(f"  spark : {srows[diff]}")
            print(f"  oracle: {orows[diff]}")
            bad.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows")
    spark.stop()
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
