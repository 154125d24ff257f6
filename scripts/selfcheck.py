#!/usr/bin/env python
"""Local emulation of the driver's correctness gate: run every registered
driver query's Spark plan AND its DuckDB oracle at sf0.01 and compare
row counts, schemas (column names), and values (columns sorted by name,
rows sorted, exact equality after normalizing timestamps/floats the way
the driver's value-hash would see them).

Usage: python scripts/selfcheck.py [query ...]   # default: all

Non-vacuity net (r9 VERDICT #5): a value-green row with 0 rows certifies
nothing — both engines can agree on an accidentally-empty result (the
%97-bench composition queries legitimately go empty on replica-structured
sweep tiers where decontamination correctly drops ~everything).  Any
green-but-empty query that is NON-empty in the sf0.01 baseline manifest
(scripts/ci_expected.txt) gets a loud VACUOUS warning on stderr, plus an
end-of-run summary; manifest-diffed stdout is unchanged.
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

    # sf0.01 baseline row counts for the vacuity net ("ok name: N rows")
    baseline: dict[str, int] = {}
    manifest = os.path.join(os.path.dirname(__file__), "ci_expected.txt")
    if os.path.exists(manifest):
        for line in open(manifest):
            parts = line.split()
            if len(parts) >= 4 and parts[0] in ("ok", "rows-only"):
                baseline[parts[1].rstrip(":")] = int(parts[2])
    vacuous: list[str] = []

    def check_vacuity(name: str, n_rows: int) -> None:
        base = baseline.get(name)
        if n_rows == 0 and (base is None or base > 0):
            vacuous.append(name)
            print(
                f"VACUOUS {name}: green but 0 rows at this tier"
                f" (sf0.01 baseline: {base if base is not None else '?'})"
                " — the value match certifies nothing here",
                file=sys.stderr,
            )

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
            check_vacuity(name, len(sdf))
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
            check_vacuity(name, len(srows))
    spark.stop()
    if vacuous:
        print(
            f"VACUITY WARNING: {len(vacuous)} green-but-empty quer"
            f"{'y' if len(vacuous) == 1 else 'ies'} at this tier:"
            f" {', '.join(vacuous)} (non-empty at sf0.01 — their value"
            " match here is vacuous; see SCALING.md for known-degenerate"
            " tier/query combinations)",
            file=sys.stderr,
        )
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
