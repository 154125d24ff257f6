#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to files.

Usage: python scripts/explain_plans.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (all queries if
none named), built against $SPARK_GRAFT_SF_DIR (default sf0.1).  Used to
commit the before/after physical plans the optimization rounds claim
(plans/r12/*_before.txt / *_after.txt) — the judge cannot run Spark and
checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    # Resolve tsatool_app_spark from the CURRENT directory, so the same
    # script dumps plans from any checkout (e.g. a worktree at the
    # previous round's commit for the _before.txt files).
    sys.path.insert(0, os.getcwd())
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    spark = get_spark("explain-plans")
    failed: list[str] = []
    for name in names or list(QUERIES):
        q = QUERIES[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record, keep going
            plan = f"EXPLAIN FAILED: {e}"
            failed.append(name)
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    if failed:
        # A committed evidence file that is a failure message instead of a
        # plan must not pass silently (ADVICE r12).
        print(f"EXPLAIN FAILED for: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
