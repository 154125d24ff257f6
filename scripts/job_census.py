#!/usr/bin/env python
"""Count Spark jobs per registry query — the instrument for the r13
job-floor work (VERDICT r12 #1/#4: pretraining_mix ran 63 driver-visible
jobs at sf0.1; each eager gate costs a ~0.15-0.3 s floor at bench tiers).

Usage: python scripts/job_census.py query [query ...]

For each named query: runs it to completion (count) inside a dedicated
job group and prints {"query": ..., "jobs": N, "wall_s": W}.  One fresh
SparkSession for the whole run (matches bench.py's JVM shape).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.getcwd())
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    spark = get_spark("job-census")
    sc = spark.sparkContext
    spark.range(1).count()  # warm the JVM outside any measured group

    def next_job_id() -> int:
        # Total jobs submitted so far, including AQE stage jobs and
        # broadcast jobs fired from non-driver threads (which do NOT
        # inherit the thread-local job group) — the honest census.
        return int(sc._jsc.sc().dagScheduler().nextJobId())  # noqa: SLF001

    for name in names:
        q = QUERIES[name]
        group = f"census-{name}"
        sc.setJobGroup(group, name)
        j0 = next_job_id()
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        n = df.count()
        wall = time.time() - t0
        j1 = next_job_id()
        sc.setJobGroup("census-idle", "idle")
        grouped = sc.statusTracker().getJobIdsForGroup(group)
        print(
            json.dumps(
                {
                    "query": name,
                    "jobs": j1 - j0,
                    "jobs_in_group": len(grouped),
                    "wall_s": round(wall, 2),
                    "rows": n,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
