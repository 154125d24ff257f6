#!/usr/bin/env python
"""Per-job breakdown for one registry query: job id, duration, stage count,
task count, and the first line of the job's call-site name — which code
path submitted it.  Companion to job_census.py for the r13 job-floor work.

Usage: python scripts/job_census_detail.py query
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.getcwd())
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    spark = get_spark("job-census-detail")
    sc = spark.sparkContext
    spark.range(1).count()

    j0 = int(sc._jsc.sc().dagScheduler().nextJobId())  # noqa: SLF001
    t0 = time.time()
    df = QUERIES[name].fn(spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    j1 = int(sc._jsc.sc().dagScheduler().nextJobId())  # noqa: SLF001

    store = spark._jsparkSession.sparkContext().statusStore()  # noqa: SLF001
    jobs = store.jobsList(None)
    print(f"# {name}: {j1 - j0} jobs, wall {wall:.2f}s, rows {n}", file=sys.stderr)
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if not (j0 <= j.jobId() < j1):
            continue
        dur = -1.0
        if j.completionTime().isDefined() and j.submissionTime().isDefined():
            dur = (
                j.completionTime().get().getTime()
                - j.submissionTime().get().getTime()
            ) / 1000.0
        nm = (j.name() or "").split("\n")[0][:110]
        print(
            f"job {j.jobId():4d}  {dur:6.2f}s  stages={j.stageIds().size():2d}  "
            f"tasks={j.numTasks():4d}  {nm}"
        )
        if dur >= float(os.environ.get("CENSUS_STAGE_DETAIL_MIN_S", "0.5")):
            sids = [j.stageIds().apply(k) for k in range(j.stageIds().size())]
            for sid in sorted(sids):
                try:
                    sdata = store.lastStageAttempt(sid)
                except Exception:  # noqa: BLE001 - skipped stages have no attempt
                    continue
                desc = (sdata.name() or "").split("\n")[0][:100]
                det = (sdata.details() or "").split("\n")
                frames = [
                    ln.strip()
                    for ln in det
                    if "tsatool_app_spark" in ln
                ][:2]
                print(f"    stage {sid:4d} tasks={sdata.numTasks():4d}  {desc}")
                for fr in frames:
                    print(f"        {fr[:120]}")
    spark.stop()


if __name__ == "__main__":
    main()
