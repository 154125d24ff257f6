#!/usr/bin/env python
"""Scale rehearsal for the r3 pipeline operators: CDC MERGE and the
composed clean_corpus pass, one-two decades beyond the bench SF.

1. MERGE — apply an orders-derived change stream replicated
   ``--changes-factor``× (unique seq per replica) onto the customer base:
   the reduce-then-join plan's wall should scale with the CHANGE volume,
   with the windowed terminal-pick as the only wide stage over the big
   side.
2. CLEAN — clean_corpus over sf0.1 documents replicated ``--docs-factor``×
   with per-replica id offsets and UNCHANGED text: every replica is an
   exact duplicate group, so the dedup survivorship stage does real work
   (survivors = one replica's worth) while lang/quality/redaction run at
   scan speed on factor× rows.

Results go into SCALING.md's rehearsal table.

Usage: python scripts/rehearsal_pipeline_ops.py [--changes-factor 100]
       [--docs-factor 100]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def run_merge(spark, factor: int, workdir: str) -> dict:
    from tsatool_app_spark.operators.cdc import apply_changes
    from tsatool_app_spark.plans.driver_queries import _synthetic_changes

    changes = _synthetic_changes(spark, SF_DIR)
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big = changes.crossJoin(F.broadcast(reps)).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        # unique, replica-ordered seq so the terminal pick has real work
        (F.col("seq") * factor + F.col("rep")).alias("seq"),
        "op",
    )
    path = os.path.join(workdir, "changes")
    big.repartition(64).write.mode("overwrite").parquet(path)
    base = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    changes_big = spark.read.parquet(path)
    n_changes = changes_big.count()
    t0 = time.time()
    out = apply_changes(base, changes_big, "c_custkey", "seq")
    n_out = out.count()
    wall = time.time() - t0
    return {"n_changes": n_changes, "n_out": n_out, "wall_s": round(wall, 2)}


def run_clean(spark, factor: int, workdir: str) -> dict:
    from tsatool_app_spark.functions.corpus import clean_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
    )
    path = os.path.join(workdir, "docs")
    big.repartition(64).write.mode("overwrite").parquet(path)
    docs_big = spark.read.parquet(path)
    n_docs = docs_big.count()
    t0 = time.time()
    out = clean_corpus(docs_big, lang="en", min_quality=0.6)
    n_out = out.count()
    wall = time.time() - t0
    return {"n_docs": n_docs, "n_out": n_out, "wall_s": round(wall, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changes-factor", type=int, default=100)
    ap.add_argument("--docs-factor", type=int, default=100)
    args = ap.parse_args()

    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-pipeline-ops")
    spark.range(1).count()
    workdir = tempfile.mkdtemp(prefix="rehearsal_ops_")
    try:
        m = run_merge(spark, args.changes_factor, workdir)
        print(f"MERGE factor={args.changes_factor}: {m}")
        c = run_clean(spark, args.docs_factor, workdir)
        print(f"CLEAN factor={args.docs_factor}: {c}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
