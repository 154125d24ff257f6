#!/usr/bin/env python
"""Scale rehearsal for the r3b additions: prefix-filtered set-similarity
join, degree-oriented triangle counting, and the BPE trainer, at
``--factor``× the bench SF (default 10× sf0.1).

- SETSIM: documents replicated factor× with id offsets and UNCHANGED
  text — the adversarial case for a similarity self-join, since every
  document becomes a factor-sized duplicate clique (C(factor,2) true
  pairs per doc). Prefix filtering must hold: candidates stay
  O(true pairs), not O(n²).
- TRIANGLES: orders replicated factor× with per-replica customer-key
  offsets — node and edge counts grow linearly, degree stays constant,
  so wall should grow ~linearly.
- BPE: 6 merges on the factor× corpus — vocabulary is unchanged (same
  words, freq ×factor), so per-iteration wall should be FLAT: the
  trainer's cost is a function of vocab size, not corpus size, after the
  one vocab-building pass.

Results go into SCALING.md's rehearsal table.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, factor: int, id_cols: dict[str, int]):
    """factor× copies with per-replica offsets on the given id columns
    (offset = replica * stride)."""
    reps = df.sparkSession.range(factor).withColumnRenamed("id", "rep")
    out = df.crossJoin(F.broadcast(reps))
    for c, stride in id_cols.items():
        out = out.withColumn(c, F.col(c) + F.col("rep") * stride)
    return out.drop("rep")


def run_setsim(spark, factor: int) -> dict:
    from tsatool_app_spark.functions.setsim import setsim_join

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = replicate(docs, factor, {"doc_id": 10_000_000})
    t0 = time.time()
    n_pairs = setsim_join(big, threshold_num=3, threshold_den=5).count()
    return {"docs": big.count(), "pairs": n_pairs, "wall_s": round(time.time() - t0, 1)}


def run_triangles(spark, factor: int) -> dict:
    from tsatool_app_spark.operators.graph import triangle_counts

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    big = replicate(
        o, factor, {"o_orderkey": 100_000_000, "o_custkey": 100_000_000}
    )
    a, b = big.alias("oa"), big.alias("ob")
    edges = a.join(
        b,
        (F.col("oa.o_custkey") == F.col("ob.o_custkey"))
        & (F.col("oa.o_orderkey") < F.col("ob.o_orderkey"))
        & (F.abs(F.datediff(F.col("oa.o_orderdate"), F.col("ob.o_orderdate"))) <= 30),
    ).select(F.col("oa.o_orderkey").alias("src"), F.col("ob.o_orderkey").alias("dst"))
    t0 = time.time()
    n_nodes = triangle_counts(edges).count()
    return {
        "orders": big.count(),
        "tri_nodes": n_nodes,
        "wall_s": round(time.time() - t0, 1),
    }


def run_bpe(spark, factor: int) -> dict:
    from tsatool_app_spark.functions.bpe import bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = replicate(docs, factor, {"doc_id": 10_000_000})
    t0 = time.time()
    merges = bpe_train(big, n_merges=6).collect()
    return {
        "docs": big.count(),
        "merges": len(merges),
        "top": (merges[0].left, merges[0].right, merges[0].pair_count),
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-setsim-graph")
    spark.range(1).count()
    for name, fn in [("setsim", run_setsim), ("triangles", run_triangles), ("bpe", run_bpe)]:
        print(f"{name} x{args.factor}: {fn(spark, args.factor)}", flush=True)
        # baseline at 1x for the ratio
        print(f"{name} x1: {fn(spark, 1)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
