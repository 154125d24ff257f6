#!/usr/bin/env python
"""Scale rehearsal for the r3c operators: bloom runtime filter, Gram
matrix, incremental minhash index. Replicates sf0.1 inputs by --factor
with shifted ids (same recipe as scale_rehearsal.py) and reports wall
times, so SCALING.md rows are measured, not argued.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_r3c.py [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, factor: int, id_cols: list[str], shift: int):
    from pyspark.sql import functions as F

    out = []
    for i in range(factor):
        d = df
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + F.lit(i * shift))
        out.append(d)
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), out)


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label:44s} {dt:7.2f} s   ({n} rows)")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsatool_app_spark.model import load_table
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-r3c")
    spark.range(1).count()

    l = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    f = args.factor
    big_l = replicate(l, f, ["l_orderkey"], 10_000_000).localCheckpoint()
    big_o = replicate(o, f, ["o_orderkey"], 10_000_000).localCheckpoint()
    big_emb = replicate(emb, f, ["vec_id"], 10_000_000).localCheckpoint()
    big_docs = replicate(docs, f, ["doc_id"], 10_000_000).localCheckpoint()
    print(
        f"inputs x{f}: lineitem={big_l.count():,} orders={big_o.count():,} "
        f"embeddings={big_emb.count():,} documents={big_docs.count():,}"
    )

    from tsatool_app_spark.operators.runtime_filter import bloom_semi_join

    keys = big_o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    timed(
        f"bloom_semi_join ({f}x lineitem)",
        lambda: bloom_semi_join(big_l, keys, "l_orderkey").count(),
    )
    timed(
        f"plain left-semi join ({f}x lineitem)",
        lambda: big_l.join(keys, "l_orderkey", "left_semi").count(),
    )

    from tsatool_app_spark.functions.linalg import gram_matrix

    timed(
        f"gram_matrix ({f}x embeddings)",
        lambda: gram_matrix(big_emb).count(),
    )

    import shutil
    import tempfile

    from tsatool_app_spark.streaming.dedup_index import (
        incremental_probe_and_update,
    )

    tmp = tempfile.mkdtemp(prefix="dedup_idx_")
    try:
        half = big_docs.where(F.col("doc_id") % 2 == 0)
        batch = big_docs.where(F.col("doc_id") % 2 == 1)
        timed(
            f"incremental index build ({f}x/2 docs)",
            lambda: incremental_probe_and_update(spark, tmp, half).count(),
        )
        timed(
            f"incremental probe+fold ({f}x/2 docs)",
            lambda: incremental_probe_and_update(spark, tmp, batch).count(),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
