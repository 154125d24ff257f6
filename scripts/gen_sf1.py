#!/usr/bin/env python
"""Generate an sf1.0 bench tier (10x sf0.1) by replicating the driver
testdata with CONSISTENT key shifts, so referential integrity holds:
orders' shifted o_custkey points at the identically shifted customer, and
lineitem's shifted l_orderkey/l_partkey/l_suppkey follow suit. Dimension
tables (region, nation) stay 1x, like real scale-ups. documents/embeddings
replicate with identical payloads — every doc becomes a 10-clone cluster,
which is an HONEST (web-corpus-like) stress for the dedup family.

Output: /root/repo/.scratch/sf1/*.parquet (gitignored).
Usage: PYTHONPATH=/root/repo python scripts/gen_sf1.py [--factor 10]
       [--src DIR] [--dst DIR]

r12: --factor 100 --dst /root/repo/.scratch/sf10 builds the sf10 tier
for the >2x-adjudication board (key shifts stay collision-free to
factor <= 1000: the smallest shift stride is 1M for suppkey vs 1k
suppliers/copy at sf0.1).
"""

from __future__ import annotations

import argparse
import os
from functools import reduce

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/root/repo/.scratch/sf1"

SHIFTS = {
    "c_custkey": 10_000_000, "o_custkey": 10_000_000,
    "s_suppkey": 1_000_000, "l_suppkey": 1_000_000,
    "p_partkey": 5_000_000, "l_partkey": 5_000_000,
    "o_orderkey": 100_000_000, "l_orderkey": 100_000_000,
    "event_id": 100_000_000, "user_id": 10_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
}
COPY_ONLY = {"region", "nation"}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", default=DST)
    args = ap.parse_args()
    src, dst = args.src, args.dst

    from pyspark.sql import functions as F

    from tsatool_app_spark.session import get_spark

    spark = get_spark("gen-sf1")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in COPY_ONLY:
            out = df
        else:
            shifted = []
            for i in range(args.factor):
                d = df
                for c in df.columns:
                    if c in SHIFTS:
                        d = d.withColumn(
                            c, (F.col(c) + F.lit(i * SHIFTS[c])).cast(dict(df.dtypes)[c])
                        )
                shifted.append(d)
            out = reduce(lambda a, b: a.unionByName(b), shifted)
        # one directory per table; model.load_table accepts both layouts
        out.repartition(max(8, args.factor // 4) if t not in COPY_ONLY else 1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
