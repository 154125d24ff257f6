#!/usr/bin/env python
"""Scale rehearsal for the r3 warehouse join shapes + EWMA + the
attribution interval join + the HLL sketch rollup, one-two decades beyond
the bench SF: replicate facts ``--factor``× (unique keys per replica) and
re-run each operator.

Expectations at factor F (the 100 TB lens):
- Q7: one fact-fact shuffle join grows linearly; dims stay broadcast →
  wall ~linear in F, far sublinear vs the F² a nested plan would cost.
- Q21: the semi/anti joins reuse ONE shuffle of lineitem by orderkey;
  wall ~linear in F.
- EWMA: applyInPandas parallel across keys; wall ~linear in rows/keys.

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


def replicated(spark, table: str, factor: int, key_cols: list[str], offset: int):
    """factor copies with replica-offset integer keys (keeps join
    selectivity identical per replica)."""
    df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    out = df.crossJoin(F.broadcast(reps))
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("rep") * F.lit(offset))
    return out.drop("rep")


def run_q7(spark, factor: int) -> float:
    from tsatool_app_spark.plans.driver_queries import _revenue_col

    li = replicated(spark, "lineitem", factor, ["l_orderkey"], 10_000_000)
    o = replicated(spark, "orders", factor, ["o_orderkey"], 10_000_000)
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    s = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    n = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    t0 = time.time()
    df = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
    )
    n_rows = df.count()
    return time.time() - t0, n_rows


def run_q21(spark, factor: int) -> float:
    li = replicated(spark, "lineitem", factor, ["l_orderkey"], 10_000_000)
    o = replicated(spark, "orders", factor, ["o_orderkey"], 10_000_000)
    s = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    t0 = time.time()
    df = (
        l1.join(
            o.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            l1.l_orderkey == F.col("o_orderkey"),
        )
        .join(l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "leftsemi")
        .join(l3, (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3), "leftanti")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
    n_rows = df.count()
    return time.time() - t0, n_rows


def run_ewma(spark, factor: int) -> float:
    from tsatool_app_spark.operators.timeseries import ewma_by_key

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).where(
        F.col("event_type") == "purchase"
    )
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("user_id") + F.col("rep") * F.lit(1_000_000)).alias("user_id"),
            (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
            "value",
        )
    )
    t0 = time.time()
    out = ewma_by_key(big, key_col="user_id", order_col="event_id", value_col="value")
    n_rows = out.count()
    return time.time() - t0, n_rows


def run_attribution(spark, factor: int):
    from tsatool_app_spark.streaming.join_stream import (
        attribute_purchases,
        click_purchase_pairs,
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("user_id") + F.col("rep") * F.lit(1_000_000)).alias("user_id"),
        (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
        "event_type", "ts", "value",
    )
    t0 = time.time()
    pairs = click_purchase_pairs(
        big.where(F.col("event_type") == "click"),
        big.where(F.col("event_type") == "purchase"),
        window_seconds=86400,
    )
    n = attribute_purchases(pairs).count()
    return time.time() - t0, n


def run_hll(spark, factor: int):
    from tsatool_app_spark.functions.sketches import hll_rollup

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("user_id") + F.col("rep") * F.lit(1_000_000)).alias("user_id"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).withColumn("week", F.date_trunc("week", F.col("day")).cast("date"))
    t0 = time.time()
    n = hll_rollup(big, ["week", "day"], ["week"], "user_id").count()
    return time.time() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-joins")
    for name, fn in [("q7_flow", run_q7), ("q21_semi_anti", run_q21), ("ewma", run_ewma),
                     ("attribution", run_attribution), ("hll_rollup", run_hll)]:
        base_t, base_n = fn(spark, 1)
        big_t, big_n = fn(spark, args.factor)
        print(
            f"{name}: 1x={base_t:.2f}s ({base_n} rows)  "
            f"{args.factor}x={big_t:.2f}s ({big_n} rows)  "
            f"scale={big_t / base_t:.2f}x wall for {args.factor}x data"
        )
    spark.stop()


if __name__ == "__main__":
    main()
