#!/usr/bin/env python
"""Streaming pack_ranges rehearsal at 10 M events with a mid-stream
checkpoint restart (r3 VERDICT next-round #6).

Protocol:
1. Generate 10 M observations (500 sensor keys x 20k readings, 1-minute
   steps, deterministic hash-derived values crossing the threshold) as 20
   time-ordered parquet files.
2. Stream run A (availableNow) over the first 10 files -> STOP the query.
3. Land the remaining 10 files, restart from the SAME checkpoint, drain.
4. Assert the streamed closed runs equal the batch pack_ranges result over
   the full input minus each key's final (still-open) run — the
   restart-equivalence check at volume.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_stream_10m.py
       [--rows 10000000] [--keys 500]
"""

from __future__ import annotations

import argparse
import shutil
import tempfile
import time

N_FILES = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=500)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        FloatType,
        IntegerType,
        StructField,
        StructType,
        TimestampType,
    )

    from tsatool_app_spark.operators.ranges import (
        pack_ranges_from_stepped,
        prepare_stepped_obs,
    )
    from tsatool_app_spark.session import get_spark
    from tsatool_app_spark.streaming.pack_ranges_stream import (
        pack_ranges_stream,
        stream_observations,
    )

    spark = get_spark("rehearsal-stream-10m")
    work = tempfile.mkdtemp(prefix="stream10m_")
    src = f"{work}/obs"
    ckpt = f"{work}/ckpt"
    outp = f"{work}/out"

    rows, keys = args.rows, args.keys
    per_key = rows // keys
    schema = StructType(
        [
            StructField("tfrom", TimestampType(), False),
            StructField("statid", IntegerType(), False),
            StructField("seid", IntegerType(), False),
            StructField("seval", FloatType(), False),
        ]
    )

    # Deterministic synthetic series: value = (xxhash64(statid, idx) mod
    # 1000) / 1000 — crosses the 0.5 threshold constantly, so runs stay
    # short and the islands merge does real work.
    base = (
        spark.range(rows)
        .select(
            (F.col("id") % keys).cast("int").alias("statid"),
            (F.col("id") / keys).cast("long").alias("idx"),
        )
        .select(
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.col("idx"))
            ).alias("tfrom"),
            "statid",
            F.lit(3).cast("int").alias("seid"),
            ((F.xxhash64("statid", "idx") % 1000 + 1000) % 1000 / 1000.0)
            .cast("float")
            .alias("seval"),
            F.col("idx"),
        )
    )
    t0 = time.time()
    chunk = per_key // N_FILES
    for i in range(N_FILES):
        (
            base.where(
                (F.col("idx") >= i * chunk) & (F.col("idx") < (i + 1) * chunk)
            )
            .drop("idx")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    print(f"generated {rows} rows in {N_FILES} time-ordered files "
          f"({time.time() - t0:.1f} s)", flush=True)

    # batch truth over the full input, minus each key's final open run
    full = spark.read.schema(schema).parquet(src)
    t0 = time.time()
    batch = pack_ranges_from_stepped(
        prepare_stepped_obs(full, 30), ">=", 0.5
    ).localCheckpoint()
    w_last = F.row_number().over(
        Window.partitionBy("statid", "seid").orderBy(F.desc("vfrom"))
    )
    expected = batch.withColumn("_rn", w_last).where(F.col("_rn") > 1).drop("_rn")
    n_expected = expected.count()
    print(f"batch pack_ranges: {batch.count()} runs "
          f"({n_expected} closed) in {time.time() - t0:.1f} s", flush=True)

    def run_stream():
        q = (
            pack_ranges_stream(
                stream_observations(
                    spark, src, schema=schema, max_files_per_trigger=3
                ),
                30,
                ">=",
                0.5,
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(560)

    # Phase A: hide the last 10 files (move aside), stream, stop.
    import glob
    import os

    files = sorted(glob.glob(f"{src}/part-*"))
    assert len(files) >= N_FILES, f"expected >= {N_FILES} part files"
    aside = f"{work}/aside"
    os.makedirs(aside)
    # keep the FIRST half by write order (files were written sequentially,
    # so sorting by mtime == time order; part names are per-write random,
    # so sort by mtime)
    files = sorted(glob.glob(f"{src}/part-*"), key=os.path.getmtime)
    for fpath in files[N_FILES // 2 :]:
        shutil.move(fpath, aside)

    t0 = time.time()
    run_stream()
    t_a = time.time() - t0
    n_a = spark.read.schema(batch.schema).parquet(outp).count()
    print(f"stream run A (first half, restart pending): {n_a} closed runs "
          f"in {t_a:.1f} s", flush=True)

    # Phase B: land the second half, RESTART from the same checkpoint.
    for fpath in sorted(glob.glob(f"{aside}/part-*"), key=os.path.getmtime):
        shutil.move(fpath, src)
    t0 = time.time()
    run_stream()
    t_b = time.time() - t0
    streamed = spark.read.schema(batch.schema).parquet(outp)
    n_total = streamed.count()
    print(f"stream run B (restart + second half): total {n_total} closed "
          f"runs in {t_b:.1f} s", flush=True)

    # Restart-equivalence: streamed closed runs == batch minus open runs.
    diff1 = streamed.exceptAll(expected).count()
    diff2 = expected.exceptAll(streamed).count()
    print(f"equivalence: stream-minus-batch={diff1} batch-minus-stream={diff2}")
    assert diff1 == 0 and diff2 == 0, "restart-equivalence FAILED"
    print(f"RESTART-EQUIVALENT at {rows} rows / {keys} keys "
          f"(A {t_a:.1f} s + B {t_b:.1f} s, batch truth {n_expected} runs)")

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
