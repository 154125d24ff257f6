#!/usr/bin/env python
"""Streaming incremental dedup-index rehearsal at volume (r6 VERDICT
next-round #6): drive streaming_minhash_dedup over the clone-heavy sf1
corpus (50k docs, every text a 10-clone) with the r6 opt-in
``dedup_texts=True`` signature path and a MID-STREAM RESTART, and assert:

1. INDEX EQUIVALENCE — after the full drain (across the restart), the
   persisted snapshot index equals the batch-computed
   ``band_bucket_keys(all_docs)`` exactly (both-ways anti-join on
   (doc_id, band, bucket)), and the dedup_texts path contributed
   identical rows (its unit pin, now at 50k docs through a real
   foreachBatch + snapshot-store lifecycle).
2. CANDIDATE COMPLETENESS, EXACTLY ONCE — every within-clone-group pair
   (truth = md5(text) groups: 5k groups x C(10,2) = 225k pairs) appears
   in the emitted matches (identical texts share every band bucket, so
   LSH candidate recall on them is certain), and no pair is emitted
   twice (the later-document-arrival contract survives the restart).
3. INDEX-BUILD WIN — the claimed dedup_texts advantage on clone-heavy
   batches, measured: full-corpus ``band_bucket_keys`` materialization
   wall with dedup_texts on vs off, plus the end-to-end stream drain
   wall both ways.  Batches are ordered by (doc_id % 10_000_000) so
   each micro-batch carries ~10 clones per distinct text — the
   index-build regime the knob is FOR (doc-id-ordered replica waves
   would make every batch all-distinct and the rep pass pure overhead).

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_stream_dedup_index.py
       [--files 10]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

SF1 = "/root/repo/.scratch/sf1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsatool_app_spark.session import get_spark
    from tsatool_app_spark.streaming.dedup_index import (
        band_bucket_keys,
        streaming_minhash_dedup,
    )
    from tsatool_app_spark.streaming.snapshot_store import read_snapshot

    spark = get_spark("rehearsal-stream-dedup-index")
    docs = spark.read.parquet(f"{SF1}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs", flush=True)

    work = tempfile.mkdtemp(prefix="streamdedup_")
    src = f"{work}/docs"
    walls: dict[str, float] = {}

    # Clone-heavy batch layout: order by base id so a batch of ~n/files
    # rows holds whole 10-clone groups (groups straddling a file boundary
    # exercise the cross-batch probe path).
    (
        docs.withColumn("_base", F.col("doc_id") % 10_000_000)
        .repartitionByRange(args.files, "_base")
        .sortWithinPartitions("_base", "doc_id")
        .drop("_base")
        .write.mode("overwrite").parquet(src)
    )
    import glob
    import os

    files = sorted(glob.glob(f"{src}/part-*.parquet"))
    print(f"{len(files)} stream files", flush=True)
    assert len(files) >= 4

    # -- 3a: index-build A/B on the full corpus (the claimed win) -----------
    for mode in (False, True):
        t0 = time.time()
        n = band_bucket_keys(docs, dedup_texts=mode).count()
        walls[f"index_build_dedup_texts_{mode}"] = round(time.time() - t0, 1)
        print(f"band_bucket_keys(dedup_texts={mode}): {n} rows, "
              f"wall={walls[f'index_build_dedup_texts_{mode}']}s", flush=True)
    keys_off = band_bucket_keys(docs, dedup_texts=False)
    keys_on = band_bucket_keys(docs, dedup_texts=True)
    d1 = keys_off.join(keys_on, ["doc_id", "band", "bucket"], "left_anti").count()
    d2 = keys_on.join(keys_off, ["doc_id", "band", "bucket"], "left_anti").count()
    assert d1 == 0 and d2 == 0, "dedup_texts must produce identical index rows"
    print("index rows identical across dedup_texts modes", flush=True)

    # -- stream both ways; dedup_texts=True gets the mid-stream restart -----
    def drive(mode: bool, restart: bool) -> tuple[str, str, float]:
        live = f"{work}/live_{mode}"
        os.makedirs(live)
        snap = f"{work}/snap_{mode}"
        matches = f"{work}/matches_{mode}"
        ckpt = f"{work}/ckpt_{mode}"
        schema = docs.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(live)
        )
        t0 = time.time()
        half = len(files) // 2 if restart else len(files)
        for f in files[:half]:
            shutil.copy(f, live)
        q = streaming_minhash_dedup(
            stream, snap, matches, checkpoint=ckpt, dedup_texts=mode
        )
        q.awaitTermination()
        if restart:
            print(f"  restart: {half} files drained, landing the rest "
                  f"and resuming from {ckpt}", flush=True)
            for f in files[half:]:
                shutil.copy(f, live)
            stream2 = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(live)
            )
            q = streaming_minhash_dedup(
                stream2, snap, matches, checkpoint=ckpt, dedup_texts=mode
            )
            q.awaitTermination()
        return snap, matches, round(time.time() - t0, 1)

    snap_on, matches_on, walls["stream_dedup_texts_True"] = drive(True, restart=True)
    print(f"stream drain (dedup_texts=True, with restart): "
          f"{walls['stream_dedup_texts_True']}s", flush=True)
    snap_off, matches_off, walls["stream_dedup_texts_False"] = drive(
        False, restart=False
    )
    print(f"stream drain (dedup_texts=False): "
          f"{walls['stream_dedup_texts_False']}s", flush=True)

    # -- 1: index equivalence -------------------------------------------------
    batch_keys = band_bucket_keys(docs).localCheckpoint()
    for label, snap in (("dedup_texts=True", snap_on), ("dedup_texts=False", snap_off)):
        idx = read_snapshot(spark, snap)
        n_idx = idx.count()
        m1 = batch_keys.join(idx, ["doc_id", "band", "bucket"], "left_anti").count()
        m2 = idx.join(batch_keys, ["doc_id", "band", "bucket"], "left_anti").count()
        print(f"index ({label}): {n_idx} rows, batch-missing={m1}, "
              f"stream-extra={m2}", flush=True)
        assert m1 == 0 and m2 == 0, f"index != batch keys ({label})"

    # -- 2: candidate completeness, exactly once ------------------------------
    groups = docs.select(F.md5("text").alias("_h"), "doc_id")
    truth = (
        groups.alias("a")
        .join(
            groups.alias("b"),
            (F.col("a._h") == F.col("b._h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .localCheckpoint()
    )
    n_truth = truth.count()
    for label, mpath in (("dedup_texts=True", matches_on),
                         ("dedup_texts=False", matches_off)):
        # project to the pair columns: the r9 sink partitions by batch_id,
        # and a whole-row distinct would hide a pair re-emitted in a
        # DIFFERENT batch (the exact failure this assert exists to catch)
        m = spark.read.parquet(mpath).select("id_a", "id_b")
        n_m, n_md = m.count(), m.distinct().count()
        missing = truth.join(m, ["id_a", "id_b"], "left_anti").count()
        print(f"matches ({label}): {n_m} rows ({n_md} distinct), "
              f"clone-pair truth {n_truth}, missing={missing}", flush=True)
        assert missing == 0, f"clone pair not surfaced ({label})"
        assert n_m == n_md, f"pair emitted twice ({label})"

    shutil.rmtree(work)
    print(json.dumps({"n_docs": n_docs, "walls": walls}))


if __name__ == "__main__":
    main()
