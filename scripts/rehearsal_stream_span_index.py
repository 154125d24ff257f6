#!/usr/bin/env python
"""Streaming span-contamination index rehearsal at volume (r8): drive
streaming_span_dedup over the clone-heavy sf10 dedup tier (500,600 docs,
scripts/gen_sf10_docs.py) in hash-spread micro-batches with a MID-STREAM
RESTART, and pin the contract against the one-shot batch detector:

1. INDEX EQUIVALENCE — after the full drain (across the restart) the
   persisted snapshot equals the batch span_doc_fingerprints relation
   exactly (both-ways anti-join on (doc_id, fp)).
2. COMPLETENESS, EXACTLY ONCE — every pair the capped BATCH detector
   emits appears in the accumulated stream matches (anti-join 0), and
   no pair is emitted twice (the later-document-arrival contract
   survives the restart).
3. THE CAP-TIMING CAVEAT, MEASURED — max_docs_per_fp is evaluated
   against the corpus-so-far, so the 600-copy giant cluster (spread
   across batches by the hash layout, crossing the 256 cap mid-stream)
   emits pairs while under the cap that the end-state batch run
   suppresses.  The rehearsal asserts the difference is EXACTLY that
   class: every stream-extra pair links two documents that both carry a
   fingerprint capped in the END state, and n_shared agrees with the
   batch on every common pair whose documents carry no capped
   fingerprint.
4. WALLS — per-batch probe+fold cost vs the one-shot batch join,
   recorded for SCALING.md (the per-ingest-batch cost is the number a
   100 TB continuously-assembled corpus pays on every landing).

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_stream_span_index.py
       [--files 6]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import tempfile
import time

SF10 = "/root/repo/.scratch/sf10docs"
CAP = 256


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.spans import (
        duplicated_span_pairs,
        hot_span_fingerprints,
        span_doc_fingerprints,
    )
    from tsatool_app_spark.session import get_spark
    from tsatool_app_spark.streaming.snapshot_store import read_snapshot
    from tsatool_app_spark.streaming.span_index import streaming_span_dedup

    spark = get_spark("rehearsal-stream-span-index")
    docs = spark.read.parquet(f"{SF10}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    print(f"tier: {n_docs} docs", flush=True)
    walls: dict[str, float] = {}

    work = tempfile.mkdtemp(prefix="streamspan_")
    src = f"{work}/docs"
    # Hash-spread layout: clone groups and the giant cluster straddle
    # every batch — the giant's ~600 copies land ~600/files per batch, so
    # its fingerprints cross the 256 cap MID-stream (the caveat regime).
    (
        docs.withColumn("_h", F.pmod(F.xxhash64("doc_id"), F.lit(args.files)))
        .repartitionByRange(args.files, "_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(src)
    )
    files = sorted(glob.glob(f"{src}/part-*.parquet"))
    print(f"{len(files)} stream files", flush=True)
    assert len(files) >= 4

    # -- one-shot batch baseline (shared arrow hashing pass) ----------------
    t0 = time.time()
    batch_fps = span_doc_fingerprints(docs, impl="arrow").localCheckpoint()
    n_batch_fps = batch_fps.count()
    walls["batch_fps"] = round(time.time() - t0, 1)
    t0 = time.time()
    batch_pairs = duplicated_span_pairs(
        fps=batch_fps, max_docs_per_fp=CAP, ordered=False
    ).localCheckpoint()
    n_batch_pairs = batch_pairs.count()
    walls["batch_pairs"] = round(time.time() - t0, 1)
    print(f"batch: {n_batch_fps} fps ({walls['batch_fps']}s), "
          f"{n_batch_pairs} capped pairs ({walls['batch_pairs']}s)", flush=True)

    # -- stream drain with a mid-stream restart -----------------------------
    live = f"{work}/live"
    os.makedirs(live)
    snap = f"{work}/snap"
    matches_path = f"{work}/matches"
    ckpt = f"{work}/ckpt"
    schema = docs.schema
    half = len(files) // 2
    t0 = time.time()
    for f in files[:half]:
        shutil.copy(f, live)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(live)
    )
    q = streaming_span_dedup(
        stream, snap, matches_path, checkpoint=ckpt, max_docs_per_fp=CAP
    )
    q.awaitTermination()
    print(f"  restart: {half} files drained, landing the rest and "
          f"resuming from {ckpt}", flush=True)
    for f in files[half:]:
        shutil.copy(f, live)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(live)
    )
    q = streaming_span_dedup(
        stream2, snap, matches_path, checkpoint=ckpt, max_docs_per_fp=CAP
    )
    q.awaitTermination()
    walls["stream_drain"] = round(time.time() - t0, 1)
    print(f"stream drain (restart after {half}/{len(files)}): "
          f"{walls['stream_drain']}s "
          f"(~{round(walls['stream_drain'] / len(files), 1)}s/batch)", flush=True)

    # -- 1: index equivalence ------------------------------------------------
    idx = read_snapshot(spark, snap).localCheckpoint()
    n_idx = idx.count()
    m1 = batch_fps.join(idx, ["doc_id", "fp"], "left_anti").count()
    m2 = idx.join(batch_fps, ["doc_id", "fp"], "left_anti").count()
    print(f"index: {n_idx} rows, batch-missing={m1}, stream-extra={m2}",
          flush=True)
    assert m1 == 0 and m2 == 0, "stream index != batch fingerprint relation"

    # -- 2: completeness, exactly once ----------------------------------------
    acc = spark.read.parquet(matches_path).localCheckpoint()
    n_acc, n_acc_d = acc.count(), acc.select("id_a", "id_b").distinct().count()
    missing = batch_pairs.join(acc, ["id_a", "id_b"], "left_anti").count()
    print(f"accumulated: {n_acc} rows ({n_acc_d} distinct pairs), "
          f"batch-missing={missing}", flush=True)
    assert n_acc == n_acc_d, "a pair was emitted twice (restart broke once-ness)"
    assert missing == 0, "stream missed pairs the batch detector finds"

    # -- 3: the cap-timing caveat is exactly the capped-fp class --------------
    extras = acc.join(batch_pairs, ["id_a", "id_b"], "left_anti").localCheckpoint()
    n_extra = extras.count()
    hot = hot_span_fingerprints(fps=idx, max_docs_per_fp=CAP).select("fp")
    capped_docs = (
        idx.join(hot, "fp", "left_semi").select("doc_id").distinct()
        .localCheckpoint()
    )
    n_capped_docs = capped_docs.count()
    bad = (
        extras.join(capped_docs.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
        .join(capped_docs.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        .count()
    )
    print(f"stream-extra pairs: {n_extra} (docs carrying an end-capped fp: "
          f"{n_capped_docs}); extras where BOTH docs are in that class: {bad}",
          flush=True)
    assert bad == n_extra, (
        "a stream-extra pair does not link two capped-fp docs — the caveat "
        "class is wrong"
    )
    # n_shared agreement outside the capped class
    clean = (
        acc.join(capped_docs.withColumnRenamed("doc_id", "id_a"), "id_a", "left_anti")
        .join(capped_docs.withColumnRenamed("doc_id", "id_b"), "id_b", "left_anti")
    )
    disagree = (
        clean.join(
            batch_pairs.withColumnRenamed("n_shared", "_nb"), ["id_a", "id_b"]
        )
        .where(F.col("n_shared") != F.col("_nb"))
        .count()
    )
    print(f"n_shared disagreements outside the capped class: {disagree}",
          flush=True)
    assert disagree == 0

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "sf": "sf10docs", "n_docs": n_docs, "files": len(files),
        "walls": walls, "n_index": n_idx, "n_batch_pairs": n_batch_pairs,
        "n_stream_pairs": n_acc, "n_extras_capped_class": n_extra,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
