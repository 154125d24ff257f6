"""Incremental near-duplicate index: probe new documents against the
band-bucket index of everything ingested so far, then fold them in.

Batch near-dedup (functions/dedup.minhash_near_dup_pairs) answers "which
pairs inside THIS corpus are near-dups"; a growing training corpus needs
the incremental question — "is this NEW document a near-dup of anything
already ingested" — without re-running LSH over history.  The index is the
(doc_id, band, bucket) relation itself: probing is ONE equi-join of the
new batch's keys against it, updating is a union — both proportional to
the batch, never the corpus.  State persists through the crash-safe
versioned snapshot store (streaming/snapshot_store.py), exactly like the
continuous aggregates in incremental_stream.py.

At 100 TB: the index carries bands × |corpus| fixed-width rows (ids and
two ints — no text, no signatures), the probe join shuffles only the
batch's keys when the index side is bucketed/partitioned by (band,
bucket), and the verify step (exact n-gram Jaccard) touches candidate
pairs only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsatool_app_spark.functions.dedup import _band_keys, minhash_signatures
from tsatool_app_spark.streaming.snapshot_store import (
    append_snapshot_segment,
    is_batch_folded,
    read_snapshot,
)


def band_bucket_keys(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    dedup_texts: bool = False,
) -> DataFrame:
    """(id, band, bucket) index rows for a document slice — MinHash
    signatures banded to bucket keys (the same construction the batch
    self-join uses, so batch and incremental agree bucket-for-bucket).

    ``dedup_texts``: run the shingle explode + 64-hash min-agg over one
    min-id representative per distinct md5(text), fanning the rep's keys
    back out through the md5 groups — identical rows (pinned by
    test_band_bucket_keys_dedup_texts_matches_direct).  Default OFF: in
    the probe-and-verify query the signature pass is not the bottleneck
    (sf1 measured 6.3 -> 5.8 s on, and the extra joins cost ~2x on the
    mostly-distinct sf0.1 tier).  Turn it on for clone-heavy STREAM
    batches: the r7 volume rehearsal
    (scripts/rehearsal_stream_dedup_index.py, 50k docs in 10:1-clone
    micro-batches with a mid-stream restart) measured the full drain at
    29.4 s vs 37.1 s off — a 1.26x win where each batch's rep set is
    small — while a ONE-SHOT whole-corpus build at the same tier
    measured 5.0 s vs 3.8 s off (the fan-out joins outgrow the
    signature savings when the rep set is large relative to the batch).
    The knob is per-call; index rows are identical either way."""
    if dedup_texts:
        groups = docs.select(
            F.md5(F.col(text_col)).alias("_h"), F.col(id_col)
        ).localCheckpoint(eager=False)
        rep = groups.groupBy("_h").agg(F.min(id_col).alias("_rep"))
        reps = rep.join(
            docs.select(F.col(id_col).alias("_rep"), F.col(text_col)), "_rep"
        )
        sig = minhash_signatures(
            reps,
            text_col=text_col,
            id_col="_rep",
            num_hashes=num_hashes,
            shingle_k=shingle_k,
        )
        rep_keys = _band_keys(sig, bands, num_hashes // bands, "_rep")
        return (
            groups.join(rep, "_h")
            .join(rep_keys, "_rep")
            .select(F.col(id_col), "band", "bucket")
        )
    sig = minhash_signatures(
        docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
    )
    return _band_keys(sig, bands, num_hashes // bands, id_col)


def probe_index(
    index: DataFrame,
    new_keys: DataFrame,
    *,
    id_col: str = "doc_id",
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Candidate matches of new documents against the index: (id_a, id_b)
    with id_a < id_b, a pair iff the two share ≥ 1 (band, bucket).

    ``max_bucket_size`` guards the same quadratic hot-bucket edge as the
    batch join — index buckets above the cap are excluded (route those
    clusters through exact dedup; the audit companion is
    functions/dedup.minhash_oversize_buckets).  Bucket size counts
    DISTINCT doc_ids — identical to the row count on a well-formed index
    (one row per doc per band), but robust to a duplicated segment
    (defense-in-depth behind snapshot_store's batch ledger)."""
    idx = index.select(F.col(id_col).alias("_idx_id"), "band", "bucket")
    if max_bucket_size is not None:
        ok = (
            idx.groupBy("band", "bucket")
            .agg(F.countDistinct("_idx_id").alias("sz"))
            .where(F.col("sz") <= max_bucket_size)
            .select("band", "bucket")
        )
        idx = idx.join(ok, ["band", "bucket"], "left_semi")
    probe = new_keys.select(F.col(id_col).alias("_new_id"), "band", "bucket")
    return (
        probe.join(idx, ["band", "bucket"])
        .where(F.col("_new_id") != F.col("_idx_id"))
        .select(
            F.least("_new_id", "_idx_id").alias("id_a"),
            F.greatest("_new_id", "_idx_id").alias("id_b"),
        )
        .distinct()
    )


def incremental_probe_and_update(
    spark: SparkSession,
    snapshot_path: str,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int | None = 512,
    dedup_texts: bool = False,
    batch_id: str | int | None = None,
    compact_every: int | None = None,
) -> DataFrame:
    """Probe ``new_docs`` against the persisted index PLUS the batch
    itself, fold the batch's keys in, and return the candidate pairs.
    Probing index ∪ self means two duplicates arriving in the SAME batch
    are still caught (the id_a < id_b dedup in probe_index collapses the
    symmetric double-find), so every near-dup pair in the corpus is
    emitted exactly once — when its later document arrives.

    ``batch_id`` (the streaming path always passes one) makes the fold
    idempotent: an already-folded id skips the append — the snapshot
    store's batch ledger remembers across crashes — and the probe runs
    against the index AS IS (it already holds this batch's keys), so a
    replayed batch recomputes exactly the same candidates without
    double-folding.

    The returned candidates are UNVERIFIED (LSH bucket collisions);
    verify with functions/dedup.ngram_jaccard_pairs over the union corpus
    before dropping anything."""
    new_keys = band_bucket_keys(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        dedup_texts=dedup_texts,
    ).localCheckpoint(eager=True)  # computed once: probed AND folded in
    already = batch_id is not None and is_batch_folded(
        snapshot_path, batch_id
    )
    current = read_snapshot(spark, snapshot_path)
    if already:
        combined = current  # replay: the index already holds this batch
    else:
        combined = (
            current.unionByName(new_keys) if current is not None else new_keys
        )
    matches = probe_index(
        combined, new_keys, id_col=id_col, max_bucket_size=max_bucket_size
    ).localCheckpoint(eager=True)  # computed before the index swaps versions
    # Append-only: the update writes THIS BATCH's keys as a new segment —
    # O(batch), while a publish_snapshot rewrite would be O(index) per
    # batch (measured 6.5 s/25 k-doc batch at the 10x rehearsal, most of
    # it rewriting history). Long-runners compact via
    # snapshot_store.compact_segments.
    if not already:
        append_snapshot_segment(
            new_keys, snapshot_path, batch_id=batch_id,
            compact_every=compact_every,
        )
    return matches


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    snapshot_path: str,
    matches_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int | None = 512,
    dedup_texts: bool = False,
    compact_every: int | None = 64,
) -> None:
    """The foreachBatch body of :func:`streaming_minhash_dedup`, exposed
    at module level so crash-replay is directly testable: calling it
    twice with the same ``batch_id`` (what a crash between the matches
    write and the streaming-checkpoint commit does) leaves the index and
    the match sink byte-identical — the fold is skipped via the snapshot
    store's batch ledger, and the matches land in a ``batch_id=N``
    partition the replay OVERWRITES instead of appending to."""
    if batch_df.isEmpty():
        return
    matches = incremental_probe_and_update(
        batch_df.sparkSession,
        snapshot_path,
        batch_df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
        dedup_texts=dedup_texts,
        batch_id=batch_id,
        compact_every=compact_every,
    )
    matches.write.mode("overwrite").parquet(
        os.path.join(matches_path, f"batch_id={batch_id}")
    )


def streaming_minhash_dedup(
    stream_docs: DataFrame,
    snapshot_path: str,
    matches_path: str,
    *,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int | None = 512,
    dedup_texts: bool = False,
    compact_every: int | None = 64,
):
    """foreachBatch driver: each micro-batch of documents is probed
    against the index-so-far, candidate pairs land under
    ``matches_path/batch_id=N`` (read the root path: batch_id surfaces
    as a partition column), and the batch folds into the index.  Returns
    the StreamingQuery.  Batch-order determinism: a pair is emitted
    exactly once, when its LATER document arrives.

    Exactly-once under BOTH restart classes: a graceful restart resumes
    from the streaming checkpoint; a crash anywhere inside the batch
    body replays it, where (a) the fold is skipped via the snapshot
    store's batch ledger and (b) the matches write overwrites its own
    ``batch_id=N`` partition — neither the index nor the match sink ever
    carries a batch twice (pinned by
    test_dedup_index_crash_replay_idempotent).

    ``dedup_texts`` forwards to band_bucket_keys: the signature pass runs
    over one representative per distinct md5(text) and fans back out —
    identical index rows, cheaper on clone-heavy batches (rehearsed at
    volume with a mid-stream restart in
    scripts/rehearsal_stream_dedup_index.py)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            batch_df,
            batch_id,
            snapshot_path,
            matches_path,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
            dedup_texts=dedup_texts,
            compact_every=compact_every,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
