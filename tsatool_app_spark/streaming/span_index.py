"""Incremental duplicated-span (contamination) index: probe new
documents' content-defined span fingerprints against everything ingested
so far, then fold them in.

Batch span detection (functions/spans.duplicated_span_pairs) answers
"which pairs inside THIS corpus share an exact substring"; a growing
training corpus needs the incremental question — "does this NEW document
share a span with anything already ingested" (the benchmark-leak gate a
continuously-assembled pretraining mix runs on every ingest batch) —
without re-hashing history.  The index is the distinct (doc_id, fp)
relation itself (functions/spans.span_doc_fingerprints): probing is ONE
equi-join of the new batch's fingerprints against it, updating is an
append — both proportional to the batch, never the corpus.  State
persists through the crash-safe versioned snapshot store
(streaming/snapshot_store.py), exactly like the minhash index in
streaming/dedup_index.py.

Exactness: a document's fingerprint set is a pure function of its text,
so a pair's ``n_shared`` is already final the moment its LATER document
arrives — the accumulated incremental output equals the one-shot batch
output EXACTLY (pair set and n_shared values; pinned by
test_incremental_span_index_matches_batch_and_streams), with one honest
cap caveat: ``max_docs_per_fp`` is evaluated against the corpus-SO-FAR
at each probe, so a boilerplate fingerprint that crosses the cap in a
LATER batch keeps the pairs it emitted while under it (the batch run
suppresses them retroactively).  Equivalence is exact when cap-crossing
fingerprints cross within their first batch, or with cap=None; the
final index is auditable either way via
functions/spans.hot_span_fingerprints(fps=read_snapshot(...)).

At 100 TB: the index carries the selected ~1/8 of (id, fp) rows — never
text; the probe join shuffles only the batch's fingerprints when the
index side is bucketed by fp; and the hashing pass over each batch uses
the arrow impl (functions/spans._span_fingerprints_arrow, 11× the SQL
expression path, byte-identical).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsatool_app_spark.functions.spans import span_doc_fingerprints
from tsatool_app_spark.streaming.snapshot_store import (
    append_snapshot_segment,
    is_batch_folded,
    read_snapshot,
)


def span_index_keys(
    docs: DataFrame,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """(doc_id, fp) index rows for a document slice — the same distinct
    relation the batch pair join consumes, so batch and incremental agree
    fingerprint-for-fingerprint.  Default ``impl="arrow"``: the stream
    path is the bulk path (the sql/arrow impls are byte-identical,
    pinned by test_span_fingerprints_impls_identical)."""
    return span_doc_fingerprints(
        docs,
        window_len=window_len,
        rate_hex_lt=rate_hex_lt,
        text_col=text_col,
        id_col=id_col,
        impl=impl,
    )


def probe_span_index(
    index: DataFrame,
    new_keys: DataFrame,
    *,
    max_docs_per_fp: int | None = 256,
) -> DataFrame:
    """Span matches of new documents against the index: (id_a, id_b,
    n_shared) with id_a < id_b, n_shared = number of distinct shared
    fingerprints.  ``index`` must already CONTAIN ``new_keys`` (the
    caller unions before probing) so two documents arriving in the same
    batch still pair; old-old pairs are never emitted because the probe
    side holds only the new batch, and the least/greatest + distinct
    collapses the symmetric same-batch double-find.

    ``max_docs_per_fp`` guards the same quadratic boilerplate edge as the
    batch join — fingerprints held by more documents than the cap
    (counted over the index, i.e. the corpus so far) are excluded; audit
    with functions/spans.hot_span_fingerprints(fps=index).  The cap
    counts DISTINCT doc_ids, the batch query's exact semantics — so a
    duplicated index segment (a replay that slipped past the fold
    ledger, or a hand-assembled index) cannot inflate the count and
    spuriously suppress a fingerprint (defense-in-depth behind
    snapshot_store's batch ledger)."""
    idx = index.select(F.col("doc_id").alias("_idx_id"), "fp")
    if max_docs_per_fp is not None:
        ok = (
            idx.groupBy("fp")
            .agg(F.countDistinct("_idx_id").alias("_n"))
            .where(F.col("_n") <= max_docs_per_fp)
            .select("fp")
        )
        idx = idx.join(ok, "fp", "left_semi")
        new_keys = new_keys.join(ok, "fp", "left_semi")
    probe = new_keys.select(F.col("doc_id").alias("_new_id"), "fp")
    return (
        probe.join(idx, "fp")
        .where(F.col("_new_id") != F.col("_idx_id"))
        .select(
            F.least("_new_id", "_idx_id").alias("id_a"),
            F.greatest("_new_id", "_idx_id").alias("id_b"),
            "fp",
        )
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def incremental_span_probe_and_update(
    spark: SparkSession,
    snapshot_path: str,
    new_docs: DataFrame,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_fp: int | None = 256,
    impl: str = "arrow",
    batch_id: str | int | None = None,
    compact_every: int | None = None,
) -> DataFrame:
    """Probe ``new_docs`` against the persisted index PLUS the batch
    itself, fold the batch's fingerprints in, and return the span matches
    (id_a, id_b, n_shared) — each pair emitted exactly once, when its
    later document arrives, with its FINAL n_shared (fingerprint sets
    are immutable per document).

    ``batch_id`` (the streaming path always passes one) makes the fold
    idempotent: an already-folded id skips the append — the snapshot
    store's batch ledger remembers across crashes — and the probe runs
    against the index AS IS (it already contains this batch's keys), so
    a replayed batch recomputes exactly the same matches without
    double-folding."""
    new_keys = span_index_keys(
        new_docs,
        window_len=window_len,
        rate_hex_lt=rate_hex_lt,
        text_col=text_col,
        id_col=id_col,
        impl=impl,
    )
    if id_col != "doc_id":
        new_keys = new_keys.withColumnRenamed(id_col, "doc_id")
    new_keys = new_keys.localCheckpoint(eager=True)  # probed AND folded in
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
    matches = probe_span_index(
        combined, new_keys, max_docs_per_fp=max_docs_per_fp
    ).localCheckpoint(eager=True)  # computed before the index swaps versions
    if not already:
        append_snapshot_segment(
            new_keys, snapshot_path, batch_id=batch_id,
            compact_every=compact_every,
        )
    return matches


def process_span_batch(
    batch_df: DataFrame,
    batch_id: int,
    snapshot_path: str,
    matches_path: str,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_fp: int | None = 256,
    impl: str = "arrow",
    compact_every: int | None = 64,
) -> None:
    """The foreachBatch body of :func:`streaming_span_dedup`, exposed at
    module level so crash-replay is directly testable: calling it twice
    with the same ``batch_id`` (what a crash between the matches write
    and the streaming-checkpoint commit does) leaves the index and the
    match sink byte-identical — the fold is skipped via the snapshot
    store's batch ledger, and the matches land in a ``batch_id=N``
    partition that the replay OVERWRITES instead of appending to."""
    if batch_df.isEmpty():
        return
    matches = incremental_span_probe_and_update(
        batch_df.sparkSession,
        snapshot_path,
        batch_df,
        window_len=window_len,
        rate_hex_lt=rate_hex_lt,
        text_col=text_col,
        id_col=id_col,
        max_docs_per_fp=max_docs_per_fp,
        impl=impl,
        batch_id=batch_id,
        compact_every=compact_every,
    )
    matches.write.mode("overwrite").parquet(
        os.path.join(matches_path, f"batch_id={batch_id}")
    )


def streaming_span_dedup(
    stream_docs: DataFrame,
    snapshot_path: str,
    matches_path: str,
    *,
    checkpoint: str,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_fp: int | None = 256,
    impl: str = "arrow",
    compact_every: int | None = 64,
):
    """foreachBatch driver: each micro-batch of documents is probed
    against the span index-so-far, matches land under
    ``matches_path/batch_id=N`` (read the root path: batch_id surfaces
    as a partition column), and the batch folds into the index.  Returns
    the StreamingQuery.

    Exactly-once under BOTH restart classes: a graceful restart resumes
    from the streaming checkpoint; a crash anywhere inside the batch
    body replays it, where (a) the fold is skipped via the snapshot
    store's batch ledger and (b) the matches write overwrites its own
    ``batch_id=N`` partition — so neither the index nor the match sink
    ever carries a batch twice (pinned by
    test_span_index_crash_replay_idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_span_batch(
            batch_df,
            batch_id,
            snapshot_path,
            matches_path,
            window_len=window_len,
            rate_hex_lt=rate_hex_lt,
            text_col=text_col,
            id_col=id_col,
            max_docs_per_fp=max_docs_per_fp,
            impl=impl,
            compact_every=compact_every,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
