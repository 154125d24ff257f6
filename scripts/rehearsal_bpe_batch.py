#!/usr/bin/env python
"""Batch-BPE-encoder scale rehearsal (r10 VERDICT next-round #1's
'Done' bar): encode 500,000 documents with a ≥10,000-merge TRAINED
vocabulary through the mapInPandas batch path — the regime where the
expression path cannot even plan (JVM StackOverflowError at ~300 nested
replaces, measured r11).

- Corpus: 500k docs × 100 words drawn from a 50,000-word md5-derived
  vocabulary (deterministic), so the per-task word memoizer sees a
  realistic unique-word working set (≈ the full vocab per task), not a
  degenerate replica corpus.
- Training: ONE distributed build_vocab pass (the corpus is never read
  again), collect the ~50k-row vocabulary to the driver, train 10,000
  merges with bpe_train_local (incremental pair counts + lazy max-heap
  — the bpe_train-identical-semantics seam for production vocabs).
- Encode: add_bpe_token_counts(impl='auto') routes to the batch
  encoder; full-corpus count aggregation is the measured wall.
- Parity: 500 sampled docs re-encoded driver-side with the LITERAL
  replace-chain spec (Python str.replace on the separator encoding —
  exactly what the Catalyst expression path computes) must match the
  distributed batch result token-for-token.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_bpe_batch.py
"""

from __future__ import annotations

import json
import os
import time

N_DOCS = int(os.environ.get("REHEARSAL_N_DOCS", 500_000))
WORDS_PER_DOC = 100
VOCAB = min(50_000, N_DOCS)
N_MERGES = int(os.environ.get("REHEARSAL_N_MERGES", 10_000))
SEP = "\x1f"


def _spec_encode_word(word: str, merges) -> list[str]:
    rep = SEP + (SEP + SEP).join(word) + SEP
    for left, right in merges:
        rep = rep.replace(
            f"{SEP}{left}{SEP}{SEP}{right}{SEP}", f"{SEP}{left}{right}{SEP}"
        )
    return rep[1:-1].split(SEP + SEP)


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.bpe import (
        EXPR_MERGE_LIMIT,
        add_bpe_token_counts,
        bpe_encode,
        bpe_train_local,
        build_vocab,
    )
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-bpe-batch")
    t0 = time.time()
    report: dict = {}

    # 500k docs; word j of doc d indexes the shared vocab via
    # md5((d*WORDS+j) % VOCAB) — variable word length 4..11 chars
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                lambda j: F.md5(
                    ((F.col("id") * WORDS_PER_DOC + j) % VOCAB).cast("string")
                ).substr(
                    F.lit(1),
                    (
                        4 + ((F.col("id") * WORDS_PER_DOC + j) % VOCAB) % 8
                    ).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    ).repartition(64).localCheckpoint(eager=True)
    report["n_docs"] = docs.count()
    report["gen_wall_s"] = round(time.time() - t0, 1)

    # one corpus pass → driver-side vocab → 10k merges in pure Python
    t1 = time.time()
    vocab = {r.word: r.freq for r in build_vocab(docs).collect()}
    report["vocab_size"] = len(vocab)
    assert len(vocab) <= VOCAB
    t2 = time.time()
    merges = bpe_train_local(vocab, N_MERGES)
    report["n_merges"] = len(merges)
    report["train_wall_s"] = round(time.time() - t2, 1)
    report["vocab_wall_s"] = round(t2 - t1, 1)
    assert len(merges) == N_MERGES, len(merges)
    assert len(merges) > EXPR_MERGE_LIMIT  # auto MUST route to batch

    # the measured wall: full-corpus true-token counting, batch path
    t3 = time.time()
    counted = add_bpe_token_counts(docs, merges)  # impl='auto' → batch
    agg = counted.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("mn"),
        F.max("n_tokens").alias("mx"),
    ).collect()[0]
    report["count_wall_s"] = round(time.time() - t3, 1)
    report["total_tokens"] = int(agg.total)
    report["docs_per_s"] = round(N_DOCS / (time.time() - t3))
    assert agg.n == N_DOCS
    # merging never inflates: tokens per doc within [WORDS, chars]
    assert WORDS_PER_DOC <= agg.mn and agg.mx <= WORDS_PER_DOC * 11

    # driver-side spec parity on a 500-doc sample (every 1000th doc)
    t4 = time.time()
    sample = docs.where(F.col("doc_id") % 1000 == 0)
    got = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
        for r in bpe_encode(sample, merges).collect()  # auto → batch
    }
    texts = {r.doc_id: r.text for r in sample.collect()}
    assert len(got) == N_DOCS // 1000
    mismatches = 0
    for did, text in texts.items():
        toks = [
            t
            for w in text.split(" ")
            if w
            for t in _spec_encode_word(w, merges)
        ]
        if got[did] != (toks, len(toks)):
            mismatches += 1
    report["parity_sample"] = len(texts)
    report["parity_mismatches"] = mismatches
    report["parity_wall_s"] = round(time.time() - t4, 1)
    assert mismatches == 0, mismatches

    report["total_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report))
    with open("/root/repo/.scratch/rehearsal_bpe_batch.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    print("ALL ASSERTS GREEN")


if __name__ == "__main__":
    main()
