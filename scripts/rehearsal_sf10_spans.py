#!/usr/bin/env python
"""Span-fingerprint scale rehearsal at the sf10 dedup tier (500,600
clone-heavy docs, scripts/gen_sf10_docs.py) — the same planted-truth
treatment the minhash/simhash/setsim families got, applied to the r7
content-defined span detector (functions/spans.py):

1. CAP — the 600-copy giant cluster's fingerprints appear in >= 600
   documents (and the giant's BASE text is additionally shared by that
   base's 100 regular replicas), far over max_docs_per_fp=256, so the
   pair join must emit ZERO pairs involving a giant doc, while
   hot_span_fingerprints surfaces the capped fingerprints (observable,
   not silent).
2. COMPLETENESS — the 10 docs of a planted (base, group) cluster are
   byte-identical, hence share every selected fingerprint; every
   same-group pair of a group WITH at least one selected fingerprint
   (shortest docs can select none — that is the 1/8 sampling rate, not
   a bug) must be found: missing == 0 by anti-join.
   Same-BASE cross-group pairs are also expected (replicas share the
   base text before their group fillers diverge) but their windows are
   boundary-clipped and the 100-replica bases sit near the cap, so the
   rehearsal REPORTS that count rather than asserting it.
3. WALLS — the O(chars x window) hashing pass over ~500k docs and the
   capped pair join, recorded for SCALING.md.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_sf10_spans.py
"""

from __future__ import annotations

import json
import time

SF10 = "/root/repo/.scratch/sf10docs"
GIANT_BASE = 2_000_000_000
CAP = 256


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.spans import (
        duplicated_span_pairs,
        duplicated_span_pairs_dedup_first,
        hot_span_fingerprints,
        span_doc_fingerprints,
    )
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-sf10-spans")
    docs = spark.read.parquet(f"{SF10}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    print(f"tier: {n_docs} docs", flush=True)
    walls: dict[str, float] = {}

    # -- hashing pass (SHARED: r8 ask #3 — computed once, checkpointed,
    # fed to the pair join AND the audit via fps=) ---------------------------
    t0 = time.time()
    fps = span_doc_fingerprints(docs).localCheckpoint()
    n_fps = fps.count()
    walls["fingerprints"] = round(time.time() - t0, 1)
    docs_with_fp = fps.select("doc_id").distinct()
    n_with = docs_with_fp.count()
    print(f"fingerprints: {n_fps} distinct (doc, fp) rows over {n_with} docs "
          f"(selection rate 1/8), wall={walls['fingerprints']}s", flush=True)

    # -- production-rate impl (r8 ask #4): the SAME md5 rule via
    # mapInPandas/hashlib — measure the hashing-pass cut AND assert the
    # relation is identical to the SQL path's (anti-join both ways)
    t0 = time.time()
    fps_arrow = span_doc_fingerprints(docs, impl="arrow").localCheckpoint()
    n_fps_ar = fps_arrow.count()
    walls["fingerprints_arrow"] = round(time.time() - t0, 1)
    extra = fps_arrow.join(fps, ["doc_id", "fp"], "left_anti").count()
    missing = fps.join(fps_arrow, ["doc_id", "fp"], "left_anti").count()
    print(f"arrow-impl pass: {n_fps_ar} distinct (doc, fp) rows, "
          f"wall={walls['fingerprints_arrow']}s "
          f"(sql-impl pass: {walls['fingerprints']}s); "
          f"vs sql: extra={extra} missing={missing}", flush=True)
    assert n_fps_ar == n_fps and extra == 0 and missing == 0
    fps_arrow.unpersist()

    # -- capped pair join (reads the shared checkpointed relation) -----------
    t0 = time.time()
    pairs = (
        duplicated_span_pairs(fps=fps, max_docs_per_fp=CAP, ordered=False)
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    walls["pairs"] = round(time.time() - t0, 1)
    giant_pairs = pairs.where(
        (F.col("id_a") >= GIANT_BASE) | (F.col("id_b") >= GIANT_BASE)
    ).count()
    print(f"pairs at cap {CAP}: {n_pairs}, giant-involving={giant_pairs}, "
          f"wall={walls['pairs']}s", flush=True)
    assert giant_pairs == 0, "600-copy giant must be excluded by the fp cap"

    # -- audit (shares the SAME hashing pass — r7 measured 714.9 s when it
    # re-derived the fingerprints from scratch) ------------------------------
    t0 = time.time()
    audit = hot_span_fingerprints(fps=fps, max_docs_per_fp=CAP)
    n_hot = audit.count()
    max_hot = audit.agg(F.max("n_docs")).first()[0]
    walls["audit"] = round(time.time() - t0, 1)
    print(f"audit: {n_hot} capped fingerprints, max n_docs={max_hot}, "
          f"wall={walls['audit']}s (r7 from-scratch: 714.9s)", flush=True)
    assert n_hot > 0 and max_hot >= 600, "giant's fingerprints must be surfaced"

    # -- planted completeness -------------------------------------------------
    regular_with = docs_with_fp.where(F.col("doc_id") < GIANT_BASE).select(
        "doc_id",
        (F.col("doc_id") % 10_000_000).alias("base"),
        ((F.col("doc_id") / 10_000_000).cast("int") / 10).cast("int").alias("grp"),
    )
    truth = (
        regular_with.alias("a")
        .join(
            regular_with.alias("b"),
            (F.col("a.base") == F.col("b.base"))
            & (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    n_truth = truth.count()
    missing = truth.join(pairs, ["id_a", "id_b"], "left_anti").count()
    same_base = (
        pairs.where(
            (F.col("id_a") % 10_000_000 == F.col("id_b") % 10_000_000)
            & (F.col("id_a") < GIANT_BASE)
        ).count()
    )
    print(f"planted same-group truth (docs with >=1 fp): {n_truth}, "
          f"missing={missing}; same-base pairs found (incl. cross-group "
          f"base-text sharing): {same_base}", flush=True)
    assert missing == 0, "identical docs share every fingerprint — must pair"

    # -- dedup-first composition: identical output, clone-proof cost ---------
    # The raw join expands a 100-clone base's shared fingerprint into
    # C(100,2) pre-aggregation rows; over md5(text) representatives the
    # same truth is C(10,2) per fingerprint plus join-only expansion.
    t0 = time.time()
    fast = (
        duplicated_span_pairs_dedup_first(docs, max_docs_per_fp=CAP, ordered=False)
        .localCheckpoint()
    )
    n_fast = fast.count()
    walls["pairs_dedup_first"] = round(time.time() - t0, 1)
    d1 = pairs.join(fast, ["id_a", "id_b", "n_shared"], "left_anti").count()
    d2 = fast.join(pairs, ["id_a", "id_b", "n_shared"], "left_anti").count()
    print(f"dedup-first: {n_fast} pairs, raw-missing={d1}, extra={d2}, "
          f"wall={walls['pairs_dedup_first']}s "
          f"(raw: {walls['pairs']}s)", flush=True)
    assert n_fast == n_pairs and d1 == 0 and d2 == 0, (
        "dedup-first span pairs must equal the raw join exactly"
    )

    print(json.dumps({"sf": "sf10docs", "n_docs": n_docs, "walls": walls,
                      "n_pairs": n_pairs, "n_truth": n_truth}))


if __name__ == "__main__":
    main()
