#!/usr/bin/env python
"""sf10 dedup-family scale rehearsal (r5 VERDICT next-round #7): run the
dedup-family pipelines over the 500k-doc planted tier
(scripts/gen_sf10_docs.py) and assert the 100 TB claims:

1. LSH COMPLETENESS at 500k docs — the RAW banded minhash candidate set
   contains every planted pair (anti-join, not sampling);
2. CAPS — the 600-clone giant cluster exceeds minhash's
   max_bucket_size=512, so the banded join EXCLUDES it (no quadratic
   hot-bucket blowup) while the dedup-first pipeline still emits all
   C(600,2) = 179_700 giant pairs from the md5 groups;
3. AUDIT — minhash_oversize_buckets / simhash_bucket_audit surface the
   dropped bucket (size 600) so the cap is observable, not silent;
4. EXACTNESS — near_dup_pairs_dedup_first returns EXACTLY
   planted ∪ giant (2_429_700 pairs, both-ways anti-join empty).

A scale finding from the first run of this rehearsal is itself recorded:
running ngram-Jaccard VERIFY over raw doc-level candidates at 500k
clone-heavy docs explodes the shingle join to ~700M rows (46 GB of
shuffle spill on this machine) — which is precisely why the dedup-first
composition exists and is what the registry queries now use.  The same
applies to raw setsim_join (prefix-candidate volume grows with Σc² over
clone groups): here setsim runs over the md5-distinct texts and expands,
mirroring the prescribed composition.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_sf10_dedup.py
"""

from __future__ import annotations

import json
import time

SF10 = "/root/repo/.scratch/sf10docs"
GIANT_BASE = 2_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.dedup import (
        connected_components,
        minhash_near_dup_pairs,
        minhash_oversize_buckets,
        near_dup_pairs_dedup_first,
        simhash_bucket_audit,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tsatool_app_spark.functions.setsim import setsim_join_dedup_first
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-sf10")
    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    n_docs = docs.count()
    print(f"tier: {n_docs} docs", flush=True)

    # Exactly-known planted truth: within-(base, group) pairs, giant apart.
    regular = docs.where(F.col("doc_id") < GIANT_BASE).select(
        "doc_id",
        (F.col("doc_id") % 10_000_000).alias("base"),
        ((F.col("doc_id") / 10_000_000).cast("int") / 10).cast("int").alias("grp"),
    )
    planted = (
        regular.alias("a")
        .join(
            regular.alias("b"),
            (F.col("a.base") == F.col("b.base"))
            & (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .localCheckpoint()
    )
    n_planted = planted.count()
    n_giant = docs.where(F.col("doc_id") >= GIANT_BASE).count()
    print(f"planted pairs: {n_planted}, giant cluster: {n_giant} docs", flush=True)
    assert n_planted == 2_250_000 and n_giant == 600
    n_giant_pairs = n_giant * (n_giant - 1) // 2

    walls: dict[str, float] = {}

    # -- 1+2a: RAW banded LSH at 500k docs (candidates only — verify at
    # doc level is the anti-pattern this tier demonstrates against) ---------
    t0 = time.time()
    cands = minhash_near_dup_pairs(docs).select("id_a", "id_b").localCheckpoint()
    n_cands = cands.count()
    walls["minhash_lsh_raw"] = round(time.time() - t0, 1)
    missing = planted.join(cands, ["id_a", "id_b"], "left_anti").count()
    giant_leaked = cands.where(F.col("id_a") >= GIANT_BASE).count()
    print(f"raw LSH: {n_cands} candidate pairs, planted missing={missing}, "
          f"giant pairs leaked={giant_leaked}, wall={walls['minhash_lsh_raw']}s",
          flush=True)
    assert missing == 0, "banded minhash lost planted pairs"
    assert giant_leaked == 0, "bucket cap should exclude the 600-clone cluster"

    # -- 3: audits ----------------------------------------------------------
    t0 = time.time()
    audit = minhash_oversize_buckets(docs).collect()
    walls["minhash_audit"] = round(time.time() - t0, 1)
    sizes = sorted({r.size for r in audit})
    print(f"minhash audit: {len(audit)} oversize buckets, sizes={sizes}, "
          f"wall={walls['minhash_audit']}s", flush=True)
    # The giant's 8 band buckets (size >= 600; colliders may join them) must
    # be surfaced. The corpus ALSO has natural band-collision mega-buckets
    # (the first run found 34 buckets, sizes 530-3230) — dropping those did
    # NOT lose any planted pair (missing==0 above): a pair only needs one
    # uncapped shared band, which is exactly the robustness the 8-band
    # design buys.
    assert audit and sum(1 for r in audit if r.size >= 600) >= 8, (
        "audit must surface the giant's band buckets"
    )

    # -- 4: dedup-first exact pipeline — the registry/100 TB composition ----
    t0 = time.time()
    pairs = (
        near_dup_pairs_dedup_first(docs, min_jaccard=0.85)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    walls["minhash_pairs_dedup_first"] = round(time.time() - t0, 1)
    truth = planted.unionByName(
        docs.where(F.col("doc_id") >= GIANT_BASE).alias("a").select(
            F.col("doc_id").alias("id_a")
        ).join(
            docs.where(F.col("doc_id") >= GIANT_BASE).select(
                F.col("doc_id").alias("id_b")
            ),
            F.col("id_a") < F.col("id_b"),
        )
    ).localCheckpoint()
    miss = truth.join(pairs, ["id_a", "id_b"], "left_anti").count()
    extra = pairs.join(truth, ["id_a", "id_b"], "left_anti").count()
    print(f"dedup-first: {n_pairs} pairs (expect {n_planted + n_giant_pairs}), "
          f"missing={miss}, extra={extra}, "
          f"wall={walls['minhash_pairs_dedup_first']}s", flush=True)
    assert n_pairs == n_planted + n_giant_pairs and miss == 0 and extra == 0

    # -- components over the exact edges ------------------------------------
    t0 = time.time()
    comp = connected_components(pairs).localCheckpoint()
    n_nodes = comp.count()
    walls["dedup_components"] = round(time.time() - t0, 1)
    expect = regular.groupBy("base", "grp").agg(F.min("doc_id").alias("want"))
    bad = (
        comp.join(regular, comp.node == regular.doc_id)
        .join(expect, ["base", "grp"])
        .where(F.col("component") != F.col("want"))
        .count()
    )
    bad_giant = comp.where(
        (F.col("node") >= GIANT_BASE) & (F.col("component") != GIANT_BASE)
    ).count()
    print(f"components: {n_nodes} nodes, mislabeled={bad}+{bad_giant}, "
          f"wall={walls['dedup_components']}s", flush=True)
    assert n_nodes == 500_600 and bad == 0 and bad_giant == 0

    # -- setsim via the packaged dedup-first composition --------------------
    # Identical texts have word-gram Jaccard 1 >= 3/5, so the EXACT answer
    # is planted ∪ giant iff the filler kills every cross-text pair — a
    # strictly stronger check than the old inline cross==0 probe.
    t0 = time.time()
    ss = (
        setsim_join_dedup_first(docs, threshold_num=3, threshold_den=5)
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
        .localCheckpoint()
    )
    n_ss = ss.count()
    walls["setsim_dedup_first"] = round(time.time() - t0, 1)
    ss_miss = truth.join(ss, ["id_a", "id_b"], "left_anti").count()
    ss_extra = ss.join(truth, ["id_a", "id_b"], "left_anti").count()
    print(f"setsim dedup-first: {n_ss} pairs, missing={ss_miss}, "
          f"extra={ss_extra}, wall={walls['setsim_dedup_first']}s", flush=True)
    assert ss_miss == 0 and ss_extra == 0

    # -- simhash raw (xxhash sigs; giant under its 2048 cap) + tight audit --
    t0 = time.time()
    sigs = simhash_signatures(docs, bits=56, shingle_k=3).localCheckpoint()
    sh = simhash_near_dup_pairs(sigs, bits=56, max_hamming=3, n_blocks=6).select(
        "id_a", "id_b"
    ).localCheckpoint()
    n_sim = sh.count()
    walls["simhash_pairs_raw"] = round(time.time() - t0, 1)
    missing = planted.join(sh, ["id_a", "id_b"], "left_anti").count()
    giant_sim = sh.where(F.col("id_a") >= GIANT_BASE).count()
    print(f"simhash raw: {n_sim} pairs, planted missing={missing}, "
          f"giant pairs={giant_sim}, wall={walls['simhash_pairs_raw']}s",
          flush=True)
    assert missing == 0, "identical docs share signatures; probing must find them"
    assert giant_sim == n_giant_pairs, "giant is under simhash's 2048 cap"
    audit = simhash_bucket_audit(
        sigs, bits=56, n_blocks=6, max_bucket_size=512
    ).collect()
    assert audit and max(r.size for r in audit) >= 600, "audit must fire at cap 512"
    print(f"simhash audit at cap 512: {len(audit)} buckets, "
          f"max size={max(r.size for r in audit)}", flush=True)

    print(json.dumps({"sf": "sf10docs", "n_docs": n_docs, "walls": walls}))


if __name__ == "__main__":
    main()
