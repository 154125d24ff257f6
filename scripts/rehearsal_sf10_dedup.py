#!/usr/bin/env python
"""sf10 dedup-family scale rehearsal (r5 VERDICT next-round #7): run the
four dedup-family pipelines over the 500k-doc planted tier
(scripts/gen_sf10_docs.py) and assert the three 100 TB claims:

1. COMPLETENESS — output ⊇ the exactly-known planted truth (50_000
   clusters of 10 identical docs → 2_250_000 pairs at J = 1.0), checked by
   anti-join, not sampling;
2. CAPS — the 600-clone giant cluster exceeds minhash's
   max_bucket_size=512, so its pairs are EXCLUDED from the banded output
   (no quadratic hot-bucket blowup) while the exact setsim join still
   finds all C(600,2) = 179_700 of them;
3. AUDIT — minhash_oversize_buckets / simhash_bucket_audit surface the
   dropped bucket (size 600) so the cap is observable, not silent.

Wall times print per query; sf1→sf10 scaling exponents go to SCALING.md
(docs ×10, planted output pairs ×~9 vs the sf1 tier).

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_sf10_dedup.py
"""

from __future__ import annotations

import json
import time

SF10 = "/root/repo/.scratch/sf10docs"


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.dedup import (
        connected_components,
        minhash_near_dup_pairs,
        minhash_oversize_buckets,
        ngram_jaccard_pairs,
        simhash_bucket_audit,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tsatool_app_spark.functions.setsim import setsim_join
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-sf10")
    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    n_docs = docs.count()
    print(f"tier: {n_docs} docs")

    # Exactly-known planted truth: within-(base, group) pairs, giant apart.
    regular = docs.where(F.col("doc_id") < 900_000_000).select(
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
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .localCheckpoint()
    )
    n_planted = planted.count()
    giant_ids = docs.where(F.col("doc_id") >= 900_000_000)
    n_giant = giant_ids.count()
    print(f"planted pairs: {n_planted}, giant cluster: {n_giant} docs")
    assert n_planted == 2_250_000 and n_giant == 600

    walls: dict[str, float] = {}

    # -- minhash (banded LSH + exact verify, capped buckets) ----------------
    t0 = time.time()
    cands = minhash_near_dup_pairs(docs).select("id_a", "id_b")
    verified = (
        ngram_jaccard_pairs(docs, cands).where(F.col("jaccard") >= 0.85)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_minhash = verified.count()
    walls["minhash_pairs"] = round(time.time() - t0, 1)
    missing = planted.join(verified, ["id_a", "id_b"], "left_anti").count()
    extra_giant = verified.where(F.col("id_a") >= 900_000_000).count()
    print(f"minhash: {n_minhash} pairs, planted missing={missing}, "
          f"giant pairs present={extra_giant}, wall={walls['minhash_pairs']}s")
    assert missing == 0, "banded minhash lost planted pairs"
    assert extra_giant == 0, "bucket cap should exclude the 600-clone cluster"

    t0 = time.time()
    audit = minhash_oversize_buckets(docs).collect()
    walls["minhash_audit"] = round(time.time() - t0, 1)
    sizes = sorted({r.size for r in audit})
    print(f"minhash audit: {len(audit)} oversize buckets, sizes={sizes}, "
          f"wall={walls['minhash_audit']}s")
    assert audit and all(r.size == 600 for r in audit), "audit must surface the giant bucket"

    # -- components over the verified graph ---------------------------------
    t0 = time.time()
    comp = connected_components(verified).localCheckpoint()
    n_nodes = comp.count()
    walls["dedup_components"] = round(time.time() - t0, 1)
    expect_comp = regular.groupBy("base", "grp").agg(
        F.min("doc_id").alias("component"), F.count(F.lit(1)).alias("sz")
    )
    bad = (
        comp.join(
            regular.select("doc_id", "base", "grp"), comp.node == regular.doc_id
        )
        .join(expect_comp, ["base", "grp"])
        .where(comp.component != expect_comp.component)
        .count()
    )
    print(f"components: {n_nodes} nodes, mislabeled={bad}, "
          f"wall={walls['dedup_components']}s")
    assert n_nodes == 500_000 and bad == 0

    # -- setsim (exact prefix-filtered join: must ALSO find the giant) ------
    t0 = time.time()
    ss = setsim_join(docs, threshold_num=3, threshold_den=5).localCheckpoint()
    n_setsim = ss.count()
    walls["setsim_pairs"] = round(time.time() - t0, 1)
    ss_pairs = ss.select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    missing = planted.join(ss_pairs, ["id_a", "id_b"], "left_anti").count()
    giant_found = ss_pairs.where(F.col("id_a") >= 900_000_000).count()
    print(f"setsim: {n_setsim} pairs, planted missing={missing}, "
          f"giant pairs={giant_found}, wall={walls['setsim_pairs']}s")
    assert missing == 0
    assert giant_found == 600 * 599 // 2, "exact join must keep the giant cluster"

    # -- simhash (combination block probing; audit at the tight cap) --------
    t0 = time.time()
    sigs = simhash_signatures(docs, bits=56, shingle_k=3, portable=True)
    sh = simhash_near_dup_pairs(sigs, bits=56, max_hamming=3, n_blocks=6)
    sh = sh.select("id_a", "id_b").localCheckpoint()
    n_sim = sh.count()
    walls["simhash_pairs"] = round(time.time() - t0, 1)
    missing = planted.join(sh, ["id_a", "id_b"], "left_anti").count()
    print(f"simhash: {n_sim} pairs, planted missing={missing}, "
          f"wall={walls['simhash_pairs']}s")
    assert missing == 0, "identical docs share signatures; probing must find them"
    # default cap is 2048 (giant cluster of 600 passes); at a 512 cap the
    # audit must fire on the giant signature's buckets
    audit = simhash_bucket_audit(sigs, bits=56, n_blocks=6, max_bucket_size=512).collect()
    assert audit and all(r.size >= 600 for r in audit), "simhash audit must fire at cap 512"
    print(f"simhash audit at cap 512: {len(audit)} buckets, "
          f"max size={max(r.size for r in audit)}")

    print(json.dumps({"sf": "sf10docs", "n_docs": n_docs, "walls": walls}))


if __name__ == "__main__":
    main()
