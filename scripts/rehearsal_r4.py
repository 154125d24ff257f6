#!/usr/bin/env python
"""Round-4 scale rehearsal: the operators r3's verdict flagged as never
having a 10× row, plus the REDESIGNED SimHash combination probe with an
adversarial planted mega-cluster (same protocol as the MinHash rehearsal:
assert the candidate volume is bounded and the cap+audit fire).

Replicates sf0.1 inputs by --factor with shifted ids (the recipe of
scale_rehearsal.py) and prints wall times for SCALING.md rows.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_r4.py [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import time
from functools import reduce

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, factor: int, id_cols: list[str], shift: int):
    from pyspark.sql import functions as F

    out = []
    for i in range(factor):
        d = df
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + F.lit(i * shift))
        out.append(d)
    return reduce(lambda a, b: a.unionByName(b), out)


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label:52s} {dt:7.2f} s   ({n} rows)", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    f = args.factor

    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.dedup import (
        ngram_containment_pairs,
        simhash_bucket_audit,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tsatool_app_spark.model import load_table
    from tsatool_app_spark.operators.timeseries import rolling_corr_sums
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-r4")
    spark.range(1).count()

    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events")
    l = load_table(spark, SF_DIR, "lineitem")

    n_docs = docs.count()
    big_docs = replicate(docs, f, ["doc_id"], 10_000_000).localCheckpoint()
    print(f"documents: {n_docs} -> {big_docs.count()} rows")

    # --- SimHash combination probe at 10x docs --------------------------
    # Replication makes every doc an f-clone cluster (identical text ->
    # identical signature), so the pair count is known exactly:
    # n_docs * C(f,2) plus whatever cross-doc near-dups existed at 1x.
    sigs = simhash_signatures(
        big_docs, bits=56, shingle_k=3, portable=False
    ).localCheckpoint()
    base_pairs = f * f * len(
        simhash_near_dup_pairs(
            simhash_signatures(docs, bits=56, shingle_k=3, portable=False),
            bits=56, max_hamming=3, n_blocks=6,
        ).where(F.expr("id_a % 10000000 != id_b % 10000000")).collect()
    )  # cross-doc near-dups replicate f*f times (every clone pairs with every clone)
    expect_clone_pairs = n_docs * f * (f - 1) // 2
    t = timed(
        f"simhash_pairs (combination probe, {f}x docs)",
        lambda: simhash_near_dup_pairs(
            sigs, bits=56, max_hamming=3, n_blocks=6, max_bucket_size=2048
        ).count(),
    )
    got = simhash_near_dup_pairs(
        sigs, bits=56, max_hamming=3, n_blocks=6, max_bucket_size=2048
    ).count()
    print(
        f"  pairs={got}  expected≈{expect_clone_pairs} clone-pairs"
        f" + {base_pairs} replicated cross-doc pairs"
    )
    audit_n = simhash_bucket_audit(
        sigs, bits=56, max_hamming=3, n_blocks=6, max_bucket_size=2048
    ).count()
    print(f"  bucket audit (cap 2048): {audit_n} oversize buckets (expect 0)")

    # --- adversarial: planted 1500-copy mega-cluster ---------------------
    mega = spark.range(1500).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit(
            "identical mega cluster document repeated many times to stress "
            "the probe buckets of the redesigned simhash join"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("planted").alias("source"),
    )
    adv = big_docs.select("doc_id", "text", "lang", "source").unionByName(mega)
    adv_sigs = simhash_signatures(
        adv, bits=56, shingle_k=3, portable=False
    ).localCheckpoint()
    audit = simhash_bucket_audit(
        adv_sigs, bits=56, max_hamming=3, n_blocks=6, max_bucket_size=512
    )
    n_over = audit.count()
    capped = simhash_near_dup_pairs(
        adv_sigs, bits=56, max_hamming=3, n_blocks=6, max_bucket_size=512
    )
    t0 = time.time()
    n_capped = capped.count()
    dt = time.time() - t0
    print(
        f"adversarial 1500-clone cluster: audit fired on {n_over} buckets "
        f"(expect 20 — one per combo table), capped join {n_capped} pairs "
        f"in {dt:.2f} s (mega-cluster pairs routed to exact dedup, "
        f"NOT exploded to ~1.1M pairs)"
    )
    assert n_over >= 20, "cap did not fire on the planted cluster"

    # --- ngram_containment at 10x pair volume ----------------------------
    base = big_docs.where(F.col("doc_id") % 10_000_000 < 500)
    excerpts = base.select(
        (F.col("doc_id") + 500_000_000).alias("doc_id"),
        F.substring("text", 1, 120).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(excerpts)
    cands = base.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 500_000_000).alias("id_b"),
    )
    timed(
        f"ngram_containment ({f}x pairs = {f*500})",
        lambda: ngram_containment_pairs(corpus, cands).count(),
    )

    # --- rolling_corr at 10x lineitem ------------------------------------
    big_l = replicate(
        l.select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"),
        f, ["l_orderkey"], 10_000_000,
    ).localCheckpoint()
    print(f"lineitem: {l.count()} -> {big_l.count()} rows")
    src = big_l.select(
        "l_suppkey",
        F.concat_ws(
            "-",
            F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
            F.lpad(F.col("l_quantity").cast("string"), 6, "0"),
        ).alias("ok"),
        "l_quantity",
        "l_extendedprice",
    )
    timed(
        f"rolling_corr ({f}x lineitem)",
        lambda: rolling_corr_sums(
            src, "l_suppkey", "ok", "l_quantity", "l_extendedprice",
            window_rows=20,
        ).count(),
    )

    # --- value_quantiles_by_type at 10x and 100x events -------------------
    big_ev = replicate(ev.select("event_type", "value"), f, [], 0).localCheckpoint()
    print(f"events: {ev.count()} -> {big_ev.count()} rows")

    def quantiles(d):
        qs = [
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)").alias(
                f"p{int(q*100)}"
            )
            for q in (0.25, 0.5, 0.75, 0.95)
        ]
        return d.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), *qs
        ).count()

    timed(f"value_quantiles_by_type ({f}x events)", lambda: quantiles(big_ev))
    big_ev100 = replicate(
        ev.select("event_type", "value"), f * 10, [], 0
    ).localCheckpoint()
    timed(
        f"value_quantiles_by_type ({f*10}x events)", lambda: quantiles(big_ev100)
    )

    # --- source_vocab_overlap at 10x docs ---------------------------------
    def vocab_overlap(d):
        vocab = d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            ).alias("term"),
        ).distinct()
        a, b = vocab.alias("a"), vocab.alias("b")
        return (
            a.join(
                b,
                (F.col("a.term") == F.col("b.term"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(F.col("a.source"), F.col("b.source"))
            .agg(F.count(F.lit(1)))
            .count()
        )

    timed(f"source_vocab_overlap ({f}x docs)", lambda: vocab_overlap(big_docs))

    spark.stop()


if __name__ == "__main__":
    main()
