#!/usr/bin/env python
"""High-dup-rate survivor rehearsal (r9 VERDICT next-round #1).

The r9 weak item was a FORCED ``F.broadcast`` on the near-dup loser id
set: fine when dup-rate ≪ corpus, a driver/executor OOM at web-crawl
dup rates (30-50 % of ~10⁹ docs).  The fix (functions/dedup.
anti_join_ids) broadcasts only under a counted bound.  This rehearsal
exercises the survivor path in exactly the regime that broke the hint:

- 500,000 docs, HALF of them near-clones (each variant appends one
  doc-specific token to its base) — a 50 % near-dup rate with a
  250,000-id loser set and NO exact-dup collapse available (every text
  is distinct, so dedup-first can't shrink it).  Words are md5-derived
  8-hex tokens, so cross-base CHAR-5-shingle overlap is ~0 (the first
  draft used sequential `w<i>x<j>` words and neighboring ids shared
  most of their character shingles — 8,182 edges for 5,000 planted
  pairs); a variant's extra ~9 chars leave shingle-Jaccard ≈ 536/545 ≈
  0.98, well above the 0.85 threshold.
- run near_dedup_survivors BOTH ways: the counted gate at its default
  bound (250k < 20M → broadcasts) and broadcast_limit=0 (the >bound
  regime → id-only shuffle anti-join);
- assert the shuffle-path plan contains NO BroadcastHashJoin (the old
  forced hint would), both paths return EXACTLY the 250,000 bases, and
  the walls are comparable (the shuffle is 8-byte ids — trivial next to
  the shingle pass either way).

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_highdup.py
"""

from __future__ import annotations

import json
import time

N_BASES = 250_000
WORDS = 60


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.dedup import (
        near_dedup_survivors,
        near_dup_pairs_dedup_first,
    )
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-highdup")
    t0 = time.time()

    base = spark.range(N_BASES).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS - 1)),
                lambda j: F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("id").cast("string"), j.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
            ),
            " ",
        ).alias("text"),
    )
    variant = base.select(
        (F.col("doc_id") + N_BASES).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.concat(F.lit("mut"), F.col("doc_id"))).alias("text"),
    )
    docs = base.unionByName(variant).repartition(64).localCheckpoint(eager=True)
    n = docs.count()
    report: dict = {"n_docs": n, "dup_rate": 0.5}
    assert n == 2 * N_BASES

    t1 = time.time()
    edges = near_dup_pairs_dedup_first(docs, min_jaccard=0.85).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    report["edge_wall_s"] = round(time.time() - t1, 1)
    report["n_edges"] = n_edges
    # every base pairs with exactly its variant (disjoint bases)
    assert n_edges == N_BASES, n_edges
    bad = edges.where(F.col("id_b") != F.col("id_a") + N_BASES).count()
    assert bad == 0, bad

    expected = spark.range(N_BASES).select(F.col("id").alias("doc_id"))

    # path 1: counted gate at the default bound (250k ids → broadcasts)
    t2 = time.time()
    surv_b = near_dedup_survivors(docs, edges)
    n_b = surv_b.count()
    missing_b = expected.join(surv_b, "doc_id", "left_anti").count()
    report["survivors_broadcast"] = {
        "n": n_b, "missing": missing_b,
        "wall_s": round(time.time() - t2, 1),
    }

    # path 2: past the bound (broadcast_limit=0) → id-only shuffle
    t3 = time.time()
    surv_s = near_dedup_survivors(docs, edges, broadcast_limit=0)
    plan = surv_s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, "forced hint regression"
    n_s = surv_s.count()
    missing_s = expected.join(surv_s, "doc_id", "left_anti").count()
    extra_s = surv_s.join(expected, "doc_id", "left_anti").count()
    report["survivors_shuffle"] = {
        "n": n_s, "missing": missing_s, "extra": extra_s,
        "wall_s": round(time.time() - t3, 1),
        "broadcast_in_plan": "BroadcastHashJoin" in plan,
    }
    assert n_b == n_s == N_BASES
    assert missing_b == missing_s == extra_s == 0

    report["total_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report))
    with open("/root/repo/.scratch/rehearsal_highdup.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    print("ALL ASSERTS GREEN")


if __name__ == "__main__":
    main()
