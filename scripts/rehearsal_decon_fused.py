#!/usr/bin/env python
"""Fused-decon scan rehearsal (r9 VERDICT next-round #2 'Done' measure).

pretraining_mix's decon stage used to read the corpus text TWICE —
contamination_hits (word 8-grams, JVM higher-order lambdas) and then
span_contamination_hits/excise_spans (char-window md5, arrow) — and at
100 TB the full-text scan is the unit of cost.  decon_probe derives
both probe streams from ONE pass.  This rehearsal measures exactly that
claim at the 500k-doc / ~300M-char tier (scripts/gen_sf10_docs.py):

- staged: time the two standalone probes (ngram JVM scan + span arrow
  scan), hit sets materialized;
- fused: time decon_probe(impl="arrow") — one mapInPandas pass emitting
  both streams;
- assert the fused hit sets are IDENTICAL to the staged ones (ng ids
  and (doc_id, pos, fp) span rows, both-way anti-joins), and report the
  walls: fused should land near the span scan alone, i.e. the ngram
  text pass is the saved scan.

Benchmark = the r=5 replica of every 50th base (the
rehearsal_pretrain_sf10 selection — non-vacuous hits without the %97
whole-corpus contamination degeneracy).

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_decon_fused.py
"""

from __future__ import annotations

import json
import time

SF10 = "/root/repo/.scratch/sf10docs"


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.corpus import (
        contamination_hits,
        decon_probe,
    )
    from tsatool_app_spark.functions.spans import (
        span_doc_fingerprints,
        span_fingerprints,
    )
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-decon-fused")
    report: dict = {}
    docs = (
        spark.read.parquet(f"{SF10}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    bench = (
        docs.where(
            (F.col("doc_id") < 1_000_000_000)
            & (F.col("doc_id") % 10_000_000 % 50 == 0)
            & (F.floor(F.col("doc_id") / 10_000_000) == 5)
        )
        .localCheckpoint(eager=True)
    )
    report["n_docs"], report["n_bench"] = docs.count(), bench.count()

    # ---- staged: two text scans ----------------------------------------
    t0 = time.time()
    ng_staged = (
        contamination_hits(docs, bench, n=8, dedup_texts=False)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    n_ng = ng_staged.count()
    t_ng = time.time() - t0

    t1 = time.time()
    bench_fps = (
        span_doc_fingerprints(bench, impl="arrow").select("fp").distinct()
    )
    sp_staged = (
        span_fingerprints(docs, impl="arrow")
        .join(F.broadcast(bench_fps), "fp")
        .select("doc_id", "pos", "fp")
        .localCheckpoint(eager=True)
    )
    n_sp = sp_staged.count()
    t_sp = time.time() - t1
    report["staged"] = {
        "ngram_wall_s": round(t_ng, 1),
        "span_wall_s": round(t_sp, 1),
        "total_wall_s": round(t_ng + t_sp, 1),
        "ng_hit_ids": n_ng,
        "span_hit_rows": n_sp,
    }

    # ---- fused: one text scan ------------------------------------------
    t2 = time.time()
    ng_f, sp_f = decon_probe(docs, bench, ngram_n=8, window_len=40, impl="arrow")
    ng_f = ng_f.localCheckpoint(eager=True)
    sp_f = sp_f.localCheckpoint(eager=True)
    n_ng_f, n_sp_f = ng_f.count(), sp_f.count()
    t_fused = time.time() - t2
    report["fused"] = {
        "total_wall_s": round(t_fused, 1),
        "ng_hit_ids": n_ng_f,
        "span_hit_rows": n_sp_f,
    }
    report["saved_wall_s"] = round(t_ng + t_sp - t_fused, 1)

    # ---- identity -------------------------------------------------------
    assert n_ng_f == n_ng and n_sp_f == n_sp, (n_ng, n_ng_f, n_sp, n_sp_f)
    d1 = ng_staged.join(ng_f, "doc_id", "left_anti").count()
    d2 = ng_f.join(ng_staged, "doc_id", "left_anti").count()
    d3 = sp_staged.join(sp_f, ["doc_id", "pos", "fp"], "left_anti").count()
    d4 = sp_f.join(sp_staged, ["doc_id", "pos", "fp"], "left_anti").count()
    assert d1 == d2 == d3 == d4 == 0, (d1, d2, d3, d4)
    report["identity_anti_joins"] = [d1, d2, d3, d4]

    print(json.dumps(report, indent=1))
    with open("/root/repo/.scratch/rehearsal_decon_fused.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    print("ALL ASSERTS GREEN")


if __name__ == "__main__":
    main()
