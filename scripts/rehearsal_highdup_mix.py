#!/usr/bin/env python
"""High-dup-rate pass through the FULL composed pipeline (r10 VERDICT
next-round #6): rehearsal_highdup.py proved the survivor filter in
isolation; this runs ``pretraining_mix`` ITSELF — both decon modes —
on the 50 %-near-dup tier, so the counted loser gate, the fused decon
probe, the mixture, and the packing interact under dup stress in ONE
plan.

Corpus: 250,000 bases + 250,000 near-clone variants (one appended
token), 48-71 words each.  Every third word is an English stopword
marker (the/and/is/of cycling) and the text ends with 'fin.', so the
docs PASS clean_corpus's language and quality gates — while the other
words stay md5-derived hex, keeping cross-base char-5-shingle overlap
at noise level (the near-dup property the survivor rehearsal pinned).

Planted contamination:
- n-gram: the benchmark carries the verbatim texts of bases 0..499 —
  those 500 survivors die on the word-8-gram filter in BOTH modes;
- span-only: one benchmark doc is six 7-word VERBATIM chunks of base
  600 joined by a word ('zzsep') absent from the corpus — every one of
  its 8-grams contains the separator, so NO n-gram fires, but the
  md5-selected 40-char windows inside each chunk match base 600
  content-identically.  In decon='drop' mode base 600 dies; in
  decon='excise' it survives with the matched spans spliced out (and a
  smaller recomputed token count).  Fixture sanity (≥1 selected window
  actually matches) is asserted cheaply before the big runs.

Asserts: survivor id set EXACT in both modes (drop = bases minus 500
n-gram hits minus {600}; excise = drop + {600}); rate_q = 10000
everywhere (budgets sized above supply); greedy packing replayed
driver-side bin-for-bin in both modes; excised 600 packs fewer tokens
than its clean siblings' shard ordering implies for an untouched doc.

Usage: PYTHONPATH=/root/repo python scripts/rehearsal_highdup_mix.py
"""

from __future__ import annotations

import json
import os
import time

N_BASES = int(os.environ.get("REHEARSAL_N_BASES", 250_000))
MARKERS = ["the", "and", "is", "of"]
BUDGETS = {"web": 1 << 42}
PACK_BUDGET = 256


def _text_expr(F, idc):
    """48 + (id % 24) words; every 3rd word a marker, rest md5-hex;
    terminal 'fin.' supplies the sentence-end quality bit."""
    n_words = 48 + (idc % 24)
    word = lambda j: F.when(  # noqa: E731
        j % 3 == 0,
        F.element_at(
            F.array(*[F.lit(m) for m in MARKERS]),
            ((j % 12) / 3 + 1).cast("int"),
        ),
    ).otherwise(
        F.md5(
            F.concat_ws("|", idc.cast("string"), j.cast("string"))
        ).substr(1, 8)
    )
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), n_words - 1), word), " "
    )
    return F.concat(body, F.lit(" fin."))


def _replay_packing(rows) -> int:
    """Greedy first-fit replay of the pack_sequences contract; returns
    the number of bin mismatches."""
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    bad = 0
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        bin_id, fill, first = 0, 0, True
        for r in rs:
            tok = r["n_tokens"]
            if not first and fill + tok > PACK_BUDGET:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            first = False
            if r["bin_id"] != bin_id:
                bad += 1
    return bad


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.corpus import pretraining_mix
    from tsatool_app_spark.session import get_spark

    spark = get_spark("rehearsal-highdup-mix")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    report: dict = {}

    base = spark.range(N_BASES).select(
        F.col("id").alias("doc_id"),
        _text_expr(F, F.col("id")).alias("text"),
    )
    variant = base.select(
        (F.col("doc_id") + N_BASES).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" mut"), (F.col("doc_id") + N_BASES)
        ).alias("text"),
    )
    docs = (
        base.unionByName(variant)
        .select(
            "doc_id", "text", F.lit("web").alias("source"),
            F.length("text").alias("n_chars"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    report["n_docs"] = docs.count()
    assert report["n_docs"] == 2 * N_BASES

    # benchmark: 500 verbatim base texts (n-gram) + the span-only probe
    ng_bench = docs.where(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    x_text = docs.where(F.col("doc_id") == 600).collect()[0].text
    x_words = x_text.split(" ")
    chunks = [
        " ".join(x_words[o : o + 7]) for o in range(0, 42, 8)
    ]
    span_bench_text = " zzsep ".join(chunks)
    for g in range(len(span_bench_text.split(" ")) - 7):
        assert "zzsep" in span_bench_text.split(" ")[g : g + 8], g
    span_bench = spark.createDataFrame(
        [(10_000_600, span_bench_text)], "doc_id long, text string"
    )
    benchmark = ng_bench.unionByName(span_bench).localCheckpoint(eager=True)

    # fixture sanity: ≥1 md5-selected window of the span benchmark
    # matches base 600 (content-defined selection is symmetric)
    from tsatool_app_spark.functions.spans import span_doc_fingerprints

    bfp = span_doc_fingerprints(span_bench).select("fp").distinct()
    xfp = span_doc_fingerprints(
        docs.where(F.col("doc_id") == 600)
    ).select("fp").distinct()
    n_shared = bfp.join(xfp, "fp").count()
    report["span_fixture_shared_fps"] = n_shared
    assert n_shared >= 1, "span fixture vacuous — widen the chunks"

    expected_drop = (
        spark.range(500, N_BASES)
        .selectExpr("id AS doc_id")
        .where(F.col("doc_id") != 600)
    )

    for mode in ("drop", "excise"):
        t1 = time.time()
        out = pretraining_mix(
            docs, benchmark, BUDGETS, decon=mode, pack_budget=PACK_BUDGET
        ).localCheckpoint(eager=True)
        n = out.count()
        wall = round(time.time() - t1, 1)
        expected = (
            expected_drop
            if mode == "drop"
            else expected_drop.unionByName(
                spark.range(600, 601).selectExpr("id AS doc_id")
            )
        )
        n_expected = N_BASES - 500 - (1 if mode == "drop" else 0)
        missing = expected.join(out, "doc_id", "left_anti").count()
        extra = out.join(expected, "doc_id", "left_anti").count()
        bad_rate = out.where(F.col("rate_q") != 10_000).count()
        rows = [
            r.asDict()
            for r in out.select("doc_id", "shard", "bin_id", "n_tokens")
            .collect()
        ]
        pack_bad = _replay_packing(rows)
        report[mode] = {
            "wall_s": wall, "n": n, "missing": missing, "extra": extra,
            "bad_rate_q": bad_rate, "pack_mismatches": pack_bad,
        }
        assert n == n_expected, (n, n_expected)
        assert missing == 0 and extra == 0, (missing, extra)
        assert bad_rate == 0 and pack_bad == 0

    # the excised doc packs FEWER tokens than its pre-excision self
    x_tokens_excise = [r["n_tokens"] for r in rows if r["doc_id"] == 600]
    report["x600_tokens_excised"] = x_tokens_excise[0]
    assert x_tokens_excise[0] < len(x_words), x_tokens_excise

    report["total_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report))
    with open("/root/repo/.scratch/rehearsal_highdup_mix.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    print("ALL ASSERTS GREEN")


if __name__ == "__main__":
    main()
