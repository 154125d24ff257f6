#!/usr/bin/env python
"""r9 volume rehearsal: pretraining_mix END-TO-END at the 500k-doc /
~600M-char tier (scripts/gen_sf10_docs.py corpus + 2,000 planted
near-dup variants), asserting every stage against independently
computable ground truth:

1. PLANTED NEAR-DUPS die at the near-dup stage: for 2,000 clean
   survivors we plant `text + " !!"` variants (char-5 J >= 0.99); each
   planted doc passes clean (same lang/quality class as its base, text
   distinct) and must appear in the component-loser set; the edge set
   must contain EXACTLY the 2,000 planted pairs (the generator's filler
   math puts every cross-group / natural pair below J=0.85, and the
   exact-verify stage has no false positives).
2. BENCHMARK CONTAMINATION is family-exact: the benchmark is ONE
   replica (r=5) of every 50th base doc — NOT the excise rehearsal's
   %97 slice, which holds a replica of ~every base and therefore
   contaminates the ENTIRE corpus through the shared original-text
   prefix (measured: 38,390/38,390 kept docs dropped, 0 rows reach the
   mixture — correct detector behavior, vacuous rehearsal).  With the
   per-50th-base bench: (a) every kept survivor whose md5(text) equals
   a bench doc's (the bench doc's identical group-0 twin) must be
   dropped; (b) every kept survivor sharing a bench doc's BASE whose
   original text has >= 8 words must be dropped (the first 8 original
   words form a word-8-gram present in both, filler notwithstanding);
   extras beyond the same-base family (natural cross-base overlaps in
   the sf0.1 texts) are counted and reported; (c) decon retains >= 90 %
   of kept, so the mixture/packing stages run on real mass.
3. MIXTURE contract: output sources == budgeted sources; the binding
   source's rate_q < buckets and its kept token mass lands within 5 % of
   rate_q/buckets * available; the loose source keeps everything
   (rate_q == buckets).
4. PACKING contract: shard == doc_id % n_shards; every bin's token sum
   <= budget unless it is a single over-budget doc; packed rows == mixed
   rows (packing drops nothing).
5. SEAM IDENTITY AT VOLUME: the one-call composition's output is
   byte-identical (anti-join 0/0 + equal counts) to running the five
   stages SEPARATELY with eager parquet materialization between them —
   the strongest available check that the composition's lazy
   localCheckpoint seams change nothing.
6. EXCISE MODE (decon="excise", r9): at the same tier, (a) every
   drop-mode decon survivor passes through excision byte-untouched;
   (b) every kept full-text benchmark clone is excised to < 5 % of its
   original length (interior unselected-run survival is (7/8)^40 ~
   0.5 %/char, plus two ~8-char edge margins); (c) the one-call excise
   composition equals mixture+packing rerun over the independently
   staged excise decon set (anti-join 0/0).

Spans use impl="arrow" (the bulk path, byte-identical to the certified
sql rule).  Walls recorded for SCALING.md.  Run idle:
  PYTHONPATH=/root/repo python scripts/rehearsal_pretrain_sf10.py
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from tsatool_app_spark.functions.corpus import (
    clean_corpus,
    contamination_hits,
    pack_sequences,
    pretraining_mix,
)
from tsatool_app_spark.functions.dedup import (
    connected_components,
    near_dup_pairs_dedup_first,
)
from tsatool_app_spark.functions.sampling import token_budget_mixture
from tsatool_app_spark.functions.spans import span_contamination_hits
from tsatool_app_spark.session import get_spark

TIER = os.environ.get("SPARK_GRAFT_SF10_DOCS", "/root/repo/.scratch/sf10docs")
OUT = "/root/repo/.scratch/pretrain_rehearsal"
LANG = "en"
MIN_Q = 0.6
PACK_BUDGET = 2048
N_SHARDS = 8
BUCKETS = 10_000

spark = get_spark("pretrain-rehearsal")
t0 = time.time()
walls: dict[str, float] = {}


def lap(name: str) -> None:
    global t0
    walls[name] = round(time.time() - t0, 1)
    print(f"[{walls[name]:7.1f}s] {name}", flush=True)
    t0 = time.time()


def mat(df: DataFrame, name: str) -> DataFrame:
    """Eager parquet materialization — the staged pipeline's seams."""
    p = f"{OUT}/{name}"
    df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


docs0 = spark.read.parquet(f"{TIER}/documents.parquet")

# ---- plant 2,000 near-dup variants off actual clean survivors --------
clean0_ids = clean_corpus(docs0, lang=LANG, min_quality=MIN_Q).select("doc_id")
surv0 = docs0.join(clean0_ids, "doc_id", "left_semi")
n_docs, n_surv0 = docs0.count(), surv0.count()
# n_chars >= 300 keeps the planted J well clear of the threshold: a
# 300-char doc has ~296 distinct char-5 shingles, and " !!" adds <= 7,
# so J >= 296/303 ~ 0.977 >> 0.85 (at 40 chars it would be 0.84 —
# BELOW threshold — so short docs are excluded by construction).
bases = mat(
    surv0.where(F.col("n_chars") >= 300).orderBy("doc_id").limit(2000),
    "planted_bases",
)
planted = bases.select(
    (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" !!")).alias("text"),
    "lang",
    "source",
    (F.col("n_chars") + 3).alias("n_chars"),
)
corpus = mat(docs0.unionByName(planted), "corpus")
# benchmark: the r=5 replica of every 50th base — contaminates the ~100
# affected base families (all replicas share the original-text prefix)
# while leaving the other 98 % of the corpus clean for the mixture
bench = mat(
    docs0.where(
        (F.col("doc_id") < 1_000_000_000)
        & (F.col("doc_id") % 10_000_000 % 50 == 0)
        & (F.floor(F.col("doc_id") / 10_000_000) == 5)
    ),
    "bench",
)
n_corpus, n_bench = corpus.count(), bench.count()
print(f"corpus {n_corpus} docs (500,600 + 2,000 planted), bench {n_bench}")
lap("setup: plant + materialize corpus/bench")

# ---- the budgets: derived so src0 BINDS (~50 %) and src1 is loose ----
# availability measured over the decontaminated set the mixture will
# actually see is unknown until that stage runs; measuring over clean
# survivors is close enough to make src0 bind far below 10000 and src1
# sit far above its supply — the asserts below use the mixture's OWN
# in-plan availability, so the band test stays exact.
av = {
    r["source"]: r["tok"]
    for r in surv0.groupBy("source")
    .agg(F.sum("n_chars").alias("tok"))
    .collect()
}
budgets = {"src0": int(av.get("src0", 1) // 2), "src1": int(av.get("src1", 1) * 10)}
print("budgets:", budgets)
lap("budget sizing aggregate")

# ======================================================================
# A. the one-call composition
# ======================================================================
composed = mat(
    pretraining_mix(
        corpus,
        bench,
        budgets,
        lang=LANG,
        min_quality=MIN_Q,
        pack_budget=PACK_BUDGET,
        n_shards=N_SHARDS,
        impl="arrow",
    ),
    "composed",
)
n_composed = composed.count()
print(f"composed output: {n_composed} rows")
lap("composed pretraining_mix (one call)")

# ======================================================================
# B. the staged pipeline — eager parquet between every stage
# ======================================================================
clean_ids = clean_corpus(corpus, lang=LANG, min_quality=MIN_Q).select("doc_id")
surv = mat(corpus.join(clean_ids, "doc_id", "left_semi"), "surv")
n_surv = surv.count()
lap("stage 1: clean (lang/quality/exact-dedup)")

edges = mat(
    near_dup_pairs_dedup_first(surv, min_jaccard=0.85).select("id_a", "id_b"),
    "edges",
)
n_edges = edges.count()
comp = connected_components(edges)
losers = mat(
    comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    ),
    "losers",
)
n_losers = losers.count()
kept = mat(surv.join(F.broadcast(losers), "doc_id", "left_anti"), "kept")
lap("stage 2: near-dup edges + components + survivors")

ng = contamination_hits(kept, bench, n=8).select("doc_id")
sp = span_contamination_hits(kept, bench, window_len=40, impl="arrow").select(
    "doc_id"
)
hits = mat(ng.unionByName(sp).distinct(), "decon_hits")
n_hits = hits.count()
decon = mat(kept.join(hits, "doc_id", "left_anti"), "decon")
n_decon = decon.count()
lap("stage 3: ngram + span decontamination")

mix = mat(
    token_budget_mixture(decon, budgets, buckets=BUCKETS), "mix"
)
n_mix = mix.count()
lap("stage 4: token-budget mixture")

packed = pack_sequences(mix, budget=PACK_BUDGET, n_shards=N_SHARDS)
staged = mat(
    packed.join(mix.select("doc_id", "source", "rate_q"), "doc_id").select(
        "doc_id", "source", "rate_q", "shard", "bin_id", "n_tokens"
    ),
    "staged",
)
n_staged = staged.count()
lap("stage 5: pack + rate join-back")

# ======================================================================
# asserts
# ======================================================================
fails: list[str] = []


def check(ok: bool, msg: str) -> None:
    tag = "OK  " if ok else "FAIL"
    print(f"{tag} {msg}", flush=True)
    if not ok:
        fails.append(msg)


# 1. planted near-dups: pass clean, then die as component losers
planted_ids = planted.select("doc_id")
n_planted_clean = surv.join(planted_ids, "doc_id", "left_semi").count()
check(n_planted_clean == 2000, f"planted pass clean: {n_planted_clean}/2000")
expected_pairs = bases.select(
    F.col("doc_id").alias("id_a"),
    (F.col("doc_id") + F.lit(3_000_000_000)).alias("id_b"),
)
missing_pairs = expected_pairs.join(edges, ["id_a", "id_b"], "left_anti").count()
extra_pairs = edges.join(expected_pairs, ["id_a", "id_b"], "left_anti").count()
check(
    missing_pairs == 0 and extra_pairs == 0,
    f"edge set == planted pairs exactly (missing={missing_pairs}, "
    f"extra={extra_pairs}, total={n_edges})",
)
n_planted_losers = losers.join(planted_ids, "doc_id", "left_semi").count()
check(
    n_planted_losers == 2000 and n_losers == 2000,
    f"losers == the 2,000 planted docs ({n_planted_losers}/{n_losers})",
)

# 2. benchmark contamination: exact on clones, family-exact on bases
bench_md5 = bench.select(F.md5("text").alias("_h")).distinct()
clones = kept.select("doc_id", F.md5("text").alias("_h")).join(
    bench_md5, "_h", "left_semi"
)
n_clones = clones.count()
missed_clones = clones.join(hits, "doc_id", "left_anti").count()
check(
    missed_clones == 0,
    f"all {n_clones} full-text benchmark clones among kept are "
    f"decontaminated (missed={missed_clones})",
)
orig = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
    F.col("doc_id").alias("base_id"),
    F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    ).alias("n_words_orig"),
)
bench_bases = bench.select(
    (F.col("doc_id") % 10_000_000).alias("base_id")
).distinct()
same_base_kept = (
    kept.where(F.col("doc_id") < 1_000_000_000)
    .select("doc_id", (F.col("doc_id") % 10_000_000).alias("base_id"))
    .join(bench_bases, "base_id")
    .join(orig, "base_id")
    .where(F.col("n_words_orig") >= 8)
    .select("doc_id")
)
n_family = same_base_kept.count()
missed_family = same_base_kept.join(hits, "doc_id", "left_anti").count()
extras = hits.join(same_base_kept, "doc_id", "left_anti").count()
check(
    missed_family == 0,
    f"all {n_family} same-base-family survivors (orig >= 8 words) are "
    f"decontaminated (missed={missed_family}; extras beyond the family="
    f"{extras})",
)
kept_count = kept.count()
check(
    n_decon >= 0.9 * kept_count,
    f"decon retains >= 90% of kept ({n_decon}/{kept_count})",
)
# the giant survivor reaches decon only if its (filler-heavy) text
# passes the lang/quality gates — assert the implication, report which
giant_in_kept = kept.where(F.col("doc_id") == 2_000_000_000).count()
giant_surv_hit = hits.where(F.col("doc_id") == 2_000_000_000).count()
check(
    giant_in_kept == giant_surv_hit,
    f"giant-cluster survivor decontaminated iff kept "
    f"(kept={giant_in_kept}, hit={giant_surv_hit})",
)

# 3. mixture contract
rates = {
    r["source"]: r["rate_q"]
    for r in mix.select("source", "rate_q").distinct().collect()
}
check(
    set(rates) <= set(budgets),
    f"mixture sources within budget keys: {sorted(rates)}",
)
check(rates.get("src1") == BUCKETS, f"loose source rate_q == {rates.get('src1')}")
check(
    rates.get("src0", BUCKETS) < BUCKETS,
    f"binding source rate_q == {rates.get('src0')} < {BUCKETS}",
)
avail_decon = {
    r["source"]: r["tok"]
    for r in decon.groupBy("source").agg(F.sum("n_chars").alias("tok")).collect()
}
kept_tok = {
    r["source"]: r["tok"]
    for r in mix.groupBy("source").agg(F.sum("n_chars").alias("tok")).collect()
}
# rate_q is all-integer arithmetic — recompute it exactly (a statistical
# token-mass band is the wrong tool: the hash-bucket filter is
# deterministic, and at ~1,900 docs/source the mass deviation from
# rate*avail is legitimately a few percent — measured 5.4 % = ~2.8 sigma
# on the first run of this rehearsal; reported below, never asserted)
for s in ("src0", "src1"):
    exp_rate = min(BUCKETS, budgets[s] * BUCKETS // avail_decon[s])
    check(
        rates[s] == exp_rate,
        f"{s}: rate_q {rates[s]} == budget*{BUCKETS} div avail ({exp_rate})",
    )
    exp = avail_decon[s] * rates[s] / BUCKETS
    print(
        f"     {s}: kept token mass {kept_tok[s]} vs rate*avail "
        f"{exp:.0f} (rel {abs(kept_tok[s] - exp) / exp:.4f}) — report only"
    )
# the kept SET follows the documented engine-portable contract: keep iff
# int(first 4 hex of md5(cast(id as string)), 16) % buckets < rate_q —
# recomputed here from the spec, not via the library helper
bucket = F.expr(
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) "
    f"as int) % {BUCKETS}"
)
exp_kept = (
    decon.where(F.col("source").isin(list(budgets)))
    .where(
        bucket
        < F.when(F.col("source") == "src0", F.lit(rates["src0"])).otherwise(
            F.lit(rates["src1"])
        )
    )
    .select("doc_id")
)
m1 = exp_kept.join(mix.select("doc_id"), "doc_id", "left_anti").count()
m2 = mix.select("doc_id").join(exp_kept, "doc_id", "left_anti").count()
check(
    m1 == 0 and m2 == 0,
    f"mixture kept set == hash-bucket contract recompute (anti {m1}/{m2})",
)

# 4. packing contract
check(n_staged == n_mix, f"packing drops nothing ({n_staged} == {n_mix})")
bad_shard = staged.where(F.col("shard") != F.col("doc_id") % N_SHARDS).count()
check(bad_shard == 0, "shard == doc_id % n_shards for every row")
bins = staged.groupBy("shard", "bin_id").agg(
    F.sum("n_tokens").alias("tok"), F.count("*").alias("n")
)
bad_bins = bins.where(
    (F.col("tok") > PACK_BUDGET) & (F.col("n") > 1)
).count()
check(bad_bins == 0, f"every multi-doc bin within budget {PACK_BUDGET}")

# 5. composed == staged, byte-identical
cols = ["doc_id", "source", "rate_q", "shard", "bin_id", "n_tokens"]
d1 = composed.select(cols).join(staged.select(cols), cols, "left_anti").count()
d2 = staged.select(cols).join(composed.select(cols), cols, "left_anti").count()
check(
    d1 == 0 and d2 == 0 and n_composed == n_staged,
    f"composition == staged pipeline (anti-joins {d1}/{d2}, "
    f"counts {n_composed}/{n_staged})",
)
lap("asserts")

# ======================================================================
# C. excise mode at volume
# ======================================================================
from tsatool_app_spark.functions.spans import excise_spans

composed_ex = mat(
    pretraining_mix(
        corpus,
        bench,
        budgets,
        lang=LANG,
        min_quality=MIN_Q,
        pack_budget=PACK_BUDGET,
        n_shards=N_SHARDS,
        impl="arrow",
        decon="excise",
    ),
    "composed_excise",
)
n_composed_ex = composed_ex.count()
lap("composed pretraining_mix (decon=excise)")

# staged excise decon, reusing Part B's materialized kept/hits frames
ng_kept = kept.join(
    contamination_hits(kept, bench, n=8).select("doc_id"), "doc_id", "left_anti"
)
ex = mat(
    excise_spans(ng_kept, bench, window_len=40, impl="arrow"), "excised"
)
decon_ex = mat(
    ng_kept.select("doc_id", "source")
    .join(
        ex.where(F.length("clean_text") > 0).select(
            "doc_id", F.col("clean_text").alias("text")
        ),
        "doc_id",
    )
    .withColumn("n_chars", F.length("text").cast("long")),
    "decon_excise",
)
lap("staged excise decon")

# (a) drop-mode survivors pass through excision byte-untouched
touched = (
    decon.select("doc_id", F.col("text").alias("_orig"))
    .join(ex.select("doc_id", "clean_text", "n_spans_excised"), "doc_id")
    .where(
        (F.col("n_spans_excised") != 0) | (F.col("clean_text") != F.col("_orig"))
    )
    .count()
)
check(
    touched == 0,
    f"all {n_decon} drop-mode decon survivors pass through excision "
    f"byte-untouched (touched={touched})",
)
# (b) kept full-text bench clones are excised to < 5 % of original length
clone_resid = (
    clones.select("doc_id")
    .join(
        ex.select("doc_id", F.length("clean_text").alias("_rem")), "doc_id"
    )
    .join(kept.select("doc_id", F.length("text").alias("_len")), "doc_id")
    .where(F.col("_rem") > 0.05 * F.col("_len"))
    .count()
)
check(
    clone_resid == 0,
    f"all {n_clones} kept bench clones excised to < 5% of original "
    f"length (violations={clone_resid})",
)
# (c) composed excise output == mixture+packing over the staged decon
mix_ex = mat(token_budget_mixture(decon_ex, budgets, buckets=BUCKETS), "mix_ex")
staged_ex = mat(
    pack_sequences(mix_ex, budget=PACK_BUDGET, n_shards=N_SHARDS)
    .join(mix_ex.select("doc_id", "source", "rate_q"), "doc_id")
    .select("doc_id", "source", "rate_q", "shard", "bin_id", "n_tokens"),
    "staged_excise",
)
e1 = composed_ex.select(cols).join(staged_ex.select(cols), cols, "left_anti").count()
e2 = staged_ex.select(cols).join(composed_ex.select(cols), cols, "left_anti").count()
check(
    e1 == 0 and e2 == 0 and n_composed_ex == staged_ex.count(),
    f"excise composition == staged excise pipeline (anti-joins {e1}/{e2}, "
    f"rows {n_composed_ex})",
)
lap("excise asserts")

print("\nstage walls:", walls)
print(
    f"\ncorpus={n_corpus} surv={n_surv} edges={n_edges} losers={n_losers} "
    f"hits={n_hits} decon={n_decon} mix={n_mix} packed={n_staged}"
)
if fails:
    print(f"\nREHEARSAL FAILED ({len(fails)}):")
    for f_ in fails:
        print(" -", f_)
    raise SystemExit(1)
print("\nREHEARSAL GREEN")
