"""r9 volume rehearsal: excise_spans at the 500k-doc / 300M-char tier.

Asserts, against independent recomputation:
1. arithmetic identity per doc: n_excised_chars == len(text) - len(clean)
   for EVERY row (the splice and the clamp agree, corpus-wide);
2. detection consistency: the excised-doc set equals
   span_contamination_hits' hit set (excision removes from exactly the
   docs the detector flags);
3. pass-through: clean docs emerge byte-identical;
4. pad=window_len residue on full-text benchmark clones matches the
   edge math: an edge survives with probability (7/8)^(pad+1), so the
   expected residue fraction is ~2*(7/8)^41 = 0.8 % of clones and every
   residue is SHORT (an un-selected margin, not a surviving span body).

Walls recorded for SCALING.md.  Run idle:
  PYTHONPATH=/root/repo python scripts/rehearsal_excise_sf10.py
"""
import os
import time

from pyspark.sql import functions as F

from tsatool_app_spark.functions.spans import (
    excise_spans,
    span_contamination_hits,
    span_doc_fingerprints,
    span_fingerprints,
)
from tsatool_app_spark.session import get_spark

TIER = os.environ.get("SPARK_GRAFT_SF10_DOCS", "/root/repo/.scratch/sf10docs")

spark = get_spark("excise-rehearsal")
docs = spark.read.parquet(f"{TIER}/documents.parquet").select("doc_id", "text")
# benchmark: a deterministic 1/97 slice of the corpus — includes bases of
# the planted clone clusters, so thousands of training docs carry
# full-text verbatim overlap with it
bench = docs.where(F.col("doc_id") % 97 == 0)
n_docs, n_bench = docs.count(), bench.count()
print(f"corpus {n_docs} docs, benchmark {n_bench}", flush=True)

t0 = time.time()
bfps = (
    span_doc_fingerprints(bench, impl="arrow").select("fp").distinct()
    .localCheckpoint()
)
t_bfps = time.time() - t0
t0 = time.time()
fps = span_fingerprints(docs, impl="arrow").localCheckpoint()
t_fps = time.time() - t0
print(f"bench fps {t_bfps:.1f} s, corpus fps pass {t_fps:.1f} s", flush=True)

t0 = time.time()
out = excise_spans(docs, bench_fps=bfps, fps_pos=fps).localCheckpoint()
n_out = out.count()
t_excise = time.time() - t0
touched = out.where(F.col("n_spans_excised") > 0).localCheckpoint()
n_touched = touched.count()
tot = touched.agg(
    F.sum("n_excised_chars").alias("chars"), F.sum("n_spans_excised").alias("spans")
).first()
print(
    f"excise {t_excise:.1f} s: {n_out} rows, {n_touched} docs touched, "
    f"{tot['spans']} spans / {tot['chars']} chars removed", flush=True,
)
assert n_out == n_docs

# 1. splice arithmetic identity, corpus-wide
joined = out.join(docs, "doc_id")
bad = joined.where(
    F.col("n_excised_chars")
    != F.coalesce(F.length("text"), F.lit(0)) - F.coalesce(F.length("clean_text"), F.lit(0))
).count()
print(f"splice-arithmetic violations: {bad}", flush=True)
assert bad == 0

# 2. excised set == detector's hit set
hits = span_contamination_hits(docs, bench, impl="arrow").select("doc_id")
d1 = touched.select("doc_id").join(hits, "doc_id", "left_anti").count()
d2 = hits.join(touched.select("doc_id"), "doc_id", "left_anti").count()
print(f"excised-but-not-detected: {d1}, detected-but-not-excised: {d2}", flush=True)
assert d1 == 0 and d2 == 0

# 3. pass-through byte identity for clean docs
clean_diff = (
    joined.where(F.col("n_spans_excised") == 0)
    .where(~F.col("clean_text").eqNullSafe(F.col("text")))
    .count()
)
print(f"pass-through mismatches: {clean_diff}", flush=True)
assert clean_diff == 0

# 4. pad=window_len residue on full-text benchmark clones == edge math
clones = docs.alias("d").join(
    bench.select(F.md5("text").alias("h")).distinct(),
    F.md5(F.col("d.text")) == F.col("h"),
    "left_semi",
).where(F.col("doc_id") % 97 != 0)
n_clones = clones.count()
t0 = time.time()
padded = excise_spans(clones, bench_fps=bfps, pad=40, impl="arrow").localCheckpoint()
res_rows = padded.where(F.length("clean_text") > 0)
residue = res_rows.count()
max_res = res_rows.agg(F.max(F.length("clean_text"))).first()[0] or 0
t_pad = time.time() - t0
frac = residue / n_clones if n_clones else 0.0
print(
    f"full-text clones of benchmark docs: {n_clones}; pad=40 residue docs: "
    f"{residue} ({100 * frac:.2f} % vs ~0.8 % expected), longest residue "
    f"{max_res} chars ({t_pad:.1f} s)", flush=True,
)
# 2*(7/8)^41 = 0.84 %; allow 3x headroom, and residues must be MARGINS
# (shorter than ~a few un-selected runs), never a surviving span body
assert frac < 0.025, "residue fraction far above the edge math"
assert max_res < 400, "a residue is too long to be an un-selected margin"

print("ALL GREEN", flush=True)
spark.stop()
