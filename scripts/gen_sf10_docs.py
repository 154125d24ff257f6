#!/usr/bin/env python
"""Generate the sf10 DOCUMENTS spot-tier for the dedup-family scale
rehearsal (r5 VERDICT next-round #7): 100x the sf0.1 corpus (500k docs)
with PLANTED ground truth whose true near-dup pair set is exactly known.

Construction (from /root/testdata/sf0.1/documents.parquet, 5k docs):

- 100 replicas r = 0..99 of every base doc, doc_id' = doc_id + r*10_000_000.
- Replicas are partitioned into 10 GROUPS of 10 (g = r // 10).  Every doc
  gets a deterministic salted FILLER suffix scaling with its CHAR length
  (~0.1 tokens/char), keyed by (g, base doc_id): within a group the 10
  replicas stay byte-identical
  (planted clusters of exactly 10), while across groups / across base docs
  the filler diverges enough to push every other pair BELOW both family
  thresholds (word-5-gram J < 0.6 and char-5-shingle J < 0.85; margins
  derived in scripts/rehearsal_sf10_dedup.py, re-verified there by
  sampling).  Natural sf0.1 near-dup pairs (J in [0.85, 1)) are likewise
  diluted below threshold, so ground truth is EXACTLY the within-cluster
  pairs: 5_000 base docs x 10 groups = 50_000 clusters of 10 identical
  docs -> 50_000 * C(10,2) = 2_250_000 pairs, every one at J = 1.0.
- Plus ONE planted GIANT cluster: 600 identical copies of the min base doc
  (doc_id 2_000_000_000+j, filler key 'x').  600 > the minhash/simhash
  max_bucket_size default of 512, so the banded pipelines must CAP the
  bucket and the oversize-bucket AUDIT must surface it -- the rehearsal
  asserts both.

Output: /root/repo/.scratch/sf10docs/documents.parquet (gitignored).
Usage: PYTHONPATH=/root/repo python scripts/gen_sf10_docs.py
"""

from __future__ import annotations

import os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf10docs"
GIANT = 600


def main() -> None:
    from pyspark.sql import functions as F

    from tsatool_app_spark.session import get_spark

    spark = get_spark("gen-sf10-docs")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(100).select(F.col("id").alias("r"))

    def filler(gkey, base_id):
        """Filler tokens z{md5(salt#i)[:8]} where salt = md5(g-id): every
        token is 8 fresh hex chars, so ALL ~10 char-5 shingles per token
        (including the boundary windows) are salt-dependent, and fillers
        for different (group, base) keys share shingles only by 1/16^5
        per-window coincidence.  Two earlier constructions failed the
        rehearsal's exactness assert and are retired for cause:
        z{g}w{id}q{g}t{i}v{g} shared the q{g}t{i}v{g} runs (179_300 extra
        pairs); z{salt10}t{i} concentrated all cross-doc diversity in 1-2
        salt chars per varying window, and among 225k same-base pair
        combos LSH adversarially selected the 23 salt pairs whose
        first/last chars collided (2_300 extras at J up to 0.92, identical
        before/after word->char count scaling).

        Token count scales with CHAR length (0.1 * chars): distinct-
        shingle mass B <= chars, filler adds F ~ chars fresh shingles per
        side, so same-base cross-group char-5 J <= B/(B+2F) ~ 1/3 << 0.85
        uniformly — long-word docs (B >> 6*words) included.  Word-grams:
        filler words are all-distinct, so word-5-gram and word-set
        Jaccard land <= ~0.5 < 0.6."""
        salt = F.md5(F.concat_ws("-", gkey, base_id))
        n_tok = F.greatest(
            F.lit(1), F.ceil(F.length("text") * 0.1).cast("int")
        )
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_tok),
                lambda i: F.concat(
                    F.lit("z"),
                    F.substring(
                        F.md5(F.concat(salt, F.lit("#"), i.cast("string"))), 1, 8
                    ),
                ),
            ),
            " ",
        )

    # NB: text (with the filler keyed by the BASE doc_id) must be computed
    # BEFORE doc_id is shifted — a single select that aliases doc_id and
    # also references it in the filler resolves the reference to the NEW
    # column under Spark's lateral column aliasing, silently keying every
    # replica's filler by its shifted id (bug found by the rehearsal's
    # planted-count assertion: 500k distinct texts instead of 50k).
    g = (F.col("r") / 10).cast("int").cast("string")
    out = (
        docs.crossJoin(reps)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" "), filler(g, F.col("doc_id").cast("string"))),
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("r") * 10_000_000)
        .select("doc_id", "text", "lang", "source")
        .withColumn("n_chars", F.length("text"))
    )

    base = docs.orderBy("doc_id").limit(1)
    giant = (
        base.crossJoin(spark.range(GIANT).select(F.col("id").alias("j")))
        .withColumn(
            "text",
            F.concat(
                F.col("text"), F.lit(" "),
                filler(F.lit("x"), F.col("doc_id").cast("string")),
            ),
        )
        .withColumn("doc_id", F.lit(2_000_000_000) + F.col("j"))
        .select("doc_id", "text", "lang", "source")
        .withColumn("n_chars", F.length("text"))
    )

    os.makedirs(DST, exist_ok=True)
    out.unionByName(giant).repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )
    n = spark.read.parquet(f"{DST}/documents.parquet").count()
    print(f"wrote {n} docs to {DST}/documents.parquet")


if __name__ == "__main__":
    main()
