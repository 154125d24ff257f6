"""Bloom-filter runtime semi-join: filter a huge fact table by a large key
set BEFORE the shuffle, then exact-join only the survivors.

The standard semi-join plan shuffles the full fact table on the key; when
the key set is too big to broadcast as an IN-list but its *bitmap* is
compact, a Bloom filter drops most non-matching fact rows at scan speed —
the "runtime filter" every warehouse engine (and Spark's own
InjectRuntimeFilter, for equi-joins it recognizes) applies at 100 TB.
This operator makes the pattern explicit and composable:

1. build: ONE distributed aggregate ORs key-hash bits into n_bits/64
   longs (the shuffle carries word partials, never keys);
2. probe: the word array rides to every fact task via a broadcast
   single-row cross join; membership is k element_at/bit tests — pure
   Column arithmetic inside whole-stage codegen;
3. verify: a final exact left-semi join removes the (bounded-rate) false
   positives, so results are EXACTLY the semi-join's.

Hash family: xxhash64(key, seed=i) — Spark's built-in 64-bit hash, k
independent seeds, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom_words(
    keys: DataFrame,
    key_col: str,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Distributed Bloom build → ONE row holding the filter as
    array<long> of n_bits/64 words (dense, including zero words, so
    element_at indexing is positional).

    The aggregate is bit_or per word index with map-side combine: the
    shuffle carries at most n_bits/64 partial words per partition —
    independent of key count."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes)))
    n_words = (n_bits + 63) // 64
    word_bits = (
        keys.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # SQL shiftleft takes column args; the pyspark wrapper's numBits
            # parameter is a plain int, hence expr() here.
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # Densify: every word index present (zeros included) so the probe can
    # index positionally without a lookup join.
    dense = (
        word_bits.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(word_bits, "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("long")).alias("word"))
    )
    return dense.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("w", "word"))
        ).alias("ww")
    ).select(F.transform("ww", lambda s: s["word"]).alias("bloom_words"))


def bloom_probe_col(key: Column, words_col: Column, *, n_bits: int, n_hashes: int) -> Column:
    """Membership-test Column: true iff every hash position's bit is set."""
    cond = None
    for p in _positions(key, n_bits, n_hashes):
        w = F.element_at(words_col, (p / 64).cast("int") + 1)
        # getbit takes a Column position (unlike the shiftleft/shiftright
        # wrappers, whose numBits is a plain int) — stays in codegen.
        c = F.getbit(w, (p % 64).cast("int")) == 1
        cond = c if cond is None else (cond & c)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact left-semi join of ``fact`` against ``keys`` with a Bloom
    pre-filter on the fact scan.

    Result rows are IDENTICAL to ``fact.join(keys, key, 'left_semi')``;
    the bloom only reduces how many fact rows reach the verify join's
    shuffle (false-positive survivors are removed there). At a ~1% FP
    rate the shuffle shrinks by roughly the true selectivity."""
    if "bloom_words" in fact.columns:
        raise ValueError("fact already has a 'bloom_words' column; rename it")
    words = build_bloom_words(keys, key_col, n_bits=n_bits, n_hashes=n_hashes)
    probed = (
        fact.crossJoin(F.broadcast(words))
        .where(
            bloom_probe_col(
                F.col(key_col), F.col("bloom_words"), n_bits=n_bits, n_hashes=n_hashes
            )
        )
        .drop("bloom_words")
    )
    return probed.join(
        keys.select(key_col).dropDuplicates(), key_col, "left_semi"
    )
