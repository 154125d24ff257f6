"""Exact set-similarity self-join with prefix filtering (PPJoin-style).

The exact counterpart to MinHash+LSH (functions/dedup.py): where LSH is
probabilistic (recall < 1 for pairs near the threshold), the prefix-filter
join returns EXACTLY the pairs with Jaccard >= t — no false negatives —
while still avoiding the O(n²) all-pairs comparison. This is the classic
candidate-pruning scheme of Chaudhuri et al. (SSJoin) / Xiao et al.
(PPJoin): order every document's token set by ascending global document
frequency (rarest first); if Jaccard(A, B) >= t, then A and B must share
at least one token among each one's first ``s - ceil(t*s) + 1`` tokens, so
an equi-join on prefix tokens finds every qualifying pair.

Scale shape (the reason this survives 100 TB where all-pairs dies):

- The ordering key is the (df, gram) pair itself — NOT a global
  row_number, which would force a single-partition window. Any total
  order consistent across documents satisfies the prefix lemma, so each
  document sorts its own gram list locally after one shuffle join that
  attaches df to (doc, gram) pairs.
- Only PREFIX grams are exploded into the self-join, and by construction
  prefixes are dominated by RARE grams — the candidate join's key
  distribution is anti-skewed (a gram that appears in d documents
  contributes at most d prefix rows, and high-df grams sit at the tail
  of the sort, outside most prefixes).
- Candidate pairs are deduplicated as (id, id) pairs BEFORE the verify
  stage, then each side's full sorted gram array is fetched by id join —
  the wide arrays never ride through the explode.
- Verification is exact: integer intersection / union sizes, threshold
  compared as ``inter * den >= num * union`` so no floats are involved
  anywhere (engine-exact, hash-checkable against a brute-force oracle).

Reference parity note: the reference app has no near-dup machinery at all
(SURVEY §2 rows are filters/joins/windows over road-sensor data); this
module is part of the rebuild's LLM-training-pipeline extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsatool_app_spark.functions.corpus import _tokens


def word_grams(text: Column, k: int = 5) -> Column:
    """Distinct word k-grams (space-joined) of a document. Documents with
    fewer than k tokens yield their full token sequence as one gram."""
    toks = _tokens(text)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def _prefix_len(set_size: Column, num: int, den: int) -> Column:
    """Prefix length s - ceil(t*s) + 1 for t = num/den, all-integer:
    ceil(num*s/den) = floor((num*s + den - 1) / den)."""
    ceil_ts = F.floor((set_size * num + (den - 1)) / den)
    return (set_size - ceil_ts + F.lit(1)).cast("int")


def setsim_join(
    docs: DataFrame,
    *,
    threshold_num: int = 3,
    threshold_den: int = 5,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs of documents whose word-k-gram sets have
    Jaccard >= threshold_num/threshold_den — exact, via prefix filtering.

    Returns (doc_a, doc_b, inter_size, union_size), doc_a < doc_b,
    ordered; sizes are BIGINT so the result hashes identically across
    engines.
    """
    if not 0 < threshold_num <= threshold_den:
        raise ValueError("threshold must be in (0, 1]")
    num, den = threshold_num, threshold_den

    sets = docs.select(
        F.col(id_col).alias("id"), word_grams(F.col(text_col), k).alias("grams")
    )
    pairs = sets.select("id", F.explode("grams").alias("g"))
    df_tbl = pairs.groupBy("g").agg(F.count(F.lit(1)).alias("df"))

    # Attach df to every (doc, gram), then rebuild each doc's gram list
    # sorted rarest-first. sort_array on (df, g) structs gives the
    # lexicographic (df asc, g asc) order — consistent across all docs.
    ranked = pairs.join(df_tbl, "g")
    lists = (
        ranked.groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("ordered"))
        .select(
            "id",
            F.col("ordered.g").alias("grams"),
            F.size("ordered").alias("s"),
        )
        # Referenced three times below (prefix explode + both verify sides);
        # persist so the tokenize→df-join→collect subtree runs once, spilling
        # to disk if the gram lists outgrow executor memory.
        .persist()
    )

    # Explode prefix grams only; self-join on the gram with id ordering and
    # the size filter t*|A| <= |B| <= |A|/t pushed into the join condition.
    pref = lists.select(
        "id",
        "s",
        F.explode(F.slice("grams", 1, _prefix_len(F.col("s"), num, den))).alias("key"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s") * num <= F.col("b.s") * den)
            & (F.col("b.s") * num <= F.col("a.s") * den),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Verify stage: fetch each side's full sorted gram array by id (the
    # arrays never rode through the explode), intersect exactly.
    la = lists.select(F.col("id").alias("id_a"), F.col("grams").alias("ga"),
                      F.col("s").alias("sa"))
    lb = lists.select(F.col("id").alias("id_b"), F.col("grams").alias("gb"),
                      F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    verified = (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            inter.cast("long").alias("inter_size"),
            (F.col("sa") + F.col("sb") - inter).cast("long").alias("union_size"),
        )
        .where(F.col("inter_size") * den >= F.lit(num) * F.col("union_size"))
    )
    return verified.orderBy("doc_a", "doc_b")


def setsim_join_dedup_first(
    docs: DataFrame,
    *,
    threshold_num: int = 3,
    threshold_den: int = 5,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: bool = False,
) -> DataFrame:
    """:func:`setsim_join` with the dedup-first composition of
    functions/dedup.near_dup_pairs_dedup_first: exact-dedup on md5(text),
    run the prefix-filtered join over ONE representative per distinct
    text, then expand rep-level pairs back to document level through the
    md5 groups.  Output is identical to the raw-corpus join (pinned by
    test_setsim_dedup_first_matches_raw): a word-gram set is a pure
    function of the text, so within-group pairs are (s, s) at Jaccard 1
    and cross-group pairs inherit the representative pair's exact
    (inter_size, union_size).  The document-frequency ordering the prefix
    lemma uses differs under dedup (df over distinct texts, not clones),
    but ANY df-consistent total order satisfies the lemma, so only the
    pruning — not the answer — changes.

    Why dedup first: clone groups amplify every stage of the raw join —
    the df table counts clones, the prefix explode carries each clone's
    prefix, the candidate join emits all C(d,2) within-group pairs, and
    the verify join intersects identical gram arrays d² times.  Over
    representatives all of that is 1 row / 0 pairs, and the within-group
    output comes straight from the md5 groups as an id self-join.

    ``checkpoint`` controls whether the md5-grouping subtrees are
    lineage-truncated (lazy ``localCheckpoint``) before the expansion
    joins.  False — no barrier — is the measured winner at EVERY tier
    (r7 adjudication, isolated idle sessions, best-of-3: sf1/5k reps
    1.5 s vs 5.7 s; sf10/50k reps 4.6 s warm vs 38-55 s, cold tie 39.0
    vs 38.2 s).  The r6 counter-signal (SCALING.md "r6 closing re-run":
    65.8 vs 93.2 s favoring the barrier at sf10) was the cold-single-
    run-inside-a-long-session measurement class, not a real scale
    crossover.  Mechanism, verified on the AQE-final physical plan: the
    md5 grouping is NOT recomputed per reference — Spark's exchange
    reuse dedups the identical shuffle subtrees within the action (8
    ReusedExchange nodes at sf10), so the barrier buys nothing and
    costs the cross-subtree optimization (broadcast decisions, AQE
    re-planning) plus per-run eager materialization.  The knob stays so
    a caller on a real multi-executor cluster can re-run the A/B where
    exchange reuse economics differ (executor-local checkpoint blocks
    vs shuffle-service fetch), but False is correct everywhere we can
    measure."""
    groups = docs.select(F.md5(F.col(text_col)).alias("_h"), F.col(id_col))
    if checkpoint:
        groups = groups.localCheckpoint(eager=False)
    rep = groups.groupBy("_h").agg(F.min(id_col).alias("_rep"))
    if checkpoint:
        rep = rep.localCheckpoint(eager=False)
    reps = rep.join(
        docs.select(F.col(id_col).alias("_rep"), F.col(text_col)), "_rep"
    )
    rep_pairs = setsim_join(
        reps,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        k=k,
        id_col="_rep",
        text_col=text_col,
    )
    rep_of = rep.select("_h", "_rep")
    cross = (
        rep_pairs.join(
            rep_of.select(F.col("_rep").alias("doc_a"), F.col("_h").alias("_ha")),
            "doc_a",
        )
        .join(
            rep_of.select(F.col("_rep").alias("doc_b"), F.col("_h").alias("_hb")),
            "doc_b",
        )
        .join(groups.select(F.col("_h").alias("_ha"), F.col(id_col).alias("_ia")), "_ha")
        .join(groups.select(F.col("_h").alias("_hb"), F.col(id_col).alias("_ib")), "_hb")
        .select(
            F.least("_ia", "_ib").alias("doc_a"),
            F.greatest("_ia", "_ib").alias("doc_b"),
            "inter_size",
            "union_size",
        )
    )
    sz = reps.select(
        F.col("_h").alias("_hs"),
        F.size(word_grams(F.col(text_col), k)).cast("long").alias("_s"),
    )
    within = (
        groups.alias("ga")
        .join(
            groups.alias("gb"),
            (F.col("ga._h") == F.col("gb._h"))
            & (F.col(f"ga.{id_col}") < F.col(f"gb.{id_col}")),
        )
        .join(sz, F.col("ga._h") == F.col("_hs"))
        .select(
            F.col(f"ga.{id_col}").alias("doc_a"),
            F.col(f"gb.{id_col}").alias("doc_b"),
            F.col("_s").alias("inter_size"),
            F.col("_s").alias("union_size"),
        )
    )
    return cross.unionByName(within).orderBy("doc_a", "doc_b")
