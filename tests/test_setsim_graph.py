"""Tests for the prefix-filtered set-similarity join (functions/setsim.py)
and degree-oriented triangle counting (operators/graph.triangle_counts)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from tsatool_app_spark.functions.setsim import setsim_join, word_grams
from tsatool_app_spark.operators.graph import triangle_counts


def _brute_jaccard_pairs(rows, threshold, k=5):
    def grams(text):
        toks = [t for t in text.split(" ") if t]
        n = max(len(toks) - (k - 1), 1)
        return {" ".join(toks[i : i + k]) for i in range(n)}

    sets = {i: grams(t) for i, t in rows}
    out = []
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter >= threshold * union:
            out.append((a, b, inter, union))
    return out


def test_setsim_matches_brute_force(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one-token edit: high overlap
    far = "completely different words with nothing shared at all here now ok"
    short = "tiny doc"
    rows = [(1, base), (2, near), (3, far), (4, short), (5, base)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r.doc_a, r.doc_b, r.inter_size, r.union_size)
        for r in setsim_join(df, threshold_num=1, threshold_den=2).collect()
    ]
    assert got == _brute_jaccard_pairs(rows, 0.5)
    # exact duplicates always survive; disjoint docs never do
    assert (1, 5) in {(a, b) for a, b, *_ in got}
    assert all(3 not in (a, b) for a, b, *_ in got)


def test_setsim_dedup_first_matches_raw(spark):
    """setsim_join_dedup_first must emit EXACTLY the raw join's rows on a
    clone-heavy corpus: within-group pairs at (s, s), cross-group pairs
    with the representative pair's exact (inter_size, union_size)."""
    from tsatool_app_spark.functions.setsim import setsim_join_dedup_first

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words with nothing shared at all here now ok"
    rows = (
        [(i, base) for i in (1, 2, 7)]
        + [(3, near), (4, near)]
        + [(5, far), (6, "tiny doc")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    raw = sorted(
        tuple(r) for r in setsim_join(df, threshold_num=1, threshold_den=2).collect()
    )
    fast = sorted(
        tuple(r)
        for r in setsim_join_dedup_first(df, threshold_num=1, threshold_den=2).collect()
    )
    assert fast == raw == sorted(_brute_jaccard_pairs(rows, 0.5))
    pairs = {(a, b) for a, b, *_ in fast}
    assert {(1, 2), (2, 7), (1, 7), (3, 4)} <= pairs  # clone groups present


def test_setsim_dedup_first_checkpoint_placements_agree(spark):
    """The checkpoint placement (r7 adjudication) is a pure performance
    knob: pinned True and pinned False must emit identical rows, and the
    DEFAULT must be the no-barrier plan — the measured winner at every
    tier (see setsim_join_dedup_first's docstring)."""
    from tsatool_app_spark.functions.setsim import setsim_join_dedup_first

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = (
        [(i, base) for i in (1, 2, 7)]
        + [(3, base.replace("today", "tomorrow"))]
        + [(5, "completely different words with nothing shared at all here")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    outs = {
        mode: sorted(
            tuple(r)
            for r in setsim_join_dedup_first(
                df, threshold_num=1, threshold_den=2, checkpoint=mode
            ).collect()
        )
        for mode in (True, False)
    }
    assert outs[True] == outs[False]
    assert len(outs[True]) >= 4  # clone group C(3,2) + near pairs
    # The checkpoint barrier truncates the md5-grouping subtree at each
    # reference site, so the pinned-True analyzed plan carries FEWER
    # Aggregate nodes (the groupBy is behind the LogicalRDD leaf); the
    # default must match the pinned-False (no-barrier) plan shape.
    def n_aggregates(**kw):
        plan = setsim_join_dedup_first(
            df, threshold_num=1, threshold_den=2, **kw
        )._jdf.queryExecution().analyzed().toString()
        return plan.count("Aggregate")

    assert n_aggregates() == n_aggregates(checkpoint=False)  # default: no barrier
    assert n_aggregates(checkpoint=True) < n_aggregates(checkpoint=False)


def test_setsim_no_false_negatives_near_threshold(spark):
    # Pairs sitting exactly AT the threshold must be found (prefix lemma
    # is >=, not >): construct sets with jaccard exactly 1/2.
    # 10 shared tokens => shared grams; use k=1-like tiny docs via k=5 on
    # short texts (each doc shorter than 5 tokens -> one gram per doc).
    a = "alpha beta"
    b = "alpha beta"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = setsim_join(df, threshold_num=1, threshold_den=1).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]


def test_word_grams_edges(spark):
    df = spark.createDataFrame([("", ), ("a b", ), ("a b c d e f",)], ["text"])
    out = df.select(word_grams(F.col("text")).alias("g")).collect()
    assert out[0].g == [""]
    assert out[1].g == ["a b"]
    assert out[2].g == ["a b c d e", "b c d e f"]


def test_triangle_counts_hand_graph(spark):
    # K4 on {1,2,3,4} plus pendant 5: every K4 node is in C(3,2)=3
    # triangles, the pendant in none.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_direction_and_dup_insensitive(spark):
    # Same triangle given with mixed directions and duplicate edges.
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_star_has_none(spark):
    df = spark.createDataFrame([(0, i) for i in range(1, 8)], ["src", "dst"])
    assert triangle_counts(df).count() == 0
