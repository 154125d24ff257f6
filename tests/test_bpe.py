"""Tests for the distributed BPE trainer/encoder (functions/bpe.py)."""

from __future__ import annotations

from collections import Counter

from tsatool_app_spark.functions.bpe import SEP, bpe_encode, bpe_train


def _ref_bpe(texts: list[str], n: int):
    """Greedy left-to-right reference implementation."""
    vocab = Counter(w for t in texts for w in t.split(" ") if w)
    reps = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n + 1):
        pc = Counter()
        for w, f in vocab.items():
            s = reps[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rank, left, right, cnt))
        for w, s in reps.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            reps[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    rows = [
        (1, "low low low lower lowest new newer newest"),
        (2, "wide wider widest low low aaa aaaa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=8).collect()
    ]
    assert got == _ref_bpe([t for _, t in rows], 8)


def test_bpe_run_merge_is_left_to_right(spark):
    # "aaaa" x3: pair (a,a) has count 9 (3 per word); first merge gives
    # (aa)(aa), second merges those into (aaaa) — never a(aa)a.
    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    got = [(r.left, r.right, r.pair_count) for r in bpe_train(df, n_merges=2).collect()]
    assert got == [("a", "a", 9), ("aa", "aa", 3)]


def test_bpe_encode_reconstructs_and_compresses(spark):
    rows = [(1, "banana bandana"), (2, "banana banana band")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [(r.left, r.right) for r in bpe_train(df, n_merges=5).collect()]
    enc = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for doc_id, text in rows:
        toks = enc[doc_id].bpe_tokens
        # concatenating tokens restores the text minus spaces
        assert "".join(toks) == text.replace(" ", "")
        # merging never increases token count below char count
        assert enc[doc_id].n_bpe_tokens < len(text.replace(" ", ""))
        assert all(SEP not in t for t in toks)


def test_bpe_empty_and_single_char_words(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "")], ["doc_id", "text"])
    assert bpe_train(df, n_merges=3).count() == 0  # no adjacent pairs exist
    enc = {r.doc_id: r for r in bpe_encode(df, []).collect()}
    assert enc[1].bpe_tokens == ["a", "b", "c"]
    assert enc[2].n_bpe_tokens == 0


def test_bpe_token_counts_match_encode(spark):
    """bpe_token_count_col (pure length arithmetic, no arrays) must equal
    bpe_encode's n_bpe_tokens for every doc — multibyte, separator-
    quarantined words, repeated-merge runs, and empty text included —
    and pack_sequences(token_count_col=...) must pack by it while the
    whitespace default stays unchanged."""
    from pyspark.sql import functions as F

    from tsatool_app_spark.functions.bpe import (
        SEP, add_bpe_token_counts, bpe_encode,
    )
    from tsatool_app_spark.functions.corpus import pack_sequences

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("aa", "a")]
    docs = spark.createDataFrame(
        [
            (0, "the other theory thaws"),
            (1, "aaaa aaa aa a"),            # greedy run merging
            (2, f"bad{SEP}word fine"),       # quarantine branch
            (3, "päätös ääkkösiä"),          # multibyte
            (4, ""),                          # no words
            (5, "   "),                       # only separators
        ],
        "doc_id long, text string",
    )
    enc = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(docs, merges).collect()}
    cnt = {
        r.doc_id: r.n_tokens
        for r in add_bpe_token_counts(docs, merges).collect()
    }
    assert cnt == enc
    # greedy left-to-right with merges (a,a) then (aa,a):
    # aaaa->(aa)(aa)=2, aaa->(aa)a->(aaa)=1, aa->1, a->1
    assert cnt[1] == 5
    packed_ws = pack_sequences(docs, budget=4, n_shards=2)
    packed_cnt = pack_sequences(
        add_bpe_token_counts(docs, merges), budget=4, n_shards=2,
        token_count_col="n_tokens",
    )
    ws = {r.doc_id: r.n_tokens for r in packed_ws.collect()}
    bp = {r.doc_id: r.n_tokens for r in packed_cnt.collect()}
    assert ws[0] == 4 and bp[0] == enc[0]  # whitespace default unchanged
    assert ws[4] == 0 and bp[4] == 0
