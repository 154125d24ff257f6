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
