"""Full-text retrieval over the documents table: keyword search and BM25.

Beyond the reference's surface (the reference has no text search); part of
the rebuild's LLM-pipeline extension family — retrieval is how a
training-data pipeline mines domain subsets and how eval harnesses pull
contexts.

Two rankers, one plan shape:

- ``keyword_search`` ranks by integer term-frequency evidence only
  (total tf, distinct terms matched, doc_id tiebreak). Integer/string
  ordering is engine-exact, so this variant is oracle-checkable hash-for-
  hash — same policy as top_terms / vocab_top_terms (functions/corpus.py).
- ``bm25_topk`` is the standard Okapi BM25 scorer (k1/b parameters).
  Scores are floats (log-idf), so cross-engine hashing is not meaningful;
  its tests assert self-consistency and agreement with an independently
  computed reference score (tests/test_ops_extra.py).

Scale plan (both): tokenize → explode → ``isin(query_terms)`` filter BEFORE
any shuffle, so only matching (doc, term) pairs leave the scan — the
exchange carries O(matches), not O(corpus tokens). Document lengths (BM25's
dl/avgdl) are computed per-row at scan time; the tiny per-term df/idf table
is broadcast. One groupBy(doc_id) + a global top-k (TakeOrdered — no full
sort) finish the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsatool_app_spark.functions.corpus import _tokens


def _matches(docs: DataFrame, terms: list[str], text_col: str, id_col: str):
    """(id, term) pairs for query-term hits only — filter under the explode,
    so Catalyst prunes non-matching tokens before anything shuffles."""
    return (
        docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .where(F.col("term").isin(terms))
    )


def keyword_search(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query, ranked by total query-term
    frequency, then by distinct query terms matched, then id ascending.
    All-integer ranking — deterministic in any engine."""
    scored = _matches(docs, terms, text_col, id_col).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("score"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )
    return scored.orderBy(
        F.desc("score"), F.desc("n_terms"), F.asc(id_col)
    ).limit(k)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: score(D) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    The df/idf side is a handful of rows (one per query term) and is
    BROADCAST; N and avgdl are computed in the same tiny aggregate. The
    corpus side never shuffles text — only matched (id, term, tf, dl) rows.
    """
    lengths = docs.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).cast("double").alias("dl")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        _matches(docs, terms, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df")
    )
    idf = df_tbl.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(lengths, id_col)
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("contrib").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def build_postings(
    docs: DataFrame,
    *,
    terms: "list[str] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted index: (term, doc_id, positions[sorted]).

    With ``terms``, the filter lands BEFORE the aggregate — building
    postings for a query's two terms scans once and shuffles only the
    matching (term, doc, pos) triples, not the whole corpus's token
    stream. Positions are 0-based token offsets.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    exploded = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    if terms is not None:
        exploded = exploded.where(F.col("term").isin(list(terms)))
    return exploded.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_search(
    docs: DataFrame,
    phrase: "list[str]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase match via positional postings: documents containing
    the tokens of ``phrase`` ADJACENT and in order.

    Plan: one scan builds postings for just the phrase's terms; the terms
    join pairwise on doc_id (tiny relations after the term filter) and
    positions chain with ``array_intersect(prev+1, next)`` — a document
    survives while the chained position set stays non-empty. Returns
    distinct matching ids.
    """
    if len(phrase) < 2:
        raise ValueError("phrase needs at least two terms")
    postings = build_postings(
        docs, terms=list(dict.fromkeys(phrase)), text_col=text_col, id_col=id_col
    )
    chain = None
    for i, term in enumerate(phrase):
        p = postings.where(F.col("term") == term).select(
            F.col(id_col), F.col("positions").alias(f"_p{i}")
        )
        chain = p if chain is None else chain.join(p, id_col)
        if i == 0:
            chain = chain.withColumn("_chain", F.col("_p0"))
        else:
            chain = chain.withColumn(
                "_chain",
                F.array_intersect(
                    F.transform("_chain", lambda x: x + 1), F.col(f"_p{i}")
                ),
            ).where(F.size("_chain") > 0)
    return chain.select(id_col).orderBy(id_col)


def tfidf_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    idf_scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents under a RATIONAL tf-idf scorer:
    score(D) = Σ_t tf(t, D) · floor(idf_scale · N / df(t)), all int64.

    Same retrieval shape as bm25_topk, but the idf is integer arithmetic
    (floor-division instead of a log), which makes the ranking — and the
    scores themselves — bit-identical in any engine, so this variant is
    driver-hash-checkable where BM25's float log-idf is not.  The log's
    role (damping common terms) is kept by the N/df ratio; for ranked
    retrieval only monotonicity in 1/df matters per term.

    Scale: identical to keyword_search — only query-term matches leave the
    scan; the df table is one row per query term (broadcast); one
    groupBy(doc) + TakeOrdered top-k.  The corpus is exploded ONCE: df
    derives from the tf table (df(t) = rows with term t — tf already has
    one row per (doc, term)), so the token generate+filter runs a single
    pass instead of once per consumer (r12: the double-explode cost 2× the
    scan at sf10, measured in the extended board).
    """
    m = _matches(docs, terms, text_col, id_col)
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    tf = m.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.floor(F.lit(idf_scale) * F.col("n") / F.col("df")).alias("idf_q"),
        )
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("idf_q")).cast("long").alias("score_q"))
    )
    return scored.orderBy(F.desc("score_q"), F.asc(id_col)).limit(k)
