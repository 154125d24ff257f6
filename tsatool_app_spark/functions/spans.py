"""Content-defined span fingerprinting: exact duplicated-substring
detection across documents (the MOSS / winnowing / "exact substring
dedup" family — the contamination detector that catches verbatim reuse
n-gram token overlap misses, e.g. benchmark passages pasted inside
otherwise-novel text).

Construction, chosen so BOTH engines (Spark and the DuckDB oracle)
compute byte-identical results:

- every character position p of a document yields the md5 hex of its
  ``window_len``-char substring (md5 of UTF-8 bytes — verified identical
  across Spark, DuckDB and hashlib, multibyte included);
- a window is SELECTED iff its hash's last hex digit is below
  ``rate_hex_lt`` — selection is a pure function of the window's
  CONTENT, so a span shared by two documents selects the same windows
  in both regardless of where the span sits in each document
  (offset-independence is the whole point: stride/grid sampling would
  only match aligned copies).  '2' keeps 2/16 = 1/8 of windows: a
  duplicated span of s chars carries ~(s - window_len)/8 shared
  fingerprints, so a 160-char span is missed with probability
  (7/8)^120 ≈ 1e-7.
- fingerprint equality IS substring equality (md5 collisions aside),
  so there is no separate verify stage; the per-pair shared-fingerprint
  count is the contamination measure.

Scale shape: the hashing pass is O(chars x window_len) work but
embarrassingly parallel with NO shuffle — only the selected 1/8 of
(doc_id, fp) rows ever reach an exchange, and the pair join dedups to
distinct (doc, fp) first.  Hot fingerprints (boilerplate shared by
thousands of documents) are the same quadratic hazard as hot LSH
buckets and get the same treatment: ``max_docs_per_fp`` excludes them
from the pair join (route such boilerplate through exact-dedup /
frequency analysis instead), and :func:`hot_span_fingerprints` is the
audit companion so the cap is observable, not silent.

Reference parity note: the reference app has no text machinery at all;
this module extends the rebuild's LLM-training-pipeline family
(SURVEY §2 extensions) alongside functions/dedup.py's shingle-set
pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sel_expr(text_col: str, window_len: int, rate_hex_lt: str) -> str:
    """SQL for the selected (pos, fp) list of one document.  The
    sequence upper bound is clamped to >= 1 because Spark's
    sequence(1, 0) DESCENDS ([1, 0]); the lambda's p-bound makes the
    short-text case empty instead."""
    if len(rate_hex_lt) != 1 or rate_hex_lt not in "0123456789abcdef":
        raise ValueError("rate_hex_lt must be one hex digit")
    return (
        f"filter(transform(sequence(1, greatest(length({text_col}) - "
        f"{window_len} + 1, 1)), p -> struct(p AS pos, "
        f"md5(substring({text_col}, p, {window_len})) AS fp)), "
        f"x -> x.pos <= length({text_col}) - {window_len} + 1 "
        f"AND substring(x.fp, 32, 1) < '{rate_hex_lt}')"
    )


def span_fingerprints(
    docs: DataFrame,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, fp) content-defined fingerprints — the selected
    windows of every document.  ``pos`` is the 1-based character
    position, kept so callers can localize a shared span."""
    sel = docs.selectExpr(
        f"{id_col} AS doc_id",
        _sel_expr(text_col, window_len, rate_hex_lt) + " AS _sel",
    )
    return sel.select(
        "doc_id", F.explode("_sel").alias("_w")
    ).select("doc_id", F.col("_w.pos").alias("pos"), F.col("_w.fp").alias("fp"))


def hot_span_fingerprints(
    docs: DataFrame,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    max_docs_per_fp: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audit companion of :func:`duplicated_span_pairs`: the fingerprints
    the cap excludes, with their document counts — boilerplate spans
    shared by more than ``max_docs_per_fp`` documents."""
    fps = span_fingerprints(
        docs, window_len=window_len, rate_hex_lt=rate_hex_lt,
        text_col=text_col, id_col=id_col,
    ).select("doc_id", "fp").distinct()
    return (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > max_docs_per_fp)
        .orderBy(F.desc("n_docs"), "fp")
    )


def duplicated_span_pairs(
    docs: DataFrame,
    *,
    window_len: int = 40,
    rate_hex_lt: str = "2",
    max_docs_per_fp: int | None = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing at least one selected duplicated
    ``window_len``-char span: (id_a, id_b, n_shared) with id_a < id_b,
    n_shared = number of DISTINCT shared fingerprints (a span repeated
    inside one document counts once).  Deterministic, engine-portable
    (hash-checkable against a DuckDB oracle running the same
    construction)."""
    fps = span_fingerprints(
        docs, window_len=window_len, rate_hex_lt=rate_hex_lt,
        text_col=text_col, id_col=id_col,
    ).select("doc_id", "fp").distinct()
    if max_docs_per_fp is not None:
        ok = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_docs_per_fp)
            .select("fp")
        )
        fps = fps.join(ok, "fp", "left_semi")
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy("id_a", "id_b")
    )
