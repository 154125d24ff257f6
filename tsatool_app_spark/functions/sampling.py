"""Deterministic, engine-portable sampling for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent, which
breaks reproducibility across engines, re-runs and repartitions. These
samplers hash a stable key instead: a row is in the p%-sample iff
``md5(key) mod 100 < p`` — the same rows are selected by any engine, any
partitioning, any day. This is the standard trick for deterministic
held-out splits of web-scale corpora.

Cost: one md5 over the key column per row — a narrow projection, no
shuffle; the filter reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the first 4 hex digits of
    md5(key) — portable to any SQL engine with md5 + hex parsing."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def deterministic_sample(
    df: DataFrame, pct: int, key_col: str, *, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < pct. Same rows on every run/engine."""
    if not 0 <= pct <= buckets:
        raise ValueError(f"pct must be in [0, {buckets}]")
    return df.where(hash_bucket(F.col(key_col), buckets) < pct)


def train_holdout_split(
    df: DataFrame, holdout_pct: int, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, deterministic (train, holdout) split keyed on key_col —
    membership survives reshuffles, re-ingests, and engine changes."""
    b = hash_bucket(F.col(key_col))
    return df.where(b >= holdout_pct), df.where(b < holdout_pct)
