"""Balanced shard output: evenly-sized parquet shards plus a manifest.

Training jobs read corpora as fixed-count worker shards; a skewed write
(one 10 GB file next to a thousand 1 MB files) turns into stragglers. This
writer hash-distributes rows over an explicit shard count — deterministic
(md5 of the id column, same trick as functions/sampling), so a re-run of
the same input produces the SAME shard membership — and emits a manifest
with per-shard row counts and content checksums for downstream integrity
checks (resumable loaders, cache keys).

Plan shape: ONE round-robin-free hash exchange on the shard id, then a
partitioned write; the manifest is a second aggregate over the written
data (re-read from disk, so it certifies what actually landed, not what
was about to land).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_id(key, n_shards: int):
    """Deterministic shard in [0, n_shards) from md5(key) — reproducible
    across runs, engines, and partitionings (unlike pmod(hash, n), whose
    seed is engine-specific)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )


def write_balanced_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
) -> None:
    """Write ``df`` as ``n_shards`` hash-balanced parquet shard directories
    (shard=<k>/...). One exchange; every shard receives ≈ n/n_shards rows
    for any id distribution (md5 is uniform even on clustered ids)."""
    sh = shard_id(F.col(id_col), n_shards).alias("shard")
    (
        df.withColumn("shard", sh)
        .repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(spark: SparkSession, path: str, *, id_col: str) -> DataFrame:
    """Certify a shard directory: (shard, n_rows, id_checksum) from what is
    actually on disk. The checksum is order-independent (sum of xxhash64 of
    the id, accumulated in DECIMAL(38,0) — a long sum would overflow ANSI
    arithmetic after a few billion rows) so it is stable under any read
    parallelism."""
    df = spark.read.parquet(path)
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.xxhash64(F.col(id_col).cast("string")).cast("decimal(38,0)")
            ).alias("id_checksum"),
        )
        .orderBy("shard")
    )
