"""Columnar lake layouts: hive-partitioned parquet/ORC write + pruned read.

The reference's storage story is a Postgres instance (SURVEY §2.1 —
psycopg2 COPY into statobs/seobs); the rebuild's equivalent at 100 TB is
a partitioned columnar lake. This module pins the two properties that
make that work, and the tests assert both from the query plan:

- **Partition pruning**: a filter on the partition column must reach the
  file listing, so a day-scoped query over years of data opens only that
  day's directories (`PartitionFilters` in the scan node, not a
  post-scan Filter).
- **Format interchange**: parquet and ORC through the same writer/reader
  surface — both are Spark-native columnar formats with predicate
  pushdown; which one a site uses is config, not code.

Layout rule of thumb baked into ``write_partitioned``: partition columns
must be LOW cardinality (date, source, event_type — thousands of values,
not millions); high-cardinality layout belongs to bucketing
(model.write_observations_bucketed) or Z-order keys (operators/layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a hive-layout columnar table (``path/col=value/...``).

    One output task per (shuffle partition × partition-dir) — callers
    repartition by the partition columns first if they need one file per
    directory; we deliberately do NOT force that here (a single hot
    partition value would serialize into one task)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def read_columnar(spark: SparkSession, path: str, *, fmt: str = "parquet") -> DataFrame:
    """Read a (possibly partitioned) columnar table; partition columns come
    back as real columns reconstructed from directory names."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    return spark.read.format(fmt).load(path)


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the plan's scan node (empty string if
    none) — lets tests assert a predicate became directory pruning."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.split("PartitionFilters:", 1)[1].strip()
    return ""
