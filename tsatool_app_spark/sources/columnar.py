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
from pyspark.sql import functions as F


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


def compact_small_files(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    fmt: str = "parquet",
    target_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a directory of many undersized files
    into ~``target_mb``-sized ones.  Returns the output file count.

    The streaming sinks and incremental folds in this repo (and any
    micro-batch pipeline at 100 TB) accrete files far below the
    row-group sweet spot; scans then pay per-file open/footer costs and
    lose row-group statistics locality.  Compaction here is a NARROW
    ``coalesce`` — no shuffle, no reordering: the target file count
    comes from the actual byte size of the input listing, so output
    files land near the target regardless of input fragmentation.
    Row-level content is preserved exactly (asserted in tests).
    """
    import math

    df = spark.read.format(fmt).load(src)
    # Size the output from the real input bytes via the JVM filesystem
    # listing (works for any Hadoop-compatible FS, not just local disk).
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(src)
    fs = fs_path.getFileSystem(hconf)
    total = fs.getContentSummary(fs_path).getLength()
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df.coalesce(n_out).write.format(fmt).mode("overwrite").save(dst)
    out = spark.read.format(fmt).load(dst)
    return out.select(F.input_file_name()).distinct().count()


def read_evolving(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    type_widening: dict[str, str] | None = None,
) -> DataFrame:
    """Read a directory whose files were written under EVOLVING schemas —
    the long-lived-dataset reality (a column added in March must not
    break February's files).

    ``mergeSchema`` unions column sets across files (absent columns read
    as NULL); Spark cannot merge conflicting TYPES though (an int32 file
    next to an int64 file fails the footer merge), so ``type_widening``
    maps column → target type and the read is issued with an explicit
    widened schema instead — parquet upcasts int32→int64 and
    float→double natively when the requested schema asks for it.  The
    common evolution cases (added columns, dropped columns, integer/float
    widening) all land in one DataFrame with the latest schema.
    """
    # recursiveFileLookup: schema epochs commonly live in sibling
    # subdirectories (one per write); note it disables hive partition-column
    # inference — for hive-layout directories pass the epoch dirs directly.
    reader = spark.read.format(fmt).option("recursiveFileLookup", "true")
    if not type_widening:
        return reader.option("mergeSchema", "true").load(path)
    return reader.schema(
        _widened_schema(spark, path, fmt, type_widening)
    ).load(path)


def _widened_schema(spark, path: str, fmt: str, widening: dict[str, str]):
    """Union of per-file schemas with the given columns forced to their
    widened types. Footer reads are per FILE on the driver — this is a
    maintenance utility for directories with a handful of schema epochs,
    not a hot path (a lakehouse table format tracks schema in metadata).

    Files are listed via the Hadoop FileSystem API (same as
    compact_small_files) so s3://, hdfs://, and local paths all work; a
    local-only glob would silently find ZERO files on a remote store and
    issue the read with an empty schema."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(hconf)
    it = fs.listFiles(fs_path, True)  # recursive
    files = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            files.append(st.getPath().toString())
    files.sort()
    if not files:
        raise FileNotFoundError(
            f"no data files under {path!r}; refusing to derive an empty schema"
        )
    fields: dict[str, object] = {}
    order: list[str] = []
    for f in files:
        for fld in spark.read.format(fmt).load(f).schema.fields:
            if fld.name not in fields:
                fields[fld.name] = fld.dataType
                order.append(fld.name)
    return StructType(
        [
            StructField(
                name,
                _parse_datatype_string(widening[name])
                if name in widening
                else fields[name],
                True,
            )
            for name in order
        ]
    )
