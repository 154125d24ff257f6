"""JSON-Lines source/sink — the interchange format LLM corpora actually
ship in (one JSON document per line, gzip-sharded).

Read path rules, all load-bearing at scale:

- ALWAYS pass an explicit schema.  Schema inference reads the whole
  input once before the real scan — a 2× pass at 100 TB — and silently
  widens types from whatever the first files contain.
- PERMISSIVE mode with a ``_corrupt_record`` column: web-scale JSONL has
  malformed lines; failing the job on line 40 billion is not an option,
  and silently dropping them (DROPMALFORMED) hides data loss.  The
  malformed fraction is a first-class data-quality signal — route it to
  the quarantine side the same way functions/quality_gate.py does.
- Compressed shards (.gz) are NOT splittable: one gzip file = one task.
  The writer therefore shards BEFORE compressing (repartition to a
  target shard count) so parallelism is chosen at write time — the same
  reasoning as sources/shard_writer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-first JSONL scan.  ``schema`` is the DDL of the GOOD fields.

    ``keep_corrupt=True`` appends a ``_corrupt_record`` column (PERMISSIVE
    read) for quarantine routing.  The good path reads with DROPMALFORMED
    instead of filtering a PERMISSIVE scan: a filter on ``_corrupt_record``
    makes any column-pruned plan over the good frame (``.count()``,
    ``.isEmpty()``) reference ONLY the corrupt column, which Spark rejects
    outright [QUERY_ONLY_CORRUPT_RECORD_COLUMN].  Dropping is not silent
    data loss here because ``corrupt_records`` is the companion view of
    exactly the dropped lines — route it to a sink next to every ingest
    (tested count parity in tests/test_ingest.py)."""
    if keep_corrupt:
        full = schema + f", {CORRUPT_COL} string"
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def corrupt_records(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The quarantine side: raw text of every malformed line.

    Spark caveat (documented in the JSON datasource): a plan whose scan
    references ONLY ``_corrupt_record`` is disallowed — and column pruning
    can reduce e.g. ``.count()`` on this frame to exactly that.  Consume
    the quarantine with full rows (write it out, or select typed columns
    alongside the raw line); that is also what a real pipeline does."""
    return read_jsonl(spark, path, schema, keep_corrupt=True).where(
        F.col(CORRUPT_COL).isNotNull()
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    shards: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write JSONL, sharding before compression so downstream read
    parallelism equals ``shards`` even though gzip is unsplittable."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def ingest_jsonl(
    spark: SparkSession,
    in_path: str,
    schema: str,
    out_path: str,
) -> tuple[DataFrame, DataFrame]:
    """ONE-pass ingest: a single PERMISSIVE scan writes good rows AND the
    corrupt quarantine, partitioned on the corrupt flag — calling
    ``read_jsonl`` + ``corrupt_records`` on the same path parses the
    input twice, which is the 2× cost this module's own docstring warns
    about.  Returns (good, quarantine) DataFrames re-read from the
    written parquet (cheap, columnar, and no longer subject to the
    corrupt-column pruning restriction).

    Layout: ``out_path/_is_bad=false/`` holds typed good rows;
    ``out_path/_is_bad=true/`` holds the raw malformed lines."""
    full = schema + f", {CORRUPT_COL} string"
    scan = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(in_path)
    )
    (
        scan.withColumn("_is_bad", F.col(CORRUPT_COL).isNotNull())
        .write.mode("overwrite")
        .partitionBy("_is_bad")
        .parquet(out_path)
    )
    stored = spark.read.parquet(out_path)
    # partition values come back as strings (no boolean type inference)
    is_bad = F.col("_is_bad").cast("string") == "true"
    good = stored.where(~is_bad).drop("_is_bad", CORRUPT_COL)
    bad = stored.where(is_bad).select(F.col(CORRUPT_COL).alias("raw"))
    return good, bad
