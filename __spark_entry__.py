"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in tsatool_app_spark/ (see SURVEY.md §2 for the operator
inventory and plans/driver_queries.py for the paired Spark/oracle registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tsatool_app_spark.plans.driver_queries import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): a two-block boolean condition over the
    events-as-observations mapping — pack_ranges per block, boundary
    segmentation + alignment, Kleene master, validity rollup."""
    from tsatool_app_spark.plans.driver_queries import q_condition_summary

    return q_condition_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops: engine-specific hashes, approximate search)."""
    return oracle_sqls()
