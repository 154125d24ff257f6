"""SQL surface: register the data model as temp views so users can drive
the engine with ``spark.sql`` (the DataFrame API and SQL compile to the
same Catalyst plans — SURVEY §1.4's mapping holds for both).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tsatool_app_spark.model import (
    TESTDATA_TABLES,
    load_observations_from_events,
    load_table,
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table plus the canonical ``observations``
    view (the obs_main shape, cond_collection.py:99-104). Returns the view
    names."""
    names = []
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    load_observations_from_events(spark, sf_dir).createOrReplaceTempView(
        "observations"
    )
    names.append("observations")
    return names
