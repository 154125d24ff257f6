"""Metadata (dimension) loading: stations and sensors CSVs.

Reference: S4 — ``COPY stations/sensors (id, lotjuid, name) FROM ...
DELIMITER '|'`` (03_insert_stations_sensors.sql:10-17), prepared from LOTJU
XML by awk scripts (00_prepare_lotju_metadata.sh:11-29 — trivial selects
here). Sensor name→id resolution (J5) normalizes names the same way the
reference does: ``lower(replace(name, '"', ''))`` (utils.py:281, P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_META_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("lotjuid", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4: pipe-CSV (id, lotjuid, name), no header in the reference dumps."""
    return spark.read.csv(path, sep="|", header=False, schema=_META_SCHEMA)


def sensor_name_to_id(sensors: DataFrame) -> dict[str, int]:
    """J5: normalized sensor-name → id dict for DSL block resolution.

    P7 normalization: strip double quotes, lowercase (utils.py:275-283).
    The dict is driver-side (145 sensors) — the lookup happens at parse
    time, not in the distributed plan."""
    rows = (
        sensors.select(
            F.lower(F.regexp_replace(F.col("name"), '"', "")).alias("name"), "id"
        )
        .where(F.col("name").isNotNull())
        .collect()
    )
    return {r.name: r.id for r in rows}
