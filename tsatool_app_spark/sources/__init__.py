from tsatool_app_spark.sources.csv_ingest import (
    read_staging_csv,
    populate_statobs,
    populate_seobs,
    build_observations,
    ingest_month,
    dedup_insert,
)
from tsatool_app_spark.sources.metadata import read_metadata_csv, sensor_name_to_id

__all__ = [
    "read_staging_csv",
    "populate_statobs",
    "populate_seobs",
    "build_observations",
    "ingest_month",
    "dedup_insert",
    "read_metadata_csv",
    "sensor_name_to_id",
]
