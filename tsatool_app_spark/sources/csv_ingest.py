"""Raw-data ingestion: LOTJU pipe-CSV dumps → canonical fact tables.

Reference pipeline (SURVEY §3.3, /root/reference/database/): per month,
``COPY`` pipe-CSV into staging (`tiesaa_mittatieto`, `anturi_arvo` —
02_rawdata_schema.sql:13-40), then PL/pgSQL procedures convert to facts:

- populate_statobs (02_rawdata_schema.sql:42-77): SET TIME ZONE
  'Europe/Helsinki'; parse the Finnish timestamp string
  ``01.03.2018 02:09:00,000000000`` by stripping the ``,fraction`` and
  reading local time (incl. DST); translate LOTJU station id → canonical id
  via stations.lotjuid (J2); drop NULL id/time/station rows (P4); insert with
  ON CONFLICT (tfrom, statid) DO NOTHING (A5/S5).
- populate_seobs (02_rawdata_schema.sql:79-106): LOTJU sensor id →
  sensors.lotjuid (J3); drop NULL value rows; dedup on (obsid, seid).

Published baseline: 16 min COPY + 1 h populate_seobs for ONE month on the
reference stack (database/README.md:89-98) — the staging→fact conversion is
its worst pain point. Spark design: no staging persistence at all — CSV scan
→ transforms → dropDuplicates → date-partitioned parquet append, one lazy
plan per month. Dimension joins broadcast (933 stations / 145 sensors);
dedup is the only shuffle, keyed on the fact PK, and AQE sizes it. At 100 TB
of dumps the plan is embarrassingly parallel per month-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsatool_app_spark.model import (
    ANTURI_ARVO_SCHEMA,
    TIESAA_MITTATIETO_SCHEMA,
)

#: Timezone the raw timestamps are written in (02_rawdata_schema.sql:46).
SOURCE_TZ = "Europe/Helsinki"


def read_staging_csv(
    spark: SparkSession, path: str, kind: str
) -> DataFrame:
    """S3: pipe-delimited, quoted-header CSV (COPY ... DELIMITER '|' CSV
    HEADER — database/README.md:79-87)."""
    schema = {"tiesaa_mittatieto": TIESAA_MITTATIETO_SCHEMA, "anturi_arvo": ANTURI_ARVO_SCHEMA}[kind]
    return spark.read.csv(path, sep="|", header=True, schema=schema, quote='"')


def parse_finnish_timestamp(col) -> F.Column:
    """P6: ``dd.MM.yyyy HH:mm:ss,nnnnnnnnn`` local Helsinki time → UTC
    timestamp. The fraction is stripped via regex (the reference's
    ``substring(aika FROM '^.*(?=,)')``); the naive parse is then interpreted
    as Europe/Helsinki local (DST-aware) and converted to UTC storage."""
    naive = F.to_timestamp(
        F.regexp_extract(col, r"^(.*),", 1), "dd.MM.yyyy HH:mm:ss"
    )
    return F.to_utc_timestamp(naive, SOURCE_TZ)


def populate_statobs(staging: DataFrame, stations: DataFrame) -> DataFrame:
    """Staging headers → statobs facts (02_rawdata_schema.sql:42-77).

    Returns (id, tfrom, statid) with PK dedup on (tfrom, statid). The
    stations dim (933 rows) is broadcast — no shuffle for the id translation.
    """
    # Rename before joining: Spark resolves case-insensitively by default,
    # so staging "ID" would clash with the dim's "id".
    stg = staging.select(
        F.col("ID").alias("src_id"),
        F.col("AIKA").alias("aika"),
        F.col("ASEMA_ID").alias("asema_id"),
    )
    st = F.broadcast(
        stations.select(F.col("id").alias("statid"), F.col("lotjuid").alias("st_lotjuid"))
    )
    return (
        stg.join(st, stg["asema_id"] == st["st_lotjuid"], "inner")  # J2
        .select(
            F.col("src_id").alias("id"),
            parse_finnish_timestamp(F.col("aika")).alias("tfrom"),
            "statid",
        )
        .where(  # P4: NULL cleansing
            F.col("id").isNotNull()
            & F.col("tfrom").isNotNull()
            & F.col("statid").isNotNull()
        )
        .dropDuplicates(["tfrom", "statid"])  # A5: PK (tfrom, statid)
    )


def populate_seobs(staging: DataFrame, sensors: DataFrame) -> DataFrame:
    """Staging values → seobs facts (02_rawdata_schema.sql:79-106).

    Returns (id, obsid, seid, seval) deduped on (obsid, seid); NULL values
    dropped (seval NOT NULL in the target schema)."""
    stg = staging.select(
        F.col("ID").alias("src_id"),
        F.col("ANTURI_ID").alias("anturi_id"),
        F.col("ARVO").alias("arvo"),
        F.col("MITTATIETO_ID").alias("mittatieto_id"),
    )
    se = F.broadcast(
        sensors.select(F.col("id").alias("seid"), F.col("lotjuid").alias("se_lotjuid"))
    )
    return (
        stg.join(se, stg["anturi_id"] == se["se_lotjuid"], "inner")  # J3
        .select(
            F.col("src_id").alias("id"),
            F.col("mittatieto_id").alias("obsid"),
            "seid",
            F.col("arvo").alias("seval"),
        )
        .where(
            F.col("id").isNotNull()
            & F.col("obsid").isNotNull()
            & F.col("seid").isNotNull()
            & F.col("seval").isNotNull()
        )
        .dropDuplicates(["obsid", "seid"])
    )


def build_observations(statobs: DataFrame, seobs: DataFrame) -> DataFrame:
    """J1: the fact-to-fact join, done ONCE at ingest.

    The reference re-runs ``statobs ⋈ seobs`` per analysis session
    (cond_collection.py:99-104) and flags the narrow schema as a perf pain
    point (database/README.md:128-131); storing the pre-joined observations
    relation makes every later query a scan."""
    return statobs.join(seobs, statobs["id"] == seobs["obsid"], "inner").select(
        "tfrom", "statid", "seid", "seval"
    )


def dedup_insert(new_rows: DataFrame, existing: DataFrame | None, pk: list[str]) -> DataFrame:
    """S5 upsert-ignore semantics (INSERT ... ON CONFLICT DO NOTHING):
    rows whose PK already exists are dropped; among new duplicates the first
    wins. Returns only the rows that would be inserted (count them for the
    RETURNING-1 tally the reference keeps)."""
    deduped = new_rows.dropDuplicates(pk)
    if existing is None:
        return deduped
    return deduped.join(existing.select(*pk).distinct(), pk, "left_anti")


def ingest_month(
    spark: SparkSession,
    *,
    mittatieto_csv: str,
    anturi_csv: str,
    stations: DataFrame,
    sensors: DataFrame,
    out_path: str | None = None,
) -> DataFrame:
    """Entry point 3 (SURVEY §3.3): one month's dumps → observations.

    One lazy plan: two CSV scans, two broadcast joins, two PK dedups, one
    fact-to-fact join, optional date-partitioned parquet append."""
    statobs = populate_statobs(
        read_staging_csv(spark, mittatieto_csv, "tiesaa_mittatieto"), stations
    )
    seobs = populate_seobs(
        read_staging_csv(spark, anturi_csv, "anturi_arvo"), sensors
    )
    obs = build_observations(statobs, seobs)
    if out_path is not None:
        from tsatool_app_spark.model import write_observations

        write_observations(obs, out_path)
    return obs
