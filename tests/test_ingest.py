"""Ingestion tests (entry point 3): pipe-CSV staging → cleansing → id
translation → dedup → observations. Fixture shapes from FIXTURES.md §2 /
reference database/example_data samples."""

from __future__ import annotations

import pytest

from tsatool_app_spark.sources import (
    build_observations,
    dedup_insert,
    ingest_month,
    populate_seobs,
    populate_statobs,
    read_staging_csv,
    sensor_name_to_id,
)

MITTATIETO = """\"ID\"|\"AIKA\"|\"ASEMA_ID\"
420958436|01.03.2018 02:09:00,000000000|1
420958437|01.03.2018 02:14:00,000000000|1
420958437|01.03.2018 02:14:00,000000000|1
420958438|25.03.2018 04:30:00,000000000|1
420958439|01.03.2018 02:09:00,000000000|2
|01.03.2018 02:19:00,000000000|1
420958440||1
420958441|01.03.2018 02:24:00,000000000|99
"""

ANTURI = """\"ID\"|\"ANTURI_ID\"|\"ARVO\"|\"MITTATIETO_ID\"|\"TIEDOSTO_ID\"
23855559698|18|275|420958436|
23855559699|18|276|420958437|
23855559699|18|276|420958437|
23855559700|19|-1.5|420958436|
23855559701|18||420958438|
23855559702|99|5|420958436|
"""


@pytest.fixture(scope="module")
def staging_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("lotju")
    m = d / "mittatieto.csv"
    a = d / "anturi.csv"
    m.write_text(MITTATIETO)
    a.write_text(ANTURI)
    return str(m), str(a)


@pytest.fixture(scope="module")
def dims(spark):
    stations = spark.createDataFrame(
        [(1115, 1, "vt1_Sipoo"), (1120, 2, "vt2_Espoo")], "id int, lotjuid int, name string"
    )
    sensors = spark.createDataFrame(
        [(3, 18, '"TIE_1"'), (27, 19, '"KELI_1"')], "id int, lotjuid int, name string"
    )
    return stations, sensors


def test_populate_statobs(spark, staging_files, dims):
    m_csv, _ = staging_files
    stations, _ = dims
    staging = read_staging_csv(spark, m_csv, "tiesaa_mittatieto")
    out = populate_statobs(staging, stations).orderBy("tfrom", "statid").collect()
    # 8 raw rows: 1 exact dup dropped, 1 null-ID dropped, 1 null-time
    # dropped, 1 unknown station (lotjuid 99) dropped by inner join → 4
    assert len(out) == 4
    # Helsinki winter (UTC+2): 02:09 local → 00:09 UTC
    assert str(out[0].tfrom) == "2018-03-01 00:09:00"
    assert out[0].statid in (1115, 1120)
    # DST boundary day: 04:30 local is EEST (UTC+3) after the 03:00→04:00
    # spring-forward switch → 01:30 UTC
    late = [r for r in out if r.tfrom.month == 3 and r.tfrom.day == 25]
    assert str(late[0].tfrom) == "2018-03-25 01:30:00"


def test_populate_seobs(spark, staging_files, dims):
    _, a_csv = staging_files
    _, sensors = dims
    staging = read_staging_csv(spark, a_csv, "anturi_arvo")
    out = populate_seobs(staging, sensors).orderBy("obsid", "seid").collect()
    # 6 raw rows: 1 dup dropped, 1 null-value dropped, 1 unknown sensor → 3
    assert len(out) == 3
    assert {(r.obsid, r.seid) for r in out} == {
        (420958436, 3),
        (420958436, 27),
        (420958437, 3),
    }
    assert [r.seval for r in out if r.seid == 27] == [-1.5]


def test_ingest_month_end_to_end(spark, staging_files, dims, tmp_path):
    m_csv, a_csv = staging_files
    stations, sensors = dims
    out_path = str(tmp_path / "obs.parquet")
    obs = ingest_month(
        spark,
        mittatieto_csv=m_csv,
        anturi_csv=a_csv,
        stations=stations,
        sensors=sensors,
        out_path=out_path,
    )
    rows = obs.orderBy("tfrom", "seid").collect()
    # observations = statobs ⋈ seobs on id=obsid: headers 420958436/437 match
    assert len(rows) == 3
    persisted = spark.read.parquet(out_path)
    assert persisted.count() == 3
    assert "obs_date" in persisted.columns and "modified" in persisted.columns


def test_dedup_insert_on_conflict_do_nothing(spark):
    existing = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    new = spark.createDataFrame([(2, 99), (3, 30), (3, 31)], "k int, v int")
    out = dedup_insert(new, existing, ["k"]).collect()
    assert len(out) == 1  # k=2 conflicts, k=3 dup collapses to first
    assert out[0].k == 3


def test_sensor_name_to_id(spark, dims):
    _, sensors = dims
    assert sensor_name_to_id(sensors) == {"tie_1": 3, "keli_1": 27}
