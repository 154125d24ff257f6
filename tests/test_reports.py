"""Report sink tests: CSV/JSON fallbacks always work; rich sinks raise
cleanly when their libraries are absent."""

from __future__ import annotations

import csv
import json
from datetime import datetime, timedelta

import pytest

from tsatool_app_spark import reports
from tsatool_app_spark.runner import AnalysisCollection, CondCollection

T0 = datetime(2018, 3, 1)


@pytest.fixture(scope="module")
def results(spark):
    rows = [(i * 5, 1122, 3, float(v)) for i, v in enumerate([5, 4, 2, 1, 2.5, 4, 5, 5])]
    obs = spark.createDataFrame(
        [(T0 + timedelta(minutes=m), s, se, v) for m, s, se, v in rows],
        "tfrom timestamp, statid int, seid int, seval float",
    )
    coll = CondCollection.from_rows(
        "sheet1", T0, T0,
        [("Sipoo", "A1", "s1122#tie_1 < 3"), ("Sipoo", "B1", "keli_10 = 8 AND")],
    )
    return coll, coll.run(obs, sensor_name_to_id={"tie_1": 3})


def test_summary_csv(results, tmp_path):
    _, res = results
    p = reports.write_summary_csv(res, str(tmp_path / "summary.csv"))
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    ok = next(r for r in rows if r["master_alias"] == "a1")
    bad = next(r for r in rows if r["master_alias"] == "b1")
    assert float(ok["percentage_valid"]) > 0
    assert bad["rows"] == "0" and bad["data_from"] == ""


def test_timeline_json(results, tmp_path):
    _, res = results
    p = reports.write_timeline_json(res["sipoo_a1"], str(tmp_path / "tl.json"))
    rows = json.load(open(p))
    series = {r["series"] for r in rows}
    assert series == {"a1_0", "master"}
    assert {r["color"] for r in rows} <= {
        reports.COLOR_TRUE, reports.COLOR_FALSE, reports.COLOR_NULL
    }


def test_error_json(results, tmp_path):
    coll, _ = results
    ac = AnalysisCollection("batch")
    ac.add_collection(coll)
    p = reports.write_error_json(ac, str(tmp_path / "errors.json"))
    tree = json.load(open(p))
    assert tree["analysis"] == "batch"
    assert "sipoo_b1" in json.dumps(tree)


def test_gated_sinks_raise_cleanly(results, tmp_path):
    _, res = results
    with pytest.raises(NotImplementedError):
        reports.write_summary_excel(res, str(tmp_path / "x.xlsx"))
    with pytest.raises(NotImplementedError):
        reports.write_timeline_png(res["sipoo_a1"], str(tmp_path / "x.png"))
    with pytest.raises(NotImplementedError):
        reports.write_pptx(res, str(tmp_path / "x.pptx"))
