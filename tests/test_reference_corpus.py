"""The reference's own golden corpora re-expressed (SURVEY §5.1):
toimiva (clean run — every row parses) and virheita (error corpus — every
row produces the documented error class, not a crash). Rows quoted from
/root/reference/example_data/*.csv; sensors/stations per the 2019 metadata
snapshot shape (utils.py:115-273 subset)."""

from __future__ import annotations

from datetime import datetime

import pytest

from tsatool_app_spark.runner import AnalysisCollection, CondCollection

T0, T1 = datetime(2018, 2, 1), datetime(2018, 3, 31)

SENSORS = {
    "ilma": 1, "tie_1": 3, "keli_1": 27, "sade": 22, "nakyvyys_metria": 58,
    "keskituuli": 16, "maksimituuli": 17, "tienpinnan_tila3": 174,
    "kitka3_luku": 181,
}
STATIONS = {1115, 1120, 1122}

TOIMIVA = [
    ("Sipoo itään", "A1", "s1120#keli_1 = 8 AND s1120#tie_1 < -3"),
    (
        "Ääkköslandia 1",
        "D1",
        "(s1115#KELI_1 in (1,2,3,4,5) AND s1120#KELI_1 in (1,2,3,4,5) AND "
        "s1122#TIENPINNAN_TILA3 in (1,2,3,4,5)) OR ((s1115#KELI_1 = 8 AND "
        "s1115#TIE_1 >= 2) OR (s1120#KELI_1 = 8 AND s1120#TIE_1 >= 2)) AND "
        "(s1122#KITKA3_LUKU >= 0.4 OR s1115#TIE_1 >= 2) AND (s1115#SADE in "
        "(0,1) OR (s1115#SADE = 2 AND s1115#KELI_1 in (1,2))) AND "
        "(s1115#NAKYVYYS_METRIA >= 600) AND (s1115#KESKITUULI < 12 OR "
        "s1115#MAKSIMITUULI < 17)",
    ),
    ("Ääkköslandia 1", "D2", "s1115#NAKYVYYS_METRIA >= 300 AND s1115#NAKYVYYS_METRIA < 600 AND D1"),
    ("Yhdistelmä", "C1", "sipoo_itaan#A1 AND (aakkoslandia_1#D1 OR aakkoslandia_1#D2)"),
]


def test_toimiva_corpus_parses_clean():
    coll = CondCollection.from_rows("toimiva", T0, T1, TOIMIVA)
    assert not coll.errors
    assert len(coll.conditions) == 4
    for c in coll.conditions.values():
        assert c.blocks_made, (c.id_string, c.errors.messages)
        for b in c.primary_blocks():
            b.resolve_sensor_id(SENSORS)
            b.validate_station(STATIONS)
        assert not any(len(b.errors) for b in c.blocks.values())
    # dependency structure of the corpus
    order = coll.execution_order()
    assert order.index("aakkoslandia_1_d1") < order.index("aakkoslandia_1_d2")
    assert order[-1] == "yhdistelma_c1"
    # D1's duplicate sub-term dedups (s1115#tie_1 >= 2 appears twice):
    # 15 terms → 14 distinct blocks, the repeat reuses alias d1_4
    d1 = coll.conditions["aakkoslandia_1_d1"]
    assert len(d1.blocks) == 14
    assert d1.alias_condition.count("d1_4") == 2


# (row, documented failure) from virheita_Syntaksivirheet.csv:4-16
VIRHEITA = [
    ("Sipoo itään ja tämä on niin pitkä nimi sijainnille ettei se kelpaa sillä 40 merkin raja ylittyy",
     "A1", "s1120#keli_1 = 8 AND s1120#tie_1 < -3", "too-long site"),
    ("Sipoo itään ja tämä on niin pitkä nimi sijainnille ettei se kelpaa sillä 40 merkin raja ylittyy",
     "liian_pitkä_master_alias_ei_kelpaa_jos_merkkimääräraja_ylittyy_vaikkapa_tähän_tapaan",
     "s1120#keli_1 = 8 AND s1120#tie_1 < -3", "too-long master_alias"),
    ("Sipoo itään", "A5", "s1120#keli_1 = 8 NOT s1120#tie_1 < -3", "misused NOT"),
    ("Sipoo itään", "A6", "s1120#keli_1 = 8 JA s1120#tie_1 < -3", "Finnish JA"),
    ("Sipoo länteen", "A1", "s1120#keli_1 == 8 AND s1120#tie_1 =< -3", "bad operators"),
    ("Sipoo länteen", "A2", "(s1120#keli_1 = 8 AND s1120#tie_1 < -3))", "unbalanced parens"),
]


@pytest.mark.parametrize("site,alias,cond,why", VIRHEITA, ids=[v[3] for v in VIRHEITA])
def test_virheita_rows_error_not_crash(site, alias, cond, why):
    coll = CondCollection.from_rows("virheita", T0, T1, [(site, alias, cond)])
    total_errors = len(coll.errors) + sum(
        len(c.errors) for c in coll.conditions.values()
    )
    runnable = [c for c in coll.conditions.values() if c.blocks_made]
    assert total_errors > 0 or not runnable, why


def test_virheita_duplicate_condition_row():
    rows = [
        ("Ääkköslandia 1", "D1", "s1115#KELI_1 = 8"),
        ("Ääkköslandia 1", "D1", "s1115#KELI_1 = 8"),  # duplicate id
    ]
    coll = CondCollection.from_rows("virheita", T0, T1, rows)
    assert len(coll.conditions) == 1
    assert any("Duplicate" in m for m in coll.errors.messages)


def test_virheita_metadata_rows():
    """Unknown sensor (keli_10), unknown station (111220), missing '#'
    (keli_1 = 8), missing 's' prefix (1120#... leading digit) — validated
    via dry-validate against the metadata snapshot."""
    rows = [
        ("Sipoo itään", "A3", "keli_1 = 8 AND s1120#tie_1 < -3"),
        ("Sipoo itään", "A4", "1120#keli_1 = 8 AND s1120#tie_1 < -3"),
        ("Sipoo itään", "A7", "s1120#keli_10 = 8 AND s1120#tie_1 < -3"),
        ("Sipoo itään", "A8", "s111220#keli_10 = 8 AND s1120#tie_1 < -3"),
    ]
    ac = AnalysisCollection("virheita")
    ac.add_collection(CondCollection.from_rows("s", T0, T1, rows))
    tree = ac.dry_validate(STATIONS, SENSORS)
    import json

    s = json.dumps(tree)
    assert "keli_10" in s           # unknown sensor reported
    assert "111220" in s            # unknown station reported
    coll = ac.collections[0]
    # A3 (no '#') and A4 (leading digit) must each carry parse errors
    assert len(coll.conditions["sipoo_itaan_a3"].errors)
    assert len(coll.conditions["sipoo_itaan_a4"].errors)


def test_virheita_secondary_reference_rows():
    rows = [
        ("Ääkköslandia 1", "D2", "E2"),          # undefined reference
        ("Ääkköslandia 1", "D3", "A3 OR A4"),    # refs exist nowhere (wrong site)
    ]
    coll = CondCollection.from_rows("virheita", T0, T1, rows)
    order = coll.execution_order()
    assert order == []  # nothing runnable
    msgs = [
        m for c in coll.conditions.values() for m in c.errors.messages
    ]
    assert any("undefined" in m for m in msgs)
