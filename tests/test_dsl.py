"""DSL parser tests — the toimiva/virheita corpora re-expressed (SURVEY §5,
FIXTURES.md §3). Pure Python, no Spark session needed."""

from __future__ import annotations

from datetime import datetime

import pytest

from tsatool_app_spark.dsl import (
    BlockSpec,
    ConditionSpec,
    normalize_identifier,
)

TR = (datetime(2018, 2, 1), datetime(2018, 3, 31, 23, 59, 59))


def cond(site, alias, raw):
    return ConditionSpec(site, alias, raw, TR[0], TR[1])


# -- identifier rules (utils.py:39-92) ----------------------------------


def test_identifier_normalization():
    assert normalize_identifier("Sipoo itään") == "sipoo_itaan"
    assert normalize_identifier("  Ääkköslandia 1 ") == "aakkoslandia_1"


@pytest.mark.parametrize(
    "bad", ["1120alku", "x" * 64, "bad-name", "statobs", "seobs", ""]
)
def test_identifier_rejections(bad):
    with pytest.raises(ValueError):
        normalize_identifier(bad)


# -- block parsing (block.py:78-179) ------------------------------------


def test_primary_block():
    b = BlockSpec("a1", "site", 0, "s1122#tie_1 < 3")
    assert b.secondary is False
    assert (b.station, b.station_id, b.sensor) == ("s1122", 1122, "tie_1")
    assert (b.operator, b.value) == ("<", 3.0)
    assert not b.errors


def test_primary_block_in_tuple():
    b = BlockSpec("a1", "site", 0, "s1115#keli_1 in (1,2,3,4,5)")
    assert b.operator == "in"
    assert b.value == (1.0, 2.0, 3.0, 4.0, 5.0)
    assert not b.errors


def test_secondary_block_bare_and_qualified():
    b = BlockSpec("c1", "yhdistelma", 0, "d1")
    assert b.secondary is True
    assert b.source_condition_id == "yhdistelma_d1"
    b2 = BlockSpec("c1", "yhdistelma", 1, "sipoo_itaan#a1")
    assert b2.source_condition_id == "sipoo_itaan_a1"


@pytest.mark.parametrize(
    "bad_logic",
    [
        "keli_1 = 8",            # operator but no '#' → primary without station
        "s1122#tie_1 == 3",      # '==' is not an operator → unparseable block
        "s1122#tie_1 =< 3",      # '=<' likewise
        "s1115#keli_1 in 1,2",   # 'in' without parentheses
        "s1122#a#b = 1",         # too many hashtags
        "s1122#tie_1 < 3 < 4",   # too many operators
        "sabc#tie_1 < 3",        # station with no digits
    ],
)
def test_block_errors(bad_logic):
    b = BlockSpec("a1", "site", 0, bad_logic)
    assert len(b.errors) > 0, bad_logic


# -- condition parsing (condition.py:84-305) ----------------------------


def test_simple_and_condition():
    c = cond("Sipoo itään", "A1", "s1120#keli_1 = 8 AND s1120#tie_1 < -3")
    assert c.blocks_made and not c.errors
    assert list(c.blocks) == ["a1_0", "a1_1"]
    assert c.alias_condition == "a1_0 and a1_1"
    assert c.secondary is False


def test_deep_nested_condition():
    raw = (
        "(s1115#KELI_1 in (1,2,3,4,5) AND s1120#KELI_1 in (1,2,3,4,5)) OR "
        "((s1115#KELI_1 = 8 AND s1115#TIE_1 >= 2) OR (s1120#KELI_1 = 8 AND s1120#TIE_1 >= 2)) "
        "AND (s1122#KITKA3_LUKU >= 0.4 OR s1115#TIE_1 >= 2)"
    )
    c = cond("Ääkköslandia 1", "D1", raw)
    assert c.blocks_made, c.errors.messages
    # duplicate term s1115#tie_1 >= 2 dedups to one block
    texts = [b.raw_logic for b in c.blocks.values()]
    assert len(texts) == len(set(texts))
    assert "d1_0" in c.alias_condition and "(" in c.alias_condition


def test_duplicate_block_reuses_alias():
    c = cond("x", "a1", "s1#tie_1 < 3 OR (s2#keli_1 = 8 AND s1#tie_1 < 3)")
    assert c.blocks_made
    assert len(c.blocks) == 2
    assert c.alias_condition == "a1_0 or (a1_1 and a1_0)"


def test_mixed_primary_secondary():
    c = cond("Ääkköslandia 1", "D2", "s1115#NAKYVYYS_METRIA >= 300 AND D1")
    assert c.blocks_made
    assert c.secondary is True
    assert c.dependencies() == {"aakkoslandia_1_d1"}


def test_cross_site_secondary():
    c = cond("Yhdistelmä", "C1", "sipoo_itaan#A1 AND (aakkoslandia_1#D1 OR aakkoslandia_1#D2)")
    assert c.blocks_made
    assert c.dependencies() == {
        "sipoo_itaan_a1",
        "aakkoslandia_1_d1",
        "aakkoslandia_1_d2",
    }


@pytest.mark.parametrize(
    "raw,why",
    [
        ("s1122#tie_1 < 3 NOT s1122#keli_1 = 8", "NOT directly between blocks"),
        ("s1122#tie_1 < 3 JA s1122#keli_1 = 8", "Finnish JA instead of AND"),
        ("(s1122#tie_1 < 3", "unbalanced parens"),
        ("s1122#tie_1 < 3 AND", "trailing AND"),
        ("s1122#tie_1 < 3 AND ()", "empty parens"),
        ("", "empty condition"),
    ],
)
def test_condition_errors(raw, why):
    c = cond("site", "a1", raw)
    assert not c.blocks_made, why
    assert len(c.errors) > 0


def test_leading_andor_quirk():
    # Reference quirk preserved: the split regex requires whitespace BEFORE
    # and/or (condition.py:185-186 `(?<=\s)and(?=\s)`; only `not` has a
    # start-of-string alternative), so a leading "AND" is swallowed into the
    # first block's station identifier ("and_s1122") rather than rejected.
    c = cond("site", "a1", "AND s1122#tie_1 < 3")
    assert c.blocks_made
    b = c.primary_blocks()[0]
    assert b.station == "and_s1122" and b.station_id == 1122


def test_not_handling():
    c = cond("site", "a1", "NOT s1122#tie_1 < 3 AND NOT (s1122#keli_1 = 8)")
    assert c.blocks_made, c.errors.messages
    assert c.alias_condition == "not a1_0 and not (a1_1)"


def test_sensor_resolution_and_station_validation():
    c = cond("site", "a1", "s1122#tie_1 < 3 AND s9999#keli_1 = 8")
    for b in c.primary_blocks():
        b.resolve_sensor_id({"tie_1": 3, "keli_1": 27})
        b.validate_station({1122, 1115, 1120})
    b1, b2 = c.primary_blocks()
    assert b1.sensor_id == 3 and not b1.errors
    assert "Unknown station id" in b2.errors.messages[0] or b2.errors.messages
    c2 = cond("site", "a2", "s1122#keli_10 = 8")
    for b in c2.primary_blocks():
        b.resolve_sensor_id({"tie_1": 3})
    assert any("keli_10" in m for m in c2.primary_blocks()[0].errors.messages)
