"""Identifier normalization (SURVEY §2.2 P9).

Reference: tsa/utils.py:10-23 (umlaut fold) and :39-92 (to_pg_identifier).
Rules: strip, lowercase, fold ä/ö→a/o, spaces→underscores; reject reserved
names, leading digit, length > 63, and any non-alphanumeric/underscore char.

Quirk preserved: the reference's error text says "maximum is 40 characters"
but the code enforces 63 (utils.py:84-87 — docstring declares 40 to leave
headroom for concatenated identifiers, the check uses the Postgres limit).
We enforce 63, like the code.
"""

from __future__ import annotations

_UMLAUTS = str.maketrans({"ä": "a", "Ä": "A", "ö": "o", "Ö": "O"})

#: Table names of the reference database, not allowed as user identifiers
#: (utils.py:66-69). Kept verbatim so the same inputs are rejected.
RESERVED_IDENTIFIERS = frozenset(
    {"stations", "statobs", "sensors", "seobs", "laskennallinen_anturi", "tiesaa_asema"}
)

MAX_IDENTIFIER_LEN = 63


def fold_umlauts(s: str) -> str:
    return s.translate(_UMLAUTS)


def normalize_identifier(raw: str) -> str:
    """Normalize a site/alias/station/sensor name to a safe identifier.

    Raises ValueError on fatally invalid input (leading digit, reserved name,
    overlong, non-alphanumeric characters) — callers convert this into an
    entry in their ErrorCollection, mirroring the reference's graceful
    degradation.
    """
    if not isinstance(raw, str):
        raise ValueError(f"identifier must be a string, got {type(raw).__name__}")
    x = fold_umlauts(raw.strip().lower()).replace(" ", "_")
    if not x:
        raise ValueError("identifier is empty")
    if x in RESERVED_IDENTIFIERS:
        raise ValueError(f'"{x}" cannot be used as an identifier: reserved name')
    if x[0].isdigit():
        raise ValueError(f'"{x}" starts with a digit')
    if len(x) > MAX_IDENTIFIER_LEN:
        raise ValueError(f'"{x}" is too long, maximum is 40 characters')
    for i, c in enumerate(x):
        if not (c.isalnum() or c == "_"):
            raise ValueError(f'"{x}" contains an invalid character at position {i}')
    return x
