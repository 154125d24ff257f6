"""Block — one term of a condition expression.

Reference: tsa/block.py:13-229. A block is either

- *primary*: ``<station>#<sensor> <op> <value>`` — one sensor predicate,
  e.g. ``s1122#tie_1 < 3`` or ``s1115#keli_1 in (1,2,3)``;
- *secondary*: ``<alias>`` or ``<site>#<alias>`` — a reference to another
  condition's master column.

Parsing rules preserved exactly (block.py:78-179, they define which inputs
are accepted — SURVEY §7.4):

- operators ``= <> > < >= <= in`` MUST be surrounded by single spaces;
  ``between`` unsupported; ``==``/``=<`` are not operators (the term then
  fails to parse as any block shape and errors);
- at most one ``#`` and at most one operator per block;
- #-count × operator-count dispatch: (0,0)→secondary w/ parent site,
  (1,0)→secondary w/ explicit site, (1,1)→primary, operator-without-# → error;
- the station id is the integer formed by the digits of the station
  identifier (``s1122`` → 1122; block.py:152);
- ``in`` value must be a parenthesized tuple (block.py:163-172).

Unlike the reference (which keeps the value as a string and splices it into
SQL — block.py:218-223, 01_init_db.sql:140), the value is parsed here into
typed Python floats for Catalyst literal expressions; a non-numeric value is
an error at parse time instead of a SQL failure at run time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tsatool_app_spark.dsl.errors import ErrorCollection
from tsatool_app_spark.dsl.idents import normalize_identifier

#: Space-surrounded binary operators, longest-first so ``>=`` wins over ``>``.
_BINOPS = [" >= ", " <= ", " <> ", " = ", " > ", " < ", " in "]


@dataclass
class BlockSpec:
    master_alias: str
    parent_site: str
    order_nr: int
    raw_logic: str

    alias: str = ""
    secondary: bool | None = None
    site: str | None = None
    station: str | None = None
    station_id: int | None = None
    source_alias: str | None = None
    source_condition_id: str | None = None
    sensor: str | None = None
    sensor_id: int | None = None
    operator: str | None = None
    value: object | None = None
    errors: ErrorCollection = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        self.master_alias = normalize_identifier(self.master_alias)
        self.parent_site = normalize_identifier(self.parent_site)
        self.alias = f"{self.master_alias}_{self.order_nr}"
        self.errors = ErrorCollection(f"BLOCK <{self.alias}>")
        self._unpack()

    # -- parsing ---------------------------------------------------------

    def _unpack(self) -> None:
        raw = self.raw_logic
        n_hash = raw.count("#")
        if n_hash > 1:
            self.errors.add('Too many "#" symbols, only one or zero allowed')

        n_ops = 0
        found_op = None
        for op in _BINOPS:
            c = raw.count(op)
            if c:
                n_ops += c
                found_op = op
        if n_ops > 1:
            self.errors.add("Too many comparison operators, only one or zero allowed")

        if n_hash == 0 and n_ops == 0:
            # secondary, site inherited from the parent condition
            self.secondary = True
            self.site = self.parent_site
            try:
                self.source_alias = normalize_identifier(raw)
                self.source_condition_id = f"{self.site}_{self.source_alias}"
            except ValueError as e:
                self.errors.add(f"Cannot resolve secondary reference: {e}")
        elif n_hash == 1 and n_ops == 0:
            # secondary with explicit site: site#alias
            self.secondary = True
            left, right = raw.split("#")
            try:
                self.site = normalize_identifier(left)
                self.source_alias = normalize_identifier(right)
                self.source_condition_id = f"{self.site}_{self.source_alias}"
            except ValueError as e:
                self.errors.add(f"Cannot resolve secondary reference: {e}")
        elif n_hash == 1 and n_ops == 1:
            self.secondary = False
            self.site = self.parent_site
            left, rest = raw.split("#")
            sensor_part, _, value_part = rest.partition(found_op)
            try:
                self.station = normalize_identifier(left)
                digits = "".join(ch for ch in self.station if ch.isdigit())
                self.station_id = int(digits)  # ValueError when no digits
                self.sensor = normalize_identifier(sensor_part)
                self.operator = found_op.strip().lower()
                self._parse_value(value_part.strip().lower())
            except ValueError as e:
                self.errors.add(f"Cannot parse primary block: {e}")
        else:
            self.errors.add('Primary block requires a "#" between station and sensor')

    def _parse_value(self, value_str: str) -> None:
        if self.operator == "in":
            if not (value_str.startswith("(") and value_str.endswith(")")):
                self.errors.add('"in" must be followed by values enclosed by "()"')
                return
            inner = value_str[1:-1].strip()
            if not inner:
                self.errors.add('"in" tuple is empty')
                return
            self.value = tuple(float(v.strip()) for v in inner.split(","))
        else:
            self.value = float(value_str)

    # -- resolution ------------------------------------------------------

    def resolve_sensor_id(self, name_to_id: dict[str, int]) -> None:
        """J5: sensor name → id lookup (block.py:181-193, utils.py:275-283)."""
        if self.secondary is False and self.sensor is not None:
            try:
                self.sensor_id = name_to_id[self.sensor]
            except KeyError:
                self.errors.add(f'No sensor id found by sensor name "{self.sensor}"')

    def validate_station(self, known_station_ids: frozenset[int] | set[int]) -> None:
        """J6: station id membership check (utils.py:115-197 applied at
        analysis_collection.py:123-147)."""
        if self.secondary is False and self.station_id is not None:
            if self.station_id not in known_station_ids:
                self.errors.add(f'Unknown station id "{self.station_id}"')

    def is_valid(self) -> bool:
        if self.secondary is None:
            self.errors.add("Block type undetermined")
        if self.secondary is False and self.sensor_id is None:
            self.errors.add("Block has no sensor id")
        return len(self.errors) == 0
