"""Condition — one boolean expression over blocks (one Excel row).

Reference: tsa/condition.py:27-305. Parsing pipeline preserved semantically
(the quirks define which inputs are accepted — SURVEY §7.4):

1. whole condition is umlaut-folded, stripped, lowercased
   (condition.py:49);
2. paren balance checked by counting (condition.py:168-176);
3. tokenized by regex split on parens and space-surrounded ``and|or|not``
   (plus leading ``not``) (condition.py:178-189);
4. ``in (…)`` tuples — split apart by the paren rule — are re-assembled
   (condition.py:195-205);
5. tokens classified open_par/close_par/andor/not/block; non-token text must
   parse as a Block;
6. common-subexpression dedup: a block with identical raw text reuses the
   earlier block's alias and order number (condition.py:229-239);
7. grammar checked via the adjacency-pair table (condition.py:84-153);
8. outputs: ordered blocks, ``alias_condition`` (expression with each block
   replaced by its alias — directly evaluable by Spark SQL ``expr``), and the
   ``secondary`` flag (condition.py:287-293).
"""

from __future__ import annotations

import re
from collections import OrderedDict
from dataclasses import dataclass, field
from datetime import datetime

from tsatool_app_spark.dsl.block import BlockSpec
from tsatool_app_spark.dsl.errors import ErrorCollection
from tsatool_app_spark.dsl.idents import fold_umlauts, normalize_identifier

_SPLIT_RE = re.compile(r"([()]|(?<=\s)and(?=\s)|(?<=\s)or(?=\s)|(?<=\s)not(?=\s)|^not(?=\s))")

_TOKEN_KINDS = {"(": "open_par", ")": "close_par", "and": "andor", "or": "andor", "not": "not"}

# Adjacency grammar (condition.py:104-126 truth table).
_ALLOWED_FIRST = ("open_par", "not", "block")
_ALLOWED_LAST = ("close_par", "block")
_ALLOWED_PAIRS = frozenset(
    {
        ("open_par", "open_par"), ("open_par", "not"), ("open_par", "block"),
        ("close_par", "close_par"), ("close_par", "andor"),
        ("andor", "open_par"), ("andor", "not"), ("andor", "block"),
        ("not", "open_par"), ("not", "block"),
        ("block", "close_par"), ("block", "andor"),
    }
)


@dataclass
class ConditionSpec:
    site: str
    master_alias: str
    raw_condition: str
    time_from: datetime
    time_until: datetime
    excel_row: int | None = None

    condition: str = ""
    id_string: str = ""
    blocks: "OrderedDict[str, BlockSpec]" = field(default_factory=OrderedDict)
    alias_condition: str = ""
    secondary: bool = False
    blocks_made: bool = False
    errors: ErrorCollection = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        self.site = normalize_identifier(self.site)
        self.master_alias = normalize_identifier(self.master_alias)
        self.id_string = f"{self.site}_{self.master_alias}"
        self.condition = fold_umlauts(self.raw_condition).strip().lower()
        self.errors = ErrorCollection(f"CONDITION <{self.id_string}>")
        self._make_blocks()

    # -- tokenization ----------------------------------------------------

    def _tokenize(self) -> list[str]:
        value = " ".join(self.condition.split()).strip()
        parts = [p.strip() for p in _SPLIT_RE.split(value)]
        parts = [p for p in parts if p]

        # Re-assemble `in (…)` tuples that the paren split broke apart
        # (condition.py:195-205): "x in" + "(" → "x in (", then keep
        # appending until the element ends with ")".
        merged: list[str] = []
        for el in parts:
            if not merged:
                merged.append(el)
            elif len(merged[-1]) > 3 and merged[-1].endswith(" in"):
                merged[-1] = merged[-1] + " " + el
            elif " in " in merged[-1] and not merged[-1].endswith(")"):
                merged[-1] = merged[-1] + el
            else:
                merged.append(el)
        return merged

    # -- grammar ---------------------------------------------------------

    def _validate_order(self, tokens: list[tuple[str, object]]) -> bool:
        ok = True
        last_i = len(tokens) - 1
        for i, (kind, text) in enumerate(tokens):
            label = text.raw_logic if isinstance(text, BlockSpec) else text
            if i == 0 and kind not in _ALLOWED_FIRST:
                self.errors.add(f'"{label}" cannot be first element in condition')
                ok = False
            if i == last_i and kind not in _ALLOWED_LAST:
                self.errors.add(f'"{label}" cannot be last element in condition')
                ok = False
            if i < last_i:
                nk, nt = tokens[i + 1]
                nlabel = nt.raw_logic if isinstance(nt, BlockSpec) else nt
                if (kind, nk) not in _ALLOWED_PAIRS:
                    self.errors.add(
                        f'Illegal combination in condition: "{label}" before "{nlabel}"'
                    )
                    ok = False
        return ok

    # -- block construction ---------------------------------------------

    def _make_blocks(self) -> None:
        is_valid = True
        n_open = self.condition.count("(")
        n_close = self.condition.count(")")
        if n_open != n_close:
            self.errors.add(
                f'Unequal number of "(" ({n_open}) and ")" ({n_close}) in condition'
            )
            is_valid = False

        classified: list[tuple[str, object]] = []
        order_nr = 0
        for el in self._tokenize():
            if el in _TOKEN_KINDS:
                classified.append((_TOKEN_KINDS[el], el))
                continue
            try:
                block = BlockSpec(
                    master_alias=self.master_alias,
                    parent_site=self.site,
                    order_nr=order_nr,
                    raw_logic=el,
                )
            except ValueError as e:
                self.errors.add(f'Cannot create block from "{el}": {e}')
                is_valid = False
                continue
            if block.errors:
                # Non-fatal: record and keep going (graceful degradation);
                # the condition is marked invalid below via is_valid.
                for m in block.errors.messages:
                    self.errors.add(m)
                is_valid = False
            # Dedup: identical raw text reuses the earlier block
            # (condition.py:229-239) — common-subexpression elimination.
            for kind, existing in classified:
                if kind == "block" and existing.raw_logic == block.raw_logic:
                    classified.append(("block", existing))
                    break
            else:
                classified.append(("block", block))
                order_nr += 1

        is_valid = self._validate_order(classified) and is_valid
        is_valid = is_valid and all(
            b.secondary is not None for k, b in classified if k == "block"
        )

        blocks: "OrderedDict[str, BlockSpec]" = OrderedDict()
        for kind, el in classified:
            if kind == "block" and el.alias not in blocks:
                blocks[el.alias] = el
        self.blocks = blocks
        if not blocks:
            self.errors.add("No blocks were created", level="warning")
            is_valid = False

        parts = []
        for kind, el in classified:
            if kind == "andor":
                parts.append(f" {el} ")
            elif kind == "not":
                parts.append(f"{el} ")
            elif kind in ("open_par", "close_par"):
                parts.append(el)
            else:
                parts.append(el.alias)
        self.alias_condition = "".join(parts)

        self.secondary = any(b.secondary for b in self.blocks.values())
        self.blocks_made = is_valid
        if not is_valid:
            self.errors.add(
                "There were errors with this condition and it will not be analyzed",
                level="warning",
            )

    # -- helpers ---------------------------------------------------------

    def primary_blocks(self) -> list[BlockSpec]:
        return [b for b in self.blocks.values() if b.secondary is False]

    def secondary_blocks(self) -> list[BlockSpec]:
        return [b for b in self.blocks.values() if b.secondary is True]

    def station_ids(self) -> set[int]:
        return {
            b.station_id for b in self.primary_blocks() if b.station_id is not None
        }

    def dependencies(self) -> set[str]:
        """id_strings of conditions this one references (for topo sort)."""
        return {
            b.source_condition_id
            for b in self.secondary_blocks()
            if b.source_condition_id
        }
