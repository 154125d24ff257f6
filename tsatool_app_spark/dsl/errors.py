"""Error accounting — a first-class output of the engine.

Reference: tsa/error.py (TsaError/TsaErrCollection). Every layer accumulates
non-fatal errors with duplicate-folding (duplicates increment a counter on the
first occurrence rather than appending — error.py:68-77); bad rows degrade
gracefully instead of aborting (README.md:113-121). The nested error tree is
itself a sink (S9): analysis → collection → condition → block, dumped as JSON.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

log = logging.getLogger(__name__)


@dataclass
class EngineError:
    msg: str
    context: str
    n_more: int = 0

    def __str__(self) -> str:
        s = f"{self.context}: {self.msg}"
        if self.n_more:
            s += f" ({self.n_more} more similar errors)"
        return s


@dataclass
class ErrorCollection:
    """Per-object error list with duplicate folding."""

    context: str
    errors: list[EngineError] = field(default_factory=list)

    def add(self, msg: str, level: str = "error") -> None:
        for e in self.errors:
            if e.msg == msg:
                e.n_more += 1
                return
        self.errors.append(EngineError(msg, self.context))
        getattr(log, level if level in ("warning", "debug", "info") else "error")(
            f"{self.context}: {msg}"
        )

    def extend_context(self, other: "ErrorCollection") -> None:
        self.errors.extend(other.errors)

    @property
    def messages(self) -> list[str]:
        return [e.msg for e in self.errors]

    def __len__(self) -> int:
        return len(self.errors)

    def __bool__(self) -> bool:
        return bool(self.errors)

    def as_tree_value(self) -> list[str]:
        return [str(e) for e in self.errors]
