"""Driver-side formatting helpers (SURVEY §2.9 parity).

Reference: tsa/utils.py:25-37 (error pointer), :94-103 (timedelta
formatting), :105-113 (display truncation). Pure Python, used by report
sinks and error messages.
"""

from __future__ import annotations

from datetime import timedelta


def strfdelta(tdelta: timedelta, fmt: str) -> str:
    """Format a timedelta with {days}/{hours}/{minutes}/{seconds}
    placeholders (utils.py:94-103)."""
    d = {"days": tdelta.days}
    d["hours"], rem = divmod(tdelta.seconds, 3600)
    d["minutes"], d["seconds"] = divmod(rem, 60)
    return fmt.format(**d)


def trunc_str(s: str, n: int = 80) -> str:
    """Truncate for display: first n-5 chars + ' ...' (utils.py:105-113)."""
    if len(s) <= n - 4:
        return s
    return s[: (n - 5)] + " ..."


def with_errpointer(s, pos) -> str:
    """Append a '~~~^ HERE' pointer line at index pos (utils.py:25-37)."""
    try:
        pos = int(pos)
        s = str(s)
    except (TypeError, ValueError):
        return str(s)
    if pos < 0:
        return s
    return s + "\n" + "~" * pos + "^ HERE"
