"""Duration parsing (SURVEY.md §2.2 P12).

Reference: Backend/Simulator/DBAPI/utils.py:6-73 ``parse_duration`` —
'1h30m' / '2days 5hours' / '10s' / bare number -> seconds. (The reference
carries two live variants plus a dead one that subtracts 30s,
DBAPI/utils.py:75-123; we implement the documented semantics once.)
"""

from __future__ import annotations

import re

_UNITS = {
    "w": 604800.0,
    "week": 604800.0,
    "weeks": 604800.0,
    "d": 86400.0,
    "day": 86400.0,
    "days": 86400.0,
    "h": 3600.0,
    "hr": 3600.0,
    "hour": 3600.0,
    "hours": 3600.0,
    "m": 60.0,
    "min": 60.0,
    "mins": 60.0,
    "minute": 60.0,
    "minutes": 60.0,
    "s": 1.0,
    "sec": 1.0,
    "secs": 1.0,
    "second": 1.0,
    "seconds": 1.0,
}

_TOKEN = re.compile(r"(\d+(?:\.\d+)?)\s*([a-zA-Z]*)")


def parse_duration(value) -> float:
    """'1h30m' / '2days 5hours' / '10s' / 90 / '90' -> seconds."""
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    if not s:
        raise ValueError("empty duration")
    try:
        return float(s)
    except ValueError:
        pass
    total = 0.0
    matched = False
    for num, unit in _TOKEN.findall(s):
        if not unit:
            unit = "s"
        key = unit.lower()
        if key not in _UNITS:
            raise ValueError(f"unknown duration unit {unit!r} in {value!r}")
        total += float(num) * _UNITS[key]
        matched = True
    if not matched:
        raise ValueError(f"unparseable duration {value!r}")
    return total
