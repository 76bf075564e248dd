"""Repo-consistency gate for the driver's 50-slot correctness window.

The round driver records correctness for only the FIRST 50 entries of
``queries()``; the r05 policy (VERDICT r04 item 2) is that every slot
must be an ORACLE-backed query with NO prior driver record — a re-record
or a rows-only entry wastes a slot the 70+-query certification backlog
needs. This test pins the invariant so a future registry edit cannot
silently break the window composition.
"""

from __future__ import annotations

import json
import pathlib
import re

from exact_spark.registry import (
    DRIVER_ORDER,
    DRIVER_WINDOW_ROUND,
    REGISTRY,
    _load_all,
    all_queries,
)

_REPO = pathlib.Path(__file__).resolve().parents[1]
# r10-safe: CORRECTNESS_r12.json matches, CORRECTNESS_LOCAL_r05.json doesn't.
_RECORD_RE = re.compile(r"^CORRECTNESS_r(\d+)\.json$")


def _recorded_names() -> set[str]:
    """Names with a driver record from a round STRICTLY before the round the
    current window was rotated for. The window's own round record (committed
    by the driver at round end) matches the window by construction; counting
    it would turn this gate red at every round boundary (ADVICE r05)."""
    names: set[str] = set()
    for p in _REPO.iterdir():
        m = _RECORD_RE.match(p.name)
        if m and int(m.group(1)) < DRIVER_WINDOW_ROUND:
            names |= set(json.loads(p.read_text()))
    return names


def test_driver_order_covers_registry_exactly():
    _load_all()
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate DRIVER_ORDER entries"
    assert set(DRIVER_ORDER) == set(REGISTRY), (
        "DRIVER_ORDER and the registry drifted: "
        f"missing={sorted(set(REGISTRY) - set(DRIVER_ORDER))[:5]} "
        f"stale={sorted(set(DRIVER_ORDER) - set(REGISTRY))[:5]}"
    )


def test_window_slots_are_oracle_backed():
    _load_all()
    window = list(all_queries())[:50]
    rows_only = [n for n in window if REGISTRY[n].sql is None]
    assert rows_only == [], (
        f"rows-only queries occupy driver window slots (cannot hash-match, "
        f"wasted slot): {rows_only}"
    )


def test_window_slots_have_no_prior_driver_record():
    """Until the certification backlog drains, every window slot must be a
    query with no green driver record in any committed CORRECTNESS_r0N.
    When the backlog IS drained (all oracle-backed queries recorded),
    re-records become legitimate and this guard self-retires."""
    _load_all()
    recorded = _recorded_names()
    oracle_backed = {n for n, s in REGISTRY.items() if s.sql is not None}
    backlog = oracle_backed - recorded
    if not backlog:
        return  # backlog drained — rotation policy no longer applies
    window = list(all_queries())[:50]
    re_records = [n for n in window if n in recorded]
    assert not re_records, (
        f"{len(re_records)} window slots re-record already-certified queries "
        f"while {len(backlog)} oracle-backed queries still lack any driver "
        f"record: {re_records[:8]}"
    )
