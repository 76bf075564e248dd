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


def _slot_priority(name: str, recorded: set[str]) -> int:
    """Window-slot priority: 0 = never-recorded oracle-backed (hash-match
    certifies), 1 = never-recorded rows-only (weaker but still a first
    record), 2 = already recorded (a re-record, worth the least)."""
    if name not in recorded:
        return 0 if REGISTRY[name].sql is not None else 1
    return 2


def test_window_slots_are_oracle_backed():
    """While 50 OR MORE never-recorded oracle-backed queries remain,
    every slot must be one — a rows-only entry cannot hash-match and
    wastes a slot. Once the oracle backlog shrinks below the window size
    (r07+), the rows-only tail legitimately takes the leftover slots and
    this specific guard defers to the no-wasted-slot invariant below."""
    _load_all()
    recorded = _recorded_names()
    oracle_backlog = {
        n for n, s in REGISTRY.items() if s.sql is not None and n not in recorded
    }
    if len(oracle_backlog) < 50:
        return
    window = list(all_queries())[:50]
    rows_only = [n for n in window if REGISTRY[n].sql is None]
    assert rows_only == [], (
        f"rows-only queries occupy driver window slots (cannot hash-match, "
        f"wasted slot): {rows_only}"
    )


def test_window_wastes_no_slot():
    """The 50 recording slots must be spent prefix-optimally: no query
    outside the window may out-prioritize a query inside it
    (never-recorded oracle-backed > never-recorded rows-only >
    re-record). While 50+ backlog remains this forbids any re-record or
    rows-only slot (the r05 policy); when the backlog shrinks below 50
    (r07+) it instead guarantees every remaining backlog query IS in the
    window before any lesser slot use; when everything is recorded it
    self-retires (all priorities equal)."""
    _load_all()
    recorded = _recorded_names()
    order = list(all_queries())
    window, outside = order[:50], order[50:]
    worst_in = max(_slot_priority(n, recorded) for n in window)
    if not outside:
        return
    best_out = min(_slot_priority(n, recorded) for n in outside)
    assert worst_in <= best_out, (
        f"window wastes slots: a priority-{worst_in} entry sits inside while "
        f"a priority-{best_out} query waits outside — "
        f"inside={[n for n in window if _slot_priority(n, recorded) == worst_in][:5]} "
        f"outside={[n for n in outside if _slot_priority(n, recorded) == best_out][:5]}"
    )
