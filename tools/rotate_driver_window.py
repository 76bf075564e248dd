#!/usr/bin/env python
"""Rotate the driver's 50-slot correctness window for a new round.

Policy (VERDICT r04 item 2, enforced by tests/test_driver_window.py):
slots 1-50 must be ORACLE-backed queries with no green driver record in
any committed CORRECTNESS_r0N.json — re-records and rows-only entries
waste slots while the certification backlog exists. This tool derives
the next window deterministically:

  1-50   never-driver-recorded oracle-backed queries, ordered by family
         (rel, dq, emb, sim, then the rest alphabetically) — the same
         priority the r05 rotation used;
  then   the remaining never-recorded oracle-backed backlog (next
         round's window, for visibility);
  then   never-recorded rows-only queries;
  then   previously recorded queries, least-recently-recorded first.

When fewer than 50 never-recorded oracle-backed queries remain (r07+),
the window naturally continues into the rows-only tail and then the
oldest re-records — the prefix of this ordering is always the best
possible spend of the slots (tests/test_driver_window.py pins the
no-wasted-slot invariant).

Run at ROUND START, after the driver commits the previous round's
CORRECTNESS record:

    python tools/rotate_driver_window.py          # preview
    python tools/rotate_driver_window.py --write  # rewrite registry.py

`--write` splices the regenerated literal list into
exact_spark/registry.py between the DRIVER_ORDER assignment and its
closing bracket; rerun pytest tests/test_driver_window.py to confirm.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_REPO = Path(__file__).resolve().parents[1]
_FAMILY_PRIORITY = ("rel_", "dq_", "emb_", "sim_", "ml_", "text_", "ts_", "dedup_")
# Queries whose RESULTS changed since their last driver record (code touched
# by the current round's fixes) — their stale certification is worthless, so
# they sort ahead of the plain least-recently-recorded rotation. Update this
# set each round; names not in the registry are ignored.
_FORCE_RERECORD: set[str] = {
    # r11: the eval-source ship exclusion (ADVICE r10) changes the release
    # manifest's schema/ship set, the funnel's rows (new stage + terminal
    # row measured from the shipped dataset), the dataset's doc set, the
    # token table's source set, and the attribution's schema — their r10
    # driver records certify superseded results, so they outrank the plain
    # least-recently-recorded rotation. The window-total rewrite (VERDICT
    # r10 item 3) changes NO values, only plans, so those queries are not
    # listed.
    "corpus_release_manifest",
    "corpus_release_funnel",
    "corpus_release_dataset",
    "corpus_release_tokens",
    "corpus_release_attribution",
}
# r10-safe: matches CORRECTNESS_r12.json, not CORRECTNESS_LOCAL_r05.json.
_RECORD_RE = re.compile(r"^CORRECTNESS_r(\d+)\.json$")


def build_order() -> tuple[list[str], dict]:
    from exact_spark.registry import REGISTRY, _load_all

    _load_all()
    recorded: set[str] = set()
    last_round: dict[str, int] = {}
    max_round = 0
    for p in sorted(_REPO.iterdir()):
        m = _RECORD_RE.match(p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for n in json.loads(p.read_text()):
            recorded.add(n)
            last_round[n] = max(last_round.get(n, 0), rnd)
    oracle = {n for n, s in REGISTRY.items() if s.sql is not None}
    never_oracle = sorted((set(REGISTRY) - recorded) & oracle)
    never_rows = sorted((set(REGISTRY) - recorded) - oracle)

    def fam_rank(n: str) -> tuple:
        for i, pref in enumerate(_FAMILY_PRIORITY):
            if n.startswith(pref):
                return (i, n)
        return (len(_FAMILY_PRIORITY), n)

    backlog = sorted(never_oracle, key=fam_rank)
    window, rest = backlog[:50], backlog[50:]
    prev = sorted(
        recorded & set(REGISTRY),
        key=lambda n: (0 if n in _FORCE_RERECORD else last_round[n], n),
    )
    order = window + rest + never_rows + prev
    assert len(order) == len(set(order)) == len(REGISTRY)
    stats = {
        "window": len(window),
        "backlog_after_window": len(rest),
        "never_rows_only": len(never_rows),
        "previously_recorded": len(prev),
        "window_round": max_round + 1,
    }
    return order, stats


def main() -> int:
    order, stats = build_order()
    print(json.dumps(stats))
    if "--write" not in sys.argv:
        for n in order[:50]:
            print(" ", n)
        print("  ... (--write to splice into registry.py)")
        return 0
    reg_path = _REPO / "exact_spark" / "registry.py"
    src = reg_path.read_text()
    src, n_subs = re.subn(
        r"DRIVER_WINDOW_ROUND: int = \d+",
        f"DRIVER_WINDOW_ROUND: int = {stats['window_round']}",
        src,
    )
    if n_subs != 1:
        raise SystemExit(
            f"DRIVER_WINDOW_ROUND line not found exactly once in registry.py "
            f"(matched {n_subs}) — refusing to write a stale round"
        )
    start = src.index("DRIVER_ORDER: list[str] = [")
    end = src.index("\n]", start) + len("\n]")
    body = "DRIVER_ORDER: list[str] = [\n"
    body += "    # --- window (slots 1-50): best available recording spend ---\n"
    for i, n in enumerate(order):
        if i == 50:
            body += "    # --- outside the window (rotates into it next round) ---\n"
        body += f'    "{n}",\n'
    body += "]"
    reg_path.write_text(src[:start] + body + src[end:])
    print(f"wrote {reg_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
