#!/usr/bin/env python
"""Merge N bench.py JSON outputs into the BASELINE.md per-query MAX
envelope table (three clean runs, conservative per-query max — see
BASELINE.md 'Recorded baseline' for the protocol rationale).

Usage: python tools/make_baseline_table.py run1.json run2.json ...
Prints the markdown table + summary line to stdout.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        print("usage: make_baseline_table.py run1.json [run2.json ...]")
        return 2
    totals = [r["value"] for r in runs]
    names = sorted({n for r in runs for n in r["queries"]})
    env = {n: max(r["queries"].get(n, 0.0) for r in runs) for n in names}
    for r in runs:
        if r.get("failures"):
            print("FAILURES:", r["failures"], file=sys.stderr)
            return 1
        missing = set(names) - set(r["queries"])
        if missing:
            print("missing in a run:", sorted(missing), file=sys.stderr)
            return 1
    print(
        f"suite totals: {' / '.join(f'{t:.1f}s' for t in totals)} over "
        f"{len(names)} queries; envelope sum {sum(env.values()):.1f}s"
    )
    print()
    print("| query | sec |")
    print("|---|---|")
    for n in names:
        print(f"| {n} | {env[n]:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
