#!/usr/bin/env python
"""Emit the SCALING ledger's session table from BENCH_SESSIONS.jsonl.

Round-13 verdict ask #2 wants the per-round SCALING table medians split
by the weather index; this generates the table mechanically (label,
steal, spot median, collapsed count, spot_clean, headline, trip count +
rulings summary) so the round ledger carries exactly what the records
say. Also prints the settled/spot-clean medians block floor_medians
computes, for pasting under the table.

Usage: python tools/session_table.py r14
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_guard import ledger_records  # noqa: E402


def main() -> int:
    prefix = sys.argv[1] if len(sys.argv) > 1 else ""
    rows = [
        r
        for r in ledger_records()
        if (r.get("label") or "").startswith(prefix)
    ]
    print(
        "| session | steal% | spot_med | collapsed | spot_clean | "
        "headline | trips (rule verdicts) |"
    )
    print("|---|---|---|---|---|---|---|")
    clean_totals = []
    for r in rows:
        w = (r.get("load") or {}).get("weather") or {}
        rulings = r.get("trip_rulings")
        if rulings is None:
            trips = "(pre-wiring)"
        elif not rulings:
            trips = "0 — guard-clean"
        else:
            counts: dict[str, int] = {}
            for t in rulings:
                counts[t["verdict"]] = counts.get(t["verdict"], 0) + 1
            trips = f"{len(rulings)}: " + ", ".join(
                f"{v}×{n}" for v, n in sorted(counts.items())
            )
        sc = w.get("spot_clean")
        print(
            f"| {r.get('label')} | {r['load'].get('steal_pct')} | "
            f"{w.get('spot_med_gbps', '—')} | "
            f"{w.get('spots_collapsed', '—')} | {sc} | "
            f"{r.get('value')} | {trips} |"
        )
        if sc and rulings == []:
            clean_totals.append(r["value"])
    if clean_totals:
        print(
            f"\nspot-clean guard-clean sessions: {len(clean_totals)}, "
            f"headline median {statistics.median(clean_totals):.3f} s"
        )
    else:
        print("\nno spot-clean guard-clean sessions with rulings yet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
