#!/usr/bin/env python
"""A/B the MapState read lever (round-8 verdict ask #5).

``stream_type_counts_tws`` point-reads each touched map entry
(``getValue`` per event type per user per batch); SCALING_r08.md
estimated a single ``iterator()`` scan would cut ~40% of the protobuf
state traffic. This tool turns the estimate into a measurement: it runs
the IDENTICAL staged-slice harness (_run_type_counts) with the point-op
processor and the iterator-read variant, alternating A/B/A/B to cancel
warm-up drift, verifies both produce identical results, and prints one
JSON line per run plus the medians.

    python tools/ab_mapstate_iterator.py [sf_dir] [reps]

Defaults: sf_dir=/root/repo/scaled_data/sf1, reps=2 (per variant).
Results are recorded in SCALING_r09.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_6_824_lab1_spark.session import get_spark  # noqa: E402
from mapreduce_6_824_lab1_spark.streaming.stateful import (  # noqa: E402
    _TypeCountIterProcessor,
    _TypeCountProcessor,
    _run_type_counts,
)

VARIANTS = {
    "point_getValue": _TypeCountProcessor,
    "iterator_scan": _TypeCountIterProcessor,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaled_data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="ab-mapstate-iterator")
    timings: dict[str, list[float]] = {k: [] for k in VARIANTS}
    contents: dict[str, frozenset] = {}
    for rep in range(reps):
        for name, cls in VARIANTS.items():
            t0 = time.monotonic()
            out = _run_type_counts(spark, sf_dir, cls())
            rows = frozenset(tuple(r) for r in out.collect())
            dt = time.monotonic() - t0
            timings[name].append(dt)
            # row-LEVEL equality across every run of every variant —
            # an aggregate checksum could be fooled by compensating
            # per-(user,type) errors (self-review round 9)
            prev = contents.setdefault(name, rows)
            assert rows == prev, f"{name} drifted between reps"
            print(
                json.dumps(
                    {
                        "variant": name,
                        "rep": rep,
                        "sec": round(dt, 3),
                        "rows": len(rows),
                    }
                ),
                flush=True,
            )
    assert contents["point_getValue"] == contents["iterator_scan"], (
        "variants disagree at row level"
    )
    med = {k: statistics.median(v) for k, v in timings.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "median_sec": {k: round(v, 3) for k, v in med.items()},
                "iterator_vs_point": round(
                    med["iterator_scan"] / med["point_getValue"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
