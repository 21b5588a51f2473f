"""Registry-wide physical-plan audit (round 14 optimization pass).

Builds every ``queries()`` key at a small SF and greps the executed plan
for the anti-patterns the optimization guide (§7.2) says to look for:

- SortAggregate           — hash-agg fallback (struct/string agg buffers);
                            expensive when the sorted rows carry text/arrays
- BatchEvalPython         — row-at-a-time Python in a query path
- ArrowEvalPython / MapInPandas / PythonMapInArrow — Python lanes
                            (legit where mandated; listed for review)
- CartesianProduct        — unbroadcast cross join
- SortMergeJoin           — listed (often correct; review build sides)

Output: one line per key with hits (clean keys print nothing unless
--all), then a summary. Keys whose builders run eager jobs (iterative
loops) still work — the sweep inspects whatever frame they return.

Usage: python tools/plan_sweep.py [--sf-dir /root/testdata/sf0.01] [--all]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKERS = (
    "SortAggregate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "CartesianProduct",
    "SortMergeJoin",
)


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    show_all = "--all" in sys.argv

    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="mr-spark-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    counts: Counter[str] = Counter()
    errors = 0
    for key in QUERIES:
        try:
            df = QUERIES[key](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must visit every key
            print(f"{key}: BUILD ERROR {type(exc).__name__}: {exc}")
            errors += 1
            continue
        hits = [m for m in MARKERS if m in plan]
        for m in hits:
            counts[m] += 1
        if hits or show_all:
            print(f"{key}: {', '.join(hits) if hits else 'clean'}")
    print(f"\nsummary over {len(QUERIES)} keys ({errors} build errors):")
    for m in MARKERS:
        print(f"  {m}: {counts[m]}")


if __name__ == "__main__":
    main()
