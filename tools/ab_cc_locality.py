#!/usr/bin/env python
"""A/B the connected-components pre-contraction locality variants.

Round-12 verdict ask #5: the r12 partition-local contraction made the CC
loop cross-partition-hop-limited, so the remaining lever is co-locating
likely-same-component edges BEFORE round 1. Variants (see
connected_components in operators/dedup.py):

- local      — shipped r12: one contraction on the existing layout
- two_level  — contract, repartition the shrunk star edges by node,
               contract again (merges the per-partition stars of a node
               whose edges were scattered); exchanges star edges only
- range      — hash-repartition the FULL pair list by min endpoint, then
               contract (the verdict's literal suggestion); exchanges
               the corpus-scale edge list

Discipline (same as SCALING_r12): N interleaved runs per variant, both
orders, identical-output check across variants, loop round counts
recorded. Ship only a variant that wins on the settled comparison; floor
ratchets stay governed by tools/floor_medians.py regardless.

Usage: python tools/ab_cc_locality.py [key ...]  (default: the two CC keys)
Writes one JSON line per (key, variant) with runs, median, rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mapreduce_6_824_lab1_spark import QUERIES  # noqa: E402
from mapreduce_6_824_lab1_spark.operators import dedup  # noqa: E402
from mapreduce_6_824_lab1_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = ["similarity_knn_clusters", "dedup_clusters"]
VARIANTS = ["local", "two_level", "range"]
RUNS = 3  # per order; 2 orders -> 6 timed runs per variant


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-cc-locality")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's two warms: JVM machinery + Arrow/Python lane
    from pyspark.sql import functions as F  # noqa: PLC0415

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    bench.materialize(
        nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("c"))
    )

    def _warm_pandas(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    bench.materialize(
        nation.select("n_nationkey").mapInPandas(_warm_pandas, "n long")
    )

    for key in keys:
        fn = QUERIES[key]

        def run(variant: str) -> tuple[float, int]:
            os.environ["SPARK_GRAFT_CC_CONTRACTION"] = variant
            try:
                t0 = time.perf_counter()
                bench.materialize(fn(spark, sf_dir))
                return (
                    round(time.perf_counter() - t0, 3),
                    dedup._LAST_CC_ROUNDS,
                )
            finally:
                os.environ.pop("SPARK_GRAFT_CC_CONTRACTION", None)

        # output-identity check first (also warms the key's own lineage)
        fingerprints = {}
        for v in VARIANTS:
            os.environ["SPARK_GRAFT_CC_CONTRACTION"] = v
            try:
                rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
            finally:
                os.environ.pop("SPARK_GRAFT_CC_CONTRACTION", None)
            fingerprints[v] = rows
        base = fingerprints[VARIANTS[0]]
        mismatch = [v for v in VARIANTS[1:] if fingerprints[v] != base]
        if mismatch:
            print(json.dumps({"key": key, "OUTPUT_MISMATCH": mismatch}))
            continue

        times: dict[str, list[float]] = {v: [] for v in VARIANTS}
        rounds: dict[str, list[int]] = {v: [] for v in VARIANTS}
        order = VARIANTS * RUNS + VARIANTS[::-1] * RUNS
        for v in order:
            t, r = run(v)
            times[v].append(t)
            rounds[v].append(r)
        membw = bench._membw_probe_gbps()
        for v in VARIANTS:
            ts = sorted(times[v])
            print(
                json.dumps(
                    {
                        "key": key,
                        "variant": v,
                        "runs": times[v],
                        "median": ts[len(ts) // 2],
                        "cc_rounds": rounds[v],
                        "outputs_identical": True,
                        "membw_gbps": membw,
                    }
                ),
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
