"""A/B: CC contraction task-count bound (round 14 optimization pass).

The partition-local union-find pre-pass of ``connected_components`` ran
on the producer's corpus-grain layout. Its cost is per-TASK, not
per-row: measured on the sf0.1 kNN edge list (6,000 pairs over 32
partitions), each Python task costs ~0.3 s of worker CPU of which the
union-find itself is 9 ms — so the two_level pre-pass (32 + 4 tasks)
burned ~11.7 s of pool CPU per run and spawned ~30 workers into a fresh
pool. The shipped change coalesces the persisted pair blocks to
max(loop grain, ~50k pairs/task) before contracting — a narrow
dependency, no shuffle, and a no-op for corpora whose layout is already
coarser than that bound (the at-scale case, so the r12 memory bound per
worker is preserved).

Protocol: the old loop body (no coalesce) is reproduced here verbatim
from the module's own internals; arms interleaved in both orders in ONE
session, >= 3 runs per arm, identity pinned by sorted-row compare, and
each run bracketed by the bench worker census so the pool-CPU claim is
measured, not asserted.

Usage: python tools/ab_cc_coalesce.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _knn_pairs(spark):
    from mapreduce_6_824_lab1_spark.operators.similarity import (
        similarity_knn_graph,
    )

    return similarity_knn_graph(spark, SF_DIR).select(
        F.col("vec_id").alias("doc_a"), F.col("neighbor_id").alias("doc_b")
    )


def cc_old(spark):
    """Pre-r14 shipped loop body: contraction on the existing layout."""
    from mapreduce_6_824_lab1_spark.operators.dedup import (
        _cc_loop,
        _contract_partitions,
    )
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    pairs = _knn_pairs(spark).persist()
    try:
        n_pairs = pairs.count()
        loop_partitions = max(4, min(200, (2 * n_pairs) // 50_000))
        loop_pairs = _contract_partitions(
            _contract_partitions(pairs).repartition(loop_partitions, "doc_a")
        )
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": str(loop_partitions)}
        ):
            out = _cc_loop(loop_pairs, 50, loop_partitions)
            out = out.localCheckpoint(eager=True)  # force before unpersist
        return out
    finally:
        pairs.unpersist()


def cc_new(spark):
    """The shipped (coalesce-bounded) form via the public operator."""
    from mapreduce_6_824_lab1_spark.operators.dedup import (
        connected_components,
    )

    return connected_components(_knn_pairs(spark))


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    import bench
    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-cc-coalesce")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows_old = sorted(map(tuple, cc_old(spark).collect()))
    rows_new = sorted(map(tuple, cc_new(spark).collect()))
    assert rows_old == rows_new, (
        f"IDENTITY FAIL old {len(rows_old)} vs new {len(rows_new)}"
    )
    print(f"identity ok: {len(rows_new)} labels")

    arms = {"old": cc_old, "new": cc_new}
    times: dict[str, list[float]] = {"old": [], "new": []}
    cpus: dict[str, list[float]] = {"old": [], "new": []}
    order = []
    for i in range(runs):
        order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for arm in order:
        spark.sparkContext.setJobDescription(f"ab-cc-coalesce {arm}")
        w0 = bench._worker_census()
        t0 = time.perf_counter()
        mat(arms[arm](spark))
        sec = round(time.perf_counter() - t0, 3)
        delta = bench._census_delta(arm, sec, w0, bench._worker_census())
        times[arm].append(sec)
        if delta is not None:
            cpus[arm].append(delta["pool_cpu_s"])
    spark.sparkContext.setJobDescription(None)

    summary = {
        arm: {
            "times": times[arm],
            "median": sorted(times[arm])[len(times[arm]) // 2],
            "min": min(times[arm]),
            "pool_cpu_s": cpus[arm],
        }
        for arm in times
    }
    summary["ratio_median"] = round(
        summary["new"]["median"] / summary["old"]["median"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
