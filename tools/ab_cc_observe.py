"""A/B: CC convergence fingerprint — separate per-round action vs folded
into the checkpoint job via DataFrame.observe (round 15, VERDICT r14 ask
#6).

The CC loop materializes each round's labels with an eager
localCheckpoint and then ran a SECOND job (decimal label-sum + count) for
the convergence fingerprint: two eager jobs — two full cluster barriers
at 1000 executors — per round, plus two at seed time. CollectMetrics
(``DataFrame.observe``) computes the identical aggregates as a side
effect of the checkpoint job itself, with exactly-once semantics under
task retry, so the shipped loop now runs ONE eager job per round. The
overflow/empty NULL disambiguation guard is unchanged
(``_fingerprint_guard``).

Protocol: the old loop body (standalone ``_fingerprint`` actions) is
reproduced here verbatim; arms interleaved in both orders in ONE session,
>= 3 runs per arm on the sf0.1 kNN edge list, identity pinned by
sorted-row compare, and per-arm Spark JOB COUNTS recorded via the status
tracker so the barrier claim is measured, not asserted.

Usage: python tools/ab_cc_observe.py [--runs-per-arm 4]
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


def _cc_loop_old(pairs, max_rounds, loop_partitions):
    """Pre-r15 loop body: standalone _fingerprint action per round."""
    from mapreduce_6_824_lab1_spark.operators.dedup import _fingerprint

    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .repartition(loop_partitions, "doc_b")
        .persist()
    )
    seeded = (
        edges.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("nbr_min"))
        .select("doc_id", F.least("doc_id", "nbr_min").alias("label"))
    )
    seed_reps = seeded.select(
        F.col("doc_id").alias("rep_id"), F.col("label").alias("rep_label")
    )
    labels = (
        seeded.join(seed_reps, seeded["label"] == seed_reps["rep_id"])
        .select("doc_id", F.least("label", "rep_label").alias("label"))
        .localCheckpoint()
    )
    prev_sum = _fingerprint(labels)
    converged = False
    hopped = None
    try:
        for _round_no in range(1, max_rounds + 1):
            msgs = edges.join(
                labels, edges["doc_b"] == labels["doc_id"]
            ).select(edges["doc_a"].alias("doc_id"), "label")
            hopped = (
                msgs.unionByName(labels)
                .groupBy("doc_id")
                .agg(F.min("label").alias("hop_label"))
                .persist()
            )
            reps = hopped.select(
                F.col("doc_id").alias("rep_id"),
                F.col("hop_label").alias("rep_label"),
            )
            updated = (
                hopped.join(reps, hopped["hop_label"] == reps["rep_id"])
                .select(
                    "doc_id",
                    F.least("hop_label", "rep_label").alias("label"),
                )
                .localCheckpoint()
            )
            hopped.unpersist()
            hopped = None
            cur_sum = _fingerprint(updated)
            labels = updated
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    finally:
        if hopped is not None:
            hopped.unpersist()
        edges.unpersist()
    if not converged:
        raise RuntimeError("old-arm CC did not converge")
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


def _run_cc(spark, loop_fn):
    from mapreduce_6_824_lab1_spark.operators.dedup import (
        _contract_partitions,
    )
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    pairs = _knn_pairs(spark).persist()
    try:
        n_pairs = pairs.count()
        loop_partitions = max(4, min(200, (2 * n_pairs) // 50_000))
        n_layout = pairs.rdd.getNumPartitions()
        contract_parts = min(
            n_layout, max(loop_partitions, (n_pairs + 49_999) // 50_000)
        )
        cpairs = (
            pairs.coalesce(contract_parts)
            if contract_parts < n_layout
            else pairs
        )
        loop_pairs = _contract_partitions(
            _contract_partitions(cpairs).repartition(
                loop_partitions, "doc_a"
            )
        )
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": str(loop_partitions)}
        ):
            out = loop_fn(loop_pairs, 50, loop_partitions)
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        pairs.unpersist()


def cc_old(spark):
    return _run_cc(spark, _cc_loop_old)


def cc_new(spark):
    from mapreduce_6_824_lab1_spark.operators.dedup import _cc_loop

    return _run_cc(spark, _cc_loop)


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-cc-observe")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    rows_old = sorted(map(tuple, cc_old(spark).collect()))
    rows_new = sorted(map(tuple, cc_new(spark).collect()))
    assert rows_old == rows_new, (
        f"IDENTITY FAIL old {len(rows_old)} vs new {len(rows_new)}"
    )
    print(f"identity ok: {len(rows_new)} labels, shipped form matches")

    arms = {"old": cc_old, "new": cc_new}
    times: dict[str, list[float]] = {"old": [], "new": []}
    jobs: dict[str, list[int]] = {"old": [], "new": []}
    order = []
    for i in range(runs):
        order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for arm in order:
        spark.sparkContext.setJobDescription(f"ab-cc-observe {arm}")
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        arms[arm](spark)  # _run_cc eagerly checkpoints the result
        times[arm].append(round(time.perf_counter() - t0, 3))
        jobs[arm].append(len(tracker.getJobIdsForGroup(None) or []) - j0)
    spark.sparkContext.setJobDescription(None)

    summary = {
        arm: {
            "times": ts,
            "median": sorted(ts)[len(ts) // 2],
            "min": min(ts),
            "jobs": jobs[arm],
        }
        for arm, ts in times.items()
    }
    summary["ratio_median"] = round(
        summary["new"]["median"] / summary["old"]["median"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
