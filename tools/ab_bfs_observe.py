"""A/B: BFS empty-frontier probe folded into the hop checkpoint job
(round 15 — the follow-on to round 14's 3 -> 2 barrier cut).

graph_bfs_frontier paid 2 eager jobs per hop: the frontier
localCheckpoint and a separate ``isEmpty()`` probe for the early-exit
test. The shipped form observes ``count(1)`` on the frontier frame via
CollectMetrics, so the row count rides the checkpoint job and the probe
job disappears: ONE eager job — one cluster barrier — per BFS hop.
``count == 0`` is exactly the predicate isEmpty() evaluated, and observe
metrics are exactly-once per successful job under task retry.

Protocol: both variants coded here verbatim (old = the r14 shipped
2-job form), interleaved in both orders in ONE session, >= 3 runs per
arm, per-run Spark JOB COUNTS from the status tracker, identity checked
by sorted-row compare against the shipped operator.

Usage: python tools/ab_bfs_observe.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges_and_hop0(spark):
    from mapreduce_6_824_lab1_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    succ = docs.select(
        F.col("doc_id").alias("tid"), F.col("source").alias("dst")
    )
    edges = (
        docs.select(
            (F.col("doc_id") + F.col("n_chars") % 7 + 1).alias("target_id"),
            F.col("source").alias("src"),
        )
        .join(succ, F.col("target_id") == F.col("tid"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    root = docs.agg(F.min("source").alias("node"))
    hop0 = root.select(
        "node", F.lit(0).cast("long").alias("hops")
    ).localCheckpoint(eager=True)
    return edges, hop0


def bfs_isempty_probe(spark):
    """The r14 shipped loop: separate isEmpty job per hop."""
    from mapreduce_6_824_lab1_spark.operators.graph import MAX_HOPS
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "16"}):
        edges, hop0 = _edges_and_hop0(spark)
        hop_frames = [hop0]
        visited_nodes = hop0.select("node")
        frontier = hop0.select("node")
        try:
            for depth in range(1, MAX_HOPS + 1):
                nxt = (
                    frontier.join(edges, frontier["node"] == edges["src"])
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .join(visited_nodes, "node", "left_anti")
                    .localCheckpoint(eager=True)
                )
                if nxt.isEmpty():
                    break
                hop_frames.append(
                    nxt.select(
                        "node", F.lit(depth).cast("long").alias("hops")
                    )
                )
                visited_nodes = visited_nodes.unionByName(nxt)
                frontier = nxt
        finally:
            edges.unpersist()
        visited = hop_frames[0]
        for f in hop_frames[1:]:
            visited = visited.unionByName(f)
        return visited.select(F.col("node").alias("source"), "hops")


def bfs_observed_count(spark):
    """The shipped (round 15) operator."""
    from mapreduce_6_824_lab1_spark.operators.graph import (
        graph_bfs_frontier,
    )

    return graph_bfs_frontier(spark, SF_DIR)


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-bfs-observe")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    rows_old = sorted(map(tuple, bfs_isempty_probe(spark).collect()))
    rows_new = sorted(map(tuple, bfs_observed_count(spark).collect()))
    assert rows_old == rows_new, (
        f"IDENTITY FAIL old {len(rows_old)} vs new {len(rows_new)}"
    )
    print(f"identity ok: {len(rows_new)} (source, hops) rows")

    arms = {"old": bfs_isempty_probe, "new": bfs_observed_count}
    times: dict[str, list[float]] = {"old": [], "new": []}
    jobs: dict[str, list[int]] = {"old": [], "new": []}

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    order = []
    for i in range(runs):
        order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for arm in order:
        spark.sparkContext.setJobDescription(f"ab-bfs-observe {arm}")
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        mat(arms[arm](spark))
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
