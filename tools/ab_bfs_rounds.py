"""A/B: BFS per-hop barrier count (round 14).

graph_bfs_frontier's loop paid 3 eager jobs per hop (frontier
checkpoint, empty probe, re-checkpoint of the growing visited union).
The candidate keeps ``visited`` as a flat union of the per-hop
checkpointed frames — every leaf already materialized, so nothing
recomputes — and drops the third job. At 1000 executors each eager job
is a full cluster barrier, so BFS rounds go from 3 to 2 barriers each;
this measures whether the local wall agrees and pins output identity.

Protocol: both variants coded here verbatim (old = the pre-r14 shipped
form), interleaved in both orders in ONE session, >= 3 runs per arm,
identity checked by sorted-row compare against the shipped operator.

Usage: python tools/ab_bfs_rounds.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges_and_root(spark):
    from mapreduce_6_824_lab1_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    succ = docs.select(F.col("doc_id").alias("tid"), F.col("source").alias("dst"))
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
    return edges, root


def bfs_recheckpoint(spark):
    """The pre-r14 shipped loop: visited re-checkpointed every hop."""
    from mapreduce_6_824_lab1_spark.operators.graph import MAX_HOPS

    edges, root = _edges_and_root(spark)
    visited = root.select(
        "node", F.lit(0).cast("long").alias("hops")
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    try:
        for depth in range(1, MAX_HOPS + 1):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(
                nxt.select("node", F.lit(depth).cast("long").alias("hops"))
            ).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        edges.unpersist()
    return visited.select(F.col("node").alias("source"), "hops")


def bfs_flat_union(spark):
    """The r14 candidate — the form now shipped in operators/graph.py."""
    from mapreduce_6_824_lab1_spark.operators.graph import _bfs_impl

    return _bfs_impl(spark, SF_DIR)


def main() -> None:
    runs_per_arm = (
        int(sys.argv[sys.argv.index("--runs-per-arm") + 1])
        if "--runs-per-arm" in sys.argv
        else 4
    )
    from mapreduce_6_824_lab1_spark.session import get_spark, scoped_conf

    spark = get_spark(app_name="ab-bfs-rounds")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"recheckpoint": bfs_recheckpoint, "flat_union": bfs_flat_union}

    def run(name):
        with scoped_conf(spark, {"spark.sql.shuffle.partitions": "16"}):
            t = time.monotonic()
            variants[name](spark).write.format("noop").mode("overwrite").save()
            return round(time.monotonic() - t, 3)

    # identity first (also warms the JVM/codegen for both shapes)
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "16"}):
        a = sorted(map(tuple, bfs_recheckpoint(spark).collect()))
        b = sorted(map(tuple, bfs_flat_union(spark).collect()))
    ident = a == b
    print(f"  identity: {ident} ({len(a)} rows)", file=sys.stderr)

    order = []
    for i in range(runs_per_arm):
        order += (
            ["recheckpoint", "flat_union"]
            if i % 2 == 0
            else ["flat_union", "recheckpoint"]
        )
    times = {"recheckpoint": [], "flat_union": []}
    for arm in order:
        sec = run(arm)
        times[arm].append(sec)
        print(f"  {arm}: {sec}", file=sys.stderr)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    print(json.dumps({
        "identity_ok": ident,
        "runs": times,
        "median_recheckpoint": med(times["recheckpoint"]),
        "median_flat_union": med(times["flat_union"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
