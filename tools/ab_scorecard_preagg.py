"""A/B: supplier_scorecard — supplier join below vs above the first
aggregation (round 15 optimization pass, VERDICT r14 ask #7).

Shipped (old) form: lineitem ⋈ orders ⋈ supplier, then ONE groupBy(s_name)
with the exact count_distinct(l_partkey). Spark's single-distinct rewrite
already pre-aggregates map-side at (s_name, l_partkey) grain, so locally
(supplier auto-broadcast) the plan is already lean. But under the CLUSTER
profile (autoBroadcastJoinThreshold=-1 — supplier is SF-scaled and too big
to broadcast at 100 TB) the supplier join sits BELOW the aggregate, so the
full joined fact re-exchanges by l_suppkey before any aggregation
(plans/r15/supplier_scorecard_cluster_profile.txt, Exchange (11)).

Candidate (new) form: pre-aggregate the fact join to (l_suppkey,
l_partkey) grain first, join supplier on PAIR-GRAIN rows, then the exact
name-grain aggregate (count_distinct(l_partkey) still computed exactly,
so duplicate supplier names — impossible in the fixture but allowed by
the schema — still dedup parts across suppkeys).

MEASURED DEAD-END (round 15) — the candidate is NOT shipped. Interleaved
medians, this tool: sf0.1 local 1.26x slower / cluster 1.11x; sf1 local
1.19x / cluster 1.20x — slower in every cell. Mechanism: distinct
(l_suppkey, l_partkey) pairs ~= fact rows PER MAP TASK (6M rows vs 800k
pairs at sf1 means each ~190k-row task sees ~180k distinct pairs), so the
map-side partial aggregate collapses almost nothing — the pair-grain
exchange ships nearly the fact's row count — and the exact name-grain
distinct then pays a SECOND pair-grain exchange that the shipped form's
single-distinct rewrite gets for free below its one fact exchange. The
same per-task-cardinality argument holds at 100 TB (pairs/task ~ rows/task
whenever total pairs >> rows per task), so the shipped join-below-
aggregate shape is kept.

Protocol: both arms in ONE session, interleaved both orders, >= 4 runs per
arm, in BOTH profiles (default auto-broadcast; cluster profile with
autoBroadcastJoinThreshold=-1 toggled via runtime conf). Identity pinned
by sorted-row compare against the shipped operator in both profiles.

Usage: python tools/ab_scorecard_preagg.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scorecard_old(spark):
    """The shipped form (supplier join below the one exact aggregate)."""
    from mapreduce_6_824_lab1_spark import QUERIES

    return QUERIES["supplier_scorecard"](spark, SF_DIR)


def scorecard_new(spark):
    """The rejected candidate: pair-grain pre-aggregate above the
    supplier join (coded verbatim — it is NOT in the operator module)."""
    from mapreduce_6_824_lab1_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    pre = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents"),
            F.expr("count_if(l_returnflag = 'R')").alias("returns"),
            F.expr(
                "sum(CAST(datediff(l_shipdate, o_orderdate) AS BIGINT))"
            ).alias("lag_sum"),
        )
    )
    return (
        pre.join(s, pre.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(
            F.sum("cnt").cast("long").alias("n_lineitems"),
            F.count_distinct("l_partkey").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.expr(
                "(CAST(sum(returns) AS DECIMAL(38,0)) * 1000000)"
                " div sum(cnt)"
            ).alias("return_ppm"),
            F.expr(
                "CAST(sum(lag_sum) div sum(cnt) AS BIGINT)"
            ).alias("avg_ship_lag_days"),
        )
    )


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-scorecard-preagg")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    summary: dict = {}
    for profile, thresh in (("local", None), ("cluster", "-1")):
        if thresh is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

        rows_old = sorted(map(tuple, scorecard_old(spark).collect()))
        rows_new = sorted(map(tuple, scorecard_new(spark).collect()))
        assert rows_old == rows_new, (
            f"IDENTITY FAIL [{profile}] old {len(rows_old)} vs new "
            f"{len(rows_new)}"
        )
        print(f"identity ok [{profile}]: {len(rows_new)} supplier rows")

        times: dict[str, list[float]] = {"old": [], "new": []}
        arms = {"old": scorecard_old, "new": scorecard_new}
        order = []
        for i in range(runs):
            order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
        for arm in order:
            spark.sparkContext.setJobDescription(
                f"ab-scorecard {profile} {arm}"
            )
            t0 = time.perf_counter()
            mat(arms[arm](spark))
            times[arm].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)

        summary[profile] = {
            arm: {
                "times": ts,
                "median": sorted(ts)[len(ts) // 2],
                "min": min(ts),
            }
            for arm, ts in times.items()
        }
        summary[profile]["ratio_median"] = round(
            summary[profile]["new"]["median"]
            / summary[profile]["old"]["median"],
            3,
        )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
