"""distributed_sort offsets-side probe (round 15, VERDICT r14 ask #5).

The key computes the global rank as bucket-local row_number + broadcast
per-bucket offsets; the offsets side re-scans lineitem (one RLE-encoded
l_shipdate column, map-side partial agg, ~84 shuffled rows). This probe
times the pieces in isolation (warm, noop sink, 5 reps).

Round-15 measurements (sf0.1, quiet host): full 0.651 s median / window
side 0.456 / offsets side 0.205 — the offsets job is ~0.2 s of which
nearly all is fixed job overhead at this SF.

MEASURED DEAD-END: every single-scan alternative examined loses —
(a) computing counts from the windowed frame makes the offsets subtree a
second consumer of the Window output; ReuseExchange covers only the
exchange, not the Window, so the full-data sort runs twice;
(b) a global rank() over (ORDER BY bucket) serializes the table through
one task — the exact thing the bucket decomposition exists to avoid;
(c) persisting the windowed frame to feed both consumers materializes
the FULL table to storage — at 100 TB that is far more I/O than
re-scanning one ~0.15%-of-table-bytes RLE column. The two-scan shape is
kept; the narrow re-scan is the cheapest source of per-bucket counts at
every scale.

Usage: python tools/probe_dsort_offsets.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SORT_KEYS = ("l_shipdate", "l_orderkey", "l_linenumber")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="probe-dsort-offsets")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    li = load_table(spark, SF_DIR, "lineitem")
    keys = [F.col(k) for k in SORT_KEYS]
    bucket = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias(
        "bucket"
    )
    bucketed = li.withColumn("bucket", bucket)
    w_local = Window.partitionBy("bucket").orderBy(*keys)
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )

    def offsets_df():
        return (
            bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
            )
            .select("bucket", "offset")
        )

    def full():
        noop(
            bucketed.withColumn("local_rn", F.row_number().over(w_local))
            .join(F.broadcast(offsets_df()), "bucket")
            .select(
                (F.col("offset") + F.col("local_rn")).alias("rn"),
                "l_orderkey",
                "l_linenumber",
                F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
            )
        )

    def window_only():
        noop(
            bucketed.withColumn("local_rn", F.row_number().over(w_local))
            .select(
                F.col("local_rn").alias("rn"),
                "l_orderkey",
                "l_linenumber",
                F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
            )
        )

    def offsets_only():
        noop(offsets_df())

    for label, fn in (
        ("full", full),
        ("window_only", window_only),
        ("offsets_only", offsets_only),
    ):
        fn()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(
            f"{label}: min {ts[0]:.3f} med {ts[len(ts) // 2]:.3f} "
            f"({reps} reps, warm)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
