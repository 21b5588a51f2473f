"""Distributed global prefix sums via bucket-local windows + offsets.

A running sum over a global order — ``sum(v) OVER (ORDER BY ...)`` — plans
a single-partition window: every row serializes through one task, the
classic 100 TB scale-killer. But prefix sums compose associatively across
any cut, so the standard decomposition (distributed_sort's rank trick,
generalized from counts to sums) is exact:

1. bucket rows by a quantization of the leading order key,
2. run the window WITHIN each bucket (shuffles by bucket, parallel),
3. add each bucket's starting value — the exclusive prefix over
   whole-bucket sums, a bucket-grain (dimension-sized) table that
   broadcasts.

Used by abc_classification (revenue cumsum over parts, which scale with
SF); events_max_concurrency/concurrency_sweep inlines the same shape at
sweep grain with an hour bucket. Property-tested against a sequential
cumsum on adversarial tie sets in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    value: str,
    order_cols: list[Column],
    bucket: Column,
    name: str = "running",
) -> DataFrame:
    """Inclusive prefix sum of ``value`` over the global ``order_cols``
    order, without a single-partition window over ``df``.

    Correctness requirements on ``bucket`` (the caller's contract):

    - monotone: rows earlier in the global order never land in a LATER
      bucket (ascending bucket order == global order across buckets);
    - tie-closed: order-equal rows share a bucket (automatic when the
      bucket is a function of the leading order key alone).

    Then bucket-local inclusive sums plus the exclusive prefix of
    whole-bucket sums equal the global running sum exactly ("exactly"
    holds for integral/decimal value columns, where Spark's sum() is
    exact; for floats the bucket cut changes accumulation order, so
    results match a serial cumsum only to float tolerance). The offsets
    window is bucket-grain — bounded when the bucket quantizes a bounded
    domain (cents width, hour, month); skewed buckets split via AQE.

    The running column keeps sum(value)'s own type (long for integral
    input, double/decimal preserved) — no silent truncation of
    fractional sums.
    """
    b = df.withColumn("__bkt", bucket)
    w_loc = (
        Window.partitionBy("__bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        b.groupBy("__bkt")
        .agg(F.sum(value).alias("__bsum"))
        .select(
            "__bkt",
            F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
        )
    )  # bucket-grain: the only unpartitioned window, dimension-sized
    return (
        b.withColumn("__loc", F.sum(value).over(w_loc))
        .join(F.broadcast(offsets), "__bkt")
        .withColumn(name, F.col("__off") + F.col("__loc"))
        .drop("__bkt", "__loc", "__off")
    )
