"""Relational operator surface over the star schema (SURVEY.md §2.C).

The reference has no relational layer — MapReduce expresses joins as
map-side tagging + reduce-side merge (MR paper §4) — so these are implemented
directly as declarative DataFrame plans and Catalyst owns the physical
strategy. Scale notes are attached per-query; the recurring ones:

- dims (region 5 rows, nation 25, supplier ≤1k·sf) are ALWAYS broadcast —
  no shuffle of the fact side for star joins;
- fact-fact joins shuffle on the join key; AQE splits skewed partitions;
- aggregations get automatic partial (map-side) aggregation;
- filters/projections sit directly on the parquet scan (pushdown + pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table, load_tables
from mapreduce_6_824_lab1_spark.functions.numeric import cents_sum, hround
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Projections / filters — σ+π with compound predicates. The whole predicate
# is pushable; .explain shows PushedFilters on the parquet scan and a
# two-column ReadSchema-driven projection.
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS disc_price,
       l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_returnflag IN ('A', 'N')
  AND l_quantity < 24
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & F.col("l_returnflag").isin("A", "N")
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            hround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "disc_price"
            ),
            "l_returnflag",
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_hash",
    oracle="""
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 100 + 0.5) / 100      AS sum_qty,
       CAST(sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
       CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_disc_price,
       floor((avg(l_quantity)) * 100 + 0.5) / 100      AS avg_qty,
       floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
       floor((avg(l_discount)) * 10000 + 0.5) / 10000      AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash agg with automatic partial aggregation.

    100 TB: 6 groups total — map-side partials collapse each scan partition
    to ≤6 rows before the shuffle; network traffic is O(partitions), not rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            hround(F.sum("l_quantity"), 2).alias("sum_qty"),
            # money sums via exact integer cents (functions/numeric.py
            # cents_sum): corpus-grain groups put double fold noise at
            # the cent digit — the round-12 sf10 finding on TPC-H q1.
            # sum_qty stays a double sum: integer-valued quantities sum
            # exactly below 2^53.
            cents_sum("l_extendedprice").alias("sum_base_price"),
            cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            hround(F.avg("l_quantity"), 2).alias("avg_qty"),
            hround(F.avg("l_extendedprice"), 2).alias("avg_price"),
            hround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       count(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood).

    100 TB: exact distinct on high-cardinality keys is a full shuffle of the
    distinct pairs; see ``agg_approx_distinct`` for the sketch-based scale
    path (HLL, mergeable, no second shuffle).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("agg_approx_distinct")  # no oracle: HLL sketch values are impl-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path.

    Sketches are mergeable → one pass, map-side partials, constant memory.
    Checked rows-only by the driver; the unit test asserts the estimate is
    within rsd bounds of the exact count.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT lang, source, count(*) AS n_docs,
       floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars,
       floor((sum(n_chars)) * 100 + 0.5) / 100 AS total_chars
FROM documents
GROUP BY ROLLUP (lang, source)
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (lang, source) — Catalyst Expand + single hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        hround(F.avg("n_chars"), 2).alias("avg_chars"),
        hround(F.sum("n_chars"), 2).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_equi",
    oracle="""
SELECT r_name, n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star equi-join: fact ⋈ dim ⋈ dim ⋈ dim.

    100 TB: customer/nation/region are broadcast (explicit hint on the two
    tiny dims; customer is sf-bounded — AQE demotes to shuffle join if it
    outgrows the threshold). The orders side never shuffles for the join.
    """
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "join_outer",
    oracle="""
SELECT c_custkey, c_mktsegment,
       count(o_orderkey) AS n_orders,
       floor((coalesce(sum(o_totalprice), 0.0)) * 100 + 0.5) / 100 AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count(col) skips nulls)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            hround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "join_full_outer",
    oracle="""
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS missing_customer,
       CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END AS missing_order,
       count(o.o_orderkey) AS n_orders
FROM (SELECT c_custkey FROM customer WHERE c_acctbal >= 5000) c
FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate <  TIMESTAMP '1998-01-01') o
  ON c.c_custkey = o.o_custkey
GROUP BY 1, 2, 3
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls arising on BOTH sides (high-balance
    customers × 1997 orders). Full outer cannot broadcast — always a
    shuffle join; at 100 TB both sides hash-partition once on the key."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].filter(F.col("c_acctbal") >= 5000).select("c_custkey")
    o = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_custkey", "o_orderkey")
    )
    j = c.join(o, F.col("c_custkey") == F.col("o_custkey"), "outer")
    return j.groupBy(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias(
            "missing_customer"
        ),
        F.when(F.col("o_custkey").isNull(), 1).otherwise(0).alias(
            "missing_order"
        ),
    ).agg(F.count("o_orderkey").alias("n_orders"))


@query(
    "join_semi_anti",
    oracle="""
SELECT c_custkey, 'has_orders' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti — join types MapReduce can't express without
    a full reduce-side merge; Spark short-circuits on first match."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cond = F.col("c_custkey") == F.col("o_custkey")
    semi = (
        t["customer"]
        .join(t["orders"], cond, "left_semi")
        .select("c_custkey", F.lit("has_orders").alias("tag"))
    )
    anti = (
        t["customer"]
        .join(t["orders"], cond, "left_anti")
        .select("c_custkey", F.lit("no_orders").alias("tag"))
    )
    return semi.unionAll(anti)


@query(
    "join_broadcast",
    oracle="""
SELECT r_name, count(*) AS n_suppliers, floor((sum(s_acctbal)) * 100 + 0.5) / 100 AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hints: zero shuffle on the probe side.

    The plan must show BroadcastHashJoin for both dims (asserted in tests) —
    at 100 TB this is the difference between a map-only stage and shuffling
    the full fact table twice.
    """
    t = load_tables(spark, sf_dir, ("supplier", "nation", "region"))
    return (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            hround(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


# Price bands for the theta/range join — literal on both sides by design.
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("budget", 0.0, 500.0),
    ("mid", 500.0, 1000.0),
    ("premium", 1000.0, 1500.0),
    ("luxury", 1500.0, 1e9),
]

_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)


@query(
    "join_theta_range",
    oracle=f"""
SELECT band, count(*) AS n_parts, floor((avg(p_retailprice)) * 100 + 0.5) / 100 AS avg_price
FROM part
JOIN (SELECT * FROM (VALUES {_BANDS_SQL}) AS b(band, lo, hi)) bands
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny band table.

    Physical plan: BroadcastNestedLoopJoin with the 4-row side broadcast —
    the correct shape for banding at any scale (never NLJ two big sides;
    if both sides were big you'd bucketize the range into equi-join keys).
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, ["band", "lo", "hi"])
    return (
        part.join(
            broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            hround(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


@query(
    "join_asof",
    oracle="""
WITH j AS (
    SELECT e.event_id, o.o_orderkey, o.o_orderdate
    FROM events e
    JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
),
m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id)
SELECT j.event_id, max(j.o_orderkey) AS o_orderkey,
       strftime(m.md, '%Y-%m-%d') AS order_day
FROM j JOIN m ON j.event_id = m.event_id AND j.o_orderdate = m.md
GROUP BY j.event_id, m.md
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest prior order of its user.

    Spark has no native ASOF; the pattern here is range-join + argmax
    aggregation: ``max(struct(o_orderdate, o_orderkey))`` picks the latest
    order with a deterministic o_orderkey tie-break, as a HASH aggregation
    with map-side partials — measurably faster than the equivalent
    row_number() window (which must sort every event's candidate set).
    100 TB: both sides hash-shuffle on the user key; partial aggregation
    collapses each event's candidates before the event_id shuffle. For
    dense per-key history, a union + last(ignorenulls) over a merged
    time-ordered stream avoids the intermediate join blow-up entirely.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    j = t["events"].join(
        t["orders"],
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )
    return (
        j.groupBy("event_id")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "event_id",
            F.col("m.o_orderkey").alias("o_orderkey"),
            F.date_format("m.o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    oracle="""
SELECT n_nationkey, c_custkey, floor((c_acctbal) * 100 + 0.5) / 100 AS acctbal, rn, rnk, drnk
FROM (
    SELECT n_nationkey, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS drnk
    FROM customer JOIN nation ON c_nationkey = n_nationkey
) t
WHERE rn <= 3
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: rank/row_number windows."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "n_nationkey",
            "c_custkey",
            hround("c_acctbal", 2).alias("acctbal"),
            "rn",
            "rnk",
            "drnk",
        )
    )


@query(
    "window_analytic",
    oracle="""
SELECT event_id, user_id,
       floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_total,
       floor((coalesce(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      -1.0)) * 100 + 0.5) / 100 AS prev_value,
       floor((coalesce(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      -1.0)) * 100 + 0.5) / 100 AS next_value
FROM events
""",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead with explicit frames, per user over time.

    100 TB: partitionBy(user_id) shuffles once; all three windows share the
    same (partition, order) spec so Catalyst computes them in ONE Window
    physical node — no extra sort or shuffle per function.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        hround(F.sum("value").over(frame), 2).alias("running_total"),
        hround(F.coalesce(F.lag("value").over(w), F.lit(-1.0)), 2).alias(
            "prev_value"
        ),
        hround(F.coalesce(F.lead("value").over(w), F.lit(-1.0)), 2).alias(
            "next_value"
        ),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.5) / 100 AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price. Physical: TakeOrderedAndProject — each
    partition keeps a k-heap, driver merges k·P rows. No global sort at any
    scale. Ties broken by o_orderkey (SURVEY.md §3.3)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            hround("o_totalprice", 2).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate <  TIMESTAMP '1996-01-01'),
     c96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate <  TIMESTAMP '1997-01-01')
SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
UNION ALL
SELECT 'only_1995' AS tag, o_custkey FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
UNION ALL
SELECT 'only_1996' AS tag, o_custkey FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over yearly active-customer key sets."""
    o = load_table(spark, sf_dir, "orders")

    def actives(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c95, c96 = actives(1995), actives(1996)
    return (
        c95.intersect(c96).select(F.lit("both").alias("tag"), "o_custkey")
        .unionAll(c95.exceptAll(c96).select(F.lit("only_1995").alias("tag"), "o_custkey"))
        .unionAll(c96.exceptAll(c95).select(F.lit("only_1996").alias("tag"), "o_custkey"))
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@query(
    "scalar_string_date",
    oracle="""
SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
       length(trim(o_orderpriority)) AS prio_len,
       year(o_orderdate)    AS o_year,
       month(o_orderdate)   AS o_month,
       quarter(o_orderdate) AS o_quarter,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
       floor((abs(o_totalprice - 100000.0)) * 100 + 0.5) / 100 AS abs_diff,
       floor((ln(o_totalprice + 1)) * 10000 + 0.5) / 10000 AS log_price
FROM orders
""",
)
def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar functions — all JVM built-ins, codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length(F.trim(F.col("o_orderpriority"))).cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        hround(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("abs_diff"),
        hround(F.log(F.col("o_totalprice") + 1), 4).alias("log_price"),
    )


@query(
    "scalar_json",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS cnt,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM events
GROUP BY k_bucket
""",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the string props column, then aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("bigint") % 10),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "scalar_array",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       floor((CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS first_val,
       floor((sqrt(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           'sum'))) * 1000000 + 0.5) / 1000000 AS l2_norm
FROM embeddings
""",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column.

    float32 values are cast to double BEFORE any arithmetic on BOTH sides so
    the fold is bit-identical between Spark and DuckDB (FIXTURES.md note).
    100 TB: transform/aggregate run inside codegen — no Python, no UDF.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        hround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        hround(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 6
        ).alias("l2_norm"),
    )


@query(
    "join_asof_merge",
    oracle="""
WITH j AS (
    SELECT e.event_id, o.o_orderkey, o.o_orderdate
    FROM events e
    JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
),
m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id)
SELECT j.event_id, max(j.o_orderkey) AS o_orderkey,
       strftime(m.md, '%Y-%m-%d') AS order_day
FROM j JOIN m ON j.event_id = m.event_id AND j.o_orderdate = m.md
GROUP BY j.event_id, m.md
""",
)
def join_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the merged-stream pattern — same semantics (and same
    oracle) as ``join_asof``, different physical shape.

    Union orders and events into one time-ordered stream per user, then
    ``last(order, ignorenulls)`` over an unbounded-preceding frame carries
    the latest order forward to each event row. No join ever materializes
    the (event × candidate-orders) blow-up: cost is one shuffle of
    |events| + |orders| rows and a per-user sort — the right shape when
    per-key order history is dense. Two independent formulations agreeing
    with one oracle is itself a correctness check.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    orders_side = t["orders"].select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),  # orders sort before events at equal t
        F.lit(None).cast("long").alias("event_id"),
        F.struct("o_orderdate", "o_orderkey").alias("ord"),
    )
    events_side = t["events"].select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None)
        .cast("struct<o_orderdate:timestamp,o_orderkey:bigint>")
        .alias("ord"),
    )
    merged = orders_side.unionByName(events_side)
    # within equal (t, is_event=0) the struct's (o_orderdate, o_orderkey)
    # ordering makes `last` pick the max orderkey deterministically
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_event", F.col("ord.o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "last_ord", F.last("ord", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("is_event") == 1) & F.col("last_ord").isNotNull())
        .select(
            "event_id",
            F.col("last_ord.o_orderkey").alias("o_orderkey"),
            F.date_format("last_ord.o_orderdate", "yyyy-MM-dd").alias(
                "order_day"
            ),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH probes AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
refs AS (
    SELECT event_id AS view_id, user_id, ts AS vts FROM events
    WHERE event_type = 'view'
),
j AS (
    SELECT p.event_id, p.ts, r.view_id, r.vts,
           abs(date_diff('microsecond', r.vts, p.ts)) AS dist_us,
           CASE WHEN r.vts <= p.ts THEN 0 ELSE 1 END AS fwd
    FROM probes p JOIN refs r ON p.user_id = r.user_id
),
rnk AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY event_id
               ORDER BY dist_us, fwd,
                        CASE WHEN fwd = 0 THEN -view_id ELSE view_id END)
               AS rn
    FROM j
)
SELECT event_id, view_id,
       CAST(dist_us AS BIGINT) AS dist_us,
       CASE WHEN fwd = 0 THEN 'backward' ELSE 'forward' END AS direction
FROM rnk WHERE rn = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: each purchase event matched to the
    CLOSEST view event of the same user in time, either direction (pandas
    ``merge_asof(direction='nearest')``; the attribution query every event
    pipeline runs). Ties at equal distance resolve backward; within a side
    the backward candidate takes the highest event_id at the nearest
    instant (carry order) and the forward one the lowest — the oracle
    mirrors that rule exactly. Probe/reference both come from ``events``
    so BOTH directions genuinely occur (the orders table is entirely in
    the past of every event, which would leave a forward path untested).

    Physical shape is the merged-stream pattern run in BOTH directions
    over ONE shuffle: union views+purchases per user, one sort, a backward
    ``last(ignorenulls)`` carry and a forward ``first(ignorenulls)`` carry
    sharing the same Window partitioning (the second window adds a frame,
    not an Exchange), then an arithmetic pick of the nearer side. No join
    materializes the probe x candidate blow-up - cost is one shuffle of
    |events| rows, the right shape for dense per-key history at 100 TB.
    Distances are exact integer MICROSECONDS on both engines, so the
    driver hash is exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    refs_side = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct(
            F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
        ).alias("ref"),
    )
    probes_side = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("struct<vts:timestamp,view_id:bigint>").alias("ref"),
    )
    merged = refs_side.unionByName(probes_side)
    # refs at the probe's exact instant sort first (is_probe 0 < 1) and are
    # therefore "backward" (vts <= ts), matching the oracle's CASE rule.
    order_cols = ("t", "is_probe", F.col("ref.view_id").asc_nulls_last())
    back_w = (
        Window.partitionBy("uid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy("uid")
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged.select(
        "is_probe",
        "event_id",
        "t",
        F.last("ref", ignorenulls=True).over(back_w).alias("back"),
        F.first("ref", ignorenulls=True).over(fwd_w).alias("fwd"),
    ).filter(
        (F.col("is_probe") == 1)
        & (F.col("back").isNotNull() | F.col("fwd").isNotNull())
    )
    dist_back = F.unix_micros("t") - F.unix_micros("back.vts")
    dist_fwd = F.unix_micros("fwd.vts") - F.unix_micros("t")
    take_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (dist_back <= dist_fwd)
    )
    pick = F.when(take_back, F.col("back")).otherwise(F.col("fwd"))
    dist = F.when(take_back, dist_back).otherwise(dist_fwd)
    return carried.select(
        "event_id",
        pick.getField("view_id").alias("view_id"),
        dist.cast("long").alias("dist_us"),
        F.when(take_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )
