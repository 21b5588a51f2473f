"""Operational / planning analytics: cross-table data-quality
expectations, range-partitioner boundary planning, OHLC downsampling.

Reference scope: the reference checkout carries no equivalents (it is the
MIT 6.824 MapReduce lab scaffold); these are the driver-mandated pipeline
extensions (SURVEY.md §2.C lineage) a production ingest needs before any
query in the rest of the registry can be trusted or scheduled:

- expectations: every constraint is a conditional count folded into one
  of TWO fact-table scans (orders once — its FK join is made 1:1 via a
  distinct dimension key, so single-table rules ride the join aggregate
  — and lineitem once) — never one job per rule.
- range bounds: the exact version of what Spark's RangePartitioner
  samples for. Value-grain compaction first (one hash shuffle), then the
  distributed_sort bucket+offset trick for cumulative counts — no
  single-partition window over fact-grain data anywhere.
- OHLC: open/close are min/max over a (ts, id, value) struct — algebraic
  aggregates, so the whole candle build is one partial-agg shuffle; the
  textbook row_number() formulation needs a full sort per key first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Data-quality expectations — Deequ-style constraint audit, fused per scan
# ---------------------------------------------------------------------------

EXPECTATIONS_ORACLE = """
WITH o AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
               AS null_custkey,
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
               AS orphans
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
),
lo AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
               AS orphans,
           CAST(count(*) FILTER (WHERE o.o_orderkey IS NOT NULL
                                   AND l.l_shipdate < o.o_orderdate)
                AS BIGINT) AS ship_before_order,
           CAST(count(*) FILTER (WHERE l.l_quantity <= 0) AS BIGINT)
               AS bad_qty,
           CAST(count(*) FILTER (WHERE l.l_discount < 0
                                    OR l.l_discount > 0.1) AS BIGINT)
               AS bad_discount
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT constraint_name, n_checked, n_violations,
       n_violations = 0 AS passed
FROM (
    SELECT 'orders_pk_unique' AS constraint_name, n AS n_checked,
           dup_pk AS n_violations FROM o
    UNION ALL SELECT 'orders_custkey_not_null', n, null_custkey FROM o
    UNION ALL SELECT 'orders_fk_customer', n, orphans FROM o
    UNION ALL SELECT 'lineitem_fk_orders', n, orphans FROM lo
    UNION ALL SELECT 'lineitem_ship_after_order', n, ship_before_order FROM lo
    UNION ALL SELECT 'lineitem_quantity_positive', n, bad_qty FROM lo
    UNION ALL SELECT 'lineitem_discount_domain', n, bad_discount FROM lo
) t
"""


def _tall(wide: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """1-row wide metrics frame -> (constraint_name, n_checked, n_violations)
    rows via ``inline`` — pure map-side expansion of an already-aggregated
    single row, so adding rules never adds jobs."""
    return wide.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint_name"),
                        F.col("n").alias("n_checked"),
                        F.col(col).alias("n_violations"),
                    )
                    for name, col in rules
                ]
            )
        )
    )


@query("table_expectations", oracle=EXPECTATIONS_ORACLE)
def table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table data-quality expectation audit (the Deequ pattern):
    PK uniqueness, NOT NULL, two referential-integrity rules, and three
    domain rules, reported as a tall (constraint, checked, violations,
    passed) table.

    Scale design: rules are FUSED per fact-table SCAN — the FK probe
    side is first reduced to DISTINCT keys, which makes the left join
    provably 1:1, so the single-table orders rules (PK uniqueness, NOT
    NULL) ride the SAME aggregate as the FK orphan count over ONE orders
    scan (round-10: previously a separate bare-orders job — the fusion
    cut 3 jobs to 2 and halves the orders I/O, which at 100 TB is a full
    fact-table pass saved; the distinct() on the dimension is
    key-grain, costs one small shuffle, and also makes n_checked robust
    to a dup-keyed dimension instead of silently inflating). The
    lineitem→orders join carries the FK rule plus three domain rules in
    one aggregate — it joins on the PK side and needs o_orderdate, so it
    stays a plain left join. 7 rules = 2 fact scans + 1 dimension
    distinct, and the ratio holds at 100 TB because adding a rule on a
    covered table adds a column, not a pass. Complements table_profile
    (per-column single-table profiling, curation.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    cust_keys = customer.select("c_custkey").distinct()
    o = (
        orders.join(
            cust_keys, orders.o_custkey == cust_keys.c_custkey, "left"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
            .cast("long")
            .alias("dup_pk"),
            F.count_if(F.col("o_custkey").isNull()).alias("null_custkey"),
            F.count_if(F.col("c_custkey").isNull()).alias("orphans"),
        )
    )
    lo = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("o_orderkey").isNull()).alias("orphans"),
            F.count_if(
                F.col("o_orderkey").isNotNull()
                & (F.col("l_shipdate") < F.col("o_orderdate"))
            ).alias("ship_before_order"),
            F.count_if(F.col("l_quantity") <= 0).alias("bad_qty"),
            F.count_if(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
            ).alias("bad_discount"),
        )
    )

    tall = (
        _tall(
            o,
            [
                ("orders_pk_unique", "dup_pk"),
                ("orders_custkey_not_null", "null_custkey"),
                ("orders_fk_customer", "orphans"),
            ],
        )
        .unionByName(
            _tall(
                lo,
                [
                    ("lineitem_fk_orders", "orphans"),
                    ("lineitem_ship_after_order", "ship_before_order"),
                    ("lineitem_quantity_positive", "bad_qty"),
                    ("lineitem_discount_domain", "bad_discount"),
                ],
            )
        )
    )
    return tall.withColumn("passed", F.col("n_violations") == 0)


# ---------------------------------------------------------------------------
# Range-partitioner boundary planning — exact balanced splits
# ---------------------------------------------------------------------------

_RB_K = 8  # target partition count
_RB_BUCKET = 100_000  # $1000 coarse buckets over extendedprice cents

RANGE_BOUNDS_ORACLE = f"""
WITH v AS (
    SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY 1
),
cum AS (
    SELECT cents,
           CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum_rows
    FROM v
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
tgt AS (
    SELECT CAST(i AS BIGINT) AS bucket_id,
           (i * n + {_RB_K - 1}) // {_RB_K} AS target_rows
    FROM generate_series(1, {_RB_K - 1}) AS gs(i), tot
)
SELECT t.bucket_id, t.target_rows,
       CAST(min(c.cents) AS BIGINT) AS split_cents,
       CAST(min(c.cum_rows) AS BIGINT) AS rows_le_split
FROM tgt t JOIN cum c ON c.cum_rows >= t.target_rows
GROUP BY t.bucket_id, t.target_rows
"""


@query("partition_range_bounds", oracle=RANGE_BOUNDS_ORACLE)
def partition_range_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact balanced range-partition boundaries for lineitem ordered by
    extendedprice — the planning step behind ``repartitionByRange`` /
    RangePartitioner, computed exactly instead of by reservoir sampling.
    Split i is the smallest value whose cumulative row count reaches
    ceil(i·N/k).

    Scale shape (the same trick distributed_sort pins): compact to value
    grain with one hash aggregate, then cumulative counts WITHOUT a
    single-partition window — a windowed local cumsum per coarse value
    bucket plus a broadcast per-bucket offset join (bucket table is
    ~100 rows). The k−1 targets are a broadcast literal join against the
    value-grain table, then an argmin struct-fold. No sort or window ever
    touches fact-grain data, so the plan survives 100 TB where the naive
    ``row_number() OVER (ORDER BY price)`` collapses to one task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    v = (
        li.select(cents.alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bkt", F.expr(f"cents div {_RB_BUCKET}"))
    )
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = v.withColumn("local_cum", F.sum("cnt").over(wloc))
    btot = v.groupBy("bkt").agg(F.sum("cnt").alias("bkt_rows"))
    woff = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # dimension-sized: ~100 coarse buckets, same shape as distributed_sort
    offsets = btot.select(
        "bkt", F.coalesce(F.sum("bkt_rows").over(woff), F.lit(0)).alias("off")
    )
    cum = local.join(broadcast(offsets), "bkt").select(
        "cents", (F.col("local_cum") + F.col("off")).alias("cum_rows")
    )

    tot = li.agg(F.count(F.lit(1)).alias("n"))
    tgt = (
        spark.range(1, _RB_K)
        .select(F.col("id").alias("bucket_id"))
        .crossJoin(broadcast(tot))
        .select(
            "bucket_id",
            F.expr(f"(bucket_id * n + {_RB_K - 1}) div {_RB_K}").alias(
                "target_rows"
            ),
        )
    )
    hit = cum.join(
        broadcast(tgt), F.col("cum_rows") >= F.col("target_rows")
    )
    return hit.groupBy("bucket_id", "target_rows").agg(
        F.min("cents").alias("split_cents"),
        F.min("cum_rows").alias("rows_le_split"),
    )


# ---------------------------------------------------------------------------
# OHLC candle downsampling — one partial-agg shuffle, no per-key sort
# ---------------------------------------------------------------------------

OHLC_ORACLE = """
WITH e AS (
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           event_type, ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT *,
           row_number() OVER (PARTITION BY week, event_type
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY week, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM e
)
SELECT week, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(min(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(sum(cents) AS BIGINT) AS volume_cents
FROM r GROUP BY week, event_type
"""


@query("timeseries_ohlc", oracle=OHLC_ORACLE)
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC candles per event type: open/close are the values at
    the first/last (ts, event_id) of the window, high/low/volume the
    min/max/sum of integer cents.

    Open and close are min/max over a (ts, event_id, cents) STRUCT —
    lexicographic struct comparison makes first/last-by-time an ALGEBRAIC
    aggregate (partial-merge exact, deterministic because event_id is
    unique). Struct min/max can't live in a hash-agg buffer, so Spark
    plans a SortAggregate — still ONE exchange carrying six partials per
    group (map-side combine), where the textbook row_number formulation
    (what the oracle spells) shuffles EVERY raw row to its window
    partition before any reduction: at 100 TB the struct fold's shuffle
    is group-grain, the window's is fact-grain. sum() stays on
    pre-quantized BIGINT cents (house vector rule); the one-exchange /
    no-Window shape is pinned in test_plans.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return e.groupBy("week", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("ts", "event_id", "cents"))
        .getField("cents")
        .alias("open_cents"),
        F.max(F.struct("ts", "event_id", "cents"))
        .getField("cents")
        .alias("close_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.sum("cents").cast("long").alias("volume_cents"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence test — event type vs weekday
# ---------------------------------------------------------------------------

CHI2_ORACLE = """
WITH obs AS (
    SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type, weekday, n_obs,
           CAST(sum(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
           CAST(sum(n_obs) OVER (PARTITION BY weekday) AS BIGINT) AS ct,
           CAST(sum(n_obs) OVER () AS BIGINT) AS n
    FROM obs
)
SELECT event_type, weekday, n_obs,
       CAST(floor((CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000
                  + 0.5) AS BIGINT) AS expected_micro,
       CAST(floor(((CAST(n_obs AS DOUBLE)
                    - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(n_obs AS DOUBLE)
                      - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS contrib_micro
FROM m
"""


@query("events_chi_square", oracle=CHI2_ORACLE)
def events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type × weekday: per-cell
    observed counts, expected counts under independence, and the χ²
    contribution — sum(contrib)/1e6 is the statistic, dof =
    (|types|−1)(6). The A/B sibling of events_ab_ztest for >2 categories.

    Scale shape: ONE fact-grain hash aggregate builds the contingency
    table; every marginal (row/column/grand totals) is a window over that
    |types|×7-row table, so the statistic costs one shuffle regardless of
    event count. Expected/contrib are pinned-shape IEEE expressions
    (identical operation sequence both engines) quantized to integer
    micro-units, the house rule for hash-exact floats. rt·ct stays in
    BIGINT (≤ n², overflow-safe until n ≈ 3·10⁹ cells — salt the product
    into DOUBLE first beyond that, documented not needed at fixture
    scales).
    """
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select("event_type", F.weekday("ts").cast("long").alias("weekday"))
        .groupBy("event_type", "weekday")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    rt = F.sum("n_obs").over(Window.partitionBy("event_type")).cast("long")
    ct = F.sum("n_obs").over(Window.partitionBy("weekday")).cast("long")
    # dimension-sized global window: |types|x7 rows, same shape family as
    # partition_range_bounds' bucket-offset table
    n = F.sum("n_obs").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ).cast("long")
    m = obs.select("event_type", "weekday", "n_obs", rt.alias("rt"),
                   ct.alias("ct"), n.alias("n"))
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast(
        "double"
    )
    diff = F.col("n_obs").cast("double") - exp
    return m.select(
        "event_type",
        "weekday",
        "n_obs",
        F.floor(exp * 1000000 + F.lit(0.5)).cast("long").alias(
            "expected_micro"
        ),
        F.floor((diff * diff / exp) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("contrib_micro"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — fraud/quality screening on amounts
# ---------------------------------------------------------------------------

import math as _math

_BENFORD_PPM = {
    str(d): int(_math.floor(_math.log10(1 + 1 / d) * 1_000_000 + 0.5))
    for d in range(1, 10)
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
) + " END"

BENFORD_ORACLE = f"""
WITH d AS (
    SELECT substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS digit
    FROM orders
),
obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM d GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
SELECT digit, n_orders,
       CAST((CAST(n_orders AS HUGEINT) * 1000000) // n AS BIGINT) AS observed_ppm,
       CAST({_BENFORD_CASE_SQL} AS BIGINT) AS benford_ppm
FROM obs, tot
"""


@query("stats_benford_digits", oracle=BENFORD_ORACLE)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts: observed
    first-significant-digit frequencies (integer ppm) next to the Benford
    expectation log10(1+1/d) — the classic screen for fabricated or
    truncated monetary data.

    The first digit comes from the STRING form of exact integer cents
    (never log10 on the engine — libm digits differ across JVMs/libcs),
    and the Benford expectations are Python-computed integer literals
    baked into both query and oracle, so no float ever crosses an engine
    boundary. One fact aggregate over ≤9 groups + a broadcast grand
    total; map-side combine makes the shuffle 9 rows per task at any
    scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    d = orders.select(
        F.substring(cents.cast("string"), 1, 1).alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = orders.agg(F.count(F.lit(1)).alias("n"))
    benford = F.coalesce(
        *[
            F.when(F.col("digit") == dd, F.lit(ppm))
            for dd, ppm in _BENFORD_PPM.items()
        ]
    )
    return obs.crossJoin(broadcast(tot)).select(
        "digit",
        "n_orders",
        F.expr("(CAST(n_orders AS DECIMAL(38,0)) * 1000000) div n").alias("observed_ppm"),
        benford.cast("long").alias("benford_ppm"),
    )


# ---------------------------------------------------------------------------
# Tree-ensemble batch scoring — models compiled to CASE expressions
# ---------------------------------------------------------------------------

# A fitted tree ensemble is constants: batch inference at 100 TB is NOT a
# UDF problem, it is expression compilation — each tree becomes a nested
# CASE over the feature columns, whole-stage-codegen fuses the ensemble
# into the scan, and scoring is map-only with zero Python. The shared SQL
# string (TPC-H pattern) IS both the Spark query and the oracle.

_T1_LEAF = """CASE WHEN cents < 5000000 THEN
         CASE WHEN urgent THEN 'A1' ELSE 'A2' END
       ELSE CASE WHEN status = 'F' THEN
              CASE WHEN cents < 15000000 THEN 'A3' ELSE 'A4' END
            ELSE 'A5' END END"""
_T1_VAL = """CASE WHEN cents < 5000000 THEN
         CASE WHEN urgent THEN 820000 ELSE 350000 END
       ELSE CASE WHEN status = 'F' THEN
              CASE WHEN cents < 15000000 THEN 150000 ELSE 90000 END
            ELSE 600000 END END"""
_T2_LEAF = """CASE WHEN urgent THEN
         CASE WHEN cents < 2000000 THEN 'B1' ELSE 'B2' END
       ELSE CASE WHEN status = 'O' THEN 'B3' ELSE 'B4' END END"""
_T2_VAL = """CASE WHEN urgent THEN
         CASE WHEN cents < 2000000 THEN 900000 ELSE 500000 END
       ELSE CASE WHEN status = 'O' THEN 300000 ELSE 120000 END END"""

TREE_SCORE_SQL = f"""
WITH f AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
               AS urgent,
           o_orderstatus AS status
    FROM orders
),
s AS (
    SELECT {_T1_LEAF} AS leaf1, {_T2_LEAF} AS leaf2,
           CAST({_T1_VAL} + {_T2_VAL} AS BIGINT) AS score_micro
    FROM f
)
SELECT leaf1, leaf2, score_micro, CAST(count(*) AS BIGINT) AS n_orders
FROM s GROUP BY leaf1, leaf2, score_micro
"""


@query("score_tree_ensemble", oracle=TREE_SCORE_SQL)
def score_tree_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference of a (hand-fitted) two-tree ensemble over order
    features, audited as per-leaf-path populations with the ensemble
    score in integer micro-units.

    The point is the COMPILATION STRATEGY: a fitted tree is constants, so
    scoring is nested CASE expressions the engine fuses into the scan via
    whole-stage codegen — map-only, zero Python, zero shuffle before the
    leaf-grain (≤5×4 cells) audit aggregate. This is how GBDT/RF models
    deploy on 100 TB (export trees → SQL), versus a per-row UDF that
    leaves codegen and pays serialization per row. Shared SQL string =
    query and oracle (the sql_tpch pattern), so semantics are identical
    by construction.
    """
    from mapreduce_6_824_lab1_spark.catalog import configure

    configure(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(TREE_SCORE_SQL)


# ---------------------------------------------------------------------------
# Join-key skew diagnosis — the decision input for salting / AQE skew-join
# ---------------------------------------------------------------------------

_SKEW_TOPN = 10


def _skew_sql(name: str, table: str, key: str) -> str:
    return f"""
SELECT '{name}' AS key_name, n_rows, n_keys,
       CAST((CAST(max_c AS HUGEINT) * 1000000) // n_rows AS BIGINT) AS top1_ppm,
       CAST((CAST(top10 AS HUGEINT) * 1000000) // n_rows AS BIGINT) AS top10_ppm
FROM (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS max_c
      FROM (SELECT {key} AS k, CAST(count(*) AS BIGINT) AS c
            FROM {table} GROUP BY 1)) s,
     (SELECT CAST(sum(c) AS BIGINT) AS top10
      FROM (SELECT CAST(count(*) AS BIGINT) AS c, {key} AS k
            FROM {table} GROUP BY {key}
            ORDER BY c DESC, k LIMIT {_SKEW_TOPN})) t
"""


SKEW_ORACLE = " UNION ALL ".join(
    [
        _skew_sql("orders.o_custkey", "orders", "o_custkey"),
        _skew_sql("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        _skew_sql("events.user_id", "events", "user_id"),
    ]
)


def _skew_audit(df: DataFrame, name: str, key: str) -> DataFrame:
    kc = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = kc.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").cast("long").alias("max_c"),
    )
    t = (
        kc.orderBy(F.desc("c"), "k")
        .limit(_SKEW_TOPN)
        .agg(F.sum("c").cast("long").alias("top10"))
    )
    return s.crossJoin(broadcast(t)).select(
        F.lit(name).alias("key_name"),
        "n_rows",
        "n_keys",
        F.expr("(CAST(max_c AS DECIMAL(38,0)) * 1000000) div n_rows").alias("top1_ppm"),
        F.expr("(CAST(top10 AS DECIMAL(38,0)) * 1000000) div n_rows").alias("top10_ppm"),
    )


@query("diagnose_partition_skew", oracle=SKEW_ORACLE)
def diagnose_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnosis for three hot keys: row and
    distinct-key counts plus the ppm share of the heaviest key and the
    top-10 keys — the numbers that decide between a plain hash join,
    salting (join_skew_salted), and AQE skew-split (pinned live in
    test_scale_stress).

    Scale shape per key: one key-grain hash aggregate (map-side combine),
    then dimension-sized folds — the top-10 head is TakeOrderedAndProject
    over key-grain rows, never fact rows. This is exactly the planning
    pass a 100 TB join should buy BEFORE shuffling: its cost is the
    partial-agg scan, its output is 1 row, and a top1_ppm in the
    hundreds of thousands says the plain join will stall on one task.
    """
    out = None
    for name, table, key in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("events.user_id", "events", "user_id"),
    ):
        a = _skew_audit(load_table(spark, sf_dir, table), name, key)
        out = a if out is None else out.unionByName(a)
    return out


# ---------------------------------------------------------------------------
# Equi-join cardinality estimation — Σ |A_k|·|B_k| on key-grain tables
# ---------------------------------------------------------------------------


def _card_sql(name: str, ta: str, ka: str, tb: str, kb: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
       (SELECT CAST(count(*) AS BIGINT) FROM {ta}) AS rows_left,
       (SELECT CAST(count(*) AS BIGINT) FROM {tb}) AS rows_right,
       CAST(count(*) AS BIGINT) AS shared_keys,
       CAST(sum(ca * cb) AS BIGINT) AS est_rows
FROM (SELECT {ka} AS k, CAST(count(*) AS BIGINT) AS ca
      FROM {ta} GROUP BY 1) a
JOIN (SELECT {kb} AS k, CAST(count(*) AS BIGINT) AS cb
      FROM {tb} GROUP BY 1) b USING (k)
"""


CARDINALITY_ORACLE = " UNION ALL ".join(
    [
        _card_sql(
            "orders*customer", "orders", "o_custkey", "customer", "c_custkey"
        ),
        _card_sql(
            "lineitem*orders", "lineitem", "l_orderkey", "orders", "o_orderkey"
        ),
    ]
)


def _card_audit(
    spark: SparkSession, sf_dir: str, name: str, ta: str, ka: str, tb: str, kb: str
) -> DataFrame:
    a = load_table(spark, sf_dir, ta)
    b = load_table(spark, sf_dir, tb)
    ga = a.groupBy(F.col(ka).alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    gb = b.groupBy(F.col(kb).alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    est = ga.join(gb, "k").agg(
        F.count(F.lit(1)).alias("shared_keys"),
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("est_rows"),
    )
    na = a.agg(F.count(F.lit(1)).alias("rows_left"))
    nb = b.agg(F.count(F.lit(1)).alias("rows_right"))
    return (
        est.crossJoin(broadcast(na))
        .crossJoin(broadcast(nb))
        .select(
            F.lit(name).alias("join_name"),
            "rows_left",
            "rows_right",
            "shared_keys",
            "est_rows",
        )
    )


@query("estimate_join_cardinality", oracle=CARDINALITY_ORACLE)
def estimate_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-join output cardinality WITHOUT running the join:
    |A ⋈ B| = Σ_k |A_k|·|B_k| over the shared key domain — the CBO/AQE
    statistic that predicts shuffle write volume before committing to a
    plan (and the quantity diagnose_partition_skew's shares are ratios
    of).

    Scale shape: two key-grain partial aggregates + one key-grain join —
    for an N-row fact with K distinct keys this costs O(K) shuffle rows
    instead of the join's O(N); the identity est_rows == actual join
    count is pinned in tests/test_round4g.py, which is what makes this
    an EXACT planning primitive rather than a histogram guess.
    """
    return _card_audit(
        spark, sf_dir, "orders*customer", "orders", "o_custkey",
        "customer", "c_custkey",
    ).unionByName(
        _card_audit(
            spark, sf_dir, "lineitem*orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey",
        )
    )


# ---------------------------------------------------------------------------
# Weighted percentiles — quantity-weighted price quantiles per group
# ---------------------------------------------------------------------------

WEIGHTED_PCT_ORACLE = """
WITH v AS (
    SELECT l_returnflag AS flag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2
),
c AS (
    SELECT flag, cents, w,
           CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT)
               AS cumw,
           CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS totw
    FROM v
)
SELECT flag, CAST(max(totw) AS BIGINT) AS w_total,
       CAST(min(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
           AS p50_cents,
       CAST(min(CASE WHEN 10 * cumw >= 9 * totw THEN cents END) AS BIGINT)
           AS p90_cents
FROM c GROUP BY flag
"""


@query("agg_weighted_percentile", oracle=WEIGHTED_PCT_ORACLE)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED percentiles (quantity-weighted p50/p90 of price per
    return flag) — the operator percentile_approx cannot express and
    plain percentile gets wrong (every unit of quantity counts, not every
    row).

    Scale shape: compact to (group, value)-grain with one hash aggregate
    (weights sum map-side), then cumulative weight runs per group over
    VALUE-grain rows (the pareto_frontier/partition_range_bounds
    justification: the window never sees fact rows), and the quantile is
    min(value | k·cumw ≥ p·totw) — integer cross-multiplied, no float
    division anywhere, so it hashes exactly. Weights floor-round to
    BIGINT (TPC-H quantities are integral).
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.floor(F.col("l_quantity") + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        .groupBy("flag", "cents")
        .agg(F.sum("q").cast("long").alias("w"))
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = v.select(
        "flag",
        "cents",
        F.sum("w").over(wcum).cast("long").alias("cumw"),
        F.sum("w").over(wtot).cast("long").alias("totw"),
    )
    return c.groupBy("flag").agg(
        F.max("totw").cast("long").alias("w_total"),
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("cents")))
        .cast("long")
        .alias("p50_cents"),
        F.min(
            F.when(10 * F.col("cumw") >= 9 * F.col("totw"), F.col("cents"))
        )
        .cast("long")
        .alias("p90_cents"),
    )


# ---------------------------------------------------------------------------
# Interval union length — covered time under overlapping activity windows
# ---------------------------------------------------------------------------

_IVL_SPAN_US = 30 * 60 * 1_000_000  # each event covers [ts, ts+30min)

INTERVAL_UNION_ORACLE = f"""
WITH iv AS (
    SELECT user_id, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS s,
           CAST(epoch_us(ts) + {_IVL_SPAN_US} AS BIGINT) AS e
    FROM events
),
m AS (
    SELECT user_id, s, e, event_id,
           CAST(max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS BIGINT) AS pmax
    FROM iv
),
isl AS (
    SELECT user_id, s, e,
           CAST(sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS island
    FROM m
)
SELECT user_id,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(mx - mn) AS BIGINT) AS covered_us
FROM (SELECT user_id, island, min(s) AS mn, max(e) AS mx,
             CAST(count(*) AS BIGINT) AS cnt
      FROM isl GROUP BY user_id, island)
GROUP BY user_id
"""


def interval_union_fold(iv: DataFrame) -> DataFrame:
    """Core interval-union fold over (user_id, event_id, s, e) rows —
    factored out so property tests can drive it with synthetic interval
    sets (tests/test_properties.py pins duplication-invariance)."""
    # ONE ordering for BOTH windows — (s, e, event_id). With inconsistent
    # tie orders (s,event_id vs s,e) two same-start intervals could land
    # island flags in a different sequence than their pmax values assumed,
    # splitting one island into two (hypothesis found the 2-interval
    # counterexample; pinned in test_properties).
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.select(
        "user_id", "s", "e", "event_id",
        F.max("e").over(wprev).alias("pmax"),
    )
    flag = F.when(
        F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
    ).otherwise(0)
    wisl = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = m.select(
        "user_id", "s", "e", F.sum(flag).over(wisl).alias("island")
    )
    per_island = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("mn"), F.max("e").alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return per_island.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("mx") - F.col("mn")).cast("long").alias("covered_us"),
    )


@query("interval_union_length", oracle=INTERVAL_UNION_ORACLE)
def interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total COVERED time per user when each event opens a 30-minute
    activity window — the interval-union problem (overlaps must count
    once), the measurement behind 'active minutes' metrics.

    Classic two-window solve, both windows over the user's own ordered
    rows (one shuffle total): a running max of interval ends over
    PRECEDING rows detects island starts (s > pmax), a running sum of
    the start flags numbers islands, and each island contributes
    max(end) − min(start) exactly once however deep its overlaps. All
    arithmetic is integer µs — exact. The n_events ≥ n_islands and
    covered ≤ n·span invariants are pinned in tests/test_round4g.py.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_IVL_SPAN_US)).alias("e"),
    )
    return interval_union_fold(iv)


# ---------------------------------------------------------------------------
# Max concurrency — distributed sweep-line over session intervals
# ---------------------------------------------------------------------------

MAX_CONCURRENCY_ORACLE = f"""
WITH pts AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) AS t, CAST(1 AS BIGINT) AS d,
           event_id
    FROM events
    UNION ALL
    SELECT CAST(epoch_us(ts) + {_IVL_SPAN_US} AS BIGINT), CAST(-1 AS BIGINT),
           event_id
    FROM events
),
sweep AS (
    SELECT t, d,
           CAST(sum(d) OVER (ORDER BY t, d, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS conc
    FROM pts
)
SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
       CAST(max(conc) AS BIGINT) AS max_concurrent,
       CAST(count(*) AS BIGINT) AS n_points
FROM sweep
GROUP BY 1
"""


def concurrency_sweep(pts: DataFrame) -> DataFrame:
    """Distributed sweep-line over (t, d, event_id) boundary points:
    hour-bucketed local running sums + broadcast bucket offsets. Factored
    so property tests can drive it with synthetic/adversarial tie sets
    (tests/test_properties.py). The bucket is a monotone function of t,
    so the global (t, d, event_id) order restricted to a bucket equals
    the bucket-local order — prefix sums compose exactly across the cut.
    Returns one row per point: (t, conc)."""
    pts = pts.withColumn("bkt", F.expr("t div 3600000000"))
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("local_sum", F.sum("d").over(wloc))
    btot = pts.groupBy("bkt").agg(F.sum("d").alias("bd"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "bkt", F.coalesce(F.sum("bd").over(woff), F.lit(0)).alias("off")
    )  # hour-grain: dimension-sized single-partition window
    return local.join(broadcast(offsets), "bkt").select(
        "t", (F.col("local_sum") + F.col("off")).cast("long").alias("conc")
    )


@query("events_max_concurrency", oracle=MAX_CONCURRENCY_ORACLE)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day when every event opens a
    30-minute window — the capacity-planning number (how many sessions
    were alive at once), via the classic sweep line: +1/−1 boundary
    points, globally ordered running sum, per-day max. Ends sort before
    coincident starts (d = −1 first), matching half-open [s, e)
    intervals.

    The global ordered prefix sum is the scale problem — a naive
    ``sum() OVER (ORDER BY t)`` is a single-partition window over 2N
    fact rows. This plan reuses distributed_sort's bucket+offset trick
    at the SWEEP grain: points bucket by hour, the running sum is
    windowed WITHIN each hour bucket, and each bucket's starting
    concurrency is the broadcast cumulative sum of whole-bucket deltas
    (hour-grain, dimension-sized). The oracle spells the single-window
    form DuckDB can afford single-node; results are identical because
    prefix sums compose associatively across the bucket cut.
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.unix_micros("ts").alias("t"),
        F.lit(1).cast("long").alias("d"),
        "event_id",
    )
    ends = ev.select(
        (F.unix_micros("ts") + F.lit(_IVL_SPAN_US)).alias("t"),
        F.lit(-1).cast("long").alias("d"),
        "event_id",
    )
    sweep = concurrency_sweep(starts.unionByName(ends))
    return (
        sweep.select(
            F.date_format(F.timestamp_micros("t"), "yyyy-MM-dd").alias(
                "day"
            ),
            "conc",
        )
        .groupBy("day")
        .agg(
            F.max("conc").cast("long").alias("max_concurrent"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average price — duration-weighted means per (type, day)
# ---------------------------------------------------------------------------

TWAP_ORACLE = """
WITH e AS (
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(epoch_us(date_trunc('day', ts)) + 86400000000 AS BIGINT)
               AS day_end_us,
           CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
d AS (
    SELECT event_type, day, cents,
           (coalesce(lead(us) OVER (PARTITION BY event_type, day
                                    ORDER BY us, event_id),
                     day_end_us) - us) // 1000000 AS dur_s
    FROM e
)
SELECT event_type, day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(dur_s) AS BIGINT) AS held_s,
       CAST(sum(cents * dur_s) AS BIGINT) AS weighted_cents_s,
       CAST(sum(cents * dur_s) // greatest(sum(dur_s), 1) AS BIGINT)
           AS twap_cents
FROM d GROUP BY event_type, day
"""


@query("timeseries_twap", oracle=TWAP_ORACLE)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (event type, day): each
    observation holds until the next one (or the day boundary), and the
    mean weights by integer holding seconds — the TWAP every execution/
    billing system computes, where the row-weighted mean is simply
    wrong for irregular arrivals.

    Overflow-proof BY CONSTRUCTION, not by fixture luck: per (type, day)
    the holding durations sum to ≤ 86 400 s whatever the event count, so
    Σ cents·dur_s ≤ max_cents·86 400 ≈ 9·10¹¹ — bounded at ANY corpus
    scale, which is why the weights are day-clipped seconds and not µs.
    One window pass per (type, day) partition (lead + day-end coalesce),
    one aggregate; the division is integer floor-division at the very
    end, so the whole result is exact BIGINT arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    day_start = F.date_trunc("day", "ts")
    e = ev.select(
        "event_type",
        F.date_format(day_start, "yyyy-MM-dd").alias("day"),
        (F.unix_micros(day_start) + F.lit(86_400_000_000)).alias(
            "day_end_us"
        ),
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
    )
    w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    d = e.select(
        "event_type",
        "day",
        "cents",
        F.expr(
            "(coalesce(lead(us) over (partition by event_type, day "
            "order by us, event_id), day_end_us) - us) div 1000000"
        ).alias("dur_s"),
    )
    return d.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("dur_s").cast("long").alias("held_s"),
        F.sum(F.col("cents") * F.col("dur_s"))
        .cast("long")
        .alias("weighted_cents_s"),
        F.expr(
            "CAST(sum(cents * dur_s) div greatest(sum(dur_s), 1) AS BIGINT)"
        ).alias("twap_cents"),
    )


# ---------------------------------------------------------------------------
# Two-step Markov transitions — matrix multiply as a relational join
# ---------------------------------------------------------------------------

MARKOV2_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b
    FROM events
),
t AS (
    SELECT a, b, CAST(count(*) AS BIGINT) AS c
    FROM seq WHERE b IS NOT NULL GROUP BY a, b
),
r AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM t GROUP BY a)
SELECT t1.a AS src, t2.b AS dst,
       CAST(count(*) AS BIGINT) AS n_paths,
       CAST(sum((CAST(t1.c AS HUGEINT) * t2.c * 1000000)
                // (CAST(r1.ra AS HUGEINT) * r2.ra)) AS BIGINT)
           AS p2_micro
FROM t t1
JOIN t t2 ON t1.b = t2.a
JOIN r r1 ON r1.a = t1.a
JOIN r r2 ON r2.a = t2.a
GROUP BY t1.a, t2.b
"""


@query("events_markov_2step", oracle=MARKOV2_ORACLE)
def events_markov_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step transition matrix P² of the per-user event chain —
    matrix multiplication expressed as the relational join it is:
    P²[a,c] = Σ_b P[a,b]·P[b,c] becomes transitions ⋈ transitions on the
    middle state, grouped by the endpoints (the companion of
    embedding_gram_matrix's X^T X: same pattern, sparse form).

    Floats are eliminated, not tolerated: each path term quantizes as
    (c_ab·c_bc·10⁶) div (r_a·r_b) — exact BIGINT per term (products
    ≤ ~10¹⁵ at fixture scales; at larger scales pre-divide the larger
    count), summed exactly, so the result is order-insensitive where a
    sum of IEEE ratio products would hash-differ per engine. One
    user-keyed window builds the chain, everything after is
    state-grain (|types|² rows).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    t = seq.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    r = t.groupBy("a").agg(F.sum("c").cast("long").alias("ra"))
    t1 = t.alias("t1")
    t2 = t.alias("t2")
    joined = (
        t1.join(t2, F.col("t1.b") == F.col("t2.a"))
        .join(broadcast(r.alias("r1")), F.col("r1.a") == F.col("t1.a"))
        .join(broadcast(r.alias("r2")), F.col("r2.a") == F.col("t2.a"))
        .select(
            F.col("t1.a").alias("src"),
            F.col("t2.b").alias("dst"),
            F.expr(
                "(CAST(t1.c AS DECIMAL(38,0)) * t2.c * 1000000)"
                " div (CAST(r1.ra AS DECIMAL(38,0)) * r2.ra)"
            ).alias("term"),
        )
    )
    return joined.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.sum("term").cast("long").alias("p2_micro"),
    )


# ---------------------------------------------------------------------------
# Recency-decayed revenue — exact power-of-two decay, no libm
# ---------------------------------------------------------------------------

DECAY_HORIZON_D = 20  # weight 2^-age for age ≤ horizon, else 0

DECAY_ORACLE = f"""
WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
d AS (
    SELECT o_orderstatus AS status,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(date_diff('day', o_orderdate, mx.m) AS BIGINT) AS age
    FROM orders, mx
)
SELECT status,
       CAST(count(*) FILTER (WHERE age <= {DECAY_HORIZON_D}) AS BIGINT)
           AS n_recent,
       CAST(sum(CASE WHEN age <= {DECAY_HORIZON_D}
                     THEN cents // (CAST(1 AS BIGINT) << age)
                     ELSE 0 END) AS BIGINT) AS decayed_cents
FROM d GROUP BY status
"""


@query("timeseries_decay_sum", oracle=DECAY_ORACLE)
def timeseries_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed revenue per status: each order contributes
    cents·2^(−age_days), ages beyond 20 days contribute nothing — the
    exponentially-decayed score behind trending/recency rankings, with
    the decay base pinned to 2 so every term is an integer SHIFT
    (floor(cents >> age)), never a libm pow.

    Exactness and overflow safety are structural: each term is ≤ its own
    cents (so the sum is bounded by plain revenue at any scale), both
    engines compute identical floor-shifts, and the whole operator is
    one scan + one partial aggregate against a broadcast max-date. The
    half-life generalizes by rescaling age (e.g. age_days·2 for a
    half-day half-life) — still integer.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("m"))
    d = orders.crossJoin(broadcast(mx)).select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.datediff("m", "o_orderdate").cast("long").alias("age"),
    )
    recent = F.col("age") <= DECAY_HORIZON_D
    return d.groupBy("status").agg(
        F.count_if(recent).alias("n_recent"),
        F.sum(
            F.when(
                recent,
                F.expr("shiftright(cents, cast(age AS int))"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("decayed_cents"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast + backtest — the baseline every model must beat
# ---------------------------------------------------------------------------

FORECAST_ORACLE = """
WITH mx AS (SELECT date_trunc('day', max(ts)) AS last_day FROM events),
hist AS (
    SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
           CAST(extract(hour FROM ts) AS BIGINT) AS hour,
           date_trunc('day', ts) AS d
    FROM events, mx WHERE date_trunc('day', ts) < mx.last_day
),
rates AS (
    SELECT dow, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT d) AS BIGINT) AS n_days
    FROM hist GROUP BY dow, hour
),
spine AS (SELECT unnest(generate_series(0, 23)) AS hour),
actual AS (
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS actual
    FROM events, mx WHERE date_trunc('day', ts) = mx.last_day
    GROUP BY 1
)
SELECT CAST(s.hour AS BIGINT) AS hour,
       CAST(coalesce(r.n_events // r.n_days, 0) AS BIGINT) AS predicted,
       CAST(coalesce(a.actual, 0) AS BIGINT) AS actual,
       CAST(abs(coalesce(r.n_events // r.n_days, 0)
                - coalesce(a.actual, 0)) AS BIGINT) AS abs_err
FROM spine s
LEFT JOIN (SELECT r.*
           FROM rates r, mx
           WHERE r.dow = isodow(mx.last_day) - 1) r ON r.hour = s.hour
LEFT JOIN actual a ON a.hour = s.hour
"""


@query("events_forecast_baseline", oracle=FORECAST_ORACLE)
def events_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive hourly forecast with an in-query backtest: predict
    the final day's hourly event counts as the historical mean for that
    (weekday, hour) cell, and score |predicted − actual| per hour — the
    baseline every fancier forecaster must beat, and the shape of every
    backtest job (train window strictly BEFORE the scored day).

    Exact integers end to end: the mean is BIGINT floor-division of two
    counts, the 24-row hour spine comes from a generated sequence (the
    date_spine_gaps recipe — no collect), and the held-out day is
    excluded from training by a broadcast max-date join, so there is no
    leakage by construction. One fact aggregate for the rates, one for
    the actuals; everything else is dimension-grain.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.date_trunc("day", F.max("ts")).alias("last_day"))
    with_day = ev.crossJoin(broadcast(mx)).select(
        F.weekday("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
        F.date_trunc("day", "ts").alias("d"),
        "last_day",
    )
    rates = (
        with_day.filter(F.col("d") < F.col("last_day"))
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("d").alias("n_days"),
        )
    )
    target_dow = mx.select(
        F.weekday("last_day").cast("long").alias("tdow")
    )
    pred = (
        rates.crossJoin(broadcast(target_dow))
        .filter(F.col("dow") == F.col("tdow"))
        .select("hour", F.expr("n_events div n_days").alias("predicted"))
    )
    actual = (
        with_day.filter(F.col("d") == F.col("last_day"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    spine = spark.range(0, 24).select(F.col("id").alias("hour"))
    return (
        spine.join(broadcast(pred), "hour", "left")
        .join(broadcast(actual), "hour", "left")
        .select(
            "hour",
            F.coalesce("predicted", F.lit(0)).cast("long").alias(
                "predicted"
            ),
            F.coalesce("actual", F.lit(0)).cast("long").alias("actual"),
            F.abs(
                F.coalesce("predicted", F.lit(0))
                - F.coalesce("actual", F.lit(0))
            )
            .cast("long")
            .alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve — cumulative revenue by cohort age
# ---------------------------------------------------------------------------

LTV_ORACLE = """
WITH firsts AS (
    SELECT o_custkey,
           min(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
               AS cohort_m
    FROM orders GROUP BY o_custkey
),
rev AS (
    SELECT f.cohort_m,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
               - f.cohort_m AS age,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
)
SELECT printf('%04d-%02d', (cohort_m - 1) // 12, ((cohort_m - 1) % 12) + 1)
           AS cohort,
       age, n_orders, cents,
       CAST(sum(cents) OVER (PARTITION BY cohort_m ORDER BY age)
            AS BIGINT) AS cum_cents
FROM rev
"""


@query("cohort_revenue_ltv", oracle=LTV_ORACLE)
def cohort_revenue_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves: revenue per (acquisition-month
    cohort, months-since-acquisition age) with the running cumulative —
    the LTV table behind payback-period decisions, the revenue sibling of
    ``cohort_retention``'s count triangle.

    Scale shape: first-order months are one customer-grain aggregate
    joined back co-partitioned on the customer key (both sides hash the
    same key — one shuffle each, no re-shuffle for the join); months are
    INTEGER year·12+month so age needs no date arithmetic at fact grain;
    the cumulative runs over the (cohort × age) table, months², which is
    dimension-sized forever. Money is exact integer cents.
    """
    o = load_table(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    with_m = o.select(
        "o_custkey",
        m.alias("om"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    firsts = with_m.groupBy("o_custkey").agg(F.min("om").alias("cohort_m"))
    rev = (
        with_m.join(firsts, "o_custkey")
        .groupBy("cohort_m", (F.col("om") - F.col("cohort_m")).alias("age"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        F.format_string(
            "%04d-%02d",
            F.expr("(cohort_m - 1) div 12").cast("int"),
            (F.pmod(F.col("cohort_m") - 1, F.lit(12)) + 1).cast("int"),
        ).alias("cohort"),
        "age",
        "n_orders",
        "cents",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


# ---------------------------------------------------------------------------
# Supplier scorecard — the vendor-KPI composite
# ---------------------------------------------------------------------------

SCORECARD_ORACLE = """
SELECT s.s_name AS supplier,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST((CAST(count(*) FILTER (WHERE l.l_returnflag = 'R') AS HUGEINT)
            * 1000000) // count(*) AS BIGINT) AS return_ppm,
       CAST(sum(CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                     AS BIGINT)) AS BIGINT)
           // CAST(count(*) AS BIGINT) AS avg_ship_lag_days
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


@query("supplier_scorecard", oracle=SCORECARD_ORACLE)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vendor KPI scorecard: volume, breadth (distinct parts), exact
    integer revenue, return rate (ppm), and mean order→ship lag (integer
    floor days) per supplier — the multi-metric composite procurement
    reviews run, all five KPIs folded into ONE aggregate.

    Scale shape: lineitem⋈orders is the co-partitioned fact join (both
    keyed by order); supplier joins for the name UNhinted — it is
    SF-scaled (smallest fact-family table), so Catalyst auto-broadcasts
    it below the threshold and AQE shuffle-joins beyond, instead of a
    forced hint OOMing the driver at 100 TB — and every
    metric is a conditional/aggregated expression in the same pass — the
    table_expectations fusion rule applied to reporting: adding a KPI
    adds a column, not a job. Lag can be negative in this fixture
    (ship_before_order is a known audited violation) and floor-division
    semantics match `div` on both engines for the aggregate because the
    SUM is divided, not per-row values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        s, li.l_suppkey == s.s_suppkey
    )
    return j.groupBy(F.col("s_name").alias("supplier")).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("revenue_cents"),
        F.expr(
            "(CAST(count_if(l_returnflag = 'R') AS DECIMAL(38,0)) * 1000000)"
            " div count(*)"
        ).alias("return_ppm"),
        F.expr(
            "CAST(sum(CAST(datediff(l_shipdate, o_orderdate) AS BIGINT))"
            " div count(*) AS BIGINT)"
        ).alias("avg_ship_lag_days"),
    )


# ---------------------------------------------------------------------------
# Binary-classifier evaluation — confusion matrix + P/R/F1 in exact ppm
# ---------------------------------------------------------------------------

_EVAL_THRESHOLD = 900_000  # ensemble micro-score cut for "urgent" call

EVAL_ORACLE = f"""
WITH f AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
               AS urgent,
           o_orderstatus AS status
    FROM orders
),
scored AS (
    SELECT urgent AS actual,
           ({_T1_VAL} + {_T2_VAL}) >= {_EVAL_THRESHOLD} AS pred
    FROM f
),
cm AS (
    SELECT CAST(count(*) FILTER (WHERE pred AND actual) AS BIGINT) AS tp,
           CAST(count(*) FILTER (WHERE pred AND NOT actual) AS BIGINT)
               AS fp,
           CAST(count(*) FILTER (WHERE NOT pred AND actual) AS BIGINT)
               AS fn,
           CAST(count(*) FILTER (WHERE NOT pred AND NOT actual) AS BIGINT)
               AS tn
    FROM scored
)
SELECT tp, fp, fn, tn,
       CAST(floor(tp * 1000000.0 / (tp + fp)) AS BIGINT) AS precision_ppm,
       CAST(floor(tp * 1000000.0 / (tp + fn)) AS BIGINT) AS recall_ppm,
       CAST(floor(2 * tp * 1000000.0 / (2 * tp + fp + fn)) AS BIGINT)
           AS f1_ppm
FROM cm
"""


@query("eval_binary_classifier", oracle=EVAL_ORACLE)
def eval_binary_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model evaluation at scale: score every order with the
    ``score_tree_ensemble`` trees, call 'urgent' when the ensemble
    micro-score clears a threshold, and fold the confusion matrix plus
    precision/recall/F1 against the actual priority flag — ONE scan, ONE
    aggregate, metrics as floor-divided integer ppm (F1 via its 2·tp/(2·tp+fp+fn)
    identity — one division per metric from integer counts, never a
    ratio of ratios; counts stay < 2^53 so the shared floor(x/y) form
    is exact on both engines, and `//` vs `div` dialect drift is
    avoided by not using either).

    This is the eval harness a batch-inference pipeline bolts onto its
    scoring pass: the conditional counts ride the same aggregate that
    would write predictions, so evaluation is free at 100 TB. The same
    CASE-expression score fragments are shared verbatim with the scoring
    key and the oracle (the sql_tpch shared-string rule), making the
    predictor under test identical by construction. Prediction is
    deliberately imperfect (price+status can't fully determine priority)
    so every confusion cell is exercised — pinned in test_round4h.
    """
    from mapreduce_6_824_lab1_spark.catalog import configure

    configure(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(EVAL_ORACLE)


# ---------------------------------------------------------------------------
# Hard data gate — assert_true kills the job instead of reporting
# ---------------------------------------------------------------------------

ASSERT_GATE_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS min_cents
FROM orders GROUP BY o_orderstatus
"""


@query("quality_assert_gate", oracle=ASSERT_GATE_ORACLE)
def quality_assert_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD data gate: ``assert_true`` inline in the pipeline kills the
    job on the first violating row (here: non-positive order totals,
    which the fixture never has) — the fail-stop complement to
    ``table_expectations``' report-and-continue audit. Use the audit for
    stewardship dashboards; use the gate where downstream writes must
    never see a violating row (an invalid row costs a failed job, a
    leaked row costs a poisoned table).

    The assertion is a map-side expression fused into the scan — zero
    cost on the happy path at any scale, no extra pass. The gate's
    teeth are pinned in tests/test_round4h.py: the same plan over a
    frame containing one violating row must RAISE, not filter. The
    passing pipeline's aggregate is ordinary and oracle-checked.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    gated = o.select(
        "o_orderstatus",
        F.when(
            F.assert_true(
                cents > 0, F.lit("order with non-positive total")
            ).isNull(),
            cents,
        ).alias("cents"),
    )
    return gated.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").cast("long").alias("min_cents"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users — exact WAU/DAU without a distinct-in-window
# ---------------------------------------------------------------------------

ROLLING_WAU_ORACLE = """
WITH ud AS (
    SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
bounds AS (SELECT max(day) AS mx FROM ud),
fan AS (
    SELECT ud.day + to_days(CAST(i AS INT)) AS window_day,
           ud.user_id, i
    FROM ud, unnest(generate_series(0, 6)) AS gs(i), bounds
    WHERE ud.day + to_days(CAST(i AS INT)) <= bounds.mx
)
SELECT strftime(window_day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS BIGINT)
           AS dau,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
       CAST((CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END)
                  AS HUGEINT)
           * 1000000) // count(DISTINCT user_id) AS BIGINT)
           AS stickiness_ppm
FROM fan GROUP BY window_day
"""


@query("events_rolling_wau", oracle=ROLLING_WAU_ORACLE)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day active users per day (WAU) next to same-day
    actives (DAU) and the DAU/WAU stickiness ratio — the engagement
    metric every product dashboard leads with, and a deliberately hard
    operator: COUNT DISTINCT is not algebraic, so no window frame can
    roll it.

    The scale-correct form: dedup events to (day, user) grain FIRST (one
    shuffle — the only fact-grain pass), then each user-day fans out to
    the ≤7 window-days it supports via a sequence explode, turning the
    rolling window into a plain equi-GROUP BY with a distinct aggregate.
    The 7× fan-out happens at user-day grain (bounded by users×days),
    never event grain — the difference between this and the naive
    spine-range-join is what survives 100 TB. Days with no trailing
    context still report correctly because membership, not history
    length, defines the window; trailing days beyond max(day) are
    clipped on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    mx = ud.agg(F.max("day").alias("mx"))
    fan = (
        ud.crossJoin(broadcast(mx))
        .select(
            "user_id",
            "mx",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day",
        )
        .select(
            "user_id",
            "i",
            F.expr("day + make_interval(0, 0, 0, i)").alias("window_day"),
            "mx",
        )
        .filter(F.col("window_day") <= F.col("mx"))
    )
    return fan.groupBy(
        F.date_format("window_day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count_distinct(
            F.when(F.col("i") == 0, F.col("user_id"))
        ).alias("dau"),
        F.count_distinct("user_id").alias("wau"),
        F.expr(
            "(CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END)"
            " AS DECIMAL(38,0)) * 1000000)"
            " div count(DISTINCT user_id)"
        ).alias("stickiness_ppm"),
    )
