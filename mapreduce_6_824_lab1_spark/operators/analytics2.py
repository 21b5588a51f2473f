"""Sequence & distribution analytics — gaps-and-islands, cumulative
distinct, transition matrices, deterministic mode, interval-overlap join.

Five classic analytical shapes a training-data/event pipeline needs that
the first analytics module doesn't cover (reference has no equivalent —
driver extension mandate, SURVEY.md §2.C lineage). All pure built-in
columnar plans; each one exists because the naive formulation has a
scale trap and the implemented plan avoids it:

- gaps-and-islands: the island key is integer arithmetic on a row_number,
  NOT a self-join on day-1 (the naive consecutive-day join is O(n²) on
  dense users).
- cumulative distinct: dedupe-to-first-occurrence THEN running count —
  ``count(DISTINCT) OVER (ORDER BY …)`` is unbounded per-row state and
  most engines (Spark included) refuse it.
- transitions: lag over (user, time) partitions — state is one row per
  partition, never the whole user history.
- mode: grouped count + per-group top-1 window with a pinned tie-break
  (Spark's ``mode()`` and DuckDB's are both tie-nondeterministic).
- interval overlap: equi-join on the owning customer FIRST, overlap as a
  residual predicate — bounded per-key fan-out instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Gaps and islands: maximal runs of consecutive active days per user
# ---------------------------------------------------------------------------

ISLANDS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
keyed AS (
    SELECT user_id, day,
           date_diff('day', DATE '2024-01-01', day)
             - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
    FROM days
)
SELECT user_id,
       strftime(min(day), '%Y-%m-%d') AS run_start,
       count(*) AS run_days
FROM keyed
GROUP BY user_id, island
"""


@query("window_gaps_islands", oracle=ISLANDS_ORACLE)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal consecutive-day activity runs per user (gaps and islands).

    ``day_ordinal - row_number()`` is constant within a consecutive run, so
    one window + one aggregate finds every maximal island. The window
    partitions by user (bounded state), and the distinct day set is tiny
    relative to raw events — the naive alternative, a self-join on
    ``day - 1``, re-shuffles the full activity table per hop and is
    quadratic on dense users at 100 TB.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    keyed = days.withColumn(
        "island",
        F.datediff("day", F.lit("2024-01-01").cast("date"))
        - F.row_number().over(w),
    )
    return keyed.groupBy("user_id", "island").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("run_start"),
        F.count(F.lit(1)).alias("run_days"),
    ).select("user_id", "run_start", "run_days")


# ---------------------------------------------------------------------------
# Cumulative distinct users per day (running count distinct)
# ---------------------------------------------------------------------------

CUMDISTINCT_ORACLE = """
WITH firsts AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events
    GROUP BY user_id
),
per_day AS (
    SELECT first_day AS day, count(*) AS new_users
    FROM firsts GROUP BY first_day
)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_users
FROM per_day
"""


@query("window_cumulative_distinct", oracle=CUMDISTINCT_ORACLE)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day.

    ``count(DISTINCT) OVER (ORDER BY day)`` needs unbounded per-row state
    and Spark rejects it outright. The scalable rewrite: each user
    contributes exactly once at their FIRST day (one hash aggregate),
    daily new-user counts follow, and the running sum is a window over
    the ~days-sized frame — O(users) shuffle, O(days) window, regardless
    of raw event volume. The final single-partition window is over one
    row per day (bounded), not per event.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (user-journey bigrams)
# ---------------------------------------------------------------------------

TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type AS from_type, event_type AS to_type, count(*) AS cnt
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@query("events_transitions", oracle=TRANSITIONS_ORACLE)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive event types per user.

    ``lag`` over (user, time) then a bigram hash aggregate — the standard
    user-journey matrix. The window's state is a single preceding row per
    partition; ordering ties are pinned with event_id so both engines see
    the same sequence. Output is |types|² rows at most — the aggregate
    collapses everything map-side before the final shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Deterministic mode (most frequent value per group)
# ---------------------------------------------------------------------------

MODE_ORACLE = """
WITH counts AS (
    SELECT lang, source, count(*) AS cnt
    FROM documents
    GROUP BY lang, source
),
ranked AS (
    SELECT lang, source, cnt,
           row_number() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, source) AS rn
    FROM counts
)
SELECT lang, source AS top_source, cnt FROM ranked WHERE rn = 1
"""


@query("agg_mode", oracle=MODE_ORACLE)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent source per language, with a deterministic tie-break.

    Spark's ``mode()`` and DuckDB's both pick an arbitrary winner on tied
    counts, which can never hash-match across engines — so mode is
    computed as grouped counts + per-group top-1 with ``(cnt DESC,
    source)`` ordering. The count aggregate collapses to |lang×source|
    rows before the window, so the window input is dimension-sized no
    matter how large documents grows.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("source"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("top_source"), "cnt")
    )


# ---------------------------------------------------------------------------
# Interval-overlap self-join: concurrently-shipping orders per customer
# ---------------------------------------------------------------------------

OVERLAP_ORACLE = """
WITH spans AS (
    SELECT o_custkey, o_orderkey,
           min(l_shipdate) AS ship_lo, max(l_shipdate) AS ship_hi
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey, o_orderkey
)
SELECT a.o_custkey AS c_custkey,
       a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(date_diff('day',
            greatest(a.ship_lo, b.ship_lo)::DATE,
            least(a.ship_hi, b.ship_hi)::DATE) AS BIGINT) AS overlap_days
FROM spans a
JOIN spans b ON a.o_custkey = b.o_custkey
            AND a.o_orderkey < b.o_orderkey
            AND a.ship_lo <= b.ship_hi AND b.ship_lo <= a.ship_hi
"""


@query("join_interval_overlap", oracle=OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of orders from the same customer whose lineitem ship spans
    overlap (concurrently-shipping orders), with the overlap length.

    Interval overlap (``a.lo <= b.hi AND b.lo <= a.hi``) is inherently
    non-equi, so the plan anchors on the EQUI key first: spans aggregate
    to one row per order, the self-join shuffles once on o_custkey, and
    the overlap test runs as a residual predicate inside the sort-merge
    join — per-customer fan-out is orders-per-customer squared (~10² at
    most), never a cross join. At 100 TB the same plan holds; if a single
    key's interval count explodes, the bucketed-range pattern from
    ``join_range_bucketed`` composes on top.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey")
        .agg(
            F.min("l_shipdate").alias("ship_lo"),
            F.max("l_shipdate").alias("ship_hi"),
        )
    )
    a = spans.alias("a")
    b = spans.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.ship_lo") <= F.col("b.ship_hi"))
        & (F.col("b.ship_lo") <= F.col("a.ship_hi")),
    ).select(
        F.col("a.o_custkey").alias("c_custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.datediff(
            F.least("a.ship_hi", "b.ship_hi").cast("date"),
            F.greatest("a.ship_lo", "b.ship_lo").cast("date"),
        )
        .cast("long")
        .alias("overlap_days"),
    )
