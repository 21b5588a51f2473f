"""Time-window semantics on the ``events`` stream-analogue table.

The reference is batch-only (MIT 6.824 Lab 1; /root/reference/README.md:1-2),
so this surface comes from the driver's extension mandate. Batch-mode
``F.window`` / ``F.session_window`` are the SAME functions Structured
Streaming uses — the streaming variants in
:mod:`mapreduce_6_824_lab1_spark.streaming` reuse these aggregations
verbatim, which is exactly how a 100 TB pipeline shares logic between its
backfill (batch) and live (streaming) paths.

Oracle parity notes: ``events.ts`` is microsecond precision; every output
timestamp is formatted to a second-precision string on BOTH sides
(SURVEY.md §7.3c). Session gap boundary is pinned STRICT (< gap merges):
Spark merges events whose window [ts, ts+gap) overlaps the session, i.e.
``next_ts - prev_ts < gap``; the oracle's lag/cumsum uses ``<`` likewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround
from mapreduce_6_824_lab1_spark.registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

TUMBLING_ORACLE = f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS cnt,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM events
GROUP BY 1, 2
"""


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling window aggregation — shared by batch and streaming."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query("window_tumbling", oracle=TUMBLING_ORACLE)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per type per 1-hour tumbling window.

    100 TB: one hash shuffle on (hour, type) with map-side partials; window
    assignment is a pure projection (no expand — tumbling = 1 window/row).
    """
    return tumbling_agg(load_table(spark, sf_dir, "events"))


@query(
    "window_sliding",
    oracle=f"""
SELECT strftime(base - k * INTERVAL 15 MINUTE, '{TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS cnt,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM (
    -- make_timestamp keeps the value timezone-naive (to_timestamp would
    -- produce TIMESTAMPTZ and strftime would then depend on session tz)
    SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000)
               AS base,
           event_type, value
    FROM events
) e, (SELECT unnest([0, 1, 2, 3]) AS k) ks
GROUP BY 1, 2
""",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes (each event lands in 4 windows).

    Spark expands each row into window_len/slide copies (Expand) then hash
    aggregates; the oracle mirrors that expansion explicitly. 100 TB: the 4×
    expand happens AFTER scan-side filters, and partial agg collapses it
    before the shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


SESSION_GAP_MIN = 30

SESSION_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     < INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 0 ELSE 1 END AS new_s
    FROM events
),
sess AS (
    SELECT user_id, ts, value,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       count(*) AS n_events,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM sess
GROUP BY user_id, sid
"""


@query("window_session", oracle=SESSION_ORACLE)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization per user with a 30-minute inactivity gap.

    Uses native ``session_window`` (merging-window state machine). The oracle
    derives identical sessions with the classic lag/gap/cumsum pattern — the
    two formulations agreeing is itself the correctness check for the gap
    boundary. 100 TB: one shuffle on user_id; sessions merge locally
    per key. Streaming variant: same groupBy with a watermark
    (see streaming module notes).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Dynamic-gap sessionization — per-event inactivity timeout (purchases hold
# a session open longer than passive views: the standard engagement-
# weighted session model). Spark's merging-session state machine takes the
# gap as an EXPRESSION; the relational oracle generalizes the lag/cumsum
# pattern to a running max of (ts + gap) — with variable gaps the previous
# EVENT is no longer the latest-expiring one, so the break test must
# compare against the running maximum, not lag(ts).
# ---------------------------------------------------------------------------

DYN_GAP_DEFAULT_MIN = 20
DYN_GAP_PURCHASE_MIN = 40

SESSION_DYNAMIC_ORACLE = f"""
WITH g AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN event_type = 'purchase'
                THEN INTERVAL {DYN_GAP_PURCHASE_MIN} MINUTE
                ELSE INTERVAL {DYN_GAP_DEFAULT_MIN} MINUTE END AS gap
    FROM events
),
flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts < max(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 0 ELSE 1 END AS new_s
    FROM g
),
sess AS (
    SELECT user_id, ts, value,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       count(*) AS n_events,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM sess
GROUP BY user_id, sid
"""


@query("window_session_dynamic", oracle=SESSION_DYNAMIC_ORACLE)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization where each event carries its own gap duration.

    Same one-shuffle profile as ``window_session``; the gap expression is
    evaluated map-side. Session end is exclusive on both engines: an event
    arriving exactly at the previous session's expiry starts a new session.
    """
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", f"{DYN_GAP_PURCHASE_MIN} minutes"
    ).otherwise(f"{DYN_GAP_DEFAULT_MIN} minutes")
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Event-time RANGE frame: rolling last-hour stats per user
# ---------------------------------------------------------------------------

RANGE_US = 3_600_000_000  # one hour in microseconds

TIME_RANGE_ORACLE = f"""
SELECT event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
           AS sum_cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {RANGE_US} PRECEDING AND CURRENT ROW)
"""


@query("window_time_range", oracle=TIME_RANGE_ORACLE)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling one-hour event count and value sum per user — the RANGE
    frame keyed on EVENT TIME ([t-1h, t] inclusive), where the tumbling/
    sliding windows bucket time instead.

    The frame bound is integer microseconds over ``unix_micros(ts)``, so
    both engines evaluate the identical inclusive interval — an INTERVAL-
    typed bound would tie the comparison to each engine's timestamp
    coercion rules. RANGE (not ROWS) makes simultaneous events peers:
    every row at the same instant sees the same frame, so the result is
    insensitive to tie order — no tiebreak column needed, unlike every
    ROWS frame in this module. 100 TB: one shuffle on user_id; frame
    state is bounded by each user's one-hour event rate, independent of
    history length.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-RANGE_US, 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(cents).over(w).cast("long").alias("sum_cents_1h"),
    )
