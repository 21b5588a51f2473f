"""Event analytics — funnel, cohort retention, multi-resolution rollup.

The product-analytics layer a training-data/event pipeline runs on its
``events`` table (reference has no equivalent — driver extension mandate,
same lineage as the temporal/window surface). All three are pure built-in
columnar plans: hash aggregates and equi-joins keyed on ``user_id`` or the
time bucket — no Python, no window-function-over-everything.

Scale notes per query are in each docstring; the common rule: everything
aggregates per ``user_id`` (150 distinct per fixture, millions in prod)
BEFORE any join, so shuffle traffic is O(users), not O(events).

Oracle parity: ``events.ts`` goes through ``catalog.load_table`` (ns→µs
normalization, FIXTURES.md); output timestamps are second-precision strings;
week buckets are ``date_trunc('week', …)`` (ISO Monday) on both engines;
week offsets are integer-day differences divided by 7 (cast to BIGINT) so
no engine-specific "week diff" semantics are involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround, sql_hround
from mapreduce_6_824_lab1_spark.registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_ORACLE = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
)
SELECT * FROM (
    SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type,
           (SELECT count(*) FROM s1) AS users
    UNION ALL
    SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM s3)
)
"""


@query("events_funnel", oracle=FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: users counted at step N only
    if step N's event happened strictly AFTER their first step-N-1 event.

    Plan: three per-user min-aggregates, each joined to the previous stage
    on ``user_id`` — every join and aggregate shares the user_id hash
    partitioning, so stages 2 and 3 reuse the shuffle. Traffic is O(users)
    after the first aggregate. 100 TB: identical; the per-step filter
    pushes ``event_type`` into the scan, and a longer funnel is just more
    stages on the same key.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )

    def stage(step_type: str, prev: DataFrame | None) -> DataFrame:
        e = events.filter(F.col("event_type") == step_type)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        return e.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    s1 = stage(FUNNEL_STEPS[0], None)
    s2 = stage(FUNNEL_STEPS[1], s1)
    s3 = stage(FUNNEL_STEPS[2], s2)
    counts = [
        s.agg(F.count(F.lit(1)).alias("users")).withColumn(
            "step", F.lit(i + 1)
        ).withColumn("event_type", F.lit(FUNNEL_STEPS[i]))
        for i, s in enumerate((s1, s2, s3))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select("step", "event_type", "users")


COHORT_ORACLE = f"""
WITH cohorts AS (
    SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
    FROM events
)
SELECT strftime(c.cohort_week, '{TS_FMT_DUCK}') AS cohort_week,
       CAST(datediff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
           AS week_offset,
       count(*) AS active_users
FROM cohorts c JOIN activity a ON c.user_id = a.user_id
GROUP BY 1, 2
"""


@query("cohort_retention", oracle=COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    in every later week they were active (the classic retention triangle).

    Plan: per-user min-week aggregate + per-(user, week) distinct — both
    shuffle once on user_id and the join reuses that partitioning; the
    final count shuffles the tiny (cohort, offset) grid. 100 TB: the
    distinct is the dominant cost and is exactly a partial-aggregated
    dedup; nothing here is O(events²).
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.date_trunc("week", F.col("ts"))
    cohorts = events.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    activity = events.select(
        "user_id", week.alias("active_week")
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", TS_FMT_SPARK).alias("cohort_week"),
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


ROLLUP_ORACLE = f"""
WITH base AS (
    SELECT date_trunc('hour', ts) AS hour_b, date_trunc('day', ts) AS day_b,
           event_type, value
    FROM events
)
SELECT CASE WHEN GROUPING(hour_b) = 0 THEN 'hour' ELSE 'day' END AS resolution,
       strftime(coalesce(hour_b, day_b), '{TS_FMT_DUCK}') AS bucket,
       event_type,
       count(*) AS cnt,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value
FROM base
GROUP BY GROUPING SETS ((hour_b, event_type), (day_b, event_type))
"""


@query("rollup_multires", oracle=ROLLUP_ORACLE)
def rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (hypertable-style continuous aggregate):
    hourly AND daily per-type aggregates in ONE pass via GROUPING SETS.

    Plan: a single Expand (×2) feeding one hash aggregate — one scan, one
    shuffle, versus two full passes if the resolutions ran separately.
    100 TB: this is how downsample hierarchies are built; adding weekly/
    monthly costs one more Expand row, not another scan. Map-side partials
    apply per grouping set.
    """
    events = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour_b"),
        F.date_trunc("day", "ts").alias("day_b"),
        "event_type",
        "value",
    )
    return (
        events.groupingSets(
            [["hour_b", "event_type"], ["day_b", "event_type"]],
            "hour_b",
            "day_b",
            "event_type",
        )
        .agg(
            F.grouping("hour_b").alias("_ghour"),
            F.count(F.lit(1)).alias("cnt"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.when(F.col("_ghour") == 0, F.lit("hour"))
            .otherwise(F.lit("day"))
            .alias("resolution"),
            F.date_format(F.coalesce("hour_b", "day_b"), TS_FMT_SPARK).alias(
                "bucket"
            ),
            "event_type",
            "cnt",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregation — materialized-view maintenance. A 100 TB events
# table is append-only: re-scanning all history to refresh a daily rollup
# is the single most common waste in production pipelines. Because these
# aggregates are algebraic (count/sum/min/max partials merge losslessly),
# the refresh is agg(old-partial ⊎ delta-partial) — history is never
# rescanned, only its |groups|-row summary. The oracle is the FULL
# recompute: merging partials must be exactly equivalent.
# ---------------------------------------------------------------------------

INCR_CUTOFF = "2024-01-21 00:00:00"


@query(
    "incremental_agg",
    oracle=f"""
SELECT event_type,
       count(*) AS n_events,
       floor((sum(value)) * 100 + 0.5) / 100 AS total_value,
       floor((avg(value)) * 10000 + 0.5) / 10000 AS avg_value,
       floor((min(value)) * 100 + 0.5) / 100 AS min_value,
       floor((max(value)) * 100 + 0.5) / 100 AS max_value
FROM events
GROUP BY event_type
""",
)
def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge a historical partial aggregate with a fresh-delta partial.

    ``old`` stands in for the stored summary table (in production it is
    read back, not recomputed); ``delta`` is the newly-arrived partition.
    avg is NOT stored — it is derived at merge time from the mergeable
    sum/count pair, the textbook algebraic-vs-holistic distinction.
    """
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")
    old = partial(ev.where(F.col("ts") < cutoff))
    delta = partial(ev.where(F.col("ts") >= cutoff))
    return (
        old.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            hround(F.sum("s"), 2).alias("total_value"),
            hround(F.sum("s") / F.sum("n"), 4).alias("avg_value"),
            hround(F.min("mn"), 2).alias("min_value"),
            hround(F.max("mx"), 2).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Anomaly detection — the built-in two-pass z-score formulation that
# pandas_normalize's docstring names as its scale escape hatch: aggregate
# per-group moments (tiny), broadcast them back, flag outliers map-side.
# No Python, no per-group Arrow batch, no giant-group failure mode — the
# group count bounds the broadcast, not the group SIZE.
# ---------------------------------------------------------------------------

ANOMALY_Z = 3.0


@query(
    "anomaly_zscore",
    oracle=f"""
WITH m AS (
    SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type,
       floor(((value - mu) / sd) * 10000 + 0.5) / 10000 AS zscore
FROM events e JOIN m ON e.event_type = m.event_type
WHERE abs((value - mu) / sd) > {ANOMALY_Z}
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events more than 3 sigma from their type's mean (two-pass, map-side).

    Pass 1 is one partial-agg shuffle producing |groups| rows; pass 2 is a
    broadcast join + filter — the full table is scanned exactly twice and
    never shuffled. Compare ``pandas_normalize``: same math, but that
    formulation shuffles every row into per-group Arrow batches. This is
    the shape that survives a 10-billion-row group.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.functions import broadcast

    m = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(broadcast(m), "event_type")
        .where(F.abs(z) > ANOMALY_Z)
        .select("event_id", "event_type", hround(z, 4).alias("zscore"))
    )


# ---------------------------------------------------------------------------
# Calendar spine — "which days had NO orders" can't be answered by any
# aggregation of rows that exist; it needs a generated dimension. The spine
# comes from sequence() over a broadcast 1-row (min, max) aggregate — no
# collect, no driver round-trip, no hand-maintained calendar table — then
# an anti-join against the observed dates.
# ---------------------------------------------------------------------------


@query(
    "date_spine_gaps",
    oracle="""
WITH span AS (
    SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM span
)
SELECT strftime(d, '%Y-%m-%d') AS gap_day
FROM spine
WHERE d NOT IN (SELECT DISTINCT o_orderdate FROM orders)
""",
)
def date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days inside the order span with zero orders (generated date spine).

    100 TB: the spine is O(days) regardless of fact size; the observed-date
    side collapses to DISTINCT dates (partial-agg shuffle of |days| rows)
    before the broadcast anti-join. The fact table itself never shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.functions import broadcast

    span = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    spine = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    )
    observed = o.select(F.col("o_orderdate").alias("d")).distinct()
    return (
        spine.join(broadcast(observed), "d", "left_anti")
        .select(F.date_format("d", "yyyy-MM-dd").alias("gap_day"))
    )


# ---------------------------------------------------------------------------
# Time-series resampling with forward fill — the spine pattern's second
# act: regularize an irregular event series onto a daily grid, carrying the
# last observation forward across gap days (LOCF). The grid is O(days ×
# |groups|) regardless of fact size; the fact table contributes one
# partial-agg shuffle and never joins at raw-row grain.
# ---------------------------------------------------------------------------


@query(
    "timeseries_ffill",
    oracle="""
WITH span AS (
    SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM span
),
daily AS (
    SELECT o_orderpriority AS prio, o_orderdate AS d,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1, 2
),
grid AS (
    SELECT p.prio, s.d FROM spine s
    CROSS JOIN (SELECT DISTINCT o_orderpriority AS prio FROM orders) p
)
SELECT g.prio,
       strftime(g.d, '%Y-%m-%d') AS day,
       CASE WHEN daily.cents IS NULL THEN 0 ELSE 1 END AS observed,
       coalesce(last_value(daily.cents IGNORE NULLS)
                    OVER (PARTITION BY g.prio ORDER BY g.d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                0) AS filled_cents
FROM grid g LEFT JOIN daily ON daily.prio = g.prio AND daily.d = g.d
""",
)
def timeseries_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue per order priority on a complete date spine, gaps
    filled with the last observed value (LOCF; 0 before the first
    observation). Money aggregates as integer cents, so the carried value
    is engine-exact. One fact shuffle (the daily partial agg), a generated
    spine, and one window per group — at 100 TB the window runs over
    |days| rows per group, not over the fact table."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("d"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    span = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dims = o.select(F.col("o_orderpriority").alias("prio")).distinct()
    grid = spine.crossJoin(broadcast(dims))
    joined = grid.join(broadcast(daily), ["prio", "d"], "left")
    w = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "prio",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("cents").isNull(), 0).otherwise(1).alias("observed"),
        F.coalesce(
            F.last("cents", ignorenulls=True).over(w), F.lit(0)
        ).alias("filled_cents"),
    )


# ---------------------------------------------------------------------------
# Time-series resampling with LINEAR interpolation — the spine pattern's
# third act. LOCF (timeseries_ffill) repeats the last value; interpolation
# draws the straight line between the bracketing observations, the standard
# resampling rule for sensor/metric series (pandas ``interpolate``,
# InfluxDB/Timescale gap-fill). Outside the observed span there is no
# bracket, so those rows stay NULL — an honest edge, not an extrapolation.
# ---------------------------------------------------------------------------


@query(
    "timeseries_interpolate",
    oracle="""
WITH span AS (
    SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM span
),
daily AS (
    SELECT o_orderpriority AS prio, o_orderdate AS d,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1, 2
),
grid AS (
    SELECT p.prio, s.d FROM spine s
    CROSS JOIN (SELECT DISTINCT o_orderpriority AS prio FROM orders) p
),
ctx AS (
    SELECT g.prio, g.d, daily.cents,
           last_value(daily.cents IGNORE NULLS)
               OVER (PARTITION BY g.prio ORDER BY g.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_cents,
           last_value(CASE WHEN daily.cents IS NOT NULL THEN g.d END
                      IGNORE NULLS)
               OVER (PARTITION BY g.prio ORDER BY g.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_d,
           first_value(daily.cents IGNORE NULLS)
               OVER (PARTITION BY g.prio ORDER BY g.d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_cents,
           first_value(CASE WHEN daily.cents IS NOT NULL THEN g.d END
                       IGNORE NULLS)
               OVER (PARTITION BY g.prio ORDER BY g.d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_d
    FROM grid g LEFT JOIN daily ON daily.prio = g.prio AND daily.d = g.d
)
SELECT prio,
       strftime(d, '%Y-%m-%d') AS day,
       CASE WHEN cents IS NOT NULL THEN 'obs'
            WHEN prev_cents IS NOT NULL AND next_cents IS NOT NULL
                THEN 'interp'
            ELSE 'edge' END AS kind,
       CASE WHEN cents IS NOT NULL THEN cents
            WHEN prev_cents IS NOT NULL AND next_cents IS NOT NULL
                THEN CAST(floor(
                         CAST(prev_cents AS DOUBLE)
                         + CAST(next_cents - prev_cents AS DOUBLE)
                           * (CAST(date_diff('day', prev_d, d) AS DOUBLE)
                              / CAST(date_diff('day', prev_d, next_d)
                                     AS DOUBLE))
                         + 0.5) AS BIGINT)
            ELSE NULL END AS value_cents
FROM ctx
""",
)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue per order priority on a complete date spine, gap days
    LINEARLY interpolated between the bracketing observations; days before
    the first / after the last observation stay NULL (kind='edge').

    Interpolation arithmetic is pinned engine-portable: observations are
    exact integer cents; the interpolated value is computed in ONE shape on
    both engines — prev + (next−prev) · (Δprev / Δspan) with every operand
    explicitly cast to double before the multiply/divide, then
    floor(x+0.5) back to BIGINT — so the IEEE result is bit-identical and
    the driver hash is exact.

    Scale shape is identical to ``timeseries_ffill``: one fact-table
    partial agg (the daily rollup), a generated O(days) spine broadcast
    against it, and per-group windows over |days| rows — two window passes
    (backward carry + forward carry) instead of LOCF's one. The fact table
    never shuffles at row grain, so 100× the orders only grows the first
    partial agg."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("d"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    span = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dims = o.select(F.col("o_orderpriority").alias("prio")).distinct()
    grid = spine.crossJoin(broadcast(dims))
    joined = grid.join(broadcast(daily), ["prio", "d"], "left")
    back = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    ctx = joined.select(
        "prio",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(back).alias("prev_cents"),
        F.last(obs_d, ignorenulls=True).over(back).alias("prev_d"),
        F.first("cents", ignorenulls=True).over(fwd).alias("next_cents"),
        F.first(obs_d, ignorenulls=True).over(fwd).alias("next_d"),
    )
    bracketed = F.col("prev_cents").isNotNull() & F.col("next_cents").isNotNull()
    interp = F.floor(
        F.col("prev_cents").cast("double")
        + (F.col("next_cents") - F.col("prev_cents")).cast("double")
        * (
            F.datediff("d", "prev_d").cast("double")
            / F.datediff("next_d", "prev_d").cast("double")
        )
        + F.lit(0.5)
    ).cast("long")
    return ctx.select(
        "prio",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("cents").isNotNull(), F.lit("obs"))
        .when(bracketed, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("kind"),
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(bracketed, interp)
        .alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# Funnel latency — time-to-convert distributions between funnel stages.
# events_funnel counts who converts; this measures HOW FAST: per-user
# first-qualifying timestamps per stage (same strictly-after chaining),
# then per-transition latency percentiles. Latencies are exact integer
# microseconds divided once by 1e6 in a pinned shape, and the percentile
# pair (Spark ``percentile`` == DuckDB ``quantile_cont``) is the same
# engine-portable pairing agg_percentiles established.
# ---------------------------------------------------------------------------


FUNNEL_LATENCY_ORACLE = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
),
lat AS (
    SELECT '{FUNNEL_STEPS[0]}->{FUNNEL_STEPS[1]}' AS transition,
           CAST(epoch_us(s2.t2) - epoch_us(s1.t1) AS DOUBLE) / 1000000.0
               AS lat_s
    FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    UNION ALL
    SELECT '{FUNNEL_STEPS[1]}->{FUNNEL_STEPS[2]}',
           CAST(epoch_us(s3.t3) - epoch_us(s2.t2) AS DOUBLE) / 1000000.0
    FROM s2 JOIN s3 ON s2.user_id = s3.user_id
)
SELECT transition,
       count(*) AS n_users,
       {sql_hround("quantile_cont(lat_s, 0.50)", 4)} AS p50_s,
       {sql_hround("quantile_cont(lat_s, 0.90)", 4)} AS p90_s,
       {sql_hround("avg(lat_s)", 4)} AS avg_s
FROM lat
GROUP BY transition
"""


@query("events_funnel_latency", oracle=FUNNEL_LATENCY_ORACLE)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between funnel stages (view→click, click→purchase):
    per-user first-qualifying timestamps with the same strictly-after
    chaining as ``events_funnel``, then count/p50/p90/mean of the latency
    per transition.

    Scale shape inherits the funnel's: three per-user min-aggregates
    chained on the user_id hash partitioning, so every stage join reuses
    one shuffle; the latency table is O(converting users) and the final
    aggregate has 2 groups. Latency arithmetic is pinned — integer µs
    difference, ONE divide by 1e6, percentile==quantile_cont — so the
    driver hash is exact."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )

    def stage(step_type: str, prev: DataFrame | None, out: str) -> DataFrame:
        e = events.filter(F.col("event_type") == step_type)
        if prev is not None:
            prev_t = prev.columns[-1]
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(out))

    s1 = stage(FUNNEL_STEPS[0], None, "t1")
    s2 = stage(FUNNEL_STEPS[1], s1, "t2")
    s3 = stage(FUNNEL_STEPS[2], s2, "t3")
    lat12 = (
        s1.join(s2, "user_id")
        .select(
            F.lit(f"{FUNNEL_STEPS[0]}->{FUNNEL_STEPS[1]}").alias("transition"),
            (
                (F.unix_micros("t2") - F.unix_micros("t1")).cast("double")
                / F.lit(1000000.0)
            ).alias("lat_s"),
        )
    )
    lat23 = (
        s2.join(s3, "user_id")
        .select(
            F.lit(f"{FUNNEL_STEPS[1]}->{FUNNEL_STEPS[2]}").alias("transition"),
            (
                (F.unix_micros("t3") - F.unix_micros("t2")).cast("double")
                / F.lit(1000000.0)
            ).alias("lat_s"),
        )
    )
    return (
        lat12.unionByName(lat23)
        .groupBy("transition")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            hround(F.expr("percentile(lat_s, 0.50)"), 4).alias("p50_s"),
            hround(F.expr("percentile(lat_s, 0.90)"), 4).alias("p90_s"),
            hround(F.avg("lat_s"), 4).alias("avg_s"),
        )
    )
