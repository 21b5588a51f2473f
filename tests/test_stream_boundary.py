"""Pin the stream_tumbling_watermark finalization boundary.

The oracle finalizes windows whose end is <= max(ts) - delay (INCLUSIVE).
Spark's append-mode emission of a window whose end EQUALS the watermark
exactly is a documented-ambiguous boundary (the state-store eviction uses
`window.end <= watermark` but the exact-equality case has shifted between
releases). Rather than depend on which inequality this Spark build uses,
this test pins that the ambiguity is UNREACHABLE at every tested scale
factor: the final watermark (max(ts) - delay) never lands exactly on an
hour boundary, so no window end can equal it.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_6_824_lab1_spark.streaming.jobs import WATERMARK_DELAY_MIN


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_final_watermark_never_on_hour_boundary(sf):
    on_boundary = duckdb.sql(
        f"""
        SELECT date_trunc('hour', max(ts) - INTERVAL {WATERMARK_DELAY_MIN} MINUTE)
               = max(ts) - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
        FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
        """
    ).fetchone()[0]
    assert on_boundary is False, (
        f"final watermark at sf{sf} lands exactly on an hour boundary; "
        "the oracle's inclusive <= and Spark's append finalization could "
        "now differ by one window row — pick a different delay"
    )


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_final_watermark_never_on_quarter_hour_boundary(sf):
    """Same pin for stream_sliding_watermark: sliding window ends lie on
    the 15-minute grid, so the ambiguity needs max(ts) - delay to land
    exactly on a quarter-hour."""
    on_boundary = duckdb.sql(
        f"""
        SELECT CAST(floor(epoch(max(ts) - INTERVAL {WATERMARK_DELAY_MIN}
                   MINUTE) / 900) * 900 AS BIGINT)
               = CAST(epoch(max(ts) - INTERVAL {WATERMARK_DELAY_MIN}
                   MINUTE) AS BIGINT)
               AND epoch(max(ts)) = floor(epoch(max(ts)))
        FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
        """
    ).fetchone()[0]
    assert on_boundary is False, (
        f"final watermark at sf{sf} lands exactly on a quarter-hour; "
        "stream_sliding_watermark's oracle and Spark could differ by one "
        "window row - pick a different delay"
    )


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_no_session_end_on_final_watermark(sf):
    """stream_session_window pin: no session's end (last event + 30 min
    gap) coincides with the final watermark to the microsecond."""
    hits = duckdb.sql(
        f"""
        WITH ev AS (
            SELECT * FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
        ),
        mx AS (SELECT max(ts) AS m FROM ev),
        flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) < INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM ev
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT count(*) FROM (
            SELECT max(ts) AS en FROM sess GROUP BY user_id, sid
        ) s, mx
        WHERE en + INTERVAL 30 MINUTE
              = mx.m - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
        """
    ).fetchone()[0]
    assert hits == 0, (
        f"a session end at sf{sf} lands exactly on the final watermark; "
        "append emission of that session is release-ambiguous"
    )


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_no_error_window_close_on_join_watermark(sf):
    """stream_stream_left_outer pin: no error's match window closes exactly
    on the join's final watermark (min of per-side max ts, minus 1 h)."""
    hits = duckdb.sql(
        f"""
        WITH ev AS (
            SELECT * FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
        ),
        mx AS (
            SELECT least(
                (SELECT max(ts) FROM ev WHERE event_type = 'error'),
                (SELECT max(ts) FROM ev WHERE event_type = 'purchase')
            ) AS m
        )
        SELECT count(*) FROM ev, mx
        WHERE event_type = 'error'
          AND ts + INTERVAL 30 MINUTE = mx.m - INTERVAL 1 HOUR
        """
    ).fetchone()[0]
    assert hits == 0


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_no_purchase_state_close_on_join_watermark(sf):
    """stream_stream_full_outer pin: no purchase's state provably closes
    exactly on the join's final watermark — the right-side sibling of the
    error-window pin above (a purchase's candidate range ends at its own
    ts, so the boundary is ts == watermark itself)."""
    hits = duckdb.sql(
        f"""
        WITH ev AS (
            SELECT * FROM read_parquet('/root/testdata/sf{sf}/events.parquet')
        ),
        mx AS (
            SELECT least(
                (SELECT max(ts) FROM ev WHERE event_type = 'error'),
                (SELECT max(ts) FROM ev WHERE event_type = 'purchase')
            ) AS m
        )
        SELECT count(*) FROM ev, mx
        WHERE event_type = 'purchase'
          AND ts = mx.m - INTERVAL 1 HOUR
        """
    ).fetchone()[0]
    assert hits == 0


def test_stateful_ns_normalization_paths_identical(spark):
    """ADVICE r3 carry-over: the sessionizer's two Spark-version read paths
    (legacy long-ns vs native TIMESTAMP_NTZ µs) must classify gap
    boundaries identically. Both paths now truncate to µs grain; prove the
    arithmetic identity on values WITH sub-µs components: for any raw ns
    value x, (x - x % 1000) == unix_micros(timestamp_micros(x div 1000)) *
    1000 — i.e. the legacy truncation equals the NTZ read (ns→µs truncate)
    re-expressed as long ns."""
    from pyspark.sql import functions as F

    raw = [0, 999, 1000, 1001, 123_456_789, 10**18 + 999, 10**18 + 1000]
    df = spark.createDataFrame([(x,) for x in raw], "ts LONG")
    legacy = df.select(
        (F.col("ts") - F.col("ts") % F.lit(1000)).cast("long").alias("v")
    )
    ntz_like = df.select(
        (
            F.unix_micros(F.timestamp_micros(F.expr("ts div 1000")))
            * F.lit(1000)
        )
        .cast("long")
        .alias("v")
    )
    assert [r.v for r in legacy.collect()] == [r.v for r in ntz_like.collect()]
