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
