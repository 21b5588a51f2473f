"""Smoke pin for tools/stream_throughput.py: every shape must build a
valid streaming query against the rate source and record progress —
the harness is manual-run, so this keeps its shapes from rotting as
the streaming surface evolves."""

from __future__ import annotations

import json
import time


def test_qualified_batch_filter():
    """Round-14 ask #5 plumbing: the min-batches loop counts only
    post-warm-up batches that processed rows — the same filter the
    median uses, so 'enough batches' means 'enough SAMPLES'."""
    from tools.stream_throughput import _qualified

    prog = [
        {"numInputRows": 10, "processedRowsPerSecond": 1.0},  # warm-up
        {"numInputRows": 10, "processedRowsPerSecond": 1.0},  # warm-up
        {"numInputRows": 0},  # empty batch
        {"numInputRows": 10, "processedRowsPerSecond": 2.0},
        {"numInputRows": 10},  # no rps field
        {"numInputRows": 10, "processedRowsPerSecond": 3.0},
    ]
    assert [p["processedRowsPerSecond"] for p in _qualified(prog)] == [2.0, 3.0]


def test_throughput_shapes_build_and_progress(spark):
    from tools.stream_throughput import _shapes

    shapes = _shapes(spark, rate=5_000)
    assert set(shapes) == {"project", "tumbling", "dedup", "session"}
    # run the most stateful shape briefly; the others share the source
    q = (
        shapes["tumbling"]()
        .writeStream.format("noop")
        .outputMode("update")
        .option(
            "checkpointLocation",
            f"/tmp/stream_tp_smoke_{time.time_ns()}",
        )
        .start()
    )
    try:
        deadline = time.time() + 30
        seen = 0
        while time.time() < deadline:
            time.sleep(2)
            prog = [json.loads(str(p)) for p in q.recentProgress]
            seen = sum(p.get("numInputRows", 0) for p in prog)
            if seen > 0:
                break
        assert seen > 0, "no rows processed within 30s"
    finally:
        q.stop()
