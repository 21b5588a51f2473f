"""Smoke pin for tools/stream_throughput.py: every shape must build a
valid streaming query against the rate source and record progress —
the harness is manual-run, so this keeps its shapes from rotting as
the streaming surface evolves."""

from __future__ import annotations

import json
import time


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
