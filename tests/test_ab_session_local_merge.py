"""Pins for tools/ab_session_local_merge.py (round 14): the session-window
local-merge knob A/B. The throughput arms are manual-run (weather-dependent);
what tests can pin is (a) the output-identity check — the knob is a physical
rewrite and must not change results — and (b) the order-balanced interleave
that makes the arms weather-robust."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_identity_check_on_bounded_key(spark):
    """MergingSessionsExec (conf on) must produce byte-identical results
    to the default two-phase session merge on the bounded registry key."""
    from tools.ab_session_local_merge import identity_check

    ident = identity_check(spark)
    assert ident["identical"], ident
    assert ident["off"][0] > 0  # the fixture actually produced sessions


def test_conf_changes_streaming_plan(spark):
    """The knob must actually take effect: with it on, the streaming
    session aggregation plans a partial-merge (sort) before the shuffle.
    Guards against the conf name rotting across Spark upgrades — if
    Spark renames it, both plans come out identical and this fails."""
    from tools.ab_session_local_merge import CONF

    from mapreduce_6_824_lab1_spark.session import scoped_conf

    def plan():
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .withWatermark("timestamp", "5 seconds")
            .groupBy(F.session_window("timestamp", "3 seconds"), "value")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            df.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", f"/tmp/ab_slm_plan_{id(df)}")
            .start()
        )
        try:
            # the physical plan is only built once a batch is planned
            import time

            for _ in range(50):
                if q.lastProgress is not None:
                    break
                time.sleep(0.2)
            return str(q._jsq.explainInternal(False))
        finally:
            q.stop()

    with scoped_conf(spark, {CONF: "false"}):
        p_off = plan()
    with scoped_conf(spark, {CONF: "true"}):
        p_on = plan()
    assert p_off != p_on
    assert "MergingSessions" in p_on


def test_interleave_is_order_balanced():
    """Both orders appear: off-first and on-first alternate, so a
    monotone host drift cannot masquerade as an arm effect."""
    from tools.ab_session_local_merge import interleaved_order

    for runs in (1, 2, 3, 4):
        order = interleaved_order(runs)
        assert order.count("off") == order.count("on") == runs
        if runs >= 2:
            firsts = [order[i] for i in range(0, len(order), 2)]
            assert set(firsts) == {"off", "on"}
