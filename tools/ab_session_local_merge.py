"""A/B: session-window local partial merge (round 14).

The streaming session shape is the suite's weakest throughput point
(~3.6M rows/s sustained vs the 8M offered rate the other shapes hold —
STREAM_THROUGHPUT_r14.jsonl). Spark ships a public knob for exactly this
shape: ``spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition``
(default false) sorts each input partition by (key, start) and merges
overlapping sessions MAP-SIDE before the stateful shuffle. With the
throughput harness's event stream (10k users, 3s gap, 2.5M rows/s) each
user emits hundreds of rows per batch that all collapse into one local
candidate session, so the shuffle shrinks by orders of magnitude — the
classic partial-aggregate trade (extra local sort CPU vs shuffle volume)
that decides itself differently per workload, hence measured, not guessed.

Protocol (same discipline as the CC-contraction A/B, SCALING_r13):
interleaved arms in BOTH orders (off,on,on,off,off,on ...), >=3 runs per
arm, each run its own streaming query + checkpoint, median
processedRowsPerSecond over >=MIN_BATCHES qualified batches per run.
Output identity is checked on the bounded registry key
(stream_session_window) with the conf off vs on — the knob is a physical
rewrite (MergingSessionsExec), so results must hash-identical.

At 1000 executors the shuffle written by the session shape is the state
store's ingest; cutting it map-side is a bigger win there than any local
number shows, but ONLY if the local A/B proves the sort doesn't eat the
gain — which is what this measures.

Usage: python tools/ab_session_local_merge.py [--rate 2500000]
           [--runs-per-arm 3] [--min-batches 5] [--max-seconds 120]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CONF = "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition"


def _argint(flag: str, default: int) -> int:
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def _events(spark, rate, rows_per_batch=None):
    # Same event shape as tools/stream_throughput.py so the numbers are
    # comparable to the recorded suite medians. With --rows-per-batch the
    # ``rate-micro-batch`` source is used instead: EXACTLY that many rows
    # per micro-batch, so batch duration measures per-batch processing
    # cost with no backlog compounding — the clean design when the knob
    # under test changes capacity (an oversubscribed ``rate`` source
    # falls behind at a rate that depends on the knob itself, so its
    # batch sizes diverge between arms and the medians stop comparing
    # like-for-like; see the capped 5M attempt in SCALING_r14).
    if rows_per_batch:
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", str(rows_per_batch))
            .option("advanceMillisPerBatch", "1000")
            .option("numPartitions", "8")
            .load()
        )
    else:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rate))
            .option("numPartitions", "8")
            .load()
        )
    return src.select(
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(10_000)).alias("user_id"),
    )


def _qualified(prog):
    return [
        p for p in prog[2:]
        if p.get("numInputRows", 0) > 0 and "processedRowsPerSecond" in p
    ]


def run_once(spark, rate, min_batches, max_seconds, rows_per_batch=None):
    q = (
        _events(spark, rate, rows_per_batch)
        .withWatermark("ts", "5 seconds")
        .groupBy(F.session_window("ts", "3 seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ab_slm_{time.time_ns()}")
        .start()
    )
    t0 = time.monotonic()
    prog = []
    while True:
        time.sleep(2)
        elapsed = time.monotonic() - t0
        prog = [json.loads(str(p)) for p in q.recentProgress]
        if len(_qualified(prog)) >= min_batches or elapsed >= max_seconds:
            break
    q.stop()
    rows = _qualified(prog)
    if not rows:
        return {"error": "no progress"}
    rps = sorted(p["processedRowsPerSecond"] for p in rows)
    durs = sorted(p["batchDuration"] for p in rows)
    return {
        "median_rows_per_sec": round(rps[len(rps) // 2]),
        "median_batch_ms": durs[len(durs) // 2],
        "max_batch_ms": durs[-1],
        "batches": len(rows),
        "capped": len(rows) < min_batches or None,
    }


def interleaved_order(runs_per_arm: int) -> list[str]:
    """Interleave arms in BOTH orders (off,on / on,off alternating) so a
    monotone host drift cannot masquerade as an arm effect."""
    order: list[str] = []
    for i in range(runs_per_arm):
        order += ["off", "on"] if i % 2 == 0 else ["on", "off"]
    return order


def identity_check(spark) -> dict:
    """Bounded registry key (stream_session_window) hashed with the conf
    off vs on — MergingSessionsExec is a physical rewrite; outputs must
    be identical."""
    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    def fingerprint():
        df = QUERIES["stream_session_window"](spark, sf_dir)
        row = (
            df.select(
                F.xxhash64(
                    *[F.col(c).cast("string") for c in sorted(df.columns)]
                ).alias("h")
            )
            .agg(
                F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
                F.count(F.lit(1)).alias("rows"),
            )
            .collect()[0]
        )
        return (int(row["rows"]), int(row["hsum"]))

    with scoped_conf(spark, {CONF: "false"}):
        off = fingerprint()
    with scoped_conf(spark, {CONF: "true"}):
        on = fingerprint()
    return {"off": off, "on": on, "identical": off == on}


def main() -> None:
    rate = _argint("--rate", 2_500_000)
    rows_per_batch = _argint("--rows-per-batch", 0) or None
    runs_per_arm = _argint("--runs-per-arm", 3)
    min_batches = _argint("--min-batches", 5)
    max_seconds = _argint("--max-seconds", 120)

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-session-local-merge")
    spark.sparkContext.setLogLevel("ERROR")

    if "--identity-only" in sys.argv:
        ident = identity_check(spark)
        print(json.dumps({"conf": CONF, "identity": {
            "off": list(ident["off"]), "on": list(ident["on"]),
            "identical": bool(ident["identical"])}}))
        spark.stop()
        return

    order = interleaved_order(runs_per_arm)

    runs = []
    for arm in order:
        spark.conf.set(CONF, "true" if arm == "on" else "false")
        r = run_once(spark, rate, min_batches, max_seconds, rows_per_batch)
        r["arm"] = arm
        runs.append(r)
        print(f"  {arm}: {r}", file=sys.stderr)

    ident = identity_check(spark)
    print(f"  identity: {ident}", file=sys.stderr)

    def med(arm, field):
        xs = sorted(
            r[field] for r in runs if r["arm"] == arm and field in r
        )
        return xs[len(xs) // 2] if xs else None

    print(json.dumps({
        "conf": CONF,
        "rate": rate,
        "rows_per_batch": rows_per_batch,
        "runs": runs,
        "median_off": med("off", "median_rows_per_sec"),
        "median_on": med("on", "median_rows_per_sec"),
        "median_batch_ms_off": med("off", "median_batch_ms"),
        "median_batch_ms_on": med("on", "median_batch_ms"),
        "identity_ok": bool(ident["identical"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
