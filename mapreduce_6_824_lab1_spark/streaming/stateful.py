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


def _run_session_stream(spark: SparkSession, sf_dir: str, attach) -> DataFrame:
    """Shared harness for the two custom-stateful sessionizers: long-ns
    normalization, per-user flush sentinel, time-ranged batch staging
    (maxFilesPerTrigger=1 so open sessions genuinely cross micro-batch
    boundaries through state), file-sink drain (session-grain output —
    see the sink-grain ruling in jobs.py), scratch detach. ``attach``
    maps the raw source stream to the sessionized stream."""
    configure(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The state machine, scratch files (_RAW_SCHEMA) and pandas loop all
    # speak long nanoseconds. Older Spark reads TIMESTAMP(NANOS) that way
    # via nanosAsLong; Spark 4.1+ reads it as TIMESTAMP_NTZ (µs) instead —
    # re-express as long ns (µs×1000 == DuckDB's truncation) in that case.
    # The long-ns path is truncated to µs granularity too ((ts div 1000) ×
    # 1000) so BOTH Spark-version paths classify session-gap boundaries
    # identically even if the fixture ever grows sub-µs components.
    if not isinstance(raw.schema["ts"].dataType, LongType):
        raw = raw.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "long"
            ),
        )
    else:
        raw = raw.withColumn(
            "ts", (F.col("ts") - F.col("ts") % F.lit(1000)).cast("long")
        )
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


class _TypeCountProcessor(_BootstrappedProcessor):
    """MapState processor: per user (the grouping key), a map
    ``event_type -> (cnt, total_cents)`` updated batch-by-batch; each
    batch EMITS the new cumulative row for every type it touched (the
    update-mode changelog shape). State is one map entry per
    (user, type) — domain-bounded per user, never per-event."""

    def init(self, handle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "cnt long, tot long"
        )

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        # integer-cents quantization, the repo-wide exact-sum convention
        cents = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype(
            "int64"
        )
        agg = (
            pd.DataFrame({"et": pdf["event_type"], "c": cents})
            .groupby("et")["c"]
            .agg(["count", "sum"])
        )
        users, types, cnts, tots = [], [], [], []
        for et, row in agg.iterrows():
            prior = self._counts.getValue((et,))
            n0, t0 = prior if prior is not None else (0, 0)
            n, t = n0 + int(row["count"]), t0 + int(row["sum"])
            self._counts.updateValue((et,), (n, t))
            users.append(user_id)
            types.append(et)
            cnts.append(n)
            tots.append(t)
        yield pd.DataFrame(
            {
                "user_id": pd.Series(users, dtype="int64"),
                "event_type": types,
                "cnt": pd.Series(cnts, dtype="int64"),
                "total_cents": pd.Series(tots, dtype="int64"),
            }
        )


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
            statefulProcessor=_TypeCountProcessor(),
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
        ev.select("user_id").distinct().select(
            "user_id",
            F.lit(FLUSH).alias("event_type"),
            F.lit(0.0).alias("value"),
        ).coalesce(1).write.mode("overwrite").parquet(f"{scratch}/flush")
        # slice order is irrelevant (appends commute); only the flush
        # file must sort LAST by mtime so the sentinel batch is final —
        # an explicit far-future-of-the-slices stamp (slices sit at
        # base..base+180), not a sleep (round-8 ADVICE: timing-based
        # ordering could deliver the flush mid-stream on a coarse-mtime
        # filesystem, dropping a slice from every user's median)
        _stamp_mtime(f"{scratch}/flush", int(time.time()) + 3600)
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
