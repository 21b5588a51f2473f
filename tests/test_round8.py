"""Round-8 additions: stream_session_tws registration, the deferred
protobuf bootstrap (no import-time sys.path / validator mutation in
processes that never touch TWS), and the ADVICE-driven unwind/rebind
hardening of ensure_protobuf(). Process-global import effects are pinned
in SUBPROCESSES — inside this pytest process other tests have already
opened the protobuf gate, so a fresh interpreter is the only honest
fixture for "pristine environment" claims."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr}"
    return out.stdout


def test_tws_is_registered_with_oracle():
    """Round-8 verdict ask #2: the freeze lifted (264/264 union closed),
    so stream_session_tws must be a first-class registry key with the
    shared window_session oracle (same SESSION_ORACLE as its GroupState
    twin)."""
    from mapreduce_6_824_lab1_spark import ORACLES, QUERIES
    from mapreduce_6_824_lab1_spark.operators.temporal import SESSION_ORACLE

    assert "stream_session_tws" in QUERIES
    assert ORACLES["stream_session_tws"] == SESSION_ORACLE
    assert ORACLES["stream_session_stateful"] == SESSION_ORACLE


def test_registry_import_leaves_protobuf_env_pristine():
    """Deferred bootstrap (round-8 ADVICE): importing the full registry —
    which registers stream_session_tws — must NOT append the fallback dir
    to sys.path, install the lenient validator, or resolve the fallback.
    Only an actual TWS run (or processor unpickle) may do that."""
    _run(
        "import sys\n"
        "import mapreduce_6_824_lab1_spark  # full registry, incl. TWS\n"
        "from mapreduce_6_824_lab1_spark import protobuf_compat as pc\n"
        "assert not any(d in sys.path for d in pc.PROTOBUF_FALLBACK_DIRS), "
        "'fallback dir on sys.path at import'\n"
        "assert not pc._PATCHED, 'validator shim installed at import'\n"
        "assert not pc.USED_FALLBACK\n"
    )


def test_session_processor_unpickle_bootstraps_protobuf():
    """The worker-side guarantee the deferred design relies on: PICKLING
    the processor is side-effect-free, UNPICKLING it (what read_single_udf
    does in every worker, before the state client is constructed) runs
    ensure_protobuf() in the receiving process."""
    out = _run(
        "import pickle\n"
        "from mapreduce_6_824_lab1_spark.streaming.stateful import (\n"
        "    _SessionProcessor,\n"
        "    _TypeCountProcessor,\n"
        "    _MedianProcessor,\n"
        ")\n"
        "from mapreduce_6_824_lab1_spark import protobuf_compat as pc\n"
        "blob = pickle.dumps(_SessionProcessor())\n"
        "assert not pc.USED_FALLBACK, 'pickling must not open the gate'\n"
        "assert not pc._PATCHED\n"
        "try:\n"
        "    p = pickle.loads(blob)\n"
        "except RuntimeError:\n"
        "    # no runtime on this host: the hook must fail LOUDLY at\n"
        "    # unpickle, never opaquely inside the state client later\n"
        "    assert not pc._protobuf_usable()\n"
        "    print('NO_RUNTIME')\n"
        "else:\n"
        "    assert isinstance(p, _SessionProcessor)\n"
        "    assert pc._protobuf_usable(), 'unpickle must have bootstrapped'\n"
        "    # every TWS processor shares the hook via the base class\n"
        "    for cls in (_TypeCountProcessor, _MedianProcessor):\n"
        "        assert isinstance(\n"
        "            pickle.loads(pickle.dumps(cls())), cls\n"
        "        )\n"
        "    print('FALLBACK' if pc.USED_FALLBACK else 'INSTALLED')\n"
    )
    assert out.strip() in ("FALLBACK", "INSTALLED", "NO_RUNTIME")


def test_ensure_protobuf_smoke_failure_unwinds_global_state():
    """Round-8 ADVICE: when the fallback activates but the StateMessage
    smoke round-trip fails, ensure_protobuf must report False WITHOUT
    leaving partial global state — the appended sys.path entry comes off
    and the stock validator is restored (the lenient shim must not stay
    installed for every other protobuf consumer in the process)."""
    _run(
        "import sys\n"
        "from mapreduce_6_824_lab1_spark import protobuf_compat as pc\n"
        "def boom():\n"
        "    raise ImportError('forced smoke failure')\n"
        "pc._smoke_state_messages = boom\n"
        "before = list(sys.path)\n"
        "assert pc.ensure_protobuf() is False\n"
        "assert list(sys.path) == before, 'sys.path not unwound'\n"
        "assert not pc._PATCHED and pc._ORIG_VALIDATOR is None\n"
        "assert not pc.USED_FALLBACK\n"
        "# the rejected runtime must not stay importable from the module\n"
        "# cache either: no cached module may point into a fallback dir\n"
        "stale = [\n"
        "    m for m, mod in sys.modules.items()\n"
        "    if getattr(mod, '__file__', None)\n"
        "    and any(\n"
        "        str(mod.__file__).startswith(d)\n"
        "        for d in pc.PROTOBUF_FALLBACK_DIRS\n"
        "    )\n"
        "]\n"
        "assert not stale, f'fallback modules survived the unwind: {stale}'\n"
        "try:\n"
        "    from google.protobuf import runtime_version as rv\n"
        "except ImportError:\n"
        "    rv = None  # no runtime at all on this host: nothing patched\n"
        "if rv is not None:\n"
        "    try:\n"
        "        rv.ValidateProtobufRuntimeVersion(\n"
        "            rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, '', 't'\n"
        "        )\n"
        "        raise SystemExit('lenient shim survived the unwind')\n"
        "    except rv.VersionError:\n"
        "        pass  # stock strict validation is back\n"
    )


def test_ensure_protobuf_rebinds_surviving_google_children():
    """Round-8 ADVICE: re-resolving the 'google' parent must rebind any
    surviving sibling children (google.auth-style modules cached in
    sys.modules with live references elsewhere) as attributes of the NEW
    parent, or later `google.<child>` attribute access breaks in
    long-lived processes."""
    out = _run(
        "import sys, types\n"
        "fake_parent = types.ModuleType('google')\n"
        "fake_child = types.ModuleType('google.fake_surviving_child')\n"
        "fake_parent.fake_surviving_child = fake_child\n"
        "sys.modules['google'] = fake_parent\n"
        "sys.modules['google.fake_surviving_child'] = fake_child\n"
        "from mapreduce_6_824_lab1_spark import protobuf_compat as pc\n"
        "pc.ensure_protobuf()\n"
        "if pc.USED_FALLBACK:\n"
        "    g = sys.modules['google']\n"
        "    assert g is not fake_parent, 'parent was not re-resolved'\n"
        "    assert getattr(g, 'fake_surviving_child', None) is fake_child\n"
        "    print('REBOUND')\n"
        "else:\n"
        "    print('NO_FALLBACK')\n"
    )
    assert out.strip() in ("REBOUND", "NO_FALLBACK")


def test_type_counts_tws_state_spans_batches(spark):
    """The MapState key must genuinely carry running aggregates ACROSS
    micro-batches: the changelog sink holds one row per (user, type,
    touching batch) — strictly more rows than final groups — and any
    multi-emission key's cnt sequence is strictly increasing (each
    batch's emission is the new cumulative, the property the downstream
    max-struct fold relies on). Folded result must equal the plain
    batch aggregate exactly (integer cents)."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.streaming import jobs
    from tests.conftest import SF_DIR

    before = len(jobs._OUT_SCRATCH)
    out = QUERIES["stream_type_counts_tws"](spark, SF_DIR)
    new_dirs = jobs._OUT_SCRATCH[before:]
    assert len(new_dirs) == 1  # exactly one _run_to_parquet drain
    sink = spark.read.parquet(f"{new_dirs[0]}/data")

    n_groups = out.count()
    assert sink.count() > n_groups, "no cross-batch emissions — state dead?"

    multi = (
        sink.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_emit"),
            F.collect_list("cnt").alias("cnts"),
        )
        .filter(F.col("n_emit") >= 2)
    )
    rows = multi.limit(20).collect()
    assert rows, "every key emitted once — batches did not split the input"
    final = {
        (r["user_id"], r["event_type"]): r["cnt"] for r in out.collect()
    }
    for r in rows:
        # cumulative counts: all emissions distinct, and the largest is
        # exactly the group's final folded cnt (a state read-after-write
        # bug emitting a stale cumulative would duplicate or undershoot)
        assert sorted(r["cnts"]) == sorted(set(r["cnts"])), r
        assert max(r["cnts"]) == final[(r["user_id"], r["event_type"])], r

    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
        )
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_user_median_tws_single_flush_emission(spark):
    """The ListState key emits EXACTLY once per user (at the flush
    batch): the changelog sink holds one row per user — state carried
    every earlier batch's appends instead of emitting partials — and
    n_events equals the per-user batch count (only reachable if all
    four slices' appends survived in RocksDB across micro-batches)."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.streaming import jobs
    from tests.conftest import SF_DIR

    before = len(jobs._OUT_SCRATCH)
    out = QUERIES["stream_user_median_tws"](spark, SF_DIR)
    new_dirs = jobs._OUT_SCRATCH[before:]
    assert len(new_dirs) == 1
    sink = spark.read.parquet(f"{new_dirs[0]}/data")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sink.count() == n_users  # one emission per user, no partials

    batch_counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out.collect():
        assert r["n_events"] == batch_counts[r["user_id"]], r
