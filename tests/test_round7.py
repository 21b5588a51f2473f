"""Round-7 additions: the pure-python protobuf fallback that un-gates
transformWithStateInPandas, proven end-to-end against the GroupState
twin (the two stateful APIs must agree row-for-row on real multi-batch
state carry-over, not just through the fake-handle unit harness)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _protobuf_available() -> bool:
    from mapreduce_6_824_lab1_spark.protobuf_compat import ensure_protobuf

    return ensure_protobuf()


def test_ensure_protobuf_rejects_namespace_shells():
    """The probe must demand a REAL runtime (descriptor importable) —
    Spark workers see spark-core's jar on sys.path, whose google/protobuf
    resource dir imports as an empty namespace package; a bare
    `import google.protobuf` succeeds there and gated round 6's worker
    crash ('cannot import name descriptor ... (unknown location)')."""
    from mapreduce_6_824_lab1_spark.protobuf_compat import _protobuf_usable

    assert _protobuf_usable() == _protobuf_available()
    if _protobuf_available():
        from google.protobuf import descriptor  # noqa: F401


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="no protobuf runtime on this machine (fallback dirs absent)",
)
def test_tws_stream_matches_groupstate_result(spark):
    """stream_session_tws (transformWithStateInPandas + RocksDB state
    store + protobuf state client) must produce EXACTLY the rows of
    stream_session_stateful (applyInPandasWithState) on the staged
    multi-batch stream — same state machine, old and new stateful APIs,
    full wire path: processor unpickle in the TWS driver worker and the
    task workers, protobuf StateMessage round-trips to the JVM state
    server, RocksDB-backed value state across micro-batches."""
    from mapreduce_6_824_lab1_spark.streaming.stateful import (
        stream_session_stateful,
        stream_session_tws,
    )

    tws = stream_session_tws(spark, SF_DIR).collect()
    base = stream_session_stateful(spark, SF_DIR).collect()
    assert len(tws) > 0
    assert sorted(map(tuple, tws)) == sorted(map(tuple, base))


def test_tws_validation_shim_is_narrow():
    """The runtime-version shim may relax EXACTLY one case — same-major
    gencode minor STRICTLY ahead, non-prerelease gencode, PUBLIC domain
    — and must still raise on a major mismatch, a patch-ahead gencode
    within the same minor, and a prerelease gencode."""
    if not _protobuf_available():
        pytest.skip("no protobuf runtime")
    from google.protobuf import runtime_version as rv

    from mapreduce_6_824_lab1_spark import protobuf_compat

    # newer minor, same major, clean gencode: tolerated (warns) — but
    # ONLY when the on-disk fallback runtime was used; a host with a
    # healthy installed protobuf keeps stock validation, where the same
    # call must stay fatal (gate on the sticky USED_FALLBACK flag, not
    # on ensure_protobuf()'s return — round-8 ADVICE)
    if protobuf_compat.USED_FALLBACK:
        with pytest.warns(UserWarning, match="older same-major runtime"):
            rv.ValidateProtobufRuntimeVersion(
                rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, "", "shim-test"
            )
    else:
        with pytest.raises(rv.VersionError):
            rv.ValidateProtobufRuntimeVersion(
                rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, "", "shim-test"
            )
    # major mismatch: still fatal
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.Domain.PUBLIC, rv.MAJOR + 1, 0, 0, "", "shim-test"
        )
    # patch ahead within the SAME minor: still fatal
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR, rv.PATCH + 1, "",
            "shim-test",
        )
    # prerelease gencode: still fatal even with the minor ahead
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, "-rc1",
            "shim-test",
        )


def test_run_to_parquet_empty_result_keeps_schema(spark):
    """A stream whose result is EMPTY commits a _spark_metadata batch
    with zero data files; the file-sink read-back must come home as an
    empty, correctly-typed frame (explicit schema — inference over a
    data-less sink dir raises), matching the memory sink's old
    behavior."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark.streaming.jobs import (
        _events_stream,
        _run_to_parquet,
    )

    src = _events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "__no_such_type__"
    ).select("event_id", "event_type", "value")
    out = _run_to_parquet(src, spark)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "event_id", "event_type", "value",
    ]
    assert out.schema["value"].dataType.typeName() == "double"
