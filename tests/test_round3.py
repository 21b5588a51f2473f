"""Behavioral tests for the round-3 operator additions: Bloom-prefiltered
decontamination equivalence, rate-limited stream batching, map-only plan
shapes, and z-order cell locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_6_824_lab1_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_decontaminate_bloom_matches_exact(spark):
    """The Bloom prefilter is purely physical: identical result set."""
    exact = {
        tuple(r)
        for r in QUERIES["decontaminate"](spark, SF_DIR).collect()
    }
    bloom = {
        tuple(r)
        for r in QUERIES["decontaminate_bloom"](spark, SF_DIR).collect()
    }
    assert exact == bloom and len(exact) > 0


def test_stream_rate_limited_batches(spark):
    """maxFilesPerTrigger must split the backlog into multiple
    micro-batches under availableNow (unlike the deprecated Trigger.Once)."""
    import shutil
    import tempfile

    from mapreduce_6_824_lab1_spark.streaming.jobs import (
        RATE_LIMIT_FILES_PER_TRIGGER,
        RATE_LIMIT_INPUT_FILES,
    )

    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    scratch = tempfile.mkdtemp(prefix="mr_test_ratelim_")
    seen = []
    try:
        raw.repartition(RATE_LIMIT_INPUT_FILES).write.mode(
            "overwrite"
        ).parquet(f"{scratch}/in")
        schema = spark.read.parquet(f"{scratch}/in").schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(RATE_LIMIT_FILES_PER_TRIGGER))
            .parquet(f"{scratch}/in")
        )
        q = (
            src.writeStream.foreachBatch(
                lambda bdf, bid: seen.append((bid, bdf.count()))
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    expected = RATE_LIMIT_INPUT_FILES // RATE_LIMIT_FILES_PER_TRIGGER
    assert len(seen) == expected, seen
    assert sum(n for _, n in seen) == raw.count()


def test_pii_and_repetition_are_map_only(spark):
    """Redaction and repetition scoring must not shuffle at all."""
    for key in ("pii_mask", "text_repetition"):
        plan = _formatted(QUERIES[key](spark, SF_DIR))
        assert "Exchange" not in plan, (key, plan)


def test_zorder_cells_are_locally_tight(spark):
    """Every Morton cell must span at most one price bucket and one size
    bucket — the 2-D locality that makes min/max skipping work."""
    rows = QUERIES["layout_zorder"](spark, SF_DIR).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.max_price - r.min_price <= 6.25, r
        assert r.max_size - r.min_size <= 4, r


def test_triangles_closed_under_symmetry(spark):
    """Total participation is 3x the number of triangles."""
    rows = QUERIES["graph_triangles"](spark, SF_DIR).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0 and total > 0, rows


def test_checkpoint_resume_exactly_once(spark):
    """A file stream resumed from its checkpoint must process only the NEW
    files (source offsets are durable) and the batchId-keyed sink must end
    up with every input row exactly once."""
    import glob
    import shutil
    import tempfile

    raw = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    scratch = tempfile.mkdtemp(prefix="mr_test_ckpt_")
    try:
        raw.repartition(8).write.parquet(f"{scratch}/stage")
        files = sorted(glob.glob(f"{scratch}/stage/part-*.parquet"))
        assert len(files) == 8
        import os

        os.makedirs(f"{scratch}/in")
        schema = spark.read.parquet(f"{scratch}/stage").schema

        def drain():
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "2")
                .parquet(f"{scratch}/in")
            )
            q = (
                src.writeStream.foreachBatch(
                    lambda bdf, bid: bdf.write.mode("overwrite").parquet(
                        f"{scratch}/out/batch_{bid}"
                    )
                )
                .option("checkpointLocation", f"{scratch}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        for f in files[:4]:
            shutil.copy(f, f"{scratch}/in/")
        drain()  # first incarnation: 4 files -> batches 0,1
        first_batches = set(glob.glob(f"{scratch}/out/batch_*"))
        for f in files[4:]:
            shutil.copy(f, f"{scratch}/in/")
        drain()  # resumed incarnation: must see ONLY the 4 new files
        all_batches = set(glob.glob(f"{scratch}/out/batch_*"))
        assert len(first_batches) == 2 and len(all_batches) == 4, all_batches
        back = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{scratch}/out"
        )
        assert back.count() == raw.count()  # no loss
        assert back.select("event_id").distinct().count() == raw.count()  # no dupes
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
