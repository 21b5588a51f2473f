"""Grouped-map pandas UDAF — the lab's reduceF as an Arrow-batched operator.

``reduceF(key, values) -> result`` with all of a key's values visible at
once is exactly Spark's ``applyInPandas`` contract (SURVEY.md §2 UDF note).
The demonstration statistic is the median absolute deviation: robust, needs
the full value set (not expressible as a mergeable aggregate), and has EXACT
cross-engine parity because numpy's linear-interpolation median equals
DuckDB's ``quantile_cont(0.5)`` on identical doubles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import sql_hround
from mapreduce_6_824_lab1_spark.registry import query

_OUT_SCHEMA = "user_id long, n long, med double, mad double"


def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype="float64")
    med = float(np.median(v))
    mad = float(np.median(np.abs(v - med)))
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n": [len(v)],
            "med": [math.floor(med * 10000 + 0.5) / 10000],
            "mad": [math.floor(mad * 10000 + 0.5) / 10000],
        }
    )


@query(
    "udaf_mad_pandas",
    oracle=f"""
WITH med AS (
    SELECT user_id, quantile_cont(value, 0.5) AS m
    FROM events GROUP BY user_id
)
SELECT e.user_id,
       count(*) AS n,
       {sql_hround("any_value(med.m)", 4)} AS med,
       {sql_hround("quantile_cont(abs(e.value - med.m), 0.5)", 4)} AS mad
FROM events e JOIN med ON e.user_id = med.user_id
GROUP BY e.user_id
""",
)
def udaf_mad_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median absolute deviation via applyInPandas (grouped map).

    100 TB: one shuffle on the group key, then each group is a single Arrow
    batch in Python — the correct shape for non-mergeable statistics. Skewed
    giant groups are this pattern's failure mode; mitigate by pre-reducing
    cardinality upstream or switching to a mergeable sketch
    (approx_percentile) when exactness isn't required.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "value").groupBy("user_id").applyInPandas(
        _mad, schema=_OUT_SCHEMA
    )


_Z_SCHEMA = "event_id long, event_type string, zscore double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype="float64")
    mean = float(v.mean())
    std = float(v.std(ddof=1))
    z = (v - mean) / std
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "event_type": pdf["event_type"].to_numpy(),
            "zscore": np.floor(z * 10000 + 0.5) / 10000,
        }
    )


@query(
    "pandas_normalize",
    oracle=f"""
SELECT event_id, event_type,
       {sql_hround(
           "(value - avg(value) OVER (PARTITION BY event_type))"
           " / stddev_samp(value) OVER (PARTITION BY event_type)", 4)}
           AS zscore
FROM events
""",
)
def pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score feature normalization via applyInPandas — the
    N-rows-in/N-rows-out grouped TRANSFORM contract (``udaf_mad_pandas`` is
    the N-in/1-out reduce): every event's value standardized against its
    event_type's mean/stddev, the feature-scaling pass a training pipeline
    runs before model ingestion.

    Parity note: numpy's pairwise summation and DuckDB's streaming
    aggregate differ only in ~1e-12 float error; outputs round to 4
    decimals (ddof=1 matches ``stddev_samp``). 100 TB: one shuffle on the
    group key, each group one Arrow batch; for giant groups switch to the
    two-pass built-in form (broadcast per-group moments, map-side
    normalize) — same result, no Python, documented here as the scale
    escape hatch.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_zscore, schema=_Z_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Python UDTF — Spark 4's user-defined TABLE function API
# ---------------------------------------------------------------------------


@query(
    "udtf_tokenize",
    oracle=f"""
SELECT doc_id, word,
       CAST(length(word) AS BIGINT) AS word_len
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 50) t
""",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lab's mapF as a literal Python UDTF: one input row in, many
    typed rows out, via Spark 4's ``@udtf`` lateral-join API.

    Kept off the hot path by construction (50 docs): per-row Python is the
    demonstration of the API shape — the production tokenizer is the
    codegen'd split/explode in functions/text.py, and the oracle here is
    the same relational expansion.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string, word_len bigint")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for w in text.split(" "):
                yield doc_id, w, len(w)

    spark.udtf.register("mr_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter("doc_id < 50").createOrReplaceTempView("mr_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.word, t.word_len "
        "FROM mr_udtf_docs, LATERAL mr_tokenize(doc_id, text) t"
    )


# ---------------------------------------------------------------------------
# mapInArrow — the zero-copy sibling of mapInPandas: batches arrive as
# pyarrow RecordBatches with NO pandas conversion on either side. For
# numeric array columns this skips the pandas object boxing entirely
# (list<float> -> numpy is a flat buffer view + reshape), which is the
# right Python entry point for embedding math at scale.
# ---------------------------------------------------------------------------

EMBEDDING_DIM = 64


def _arrow_l2(batches):
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        emb = batch.column("embedding")
        # list<float32> values are one contiguous buffer: view + reshape,
        # no per-row Python objects
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        mat = flat.astype(np.float64).reshape(-1, EMBEDDING_DIM)
        norm = np.sqrt((mat * mat).sum(axis=1))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("vec_id"),
                batch.column("label"),
                pa.array(np.floor(norm * 10000 + 0.5) / 10000),
            ],
            ["vec_id", "label", "l2_norm"],
        )


@query(
    "arrow_embedding_norm",
    oracle="""
SELECT vec_id, label,
       floor((sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * x)))) * 10000 + 0.5) / 10000 AS l2_norm
FROM embeddings
""",
)
def arrow_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via ``mapInArrow`` (Arrow-native map partition).

    Float parity: both sides promote the float32 components to float64
    before squaring (numpy here, explicit CAST in the oracle), so the only
    divergence is summation order at ~1e-12 — absorbed by 4-decimal
    rounding. 100 TB: map-only, no shuffle; each Arrow batch is one numpy
    matmul-shaped pass, the same shape the brute-force ANN path uses.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.mapInArrow(
        _arrow_l2, schema="vec_id long, label int, l2_norm double"
    )


# ---------------------------------------------------------------------------
# Python UDTF with a TABLE argument + PARTITION BY (table-valued function)
# ---------------------------------------------------------------------------

UDTF_TABLE_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
GROUP BY user_id
"""


@query("udtf_table_arg", oracle=UDTF_TABLE_ORACLE)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats through a Python UDTF taking a TABLE argument
    with PARTITION BY — Spark's table-valued-function API (the SQL-facing
    sibling of ``applyInPandas``): each user's rows stream through one UDTF
    instance (``eval`` per row, ``terminate`` per partition).

    Accumulation is integer cents, so the per-partition fold is
    order-insensitive and the result hash-exact vs a plain GROUP BY oracle
    — which is the point: the black-box UDTF must reproduce what the
    declarative aggregate computes. 100 TB: PARTITION BY is one hash
    shuffle; the UDTF is the slow path (row-at-a-time Python) kept here as
    deliberate API-surface coverage, with the equivalent JVM aggregate one
    line away (the oracle).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, total_cents bigint")
    class PerUserStats:
        def __init__(self) -> None:
            self._uid = None
            self._n = 0
            self._cents = 0

        def eval(self, row) -> None:
            self._uid = row["user_id"]
            self._n += 1
            self._cents += int(math.floor(row["value"] * 100 + 0.5))

        def terminate(self):
            if self._uid is not None:
                yield self._uid, self._n, self._cents

    spark.udtf.register("mr_per_user_stats", PerUserStats)
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("mr_udtf_events")
    return spark.sql(
        "SELECT * FROM mr_per_user_stats("
        "TABLE(mr_udtf_events) PARTITION BY user_id)"
    )


# ---------------------------------------------------------------------------
# Clamped running balance — the inherently-sequential recurrence class
# ---------------------------------------------------------------------------

BALANCE_CAP = 500

BALANCE_SCHEMA = (
    "partkey long, n_moves long, final_balance long, "
    "n_clamped_low long, n_clamped_high long"
)


def _fold_one(deltas) -> tuple[int, int, int]:
    """The clamp fold itself: b ← clamp(b + delta, 0, CAP)."""
    b = lo = hi = 0
    for d in deltas:
        b += int(d)
        if b < 0:
            b, lo = 0, lo + 1
        elif b > BALANCE_CAP:
            b, hi = BALANCE_CAP, hi + 1
    return b, lo, hi


def _fold_balance_partition(batches):
    """ONE Python crossing per Arrow batch, not per group: the input
    partition is hash-bucketed by part and sorted by (part, shipdate,
    orderkey, linenumber), so groups are contiguous — fold every complete
    group in the batch and CARRY the trailing (possibly split) group into
    the next batch. This is the secondary-sort amortization that makes
    per-entity sequential folds affordable: Arrow/pandas overhead scales
    with batches (~10k rows), while applyInPandas pays it per GROUP
    (re-measured round 5, warm noop-write on local[32]: applyInPandas
    form 6.9 s at sf0.01; this form 0.73 s at sf0.01 / 1.06 s at sf0.1;
    same results, pinned by the same tests)."""
    carry = None

    def fold_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pk, g in pdf.groupby("l_partkey", sort=False):
            b, lo, hi = _fold_one(g["delta"])
            out.append((int(pk), len(g), b, lo, hi))
        return pd.DataFrame(
            out,
            columns=[
                "partkey",
                "n_moves",
                "final_balance",
                "n_clamped_low",
                "n_clamped_high",
            ],
        )

    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last = pdf["l_partkey"].iloc[-1]
        head = pdf[pdf["l_partkey"] != last]
        carry = pdf[pdf["l_partkey"] == last]
        if len(head):
            yield fold_groups(head)
    if carry is not None and len(carry):
        yield fold_groups(carry)


@query("running_balance_clamped")  # rows-only: clamped prefix recurrences
def running_balance_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory balance per part under a clamp: receipts (+qty when
    linestatus='O') and issues (−qty otherwise) fold in shipdate order
    through b ← clamp(b + Δ, 0, 500), reporting the final level and how
    often each bound bit.

    This key exists to place the SEQUENTIAL-RECURRENCE class honestly:
    clamp(prefix-sum) is NOT expressible in window algebra (the clamp
    couples every step to the last, unlike EWMA's linear recurrence that
    timeseries_ewma unrolls), so the right Spark tool is a grouped
    Arrow-batched ``applyInPandas`` — ONE shuffle on the entity key, the
    per-key fold runs where the rows already are, constant memory per
    key. No SQL oracle CAN express it (a DuckDB recursive CTE would
    iterate per key); correctness is pinned by an independent Python
    recompute in tests/test_round4g.py, the same treatment as the other
    rows-only keys. Scale: state is one integer per key; the sort is
    within each key's partition-local group, never global.
    """
    li = load_table(spark, sf_dir, "lineitem")
    moves = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_linestatus") == "O",
            F.floor(F.col("l_quantity") + F.lit(0.5)),
        )
        .otherwise(-F.floor(F.col("l_quantity") + F.lit(0.5)))
        .cast("long")
        .alias("delta"),
    )
    part = moves.repartition("l_partkey").sortWithinPartitions(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return part.mapInPandas(_fold_balance_partition, schema=BALANCE_SCHEMA)


# ---------------------------------------------------------------------------
# KLL quantile sketches — the mergeable-quantiles member of the sketch family
# ---------------------------------------------------------------------------


@query("agg_kll_quantiles")  # rows-only: KLL is a randomized sketch
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation with DataSketches KLL (Spark 4 built-ins):
    per-return-flag sketches over price cents, plus an ALL row built by
    MERGING the per-flag sketches — mergeability is the whole point
    (partial sketches combine associatively, so quantiles of a 100 TB
    table cost one partial-agg shuffle of ~KB-sized states, where exact
    percentiles need a sort or value-grain compaction like
    agg_weighted_percentile).

    Completes the sketch family: HLL (distinct), approx top-k (heavy
    hitters), and now KLL (quantiles). Rows-only like the other
    randomized sketches — the normalized-rank error bound (±~2% rank at
    the default k) is pinned against exact order statistics in
    tests/test_round4h.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_flag = cents.groupBy("flag").agg(
        F.expr("kll_sketch_agg_bigint(cents)").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    flags = per_flag.select(
        "flag",
        "n",
        F.expr("kll_sketch_get_quantile_bigint(sk, 0.5)").alias(
            "p50_cents"
        ),
        F.expr("kll_sketch_get_quantile_bigint(sk, 0.9)").alias(
            "p90_cents"
        ),
    )
    merged = per_flag.agg(
        F.expr("kll_merge_agg_bigint(sk)").alias("sk"),
        F.sum("n").cast("long").alias("n"),
    ).select(
        F.lit("ALL").alias("flag"),
        "n",
        F.expr("kll_sketch_get_quantile_bigint(sk, 0.5)").alias(
            "p50_cents"
        ),
        F.expr("kll_sketch_get_quantile_bigint(sk, 0.9)").alias(
            "p90_cents"
        ),
    )
    return flags.unionByName(merged)


# ---------------------------------------------------------------------------
# Deterministic column encryption — equality-preserving PII protection
# ---------------------------------------------------------------------------

_AES_KEY = "0000111122223333"  # fixture key; production = KMS-managed

ENCRYPT_ORACLE = """
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct_plain,
       CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct_cipher,
       CAST(count(*) AS BIGINT) AS n_roundtrip_ok
FROM customer GROUP BY c_mktsegment
"""


@query("pii_encrypt_roundtrip", oracle=ENCRYPT_ORACLE)
def pii_encrypt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption audit with ``aes_encrypt``/``aes_decrypt``
    in deliberately DETERMINISTIC ECB mode: ciphertext cardinality must
    equal plaintext cardinality (equality-preserving encryption — what
    lets joins/dedup/groupBy run on protected columns without the key)
    and every row must decrypt back byte-identical.

    The trade is stated, not hidden: determinism IS ECB's leak
    (identical plaintexts are visible as identical ciphertexts) — it is
    chosen exactly when that equality is the feature; randomized GCM is
    the default for pure at-rest protection. Only COUNTS leave this
    operator, so the audit is fully oracle-checkable even though DuckDB
    has no AES: distinct-cipher == distinct-plain and roundtrip-ok == n
    are data-independent invariants the oracle states directly — a
    mechanism-exotic/result-relational key like agg_bitmap_distinct.
    """
    c = load_table(spark, sf_dir, "customer")
    enc = c.select(
        "c_mktsegment",
        "c_name",
        F.expr(f"aes_encrypt(c_name, '{_AES_KEY}', 'ECB')").alias("ct"),
    )
    audit = enc.select(
        "c_mktsegment",
        "c_name",
        "ct",
        F.expr(
            f"CAST(aes_decrypt(ct, '{_AES_KEY}', 'ECB') AS STRING)"
        ).alias("rt"),
    )
    return audit.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("c_name").alias("n_distinct_plain"),
        F.count_distinct("ct").alias("n_distinct_cipher"),
        F.count_if(F.col("rt") == F.col("c_name")).alias("n_roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Arrow-native scalar UDF — Spark 4.1's @arrow_udf (no pandas boxing)
# ---------------------------------------------------------------------------

ARROW_UDF_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events GROUP BY event_type
"""


@query("arrow_scalar_udf", oracle=ARROW_UDF_ORACLE)
def arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's ``@arrow_udf`` — the Arrow-NATIVE scalar UDF: batches
    arrive as ``pyarrow.Array`` and compute happens in Arrow compute
    kernels, skipping the pandas Series boxing a ``@pandas_udf`` pays on
    both edges (the scalar-function sibling of ``mapInArrow``,
    arrow_embedding_norm).

    The kernel quantizes values to integer cents with the SAME IEEE
    multiply/add/floor sequence as the house rule, so the Python path is
    value-exact against the relational oracle — the point being that
    'UDF' and 'hash-exact' are compatible when the arithmetic shape is
    pinned. Still the slow path versus built-ins; registered as API
    coverage with the aggregate (JVM-side) doing the heavy lifting.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    # this module runs under `from __future__ import annotations`, which
    # stringifies type hints — but arrow_udf infers its eval type from
    # REAL pa.Array annotations. exec() the kernel in its own namespace
    # so the hints stay live objects.
    ns = {"pa": pa, "pc": pc}
    exec(
        "def _kernel(v: pa.Array) -> pa.Array:\n"
        "    return pc.cast("
        "pc.floor(pc.add(pc.multiply(v, 100.0), 0.5)), pa.int64())",
        ns,
    )
    to_cents = arrow_udf(ns["_kernel"], "long")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", to_cents("value").alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Arrow-native UDTF — table-in/table-out through pyarrow batches
# ---------------------------------------------------------------------------

ARROW_UDTF_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM events GROUP BY event_type
"""


@query("udtf_arrow_batch", oracle=ARROW_UDTF_ORACLE)
def udtf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's ``@arrow_udtf`` with a TABLE argument: whole Arrow
    batches in, Arrow tables out — the table-function completion of the
    Arrow-native Python surface (scalar: arrow_scalar_udf; map:
    arrow_embedding_norm; here N-columns-in/M-columns-out). Unlike
    ``udtf_tokenize``'s row-at-a-time ``eval``, every batch is one
    Python call over columnar buffers, so a vectorizable table transform
    pays per-batch, not per-row, overhead.

    The kernel quantizes to integer cents with the pinned IEEE shape
    (hash-exact vs the relational oracle) and passes event_type through
    untouched; the audit aggregate stays JVM-side after the UDTF.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="event_type string, cents bigint")
    class Quantize:
        def eval(self, batch):
            tbl = (
                batch
                if isinstance(batch, pa.Table)
                else pa.Table.from_batches([batch])
            )
            cents = pc.cast(
                pc.floor(
                    pc.add(pc.multiply(tbl.column("value"), 100.0), 0.5)
                ),
                pa.int64(),
            )
            yield pa.Table.from_arrays(
                [tbl.column("event_type"), cents], ["event_type", "cents"]
            )

    spark.udtf.register("mr_arrow_quantize", Quantize)
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "mr_audtf_events"
    )
    return spark.sql(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(cents) AS BIGINT) AS total_cents, "
        "CAST(max(cents) AS BIGINT) AS max_cents "
        "FROM mr_arrow_quantize(TABLE(SELECT event_type, value "
        "FROM mr_audtf_events)) GROUP BY event_type"
    )
