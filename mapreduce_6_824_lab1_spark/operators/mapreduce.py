"""The reference's actual API shape: user-supplied mapF / reduceF.

MIT 6.824 Lab 1's whole point is running arbitrary user functions
``mapF(filename, contents) -> [KeyValue]`` and ``reduceF(key, values) -> str``
(public lab spec, ``src/mr/worker.go`` signatures; the local reference
checkout is the 2-line stub /root/reference/README.md:1-2). This module
honors that API shape once, literally, and demonstrates the idiomatic Spark
escalation ladder for user code:

1. :func:`map_reduce` — RDD ``flatMap``/``reduceByKey``: the lab's exact
   programming model. ``reduceByKey`` has map-side combine, i.e. the paper's
   combiner (§4.3) — same shuffle profile as the lab's hash-partitioned
   intermediate files.
2. ``udf_mapreduce`` query — wordcount expressed through that API; its oracle
   is the same SQL as the built-in ``wordcount`` (they must agree — this is
   the lab's own "distributed vs sequential" golden test pattern).

Everywhere else in the engine, user logic stays in built-in columnar
expressions — the RDD path exists for API parity, not for the hot path
(Python per-row costs ~10-100× at 100 TB; SURVEY.md §2 UDF note).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity helpers)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.operators.text import WORDCOUNT_ORACLE
from mapreduce_6_824_lab1_spark.registry import query

KV = tuple[str, str]


def map_reduce(
    df: DataFrame,
    map_f: Callable[[str, str], Iterable[KV]],
    reduce_f: Callable[[str, list[str]], str],
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Run a lab-shaped MapReduce job over a DataFrame.

    ``map_f(key, contents)`` emits (k, v) string pairs; ``reduce_f(k, values)``
    emits one string per key — the exact contract of the lab's plugin apps.
    Implemented as ``flatMap`` → ``groupByKey``-free aggregation: values are
    list-merged with ``reduceByKey`` (associative list concat) so the reduce
    side still sees "all values for a key at once" like the lab's sorted scan,
    without a groupByKey shuffle explosion for the common case.
    """
    pairs = df.select(key_col, value_col).rdd.flatMap(
        lambda r: [(k, [v]) for k, v in map_f(str(r[0]), str(r[1]))]
    )
    reduced = pairs.reduceByKey(lambda a, b: a + b).map(
        lambda kv: (kv[0], reduce_f(kv[0], kv[1]))
    )
    schema = StructType(
        [StructField("key", StringType()), StructField("value", StringType())]
    )
    return df.sparkSession.createDataFrame(reduced, schema)


# ---------------------------------------------------------------------------
# udf_mapreduce: wordcount through the lab's API (mrapps/wc.go semantics on
# our pinned single-space tokenization), checked against the SAME oracle as
# the declarative wordcount.
# ---------------------------------------------------------------------------


def _wc_map(doc_id: str, contents: str) -> list[tuple[str, int]]:
    return [(w, 1) for w in contents.split(" ")]


@query("udf_mapreduce", oracle=WORDCOUNT_ORACLE)
def udf_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", "text")
        .rdd.flatMap(lambda r: _wc_map(r[0], r[1]))
        .reduceByKey(lambda a, b: a + b)  # map-side combine == paper combiner
    )
    schema = StructType(
        [StructField("word", StringType()), StructField("cnt", LongType())]
    )
    return spark.createDataFrame(counts, schema)
