"""Custom connector via Spark 4's Python DataSource API.

The reference's only "connector" is reading local text files; a real
deployment needs custom sources (internal services, proprietary formats).
Spark 4 exposes that extension point to Python — this module implements a
deterministic synthetic source (partitioned counter with derived columns) to
exercise the full surface: registration, options, schema declaration,
partition planning, and per-partition generators. Because the source is
arithmetic, the DuckDB oracle regenerates it exactly with generate_series —
a value-checked custom connector.

Scale note: ``partitions()`` is the parallelism contract — each
InputPartition becomes one Spark task, so a production source should derive
partitions from the remote system's natural split (files, shards, offset
ranges), never return a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from mapreduce_6_824_lab1_spark.registry import query

COUNTER_N = 10_000
COUNTER_PARTS = 8


class CounterDataSource(DataSource):
    """``spark.read.format("mr_counter").option("n", ...).load()``"""

    @classmethod
    def name(cls) -> str:
        return "mr_counter"

    def schema(self) -> str:
        return "id BIGINT, squared BIGINT, label STRING"

    def reader(self, schema) -> "CounterReader":
        return CounterReader(self.options)


class CounterReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", COUNTER_N))
        self.parts = int(options.get("parts", COUNTER_PARTS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        start = partition.value
        for k in range(start, self.n, self.parts):
            yield (k, k * k, f"bucket{k % 10}")


@query(
    "source_python_datasource",
    oracle=f"""
SELECT 'bucket' || CAST(k % 10 AS VARCHAR) AS label,
       count(*) AS cnt,
       CAST(sum(k * k) AS BIGINT) AS sum_squared
FROM generate_series(0, {COUNTER_N - 1}) AS t(k)
GROUP BY 1
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read from the registered Python data source and aggregate — proving
    schema, options, partitioning, and row generation all round-trip."""
    try:
        spark.dataSource.register(CounterDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("mr_counter")
        .option("n", COUNTER_N)
        .option("parts", COUNTER_PARTS)
        .load()
    )
    return df.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("squared").alias("sum_squared"),
    )
