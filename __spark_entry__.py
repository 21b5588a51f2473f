"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (wordcount — the lab's own
hello-world, MIT 6.824 Lab 1 ``mrapps/wc.go``; SURVEY.md §7.1) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator registry of
:mod:`mapreduce_6_824_lab1_spark` — one entry per implemented operator from
SURVEY.md §2, each paired with its DuckDB oracle unless genuinely
non-SQL-expressible (sketch-based dedup keys: xxhash64 signatures have no
DuckDB equivalent → rows-only per the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_6_824_lab1_spark import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omissions = rows-only checks)."""
    return dict(ORACLES)
