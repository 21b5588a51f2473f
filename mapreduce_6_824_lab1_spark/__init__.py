"""PySpark-native analytics engine with the query surface of
``fannaihao/mapreduce-6.824-lab1`` (MIT 6.824 Lab 1: MapReduce).

The reference checkout is a stub (``/root/reference/README.md:1-2`` is the
entire repo), so the surface implemented here is the MapReduce computational
model it names — canonical applications from the lab spec and the MapReduce
paper (Dean & Ghemawat, OSDI 2004) — plus the full relational / streaming /
LLM-data-pipeline extension mandated by the driver (SURVEY.md §2).

Design stance (SURVEY.md §7.0): everything is declarative DataFrame / SQL so
Catalyst owns pushdown, pruning, join strategy, partial aggregation and AQE.
The reference's engine concerns (hash partitioning, phase barriers, sort-group
reduce, task retry, atomic output) are Spark built-ins and are deliberately
NOT reimplemented — see SURVEY.md §2.A.
"""

from mapreduce_6_824_lab1_spark.catalog import TABLES, load_table, load_tables
from mapreduce_6_824_lab1_spark.registry import ORACLES, QUERIES
from mapreduce_6_824_lab1_spark.session import get_spark

# Importing the operator packages registers every query + oracle pair.
import mapreduce_6_824_lab1_spark.operators  # noqa: E402,F401
import mapreduce_6_824_lab1_spark.streaming  # noqa: E402,F401

__all__ = [
    "TABLES",
    "QUERIES",
    "ORACLES",
    "get_spark",
    "load_table",
    "load_tables",
]
