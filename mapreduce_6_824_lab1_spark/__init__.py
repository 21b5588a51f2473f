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

import os as _os

# Single-threaded BLAS, pinned BEFORE anything in this package can import
# numpy. This MUST live at the very top of the package __init__ — not in
# preload_daemon — because the daemon launch shape is `python -m
# mapreduce_6_824_lab1_spark.preload_daemon`, which imports THIS module
# (and, through the operator imports below, numpy) before the daemon
# module body runs; a pin placed there executes after OpenBLAS has
# already sized its thread pool (ADVICE r12, verified empirically: this
# box's OpenBLAS 0.3.23 spawns its full 32-thread pool at numpy import).
# One BLAS thread per worker is correct under Spark — a worker owns one
# task slot, so 32 workers x 32 BLAS threads oversubscribes the box 32x.
# setdefault keeps two escape hatches: an operator that wants threaded
# BLAS in a single-partition stage can export the var first, and Spark's
# own executor-env injection (OMP_NUM_THREADS = task cpus) still wins
# where configured. cluster.py additionally pins these four vars via
# spark.executorEnv.* so cluster deployments do not depend on this
# import-order contract at all.
for _var in (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    _os.environ.setdefault(_var, "1")
del _var

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
