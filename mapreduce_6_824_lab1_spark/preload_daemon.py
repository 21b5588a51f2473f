"""Python-worker daemon with the Arrow lane pre-imported (fork warming).

Spark 4.1's ``PythonWorkerFactory`` reaps idle pooled workers after a
HARD-CODED one minute (``IDLE_WORKER_TIMEOUT_NS = MINUTES.toNanos(1)``
in the factory's static initializer — a constant, not a conf; verified
against this build's bytecode and empirically via
``tools/probe_worker_lifetime.py``: a 32-worker pool sits intact for
60 s idle, then collapses to daemon-only within the next poll). Any
Python-lane stage that starts >60 s after the previous one therefore
pays a full pool rebuild, and the dominant rebuild cost is each fresh
worker importing numpy/pandas/pyarrow (~0.7 s CPU per worker, N× in
parallel) — measured live in WORKER_CENSUS.jsonl session r12n, where
``similarity_knn_clusters`` rebuilt 31 workers inside its own timing.

The fix is the classic pre-fork trick: ``spark.python.daemon.module``
lets the engine supply this module in place of ``pyspark.daemon``. The
daemon process is long-lived (the reaper kills only workers), so
imports done HERE before entering the daemon loop are inherited
copy-on-write by every forked worker — including respawns after the
one-minute reap — turning pool rebuild from N×(interpreter + numpy +
pandas + pyarrow import) into N×fork().

Importing this module as ``__main__`` via ``python -m`` also imports
its parent package first, so the engine's own operator modules (which
worker-side cloudpickle references resolve against) are warmed the
same way for free.

At cluster scale this matters MORE than on local[32]: a 100 TB
pipeline interleaves minutes-long JVM-only stages (joins, shuffles,
scans) with Arrow-lane stages (quality UDFs, embedding math), so every
Arrow stage after a JVM gap lands on a freshly-reaped pool across the
whole fleet — preloading moves that cost to one import per executor
process lifetime.

The tuned session factory (:mod:`.session`) enables this module unless
``SPARK_GRAFT_NO_PRELOAD_DAEMON`` is set (the A/B switch used by
``tools/ab_worker_respawn.py``). The driver's own vanilla sessions are
unaffected — this is an engine optimization, not a correctness path.
"""

from __future__ import annotations

import importlib
import os

# Single-threaded BLAS in workers, pinned BEFORE numpy loads: this box's
# numpy/OpenBLAS (0.3.23, DYNAMIC_ARCH) spawns its full 32-thread pool AT
# IMPORT, so an uncapped preload hands every forked worker a broken
# 32-thread server that re-initializes per child — measured 97.8 s of
# pool CPU for similarity_knn_clusters' 31-worker stage vs 32.3 s
# without preload (WORKER_CENSUS.jsonl r12o vs ctlA). One BLAS thread
# per worker is also simply correct under Spark: a worker owns one task
# slot, and 32 workers × 32 BLAS threads oversubscribes the box 32×.
# setdefault, so an operator that genuinely wants threaded BLAS in a
# single-partition stage can override via the environment.
for _var in (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ.setdefault(_var, "1")

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.parquet"):
    try:
        importlib.import_module(_mod)
    except ImportError:  # environment without the lib: fork cold, as before
        pass

# ORDER CONTRACT: this import must stay AFTER the env pins (numpy reads
# OPENBLAS_NUM_THREADS at load, and pyspark.daemon may transitively load
# it) and must see sys.argv UNTOUCHED — pyspark/daemon.py resolves the
# worker module from sys.argv[1] at MODULE IMPORT time (`python -m
# <daemonModule> <workerModule>` is the factory's launch shape), so the
# pass-through works for any `pyspark.*` worker module Spark chooses,
# not just pyspark.worker.
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
