#!/usr/bin/env python
"""Measure the cost of a Python worker-pool cold restart directly.

SCALING_r12's variance watch attributes the noisy-host excursions on
``embedding_gram_matrix`` (7.1 s vs a 1.45–1.90 s settled band) to "a
full 32-worker cold restart" by arithmetic (~5.6 s delta ≈ spin-up +
per-worker numpy/pandas import + Arrow first-touch). This A/B measures
that number instead of estimating it:

1. warm the session exactly like bench.py (JVM + Arrow lane),
2. time the watch keys N times on the warm pool,
3. SIGKILL every idle pooled worker (children of pyspark.daemon — the
   daemon itself is left alone so Spark's recovery path is the normal
   worker-respawn one),
4. time the first post-kill run (pays the full pool rebuild),
5. time recovery runs on the rebuilt pool.

If (post-kill − warm-median) reproduces the excursion delta, the
mechanism is confirmed and r13 can stop theorizing; if it comes in far
under, the excursions need a different explanation (JVM code-cache,
scheduler state) and the census rules worker churn OUT.

Usage: python tools/ab_worker_respawn.py [key ...]   (defaults below)
Writes one JSON line per key to stdout; safe to run on a quiet host
only (it is a timing experiment — steal/membw probes are recorded).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses census + probes; no main() side effects)
from tools.probe_worker_lifetime import _my_jvm_pid, _my_pool  # noqa: E402
from mapreduce_6_824_lab1_spark import QUERIES  # noqa: E402
from mapreduce_6_824_lab1_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = ["embedding_gram_matrix", "similarity_knn_clusters"]
WARM_RUNS = 3
RECOVERY_RUNS = 2


def _kill_pool(jvm: int) -> int:
    """SIGKILL every pooled worker belonging to THIS process's JVM.

    The census is filtered to our own JVM subtree (probe_worker_lifetime's
    _my_pool: daemons whose ppid is our JVM child, plus their workers) —
    an unfiltered bench._worker_census() matches any pyspark worker on
    the box, so a concurrent driver_sim/pytest session would get its
    pool killed and pollute the A/B counts (ADVICE r12). Within the
    subtree, "parent is also in the set" identifies workers exactly (a
    daemon's parent is the JVM, which is not in the set). Returns the
    kill count."""
    pool = _my_pool(jvm)
    pool_pids = {pid for (pid, _) in pool}
    killed = 0
    for (pid, _), info in pool.items():
        if info["ppid"] in pool_pids:
            try:
                os.kill(pid, signal.SIGKILL)
                killed += 1
            except OSError:
                pass
    return killed


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-worker-respawn")
    spark.sparkContext.setLogLevel("ERROR")

    # same two warms as bench.py: JVM machinery + Arrow/Python lane
    from pyspark.sql import functions as F  # noqa: PLC0415

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    bench.materialize(
        nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("c"))
    )

    def _warm_pandas(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    bench.materialize(
        nation.select("n_nationkey").mapInPandas(_warm_pandas, "n long")
    )

    jvm = _my_jvm_pid()
    if jvm is None:
        print(json.dumps({"error": "no JVM child found; refusing to kill"}))
        spark.stop()
        return

    for key in keys:
        fn = QUERIES[key]

        def run() -> float:
            t0 = time.perf_counter()
            bench.materialize(fn(spark, sf_dir))
            return round(time.perf_counter() - t0, 3)

        warm, warm_pool = [], []
        for _ in range(WARM_RUNS):
            warm.append(run())
            warm_pool.append(len(_my_pool(jvm)))
        pool_before = _my_pool(jvm)
        n_killed = _kill_pool(jvm)
        time.sleep(1.0)  # let the daemon reap; avoids racing half-dead pids
        post_kill = run()
        pool_after = _my_pool(jvm)
        recovery = [run() for _ in range(RECOVERY_RUNS)]
        warm_med = sorted(warm)[len(warm) // 2]
        print(json.dumps({
            "key": key,
            "warm_runs": warm,
            "warm_pool_sizes": warm_pool,
            "warm_median": warm_med,
            "workers_killed": n_killed,
            "pool_before": len(pool_before),
            "pool_after_rebuild": len(pool_after),
            "post_kill_run": post_kill,
            "rebuild_delta": round(post_kill - warm_med, 3),
            "recovery_runs": recovery,
            "membw_gbps": bench._membw_probe_gbps(),
        }))

    spark.stop()


if __name__ == "__main__":
    main()
