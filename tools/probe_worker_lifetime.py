#!/usr/bin/env python
"""Measure idle Python-worker pool lifetime under this Spark build.

r12n's census (WORKER_CENSUS.jsonl) showed the lone warm worker dying
while IDLE ~110 s after spawn, during a pure-JVM query — contradicting
the r12 dead-end note "idleTimeoutSeconds unset => no idle reaping".
This probe settles it empirically: build a full-width pool with one
wide mapInPandas, then census every POLL_S seconds while the session
sits idle, printing pool size over time. If workers are reaped at some
T, the wide-warm-up fix must be judged against that T (the heavies run
~2-3 min after warm-up in a full bench session).

Census is filtered to THIS process's JVM subtree (daemon's ppid == our
JVM child), so a concurrently running driver_sim/pytest session cannot
pollute the counts — unlike bench.py's census, which assumes it owns
the box (true for driver runs).

Usage: python tools/probe_worker_lifetime.py [duration_s] [poll_s]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mapreduce_6_824_lab1_spark.session import get_spark  # noqa: E402


def _my_jvm_pid() -> int | None:
    me = os.getpid()
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(path) as fh:
                stat = fh.read()
        except OSError:
            continue
        after = stat.rsplit(")", 1)[1].split()
        if int(after[1]) == me and "(java)" in stat:
            return int(path.split("/")[2])
    return None


def _my_pool(jvm: int) -> dict:
    pool = bench._worker_census() or {}
    daemon_pids = {pid for (pid, _), w in pool.items() if w["ppid"] == jvm}
    return {
        k: w
        for k, w in pool.items()
        if k[0] in daemon_pids or w["ppid"] in daemon_pids
    }


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    poll = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="worker-lifetime-probe")
    spark.sparkContext.setLogLevel("ERROR")
    width = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy as np  # noqa: F401,PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    bench.materialize(
        spark.range(0, width * 64, 1, width).mapInPandas(_warm, "n long")
    )
    jvm = _my_jvm_pid()
    if jvm is None:
        print(json.dumps({"error": "no JVM child found"}))
        return
    t0 = time.monotonic()
    sizes = []
    while time.monotonic() - t0 < duration:
        n = len(_my_pool(jvm))
        sizes.append({"t_s": round(time.monotonic() - t0, 1), "n": n})
        print(json.dumps(sizes[-1]), flush=True)
        if n <= 1:  # daemon only — pool fully reaped, question answered
            break
        time.sleep(poll)
    spark.stop()


if __name__ == "__main__":
    main()
