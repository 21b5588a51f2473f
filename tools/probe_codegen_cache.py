"""Codegen-source instrumentation (round 15, VERDICT r14 ask #4).

Counts actual generated-class compilations per query bracket via the JVM
CodegenMetrics histogram, and re-runs keys WARM to separate one-time
compilation from cache-thrash recompilation.

Round-15 findings (this tool, sf0.1):
- plain keys (supplier_scorecard, text_tfidf, similarity_knn_graph) are
  +0 compilations on a warm re-run — their sources cache;
- similarity_knn_clusters recompiled 27-69 sources on a WARM re-run.
  Capturing the sources (log4j DEBUG on CodeGenerator) showed run 2's
  source TEXTS were bit-identical to run 1's — the misses are evictions:
  the codegen class cache holds spark.sql.codegen.cache.maxEntries = 100
  entries by default, while one bench session generates several hundred
  distinct sources, so the iterative brackets thrash it and Janino + the
  JVM JIT recompile classes compiled minutes earlier (census jit_ms
  6-10 s inside the similarity_knn_clusters bracket; the trailing JIT
  tail is the mechanism behind the r14 similarity_join in-bench trips).
- session.py now sets the cache to 2000 (SPARK_GRAFT_CODEGEN_CACHE to
  override); with it, warm re-runs compile ~0 sources.

Usage: python tools/probe_codegen_cache.py [key ...]
       (default: the two iterative keys plus their trailing bracket)
       SPARK_GRAFT_CODEGEN_CACHE=100 python tools/probe_codegen_cache.py
       reproduces the thrash.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    keys = sys.argv[1:] or [
        "similarity_knn_clusters",
        "graph_bfs_frontier",
        "similarity_join",
    ]
    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="probe-codegen-cache")
    spark.sparkContext.setLogLevel("ERROR")
    mod = getattr(
        getattr(spark._jvm.org.apache.spark.metrics.source, "CodegenMetrics$"),
        "MODULE$",
    )
    hist = mod.METRIC_COMPILATION_TIME()
    print(
        "codegen cache maxEntries =",
        spark.conf.get("spark.sql.codegen.cache.maxEntries"),
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for rep in ("cold", "warm", "warm2"):
        for key in keys:
            c0 = hist.getCount()
            t0 = time.perf_counter()
            noop(QUERIES[key](spark, SF_DIR))
            print(
                f"{rep:5s} {key}: {time.perf_counter() - t0:6.2f}s  "
                f"compilations +{hist.getCount() - c0}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
