"""A/B: pipeline_pretraining_corpus dedup aggregate — SortAggregate vs
HashAggregate (round 14 optimization pass).

The exact-dedup stage picked its winner with ``min(struct(doc_id, text,
h, n_tokens))``: a struct-typed aggregation buffer, which HashAggregate's
UnsafeRow buffer cannot hold, so Catalyst fell back to SortAggregate —
sorting the FULL gated text corpus by digest on both sides of the
exchange (Sort+partial SortAggregate → Exchange → Sort+final
SortAggregate). The shipped form now groups by (digest, text) — identical
groups, text determines digest — with primitive-only aggregates
(min(doc_id), min(n_tokens)) and recomputes h from the winning doc_id,
which restores hash aggregation and removes all four Sort/SortAggregate
nodes (plans/r14/pipeline_pretraining_corpus_{before,after}.txt).

Protocol: the old dedup stage is coded here verbatim and spliced into the
shipped downstream (decontamination → split/shard manifest, imported from
the operator module so both arms share it); arms interleaved in both
orders in ONE session, >= 3 runs per arm, identity pinned by sorted-row
compare against the shipped operator.

Usage: python tools/ab_pretrain_hashagg.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pretrain_old(spark):
    """Pre-r14 shipped form: min(struct(...)) dedup → SortAggregate."""
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.operators.pipeline import (
        _KNUTH,
        _MOD,
        _PP_EVAL_MOD,
        _PP_GRAM,
        _PP_MIN_CHARS,
        _PP_MIN_TOKENS,
        _PP_SHARDS,
        _token_grams,
    )
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, SF_DIR, "documents")
    gated = (
        docs.select(
            "doc_id",
            "text",
            F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)).alias("h"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            "n_chars",
        )
        .filter(
            (F.col("n_chars") >= _PP_MIN_CHARS)
            & (F.col("n_tokens") >= _PP_MIN_TOKENS)
        )
        .drop("n_chars")
    )
    deduped = (
        gated.groupBy(F.md5("text").alias("digest"))
        .agg(F.min(F.struct("doc_id", "text", "h", "n_tokens")).alias("s"))
        .select("s.doc_id", "s.text", "s.h", "s.n_tokens")
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _PP_GRAM
    )
    evalg = (
        toks.filter(F.pmod("doc_id", F.lit(_PP_EVAL_MOD)) == 0)
        .select(_token_grams("t", _PP_GRAM).alias("gram"))
        .distinct()
    )
    traing = deduped.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", _token_grams("t", _PP_GRAM).alias("gram"))
    contaminated = traing.join(broadcast(evalg), "gram", "left_semi").select(
        "doc_id"
    ).distinct()
    clean = deduped.filter(
        F.pmod("doc_id", F.lit(_PP_EVAL_MOD)) != 0
    ).join(contaminated, "doc_id", "left_anti")
    split = (
        F.when(F.col("h") < int(0.90 * _MOD), "train")
        .when(F.col("h") < int(0.95 * _MOD), "val")
        .otherwise("test")
    )
    return (
        clean.select(
            split.alias("split"),
            F.pmod(F.expr("h div 65536"), F.lit(_PP_SHARDS)).alias("shard"),
            "n_tokens",
            "h",
        )
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("h").cast("long").alias("checksum"),
        )
    )


def pretrain_new(spark):
    """The shipped (hash-aggregate) form."""
    from mapreduce_6_824_lab1_spark import QUERIES

    return QUERIES["pipeline_pretraining_corpus"](spark, SF_DIR)


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-pretrain-hashagg")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows_old = sorted(map(tuple, pretrain_old(spark).collect()))
    rows_new = sorted(map(tuple, pretrain_new(spark).collect()))
    assert rows_old == rows_new, (
        f"IDENTITY FAIL old {len(rows_old)} vs new {len(rows_new)}"
    )
    print(f"identity ok: {len(rows_new)} manifest rows, shipped form matches")

    # plan shape pins: old arm sorts, new arm hash-aggregates
    old_plan = pretrain_old(spark)._jdf.queryExecution().executedPlan().toString()
    new_plan = pretrain_new(spark)._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" in old_plan, "old arm no longer SortAggregate?"
    assert "SortAggregate" not in new_plan, "new arm still SortAggregate!"
    print("plan pin ok: SortAggregate in old only")

    arms = {"old": pretrain_old, "new": pretrain_new}
    times: dict[str, list[float]] = {"old": [], "new": []}
    order = []
    for i in range(runs):
        order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for arm in order:
        spark.sparkContext.setJobDescription(f"ab-pretrain {arm}")
        t0 = time.perf_counter()
        mat(arms[arm](spark))
        times[arm].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)

    summary = {
        arm: {
            "times": ts,
            "median": sorted(ts)[len(ts) // 2],
            "min": min(ts),
        }
        for arm, ts in times.items()
    }
    summary["ratio_median"] = round(
        summary["new"]["median"] / summary["old"]["median"], 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
