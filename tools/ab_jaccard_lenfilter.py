"""A/B: Jaccard pair-gen length filter (round 14 optimization pass).

``jaccard_pairs`` generates candidate pairs from posting lists and counts
common shingles through a groupBy shuffle. Jaccard >= t implies
min(na, nb) / max(na, nb) >= t (common <= min, union >= max), so pairs
failing that size-ratio test can be dropped INSIDE the pair-gen lambda —
before they are ever emitted, exploded, or shuffled (guide 2.3: shuffle
fewer bytes; same family as the prefix/length filters of the set-similarity
join literature, e.g. PPJoin). DuckDB measurement on the sf0.1 fixture:
1,265,779 pair rows generated today, 822,468 survive the length filter
(-35%), and the final >= 0.6 output is identical (256 pairs) because the
dropped pairs are exactly those that cannot reach the threshold.

Protocol: both variants coded here verbatim (old = pre-change shipped
form), interleaved in both orders in ONE session, >= 3 runs per arm,
identity pinned by sorted-row compare (and against the shipped operator).

Usage: python tools/ab_jaccard_lenfilter.py [--runs-per-arm 4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.6
DF_CAP = 1000


def _postings(spark):
    from mapreduce_6_824_lab1_spark.catalog import load_table
    from mapreduce_6_824_lab1_spark.operators.dedup import shingle_sets

    docs = load_table(spark, SF_DIR, "documents")
    sets = shingle_sets(docs)
    sh = sets.select(
        F.explode("shs").alias("shingle"),
        F.struct(F.col("doc_id"), F.size("shs").alias("n")).alias("d"),
    )
    return (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("d")).alias("docs"))
        .filter((F.size("docs") > 1) & (F.size("docs") <= DF_CAP))
    )


def _finish(pairs):
    from mapreduce_6_824_lab1_spark.functions.numeric import hround

    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return pairs.filter(jac >= THRESHOLD).select(
        "doc_a", "doc_b", hround(jac, 4).alias("jaccard")
    )


def jaccard_unfiltered(spark):
    """The pre-r14 shipped pair-gen: every co-occurring pair emitted."""
    postings = _postings(spark)
    pairs = (
        postings.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> "
                    "transform(slice(docs, i + 2, size(docs)), "
                    "y -> struct(x.doc_id AS doc_a, x.n AS na, "
                    "y.doc_id AS doc_b, y.n AS nb))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.na", "p.doc_b", "p.nb")
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return _finish(pairs)


def jaccard_lenfiltered(spark):
    """Candidate: size-ratio filter inside the pair-gen lambda."""
    postings = _postings(spark)
    pairs = (
        postings.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> "
                    "transform(filter(slice(docs, i + 2, size(docs)), "
                    f"y -> least(x.n, y.n) >= {THRESHOLD} * greatest(x.n, y.n)"
                    " - 1e-9), "
                    "y -> struct(x.doc_id AS doc_a, x.n AS na, "
                    "y.doc_id AS doc_b, y.n AS nb))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.na", "p.doc_b", "p.nb")
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return _finish(pairs)


def main() -> None:
    runs = 4
    if "--runs-per-arm" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs-per-arm") + 1])

    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="ab-jaccard-lenfilter")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # identity first (also vs the shipped operator, whichever form it holds)
    from mapreduce_6_824_lab1_spark import QUERIES

    rows_old = sorted(map(tuple, jaccard_unfiltered(spark).collect()))
    rows_new = sorted(map(tuple, jaccard_lenfiltered(spark).collect()))
    rows_ship = sorted(
        map(tuple, QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect())
    )
    assert rows_old == rows_new, (
        f"IDENTITY FAIL old {len(rows_old)} vs new {len(rows_new)}"
    )
    assert rows_ship == rows_new, (
        f"IDENTITY FAIL shipped {len(rows_ship)} vs new {len(rows_new)}"
    )
    print(f"identity ok: {len(rows_new)} pairs, shipped form matches")

    arms = {"old": jaccard_unfiltered, "new": jaccard_lenfiltered}
    times: dict[str, list[float]] = {"old": [], "new": []}
    # interleave both orders: old,new,new,old,old,new,... absorbs drift
    order = []
    for i in range(runs):
        order += ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for arm in order:
        spark.sparkContext.setJobDescription(f"ab-jaccard {arm}")
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
