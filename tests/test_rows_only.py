"""Coverage for the rows-only (no-oracle) queries: they must run, produce a
stable schema, and their approximations must agree with the exact twins."""

from __future__ import annotations

import pytest

from mapreduce_6_824_lab1_spark import QUERIES
from tests.conftest import SF_DIR


def test_minhash_recall_vs_exact(spark):
    """LSH candidates + exact verify must recover the planted near-dup pairs
    found by the exact n-gram Jaccard query (the lab's golden-diff pattern)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    }
    assert approx <= exact, f"false positives survived verify: {approx - exact}"
    # 16 bands × 4 rows at s≥0.6 ⇒ per-pair detection ≥ 0.90; planted pairs
    # score ≥ 0.98 where detection is ~1. Allow one miss.
    assert len(approx) >= len(exact) - 1, (
        f"recall too low: {len(approx)}/{len(exact)}"
    )


def test_simhash_runs_and_is_symmetric_free(spark):
    df = QUERIES["dedup_simhash"](spark, SF_DIR)
    rows = df.collect()
    assert df.columns == ["doc_a", "doc_b", "hamming"]
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3


def test_approx_distinct_within_bounds(spark):
    exact = {
        r.event_type: r.n_users
        for r in QUERIES["agg_distinct"](spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(3, 0.1 * v), (k, approx[k], v)


def test_approx_percentile_within_bounds(spark):
    exact = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["agg_percentiles"](spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: (r.approx_p50, r.approx_p90)
        for r in QUERIES["agg_approx_percentile"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k, (p50, p90) in exact.items():
        a50, a90 = approx[k]
        assert abs(a50 - p50) <= max(5.0, 0.1 * p50), (k, a50, p50)
        assert abs(a90 - p90) <= max(5.0, 0.1 * p90), (k, a90, p90)


def test_ivf_recall_against_exact_topk(spark):
    exact = [r.vec_id for r in QUERIES["similarity_topk"](spark, SF_DIR).collect()]
    ivf = {r.vec_id for r in QUERIES["similarity_ivf"](spark, SF_DIR).collect()}
    recall = len(set(exact) & ivf) / len(exact)
    # multi-probe over 5/16 cells; sign-agreement correlates with cosine,
    # so recall well above the 5/16 ≈ 0.31 random baseline is expected
    assert recall >= 0.4, (recall, exact, sorted(ivf))


def test_mllib_lsh_neighbors_sane(spark):
    rows = QUERIES["similarity_mllib_lsh"](spark, SF_DIR).collect()
    assert len(rows) == 10
    dists = [r.euclidean_dist for r in rows]
    assert all(d >= 0 for d in dists)
    assert sorted(dists) == dists or set(dists) == set(sorted(dists))


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_hll_merge_equals_direct_and_bounds(spark, sf_dir):
    """Daily-sketch union must equal the direct whole-column sketch (the
    lossless-merge identity), and the estimate must sit within HLL lgK=14
    error (<2%) of exact — pinned at BOTH fixture scale and bench scale
    (sf0.1), so the rows-only key carries quantitative evidence where the
    driver benches it (VERDICT r2 ask #8)."""
    from pyspark.sql import functions as F

    from mapreduce_6_824_lab1_spark.catalog import load_table

    merged = {
        r.event_type: r.est_users
        for r in QUERIES["agg_hll_merge"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct, "sketch union lost information vs direct sketch"
    for t, est in merged.items():
        assert abs(est - exact[t]) <= max(1, 0.02 * exact[t]), (t, est, exact[t])


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_approx_topk_matches_exact(spark, sf_dir):
    """With maxItemsTracked (10k) far above the corpus vocabulary (31),
    the sketch counts are exact — pin against the true word counts at both
    fixture scale and bench scale (sf0.1)."""
    from pyspark.sql import functions as F

    from mapreduce_6_824_lab1_spark.catalog import load_table

    approx = {
        (r.word, r.cnt)
        for r in QUERIES["agg_approx_topk"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(len(approx))
        .collect()
    )
    # ties at the k-th count make the exact cut ambiguous; compare counts
    # for every word the sketch returned
    exact_all = dict(
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    for word, cnt in approx:
        assert exact_all[word] == cnt, (word, cnt, exact_all[word])
    assert len(approx) == min(10, len(exact_all))
    del exact
