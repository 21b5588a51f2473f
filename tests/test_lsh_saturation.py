"""Anti-saturation pins for the adaptive sign-LSH widths (round 6).

A 100x scaled sweep (tools/make_scaled_data.py + tools/scaling_sweep.py)
caught ``similarity_knn_graph`` returning ZERO rows at 200k vectors: the
then-fixed 8-bit cell space saturated (every bucket > KNN_BUCKET_CAP) and
the hot-bucket skew guard silently deleted the whole graph. These tests
pin the fix — ``adaptive_sign_bits`` — at three levels: the pure integer
ladder, its DuckDB mirror (the oracles must derive the IDENTICAL width
from count(*)), and the end-to-end property that a corpus big enough to
saturate the old fixed width still yields a full-coverage kNN graph.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_6_824_lab1_spark import QUERIES
from mapreduce_6_824_lab1_spark.operators.similarity import (
    KNN_BUCKET_CAP,
    KNN_MAX_BITS,
    KNN_MIN_BITS,
    KNN_TARGET_BUCKET,
    adaptive_sign_bits,
    knn_bits,
    sql_adaptive_bits,
)


def test_adaptive_sign_bits_ladder():
    # driver/bench scales are all below the first step: width unchanged
    for n in (0, 1, 20, 200, 2000, 4096):
        assert knn_bits(n) == KNN_MIN_BITS
    assert knn_bits(4097) == 9
    assert knn_bits(20_000) == 11
    assert knn_bits(200_000) == 14
    assert knn_bits(10**9) == KNN_MAX_BITS  # clamped
    # defining property: smallest width whose expected bucket <= target
    for n in (1, 4096, 4097, 12_345, 65_536, 10**6):
        b = adaptive_sign_bits(n, KNN_MIN_BITS, KNN_MAX_BITS, KNN_TARGET_BUCKET)
        assert (1 << b) * KNN_TARGET_BUCKET >= n or b == KNN_MAX_BITS
        if b > KNN_MIN_BITS:
            assert (1 << (b - 1)) * KNN_TARGET_BUCKET < n


@pytest.mark.parametrize(
    "min_b,max_b,target", [(8, 16, 16), (4, 16, 128), (2, 5, 10)]
)
def test_sql_ladder_matches_python(min_b, max_b, target):
    """The oracle's CASE ladder over count(*) == adaptive_sign_bits for
    every n, including the exact step boundaries (integer thresholds —
    no float log2 on either side, so equality is exact, not approximate)."""
    ladder = sql_adaptive_bits(min_b, max_b, target)
    ns = [0, 1, 2]
    for b in range(min_b, max_b + 1):
        ns += [(1 << b) * target - 1, (1 << b) * target, (1 << b) * target + 1]
    con = duckdb.connect()
    for n in ns:
        got = con.execute(f"SELECT {ladder} FROM range({n})").fetchone()[0]
        assert got == adaptive_sign_bits(n, min_b, max_b, target), n


def test_knn_graph_survives_saturating_corpus(spark, tmp_path):
    """20k vectors saturate a fixed 8-bit space (expected bucket 78 >
    KNN_BUCKET_CAP=64 -> the old code dropped ~all buckets and most
    anchors lost their neighbors). With adaptive width (11 bits here)
    virtually every anchor must keep its full k of 3."""
    rng = np.random.default_rng(6)
    n, d = 20_000, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(list(x), pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, np.int32), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    assert knn_bits(n) == 11
    exp_bucket = n / (1 << 11)
    assert exp_bucket <= KNN_BUCKET_CAP / 2  # cap has real headroom again
    got = (
        QUERIES["similarity_knn_graph"](spark, str(tmp_path))
        .groupBy("vec_id")
        .count()
        .toPandas()
    )
    # sign-LSH on isotropic data leaves a small tail of anchors whose
    # buckets are singletons in all 4 tables; coverage must be near-total
    assert len(got) >= 0.99 * n
    assert (got["count"] == 3).mean() >= 0.99

def test_bloom_bits_ladder():
    """Same defect class, Bloom flavor: decontaminate_bloom's bit-array
    size must grow with the eval shingle count so FPR stays bounded
    (fixed m -> FPR drifts to 1 and the prefilter silently passes the
    whole corpus to the exact join)."""
    from mapreduce_6_824_lab1_spark.operators.curation import (
        BLOOM_BITS_PER_KEY,
        BLOOM_MIN_BITS,
        bloom_bits,
    )

    # every fixture/driver/bench eval set is far below the floor: unchanged
    for n in (0, 1, 1000, BLOOM_MIN_BITS // BLOOM_BITS_PER_KEY):
        assert bloom_bits(n) == BLOOM_MIN_BITS
    for n in (10**5, 10**6, 10**8):
        m = bloom_bits(n)
        assert m >= n * BLOOM_BITS_PER_KEY  # bounded FPR
        assert m & (m - 1) == 0  # power of two
        assert m // 2 < n * BLOOM_BITS_PER_KEY or m == BLOOM_MIN_BITS

def test_simhash_combo_bands_identical_pairs(spark, monkeypatch):
    """The scale scheme (5-of-8-chunk combination bands, used above
    SIMHASH_COMBO_THRESHOLD) must produce EXACTLY the pairs of the classic
    4-single-chunk scheme — both are exact covers of the hamming<=3 ball,
    so the only difference is candidate-generation cost."""
    import mapreduce_6_824_lab1_spark.operators.dedup as dd

    sf = "/root/testdata/sf0.01"
    base = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.dedup_simhash(spark, sf).collect()
    )
    monkeypatch.setattr(dd, "SIMHASH_COMBO_THRESHOLD", 0)
    combo = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.dedup_simhash(spark, sf).collect()
    )
    assert len(base) > 0
    assert base == combo


def test_shingle_df_cap_sensitivity(spark):
    """The SHINGLE_DF_CAP recall trade (PLANS.md 100 TB ruling), made
    executable: (a) pairs whose ONLY shared shingle is hot (df > cap)
    are deliberately lost; (b) pairs sharing any sub-cap shingle
    survive; (c) a pair sharing both keeps FULL set sizes, so its
    capped Jaccard is exactly the lower-bound formula
    common_kept / (na + nb - common_kept); (d) with the cap above the
    hot df, the same input yields the hot pairs back — the result is
    cap-sensitive on exactly the hot-only class and nothing else."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark.operators.dedup import (
        jaccard_pairs,
        shingle_sets,
    )

    # 12 docs that are pure boilerplate: one shingle, "h1 h2 h3".
    hot = [(100 + i, "h1 h2 h3") for i in range(12)]
    # one true near-dup pair on rare shingles only
    rare = [(1, "a b c d"), (2, "a b c d")]
    # one pair sharing 3 rare shingles + the hot one (4 total each)
    mixed = [(5, "r s t h1 h2 h3"), (6, "r s t h1 h2 h3")]
    docs = spark.createDataFrame(
        hot + rare + mixed, "doc_id long, text string"
    )
    sets = shingle_sets(docs)

    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sets, df_cap=10).collect()
    }
    # hot-only pairs (true J = 1.0) are gone: df("h1 h2 h3") = 14 > 10
    assert not any(a >= 100 for a, _ in capped), capped
    # rare pair survives at full score
    assert capped[(1, 2)] == 1.0
    # mixed pair: 3 of 4 shared shingles kept -> 3/(4+4-3) = 0.6 exactly
    # (true J = 1.0; the capped score is the documented lower bound)
    assert capped[(5, 6)] == 0.6

    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sets, df_cap=1000).collect()
    }
    assert uncapped[(5, 6)] == 1.0 and uncapped[(1, 2)] == 1.0
    # every hot-only pair reappears, at J = 1.0, and the delta vs the
    # capped run is EXACTLY the hot-only class
    hot_pairs = {p for p in uncapped if p[0] >= 100}
    assert len(hot_pairs) == 12 * 11 // 2
    assert set(uncapped) - set(capped) == hot_pairs
