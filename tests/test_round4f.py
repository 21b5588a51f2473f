"""Round-4f additions: vocab coverage curve, duplicate-substring signal,
exact-k hash reservoir — python recomputes plus the TakeOrdered plan pin."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from mapreduce_6_824_lab1_spark import QUERIES
from mapreduce_6_824_lab1_spark.operators.curation3 import (
    _GRAM_K,
    _RESERVOIR_K,
    _VOCAB_N,
)
from mapreduce_6_824_lab1_spark.operators.text_analysis import _KNUTH, _MOD
from tests.conftest import SF_DIR


def test_vocab_coverage_matches_counter(spark):
    got = (
        QUERIES["text_vocab_coverage"](spark, SF_DIR)
        .toPandas()
        .sort_values("rank", ignore_index=True)
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt = Counter(w for t in docs["text"] for w in t.split(" "))
    total = sum(cnt.values())
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB_N]
    assert list(got["word"]) == [w for w, _ in ref]
    assert list(got["n_occurrences"]) == [c for _, c in ref]
    cum = 0
    for i, (_, c) in enumerate(ref):
        cum += c
        assert got["coverage_ppm"].iloc[i] == cum * 1_000_000 // total
    # the curve is a monotone share, capped at 1e6 ppm
    assert got["coverage_ppm"].is_monotonic_increasing
    assert got["coverage_ppm"].iloc[-1] <= 1_000_000


def test_substring_dupes_match_python_recompute(spark):
    got = (
        QUERIES["dedup_substring_ngrams"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    grams: dict[int, list[str]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        t = text.split(" ")
        if len(t) >= _GRAM_K:
            grams[did] = [
                " ".join(t[i : i + _GRAM_K])
                for i in range(len(t) - _GRAM_K + 1)
            ]
    owners: dict[str, set[int]] = {}
    for did, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(did)
    dup = {g for g, ds in owners.items() if len(ds) >= 2}
    assert set(got.index) == set(grams)
    n_docs_with_dup = 0
    for did, gs in grams.items():
        nd = sum(g in dup for g in gs)
        assert got.loc[did, "n_grams"] == len(gs)
        assert got.loc[did, "n_dup_grams"] == nd
        assert got.loc[did, "dup_ppm"] == nd * 1_000_000 // len(gs)
        n_docs_with_dup += nd > 0
    # the fixture genuinely contains cross-document 8-gram duplication
    assert n_docs_with_dup > 0


def test_reservoir_is_exact_k_smallest_hashes_via_takeordered(spark):
    df = QUERIES["sample_reservoir"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()
    got = df.toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    h = (docs["doc_id"] * _KNUTH) % _MOD
    ref = (
        docs.assign(h=h)
        .sort_values(["h", "doc_id"], ignore_index=True)
        .head(_RESERVOIR_K)
    )
    assert len(got) == _RESERVOIR_K
    assert set(got["doc_id"]) == set(ref["doc_id"])
    # stability: the sample is the k-smallest-hash set, so restricting the
    # corpus to any superset of it reproduces it exactly (diffable samples)
    assert (got.sort_values("h")["h"].to_numpy() == ref["h"].to_numpy()).all()
