"""Every registered query with an oracle must match DuckDB at sf0.001 —
the same check the driver runs at sf0.01 (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from mapreduce_6_824_lab1_spark import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_parity

ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, duck):
    df = QUERIES[key](spark, SF_DIR)
    assert_parity(df, ORACLES[key], duck)


def test_all_queries_registered():
    # every query is either oracle-checked or explicitly rows-only
    rows_only = set(QUERIES) - set(ORACLES)
    # sketch/iterative-numeric keys are the only sanctioned rows-only
    # entries (each carries a unit test pinning it to an exact reference)
    assert rows_only <= {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "agg_approx_distinct",
        "agg_approx_percentile",
        "similarity_mllib_lsh",
        "kmeans_embeddings",
        "agg_hll_merge",
        "agg_approx_topk",
        "embedding_pca_power",  # eigenvector: numpy-pinned, not SQL
        "running_balance_clamped",  # clamped recurrence: python-pinned
        "tokenizer_bpe_train",  # iterative merge loop: python-pinned
        "agg_kll_quantiles",  # randomized sketch: rank-error-bound-pinned
    }, f"unexpected rows-only queries: {rows_only}"


def test_tpch_q2_nonempty(spark, duck):
    """ADVICE r2: q2 keeps rows only while both engines form the exact same
    IEEE double for ps_supplycost == min(...) — a silent divergence (decimal
    promotion, decorrelation rewrite) would drop ALL rows yet still
    hash-match an equally-empty oracle. Pin non-emptiness on both sides."""
    key = "sql_tpch_q2"
    assert QUERIES[key](spark, SF_DIR).count() > 0
    assert len(duck.execute(ORACLES[key]).df()) > 0
