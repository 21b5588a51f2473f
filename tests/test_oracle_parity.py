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
    # sketch-based keys are the only sanctioned rows-only entries
    assert rows_only <= {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "agg_approx_distinct",
        "agg_approx_percentile",
        "similarity_mllib_lsh",
        "kmeans_embeddings",
        "agg_hll_merge",
        "agg_approx_topk",
    }, f"unexpected rows-only queries: {rows_only}"
