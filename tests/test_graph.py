"""PageRank sanity guards beyond oracle parity: rank mass is conserved
(up to the documented dangling-node leak) and the derived graph is
irregular — a regression to the degenerate uniform distribution (which a
plain i -> i+1 chain produces under round-robin doc->source assignment)
would still hash-match a degenerate oracle, so pin non-uniformity here."""

from __future__ import annotations

import pytest

from mapreduce_6_824_lab1_spark import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ranks(spark):
    return QUERIES["pagerank_sources"](spark, SF_DIR).collect()


def test_rank_mass_conserved(ranks):
    total = sum(r["rank"] for r in ranks)
    assert total == pytest.approx(1.0, abs=1e-3)
    assert all(r["rank"] > 0 for r in ranks)


def test_ranks_not_uniform(ranks):
    assert len({r["rank"] for r in ranks}) > 1
