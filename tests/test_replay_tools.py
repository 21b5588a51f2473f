"""Unit pins for the scaled-replay helpers in tools/replay_sf1.py."""

from __future__ import annotations

import itertools
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.replay_sf1 import _hamming_ball_pairs  # noqa: E402


def test_hamming_ball_matches_itertools_brute_force():
    rng = np.random.RandomState(7)
    # cluster structure: a base fingerprint plus 1-4 bit flips, plus noise
    base = rng.randint(0, 2**63, size=5, dtype=np.int64).view(np.uint64)
    fps = [base[i % 5] ^ np.uint64(1 << rng.randint(0, 64)) for i in range(40)]
    fps += list(rng.randint(0, 2**63, size=60, dtype=np.int64).view(np.uint64))
    fps = np.array(fps, dtype=np.uint64)
    ids = np.arange(100, dtype=np.int64) * 3 + 11  # non-contiguous ids

    got = _hamming_ball_pairs(fps, ids, 3)
    ref = set()
    for i, j in itertools.combinations(range(100), 2):
        h = bin(int(fps[i] ^ fps[j])).count("1")
        if h <= 3:
            a, b = ids[i], ids[j]
            ref.add((int(min(a, b)), int(max(a, b)), h))
    assert got == ref and len(ref) > 0


def test_hamming_ball_block_boundary():
    # identical fingerprints straddling the 1024-row block edge must pair
    fps = np.zeros(2050, dtype=np.uint64)
    fps[:] = np.uint64(0xDEADBEEF)
    ids = np.arange(2050, dtype=np.int64)
    got = _hamming_ball_pairs(fps, ids, 0)
    assert len(got) == 2050 * 2049 // 2
