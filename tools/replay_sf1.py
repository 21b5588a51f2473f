"""sf1-scale replay checks for the three heaviest rows-only keys
(round-11 verdict ask #5).

The rows-only keys have no SQL oracle; each is pinned to an exact
independent replay at sf0.01 (tests/test_rows_only.py, test_kmeans.py,
test_round4h.py). This tool re-runs those SAME replay oracles at
scaled_data/sf1 (10x driver scale) to catch drift the driver cannot see
at any scale it runs:

- ``dedup_minhash_lsh`` — candidates+verify vs the exact n-gram Jaccard
  twin (itself hash-verified against DuckDB at sf1 by parity_sf1.py):
  zero false positives required; recall >= 0.9 (16 bands x 4 rows at
  s>=0.6 gives per-pair detection >= 0.90; planted pairs score ~0.98).
- ``kmeans_embeddings`` — full numpy Lloyd's replay (same deterministic
  init/ties/iterations) over the sf1 embeddings: member counts must
  match exactly, centroid norms to 1e-3.
- ``tokenizer_bpe_train`` — exact pure-Python BPE replay over the sf1
  documents: every merge step (pair, merged token, count) must match.

Appends the result to PARITY_SF1.md. Exit 0 = all three agree.

    python tools/replay_sf1.py           # sf1 (10x driver scale)
    python tools/replay_sf1.py --sf10    # sf10 (100x; appends to
                                         # PARITY_SF10.md instead)

At sf10 the numpy Lloyd's replay streams the 200k x d distance
computation in row blocks (the full 200k x k x d tensor would be
~0.8 GB per iteration); the replay arithmetic is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "scaled_data", "sf1")
SF10 = os.path.join(REPO, "scaled_data", "sf10")
RECORD = os.path.join(REPO, "PARITY_SF1.md")
RECORD10 = os.path.join(REPO, "PARITY_SF10.md")


def _numpy_kmeans(sf_dir: str, k: int, iterations: int):
    """Independent Lloyd's replay — mirrors tests/test_kmeans.py."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = t["vec_id"].to_numpy()
    X = np.array(t["embedding"].to_pylist(), dtype="float64")
    order = np.argsort(vec_ids)
    X = X[order]
    vec_ids = vec_ids[order]
    cents = X[vec_ids < k].copy()

    def _assign(cents):
        # row-blocked distances: identical argmin, bounded memory at sf10
        out = np.empty(len(X), dtype=np.int64)
        for lo in range(0, len(X), 20000):
            blk = X[lo : lo + 20000]
            d = ((blk[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            out[lo : lo + 20000] = d.argmin(axis=1)
        return out

    for _ in range(iterations):
        cid = _assign(cents)
        cents = np.array(
            [
                X[cid == c].mean(axis=0) if (cid == c).any() else cents[c]
                for c in range(k)
            ]
        )
    cid = _assign(cents)
    counts = {c: int((cid == c).sum()) for c in range(k) if (cid == c).any()}
    norms = {c: float(np.sqrt((cents[c] ** 2).sum())) for c in counts}
    return counts, norms


def _python_bpe(corpus, k: int, join: str):
    """Exact BPE replay — mirrors tests/test_round4h.py."""
    merges = []
    toks = [list(t) for t in corpus]
    for step in range(1, k + 1):
        counts: Counter = Counter()
        for t in toks:
            counts.update(zip(t, t[1:]))
        if not counts:
            break
        (x, y), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merged = f"{x}{join}{y}"
        merges.append((step, x, y, merged, c))
        out = []
        for t in toks:
            acc: list[str] = []
            for tok in t:
                if acc and acc[-1] == x and tok == y:
                    acc[-1] = merged
                else:
                    acc.append(tok)
            out.append(acc)
        toks = out
    return merges


def main() -> None:
    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.operators.curation3 import (
        BPE_JOIN,
        BPE_MERGES,
    )
    from mapreduce_6_824_lab1_spark.operators.kmeans import ITERATIONS, K
    from mapreduce_6_824_lab1_spark.session import get_spark

    sf10 = sys.argv[1:2] == ["--sf10"]
    sf_dir = SF10 if sf10 else SF1
    record = RECORD10 if sf10 else RECORD
    scale = "sf10 (100x)" if sf10 else "sf1"

    spark = get_spark(app_name="replay-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    lines, fails = [], []

    # 1. minhash LSH vs exact Jaccard twin
    t0 = time.time()
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    fp = approx - exact
    recall = len(approx & exact) / max(1, len(exact))
    ok = not fp and recall >= 0.9
    if not ok:
        fails.append("dedup_minhash_lsh")
    lines.append(
        f"| dedup_minhash_lsh | {'pass' if ok else '**FAIL**'} | "
        f"{len(approx)}/{len(exact)} pairs | false_pos={len(fp)}, "
        f"recall={recall:.4f}, {time.time() - t0:.1f}s |"
    )
    print(lines[-1], flush=True)

    # 2. kmeans vs numpy Lloyd's
    t0 = time.time()
    rows = QUERIES["kmeans_embeddings"](spark, sf_dir).collect()
    counts, norms = _numpy_kmeans(sf_dir, K, ITERATIONS)
    got_counts = {r.cid: r.n_members for r in rows}
    bad_norm = [
        r.cid for r in rows if abs(r.centroid_norm - norms[r.cid]) >= 1e-3
    ]
    ok = got_counts == counts and not bad_norm
    if not ok:
        fails.append("kmeans_embeddings")
    lines.append(
        f"| kmeans_embeddings | {'pass' if ok else '**FAIL**'} | "
        f"{sum(counts.values())} vectors, {len(counts)} clusters | "
        f"counts_match={got_counts == counts}, norm_drift_cids={bad_norm}, "
        f"{time.time() - t0:.1f}s |"
    )
    print(lines[-1], flush=True)

    # 3. BPE merges vs pure-Python replay
    t0 = time.time()
    got = (
        QUERIES["tokenizer_bpe_train"](spark, sf_dir)
        .toPandas()
        .sort_values("step", ignore_index=True)
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ref = _python_bpe(
        [t.split(" ") for t in docs["text"]], BPE_MERGES, BPE_JOIN
    )
    ok = len(got) == len(ref)
    if ok:
        for (step, x, y, merged, c), (_, row) in zip(ref, got.iterrows()):
            if (
                row["step"] != step
                or (row["left"], row["right"]) != (x, y)
                or row["merged"] != merged
                or row["pair_count"] != c
            ):
                ok = False
                break
    if not ok:
        fails.append("tokenizer_bpe_train")
    lines.append(
        f"| tokenizer_bpe_train | {'pass' if ok else '**FAIL**'} | "
        f"{len(got)} merges over {len(docs)} docs | exact step/pair/count "
        f"match, {time.time() - t0:.1f}s |"
    )
    print(lines[-1], flush=True)

    with open(record, "a") as fh:
        fh.write(
            f"\n## Appendix — rows-only replay checks at {scale} "
            "(round-12; `python tools/replay_sf1.py"
            + (" --sf10" if sf10 else "")
            + "`)\n\n"
            "The three heaviest rows-only keys re-verified against their "
            "EXACT independent replay oracles (the same replays "
            "tests/test_rows_only.py pins at sf0.01) at "
            f"{'100x' if sf10 else '10x'} driver "
            f"scale: **{3 - len(fails)}/3**"
            + (f" — failures: {', '.join(fails)}" if fails else "")
            + "\n\n| key | status | size | detail |\n|---|---|---|---|\n"
            + "\n".join(lines)
            + "\n"
        )
    print(json.dumps({f"replay_{'sf10' if sf10 else 'sf1'}": f"{3 - len(fails)}/3", "fails": fails}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
