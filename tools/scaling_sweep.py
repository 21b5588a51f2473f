"""Empirical scaling sweep over the scaled replicas of sf0.1.

Runs registry queries at several SF dirs (the driver's sf0.1 plus the
scaled_data/ replicas from tools/make_scaled_data.py) in ONE warm Spark
session per SF, warm best-of-N per query, and prints a per-query table of
times and per-10x ratios. A linear plan should show ratio <= ~10 per 10x
rows on a fixed 32-thread box (often far less while fixed costs
dominate); anything trending super-linear at 100x is a scale bug the
sf0.1 bench can't see.

Usage (from repo root):
    python tools/scaling_sweep.py                       # default set, sf0.1+sf1
    python tools/scaling_sweep.py --sf sf0.1 sf1 sf10 q1 q2 ...
Output: one JSON line per SF dir, then a markdown table on stderr-free
stdout for pasting into SCALING_r06.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    # headline cross-section
    "wordcount",
    "distributed_sort",
    "agg_hash",
    "join_inner_equi",
    "join_asof_merge",
    "window_analytic",
    "window_session",
    "topk",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "text_tfidf",
    # heavy / iterative extended
    "basket_pair_support",
    "embedding_gram_matrix",
    "supplier_scorecard",
    "similarity_knn_graph",
    "similarity_knn_clusters",
    "graph_bfs_frontier",
    "dedup_minhash_lsh",
    "pipeline_pretraining_corpus",
]


def resolve_sf_dir(tag: str) -> str:
    if os.path.isdir(tag):
        return tag
    if tag == "sf0.1":
        return "/root/testdata/sf0.1"
    cand = os.path.join(REPO, "scaled_data", tag)
    if os.path.isdir(cand):
        return cand
    raise SystemExit(f"unknown sf dir: {tag}")


def main() -> None:
    args = sys.argv[1:]
    sf_tags = ["sf0.1", "sf1"]
    if "--sf" in args:
        i = args.index("--sf")
        rest = args[i + 1 :]
        sf_tags = []
        while rest and (rest[0].startswith("sf") or os.path.isdir(rest[0])):
            sf_tags.append(rest.pop(0))
        args = args[:i] + rest
    keys = args or DEFAULT_QUERIES
    runs = int(os.environ.get("SWEEP_RUNS", "2"))

    from mapreduce_6_824_lab1_spark import QUERIES
    from mapreduce_6_824_lab1_spark.session import get_spark

    for k in keys:
        if k not in QUERIES:
            raise SystemExit(f"unknown query key: {k}")

    results: dict[str, dict[str, float]] = {}
    counts: dict[str, dict[str, int]] = {}
    for tag in sf_tags:
        sf_dir = resolve_sf_dir(tag)
        spark = get_spark(app_name=f"scaling-sweep-{tag}")
        spark.sparkContext.setLogLevel("ERROR")
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for key in keys:
            best = float("inf")
            for _ in range(runs):
                t0 = time.monotonic()
                QUERIES[key](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
            times[key] = round(best, 3)
            # result-count sanity: the round-6 LSH saturation returned ZERO
            # rows while getting FASTER — a falling/zero count across SFs is
            # the bug signature timing alone can miss. One extra execution.
            rows[key] = QUERIES[key](spark, sf_dir).count()
            print(
                f"  {tag} {key}: {times[key]} ({rows[key]} rows)",
                file=sys.stderr,
            )
        results[tag] = times
        counts[tag] = rows
        print(json.dumps({"sf": tag, "queries": times, "rows": rows}))
        spark.stop()

    # markdown table with per-step ratios
    hdr = "| query | " + " | ".join(sf_tags) + " | " + " | ".join(
        f"{b}/{a}" for a, b in zip(sf_tags, sf_tags[1:])
    ) + " |"
    print(hdr)
    print("|" + "---|" * (1 + len(sf_tags) + len(sf_tags) - 1))
    for key in keys:
        row = [key] + [
            f"{results[t][key]:.2f} ({counts[t][key]}r)" for t in sf_tags
        ]
        for a, b in zip(sf_tags, sf_tags[1:]):
            ratio = results[b][key] / max(results[a][key], 1e-9)
            row.append(f"{ratio:.1f}x")
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
