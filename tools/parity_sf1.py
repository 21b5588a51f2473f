"""sf1 oracle-parity pass (round-10 verdict ask #4).

Every registry key is driver-verified at sf0.01 (~6k documents / 600k
lineitem); this tool re-runs the HEAVIEST join/window/dedup/ANN keys
against their own DuckDB oracles on the 10x replicas in
``scaled_data/sf1`` — the drift classes invisible at fixture scale are
float accumulation order (10x more addends per group), integer headroom
(sums 10x larger), and candidate-generation cutoffs (DF caps, LSH bit
ladders) that bind differently at bigger N. The compare is
driver_sim.compare_frames — the same strict dtype-aware comparator the
round gate uses.

    python tools/parity_sf1.py            # the pinned 20-key list at sf1
    python tools/parity_sf1.py key1 key2  # ad-hoc subset at sf1
    python tools/parity_sf1.py --sf10     # 12-key spot-check at sf10
                                          # (100x driver scale)

Writes PARITY_SF1.md / PARITY_SF10.md (human record) and prints one
status line per key. Exit 0 = all compared keys hash-green.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from driver_sim import TABLES, compare_frames  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "scaled_data", "sf1")
RECORD = os.path.join(REPO, "PARITY_SF1.md")
SF10 = os.path.join(REPO, "scaled_data", "sf10")
RECORD10 = os.path.join(REPO, "PARITY_SF10.md")

# sf10 spot-check: the subset whose ORACLES stay tractable in DuckDB at
# 60M lineitem / 20M events / 600k documents / 200k embeddings.
# Round-12 extensions (r11 verdict ask #4): the ngram-Jaccard posting
# lists stay DF-capped so its oracle IS tractable at 600k docs
# (measured 113 s, 25.6k pairs) — dedup_ngram_jaccard joins the full
# list, and both CC keys join via the union-find oracle over the same
# DuckDB edge SQL (_cc_oracle_frame; the recursive CTE stays
# intractable). similarity_join is handled separately: its ENGINE cost
# is quadratic per label by spec (all-pairs within label), so the sf10
# check runs on a deterministic 20% vec_id stratum of the sf10
# embeddings (vec_id % 5 == 0 → 40k vectors, 2x the sf1 pair work,
# drawn from the 100-replica rotated distribution) — stated openly in
# the record as a stratum, not full-output, check.
SF10_KEYS = [
    "supplier_scorecard",
    "customer_rfm",
    "cohort_revenue_ltv",
    "basket_pair_support",
    "window_sliding_median",
    "window_rolling_corr",
    "interval_union_length",
    "events_path_topk",
    "events_max_concurrency",
    "text_tfidf",
    "text_bm25_ranking",
    "similarity_knn_graph",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "similarity_knn_clusters",
    "similarity_join",
    # the full TPC-H suite (round-12): 60M lineitem IS TPC-H sf10 — the
    # first ad-hoc pass caught two real at-scale drift bugs (q1 money
    # sums cent-flipping on fold order, q15's argmax tie set differing
    # per engine), both fixed with exact integer-cents sums
    *[f"sql_tpch_q{i}" for i in range(1, 23)],
    # corpus-grain money-sum DataFrame keys, moved to cents_sum in the
    # round-12 sweep of the same drift class
    "agg_hash",
    "join_inner_equi",
    "join_partition_pruned",
]

# keys whose sf10 check runs on the deterministic embeddings stratum
STRATUM_KEYS = {"similarity_join"}
STRATUM_MOD = 5  # keep vec_id % 5 == 0 → 20% of the sf10 vectors


def _stratum_dir() -> str:
    """Materialize scaled_data/sf10_strat: embeddings filtered to the
    deterministic 20% vec_id stratum, every other table symlinked to its
    sf10 original. Idempotent."""
    out = SF10 + "_strat"
    os.makedirs(out, exist_ok=True)
    emb = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(emb):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{SF10}/embeddings.parquet' "
            f"WHERE vec_id % {STRATUM_MOD} = 0) TO '{emb}' "
            "(FORMAT PARQUET)"
        )
    for t in TABLES:
        if t == "embeddings":
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF10, f"{t}.parquet"), link)
    return out

# The 20 heaviest oracle-bearing keys by bench cost, spanning the
# families the verdict named: fuzzy dedup (posting lists, LSH bands,
# substring grams, embedding buckets), ANN (graph build + CC), star
# joins/multi-agg, windows (median/corr over big frames), interval and
# path analytics, text ranking (tf-idf/BM25 integer micro-units).
KEYS = [
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_substring_ngrams",
    "dedup_embedding",
    "dedup_exact_fulltext",
    "similarity_topk",
    "similarity_join",
    "similarity_knn_graph",
    "similarity_knn_clusters",
    "basket_pair_support",
    "supplier_scorecard",
    "customer_rfm",
    "cohort_revenue_ltv",
    "window_sliding_median",
    "window_rolling_corr",
    "interval_union_length",
    "events_path_topk",
    "events_max_concurrency",
    "text_tfidf",
    "text_bm25_ranking",
]


def _union_find_labels(edges) -> dict[int, int]:
    """Min-id connected components over (a, b) edge rows — the sf1-scale
    oracle for the CC keys. The registry oracles replay CC with a
    recursive reachability CTE, which materializes Σ|component|² rows:
    fine at driver scale, intractable once components grow (measured:
    >13 min and climbing on the sf1 kNN graph). Union-find over the
    SAME DuckDB-produced edge list is still an independent check of the
    Spark loop — the edges themselves are hash-verified against Spark by
    the upstream graph key — at O(E α(N))."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


# CC keys: oracle = union-find over the upstream graph's oracle edges
# (recursive CTE blows up at sf1 — see _union_find_labels). Maps key ->
# (edge SQL producing columns (a, b), output columns).
def _cc_oracle_frame(duck, key):
    import pandas as pd  # noqa: PLC0415

    from mapreduce_6_824_lab1_spark.operators.dedup import (  # noqa: PLC0415
        NGRAM_ORACLE,
    )
    from mapreduce_6_824_lab1_spark.operators.similarity import (  # noqa: PLC0415
        KNN_GRAPH_ORACLE,
    )

    edge_sql, a_col, b_col, id_col = {
        "similarity_knn_clusters": (
            KNN_GRAPH_ORACLE, "vec_id", "neighbor_id", "vec_id"
        ),
        "dedup_clusters": (NGRAM_ORACLE, "doc_a", "doc_b", "doc_id"),
    }[key]
    edges = duck.execute(edge_sql).fetchdf()[[a_col, b_col]].values
    labels = _union_find_labels(edges)
    return pd.DataFrame(
        {
            id_col: list(labels),
            "cluster_rep": [labels[n] for n in labels],
        }
    ).astype("int64")


def main() -> None:
    args = sys.argv[1:]
    sf10 = args[:1] == ["--sf10"]
    only = args[1:] if sf10 else args
    keys = only or (SF10_KEYS if sf10 else KEYS)
    sf_dir = SF10 if sf10 else SF1
    record = RECORD10 if sf10 else RECORD

    from mapreduce_6_824_lab1_spark import ORACLES, QUERIES
    from mapreduce_6_824_lab1_spark.session import get_spark

    spark = get_spark(app_name="parity-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    lines, fails = [], []
    for i, k in enumerate(keys):
        # stratum keys (sf10 only): both engines run the FULL key on the
        # deterministic 20% embeddings stratum — the engine cost is
        # quadratic per label by spec, so full-output sf10 parity is
        # genuinely intractable on BOTH sides; the stratum is an exact,
        # openly-partial check at sf10 content
        strat = sf10 and k in STRATUM_KEYS
        k_dir, k_duck, note = sf_dir, duck, ""
        if strat:
            k_dir = _stratum_dir()
            k_duck = duckdb.connect()
            for t in TABLES:
                k_duck.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{k_dir}/{t}.parquet'"
                )
            note = f" (vec_id%{STRATUM_MOD}==0 stratum)"
        t0 = time.time()
        try:
            sdf = QUERIES[k](spark, k_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — recorded, not raised
            fails.append(k)
            lines.append(f"| {k} | SPARK ERROR | — | {ex} |")
            print(f"[{i + 1}/{len(keys)}] {k}: SPARK ERROR {ex}", flush=True)
            continue
        t_spark = time.time() - t0
        is_cc = k in ("similarity_knn_clusters", "dedup_clusters")
        if k not in ORACLES and not is_cc:
            lines.append(
                f"| {k} | rows-only | {len(sdf)} rows | no oracle |"
            )
            print(f"[{i + 1}/{len(keys)}] {k}: rows-only {len(sdf)}", flush=True)
            continue
        t0 = time.time()
        if is_cc:
            odf = _cc_oracle_frame(k_duck, k)
        else:
            odf = k_duck.execute(ORACLES[k]).fetchdf()
        t_duck = time.time() - t0
        msg = compare_frames(sdf, odf)
        if msg:
            fails.append(k)
            lines.append(f"| {k} | **FAIL**{note} | {len(sdf)} rows | {msg} |")
            print(f"[{i + 1}/{len(keys)}] {k}: FAIL {msg}", flush=True)
        else:
            lines.append(
                f"| {k} | pass{note} | {len(sdf)} rows | spark "
                f"{t_spark:.1f}s / duckdb {t_duck:.1f}s |"
            )
            print(
                f"[{i + 1}/{len(keys)}] {k}: ok{note} {len(sdf)} rows "
                f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)",
                flush=True,
            )

    if not only:  # ad-hoc subsets don't overwrite the committed record
        scale = (
            "100x driver scale (60M lineitem / 600k documents / 200k "
            "embeddings; oracle-tractable subset — see SF10_KEYS)"
            if sf10
            else "10x driver scale (6M lineitem / 60k documents / 20k "
            "embeddings)"
        )
        name = "PARITY_SF10" if sf10 else "PARITY_SF1"
        cmd = "python tools/parity_sf1.py" + (" --sf10" if sf10 else "")
        with open(record, "w") as fh:
            fh.write(
                f"# {name} — oracle parity at {scale}\n\n"
                f"Generated by `{cmd}`. Comparator: "
                "driver_sim.compare_frames "
                "(dtype-aware, order-insensitive, float atol 1e-6).\n\n"
                f"Result: **{len(keys) - len(fails)}/{len(keys)} "
                "hash-green**"
                + (f" — failures: {', '.join(fails)}" if fails else "")
                + "\n\n| key | status | size | detail |\n|---|---|---|---|\n"
                + "\n".join(lines)
                + "\n"
            )
        print(f"wrote {record}")
    print(
        json.dumps(
            {f"parity_{'sf10' if sf10 else 'sf1'}":
                 f"{len(keys) - len(fails)}/{len(keys)}",
             "fails": fails}
        )
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
