"""Round-4g additions: Gram matrix / power-iteration PCA / tree-ensemble
scoring — numpy and pandas recomputes for what the oracles can't express."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapreduce_6_824_lab1_spark import QUERIES
from mapreduce_6_824_lab1_spark.operators.embeddings import DIM, GRAM_QUANT
from tests.conftest import SF_DIR


def _gram_ref() -> np.ndarray:
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    # quantize each row's outer product to micro-units BEFORE summing,
    # exactly as both engines do
    G = np.zeros((DIM, DIM), dtype=np.int64)
    for r in X:
        G += np.floor(np.outer(r, r) * GRAM_QUANT + 0.5).astype(np.int64)
    return G


def test_gram_matrix_matches_numpy(spark):
    got = QUERIES["embedding_gram_matrix"](spark, SF_DIR).toPandas()
    G = _gram_ref()
    assert len(got) == DIM * (DIM + 1) // 2
    for _, row in got.iterrows():
        assert row["j"] >= row["i"]
        assert G[row["i"] - 1, row["j"] - 1] == row["g_micro"]


def test_partial_gram_chunking_and_empty_partitions(spark):
    """The round-6 mapInPandas partial-Gram (``_partial_gram``) accumulates
    in 2048-row chunks and must emit nothing for empty partitions. No
    fixture crosses the chunk boundary (sf0.1 = 2000 rows), so pin it
    directly: 3000 synthetic rows over 8 partitions — one of which is
    forced empty — must equal the row-at-a-time numpy fold."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark.operators.embeddings import (
        _partial_gram,
    )

    rng = np.random.default_rng(7)
    X = rng.normal(size=(3000, DIM)).astype(np.float32)
    pdf = pd.DataFrame({"embedding": list(X)})
    df = spark.createDataFrame(pdf).repartition(8)

    got = (
        df.mapInPandas(_partial_gram, "i long, j long, p long")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("g_micro"))
        .toPandas()
    )
    ref = np.zeros((DIM, DIM), dtype=np.int64)
    for r in X.astype(np.float64):
        ref += np.floor(np.outer(r, r) * GRAM_QUANT + 0.5).astype(np.int64)
    assert len(got) == DIM * (DIM + 1) // 2
    for _, row in got.iterrows():
        assert ref[row["i"] - 1, row["j"] - 1] == row["g_micro"]

    # an empty input partition emits nothing (not a 2080-row zero matrix)
    empty = (
        spark.createDataFrame(pdf.head(1)).repartition(4)
        .mapInPandas(_partial_gram, "i long, j long, p long")
    )
    assert empty.count() == DIM * (DIM + 1) // 2  # only 1 partition emits


def test_partial_gram_dirty_rows_match_jvm_null_semantics(spark):
    """NULL rows, short rows, and NULL elements must degrade like the
    NULL-skip SUM semantics of the SQL formulation the numpy fold
    replaced: any NULL operand makes the cell product NULL and SUM skips
    it. Pinned by running the original nested-transform expression with
    ``try_element_at`` over the same dirty frame (plain ``element_at``
    — what the replaced code used — RAISES on short arrays in Spark 4,
    so the numpy path is strictly MORE tolerant than its predecessor,
    never less)."""
    import pyspark.sql.functions as F

    from mapreduce_6_824_lab1_spark.operators.embeddings import (
        _partial_gram,
    )

    rng = np.random.default_rng(11)
    clean = [rng.normal(size=DIM).astype(np.float32).tolist() for _ in range(5)]
    short = rng.normal(size=DIM // 2).astype(np.float32).tolist()
    holey = rng.normal(size=DIM).astype(np.float32).tolist()
    holey[3] = None
    holey[40] = None
    rows = [(e,) for e in [*clean, None, short, holey]]
    df = spark.createDataFrame(rows, "embedding array<float>").repartition(3)

    got = {
        (r.i, r.j): r.g_micro
        for r in df.mapInPandas(_partial_gram, "i long, j long, p long")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("g_micro"))
        .collect()
    }
    jvm = {
        (r.i, r.j): r.g_micro
        for r in df.select(
            F.explode(
                F.expr(
                    f"""flatten(transform(sequence(1, {DIM}), i ->
                      transform(sequence(i, {DIM}), j -> struct(
                        CAST(i AS BIGINT) AS i,
                        CAST(j AS BIGINT) AS j,
                        CAST(floor(CAST(try_element_at(embedding, i) AS DOUBLE)
                                   * CAST(try_element_at(embedding, j) AS DOUBLE)
                                   * {GRAM_QUANT} + 0.5) AS BIGINT) AS p))))"""
                )
            ).alias("c")
        )
        .select("c.i", "c.j", "c.p")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("g_micro"))
        .collect()
    }
    assert len(got) == DIM * (DIM + 1) // 2
    assert got == jvm


def test_pca_power_matches_eigh(spark):
    got = (
        QUERIES["embedding_pca_power"](spark, SF_DIR)
        .toPandas()
        .sort_values("dim", ignore_index=True)
    )
    G = _gram_ref().astype(np.float64)
    w, V = np.linalg.eigh(G)
    top = V[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    v = got["loading_micro"].to_numpy() / GRAM_QUANT
    assert len(v) == DIM
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    cos = float(v @ top)
    # power iteration from all-ones converges to the dominant eigenvector
    assert cos > 0.9999, cos  # 200 iterations: residual (0.93)^200 ~ 5e-7


def test_tree_scores_match_pandas(spark):
    got = QUERIES["score_tree_ensemble"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    urgent = orders["o_orderpriority"].str.match(r"[12]").to_numpy()
    status = orders["o_orderstatus"].to_numpy()

    def t1(c, u, s):
        if c < 5_000_000:
            return ("A1", 820000) if u else ("A2", 350000)
        if s == "F":
            return ("A3", 150000) if c < 15_000_000 else ("A4", 90000)
        return ("A5", 600000)

    def t2(c, u, s):
        if u:
            return ("B1", 900000) if c < 2_000_000 else ("B2", 500000)
        return ("B3", 300000) if s == "O" else ("B4", 120000)

    ref: dict[tuple, list] = {}
    for c, u, s in zip(cents, urgent, status):
        l1, v1 = t1(c, u, s)
        l2, v2 = t2(c, u, s)
        k = (l1, l2, v1 + v2)
        ref[k] = ref.get(k, 0) + 1
    assert got["n_orders"].sum() == len(orders)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        assert (
            ref[(row["leaf1"], row["leaf2"], row["score_micro"])]
            == row["n_orders"]
        )


def _negatives_reference(ids, labels):
    """Pure-python replay of the bucket-argmin negative-sampling rule
    (density-independent: works on ANY id multiset, not just 0..n-1)."""
    n = len(ids)
    nb = max(n // 64, 1)
    buckets: dict = {}
    for v in ids:
        buckets.setdefault((v * 2246822519) % 4294967296 % nb, []).append(v)
    out = {}
    for a in ids:
        for slot in (1, 2, 3, 4):
            cb = ((a + slot) * 2654435761) % 4294967296 % nb
            cands = [v for v in buckets.get(cb, []) if v != a]
            if not cands:
                continue
            neg = min(
                cands, key=lambda v: ((v + slot) * 2654435761) % 4294967296
            )
            out[(a, slot)] = neg
    return out


def test_negatives_are_deterministic_informative_and_self_free(spark):
    got = QUERIES["sample_contrastive_negatives"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    labels = dict(zip(emb["vec_id"], emb["label"]))
    ref = _negatives_reference(list(emb["vec_id"]), labels)
    assert len(got) == len(ref)
    # near-total coverage: only an anchor alone in its candidate bucket
    # can lose a slot
    assert len(ref) >= 0.99 * 4 * len(emb)
    for _, r in got.iterrows():
        assert r["neg_id"] == ref[(r["vec_id"], r["slot"])]
        assert r["neg_id"] != r["vec_id"]  # never a self-pair
        assert r["neg_label"] == labels[r["neg_id"]]
        assert r["is_informative"] == (r["anchor_label"] != r["neg_label"])


def test_negatives_survive_sparse_id_space(spark, tmp_path):
    """Regression for the round-6 sweep find: the old dense-id formula
    (hash mod n as an ID, inner-joined) silently dropped ~90% of
    negatives on a key-offset-replicated corpus. On sparse, gappy ids
    the bucket scheme must still give virtually every anchor its K
    negatives."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(64)
    n = 3000
    ids = (1_000_000 + 7919 * np.arange(n)).astype("int64")  # dense nowhere
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    list(rng.standard_normal((n, 8)).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(rng.integers(0, 10, n, dtype=np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = QUERIES["sample_contrastive_negatives"](
        spark, str(tmp_path)
    ).toPandas()
    assert len(got) >= 0.99 * 4 * n
    assert (got["neg_id"] != got["vec_id"]).all()
    assert set(got["neg_id"]).issubset(set(ids))


def test_cached_fanout_reads_cache_twice(spark):
    df = QUERIES["cached_fanout_reuse"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    got = df.toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    base = (
        li.assign(cents=cents)
        .groupby("l_orderkey")
        .agg(n_items=("cents", "size"), order_cents=("cents", "sum"))
    )
    hist = base["n_items"].value_counts()
    bucket = (base["order_cents"] // 10_000_000).value_counts()
    h = got[got["metric"] == "items_hist"].set_index("k")["v"]
    b = got[got["metric"] == "cents_bucket"].set_index("k")["v"]
    assert h.sort_index().equals(hist.sort_index().astype("int64"))
    assert b.sort_index().equals(bucket.sort_index().astype("int64"))


def test_pretraining_pipeline_stage_invariants(spark):
    got = QUERIES["pipeline_pretraining_corpus"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    K, MOD = 2654435761, 4294967296
    toks = docs["text"].str.split(" ")
    gated = docs[(docs["n_chars"] >= 100) & (toks.str.len() >= 20)].copy()
    gated["n_tokens"] = toks.loc[gated.index].str.len()
    gated["h"] = (gated["doc_id"] * K) % MOD
    # exact dedup: first doc_id per text
    deduped = gated.sort_values("doc_id").drop_duplicates("text")
    # decontamination vs the doc_id%97 eval set, 8-gram overlap
    def grams(t):
        return {" ".join(t[i : i + 8]) for i in range(len(t) - 7)}
    eval_grams = set()
    for _, r in docs[docs["doc_id"] % 97 == 0].iterrows():
        t = r["text"].split(" ")
        if len(t) >= 8:
            eval_grams |= grams(t)
    def contaminated(text):
        return bool(grams(text.split(" ")) & eval_grams)
    clean = deduped[
        (deduped["doc_id"] % 97 != 0)
        & ~deduped["text"].map(contaminated)
    ]
    split = np.where(
        clean["h"] < int(0.90 * MOD),
        "train",
        np.where(clean["h"] < int(0.95 * MOD), "val", "test"),
    )
    shard = (clean["h"] // 65536) % 4
    ref = (
        clean.assign(split=split, shard=shard)
        .groupby(["split", "shard"])
        .agg(
            n_docs=("doc_id", "size"),
            total_tokens=("n_tokens", "sum"),
            checksum=("h", "sum"),
        )
        .reset_index()
    )
    merged = got.merge(
        ref, on=["split", "shard"], suffixes=("", "_ref"), how="outer"
    )
    assert len(merged) == len(got) == len(ref)
    for c in ("n_docs", "total_tokens", "checksum"):
        assert (merged[c] == merged[f"{c}_ref"]).all(), c
    # manifests cover exactly the clean corpus — nothing lost or doubled
    assert got["n_docs"].sum() == len(clean)


def test_cardinality_estimate_equals_actual_join(spark):
    got = QUERIES["estimate_join_cardinality"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    actual = {
        "orders*customer": len(
            orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        ),
        "lineitem*orders": len(
            li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        ),
    }
    for _, r in got.iterrows():
        # the sum-of-products "estimate" is EXACT for equi-joins
        assert r["est_rows"] == actual[r["join_name"]], r["join_name"]


def test_skew_shares_match_value_counts(spark):
    got = QUERIES["diagnose_partition_skew"](spark, SF_DIR).toPandas()
    frames = {
        "orders.o_custkey": pd.read_parquet(f"{SF_DIR}/orders.parquet")[
            "o_custkey"
        ],
        "lineitem.l_suppkey": pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
            "l_suppkey"
        ],
        "events.user_id": pd.read_parquet(f"{SF_DIR}/events.parquet")[
            "user_id"
        ],
    }
    for _, r in got.iterrows():
        s = frames[r["key_name"]]
        vc = s.value_counts()
        assert r["n_rows"] == len(s)
        assert r["n_keys"] == s.nunique()
        assert r["top1_ppm"] == vc.iloc[0] * 1_000_000 // len(s)
        # top-10 tie-break is by key asc, but the SUM of any 10 largest
        # counts is tie-insensitive
        assert r["top10_ppm"] == vc.iloc[:10].sum() * 1_000_000 // len(s)
        assert r["top1_ppm"] <= r["top10_ppm"] <= 1_000_000


def test_weighted_percentile_matches_expansion(spark):
    got = (
        QUERIES["agg_weighted_percentile"](spark, SF_DIR)
        .toPandas()
        .set_index("flag")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64")
    df = pd.DataFrame(
        {"flag": li["l_returnflag"], "cents": cents, "q": q}
    )
    for flag, g in df.groupby("flag"):
        # brute-force: expand each row q times, take positional quantiles
        exp = np.sort(np.repeat(g["cents"].to_numpy(), g["q"].to_numpy()))
        tot = len(exp)
        p50 = exp[int(np.ceil(tot * 0.5)) - 1]
        p90 = exp[int(np.ceil(tot * 0.9)) - 1]
        assert got.loc[flag, "w_total"] == tot
        assert got.loc[flag, "p50_cents"] == p50, flag
        assert got.loc[flag, "p90_cents"] == p90, flag


def test_interval_union_matches_sweep(spark):
    got = (
        QUERIES["interval_union_length"](spark, SF_DIR)
        .toPandas()
        .set_index("user_id")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    span = 30 * 60 * 1_000_000
    us = (
        pd.to_datetime(ev["ts"]).values.astype("datetime64[us]").astype(
            "int64"
        )
    )
    df = pd.DataFrame({"u": ev["user_id"], "s": us, "e": us + span})
    for u, g in df.groupby("u"):
        ivs = sorted(zip(g["s"], g["e"]))
        covered, islands = 0, 0
        cur_s, cur_e = None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
                islands += 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert got.loc[u, "n_events"] == len(ivs)
        assert got.loc[u, "n_islands"] == islands
        assert got.loc[u, "covered_us"] == covered
        # unions never exceed the naive sum and never undercut one span
        assert span <= covered <= len(ivs) * span


def test_dynamic_overwrite_preserves_untouched_partitions(spark):
    got = (
        QUERIES["sink_dynamic_partition_overwrite"](spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ref = docs.groupby("lang").agg(
        n_docs=("doc_id", "size"), total_chars=("n_chars", "sum")
    )
    for lang, row in ref.iterrows():
        assert got.loc[lang, "n_docs"] == row["n_docs"], lang
        bump = 1_000_000 * row["n_docs"] if lang == "de" else 0
        assert got.loc[lang, "total_chars"] == row["total_chars"] + bump


def test_codec_roundtrip_all_codecs_identical(spark):
    got = QUERIES["sink_codec_roundtrip"](spark, SF_DIR).toPandas()
    assert sorted(got["codec"]) == ["gzip", "snappy", "zstd"]
    assert got["checksum"].nunique() == 1
    assert got["n_docs"].nunique() == 1


def test_resize_pooling_matches_numpy(spark):
    got = (
        QUERIES["multimodal_resize"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    seen = 0
    for _, r in docs.iterrows():
        b = r["text"].encode()
        h2 = (len(b) // 16) - (len(b) // 16) % 2
        if h2 < 2:
            assert r["doc_id"] not in got.index
            continue
        a = np.frombuffer(b[: h2 * 16], dtype=np.uint8).reshape(h2, 16)
        a = a.astype(np.int64)
        pooled = (
            a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]
        ) // 4
        row = got.loc[r["doc_id"]]
        assert row["out_w"] == 8 and row["out_h"] == h2 // 2
        assert row["n_cells"] == pooled.size
        assert row["checksum"] == pooled.sum()
        seen += 1
    assert seen == len(got)


def test_set_ops_all_multiset_semantics(spark):
    got = QUERIES["set_ops_all"](spark, SF_DIR).toPandas().set_index("tag")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    m = li.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    y = pd.to_datetime(m["o_orderdate"]).dt.year
    c95 = m[y == 1995]["l_partkey"].value_counts()
    c96 = m[y == 1996]["l_partkey"].value_counts()
    diff = (c95.subtract(c96, fill_value=0)).clip(lower=0).astype(int)
    inter = pd.concat([c95, c96], axis=1).fillna(0).min(axis=1).astype(int)
    ex = got.loc["except_all_95_96"]
    assert ex["n_rows"] == diff.sum()
    assert ex["n_keys"] == (diff > 0).sum()
    assert ex["key_sum"] == (diff.index * diff).sum()
    it = got.loc["intersect_all_95_96"]
    assert it["n_rows"] == inter.sum()
    assert it["n_keys"] == (inter > 0).sum()
    assert it["key_sum"] == (inter.index * inter).sum()


def test_mdm_survivorship_matches_pandas(spark):
    got = (
        QUERIES["mdm_survivorship"](spark, SF_DIR)
        .toPandas()
        .set_index("custkey")
        .sort_index()
    )
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o = o.assign(
        precedence=o["o_orderkey"] % 3,
        feed=(o["o_orderkey"] % 3).map({0: "crm", 1: "erp", 2: "web"}),
        cents=np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(
            "int64"
        ),
    )
    latest = (
        o.sort_values(["o_orderdate", "o_orderkey"])
        .groupby(["o_custkey", "feed"], as_index=False)
        .last()
    )
    for ck, g in latest.groupby("o_custkey"):
        best = g.loc[g["precedence"].idxmin()]
        assert got.loc[ck, "chosen_source"] == best["feed"]
        assert got.loc[ck, "status"] == best["o_orderstatus"]
        assert got.loc[ck, "cents"] == best["cents"]
        assert got.loc[ck, "n_feeds_present"] == len(g)


def test_running_balance_matches_python_fold(spark):
    got = (
        QUERIES["running_balance_clamped"](spark, SF_DIR)
        .toPandas()
        .set_index("partkey")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64")
    li = li.assign(delta=np.where(li["l_linestatus"] == "O", q, -q))
    for pk, g in li.groupby("l_partkey"):
        g = g.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        b = lo = hi = 0
        for d in g["delta"]:
            b += int(d)
            if b < 0:
                b, lo = 0, lo + 1
            elif b > 500:
                b, hi = 500, hi + 1
        assert got.loc[pk, "n_moves"] == len(g)
        assert got.loc[pk, "final_balance"] == b
        assert got.loc[pk, "n_clamped_low"] == lo
        assert got.loc[pk, "n_clamped_high"] == hi
    assert got["final_balance"].between(0, 500).all()


def test_bm25_matches_python_scoring(spark):
    import math

    got = (
        QUERIES["text_bm25_ranking"](spark, SF_DIR)
        .toPandas()
        .sort_values("rnk", ignore_index=True)
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = docs["text"].str.split(" ")
    N = len(docs)
    avg = toks.str.len().sum() / N
    query = ("column", "window", "customer")
    dfreq = {
        t: int(toks.map(lambda ws, t=t: t in ws).sum()) for t in query
    }
    scores = {}
    for did, ws in zip(docs["doc_id"], toks):
        s = 0.0
        for t in query:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((N - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avg))
        if s > 0:
            scores[did] = math.floor(s * 1e6 + 0.5)
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got["doc_id"]) == [d for d, _ in ref]
    for (d, smicro), (_, row) in zip(ref, got.iterrows()):
        assert abs(row["score"] * 1e6 - smicro) <= 1.0


def test_max_concurrency_matches_sweep(spark):
    got = (
        QUERIES["events_max_concurrency"](spark, SF_DIR)
        .toPandas()
        .set_index("day")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    span = 30 * 60 * 1_000_000
    us = (
        pd.to_datetime(ev["ts"]).values.astype("datetime64[us]").astype(
            "int64"
        )
    )
    pts = sorted(
        [(t, 1, e) for t, e in zip(us, ev["event_id"])]
        + [(t + span, -1, e) for t, e in zip(us, ev["event_id"])],
        key=lambda p: (p[0], p[1], p[2]),
    )
    conc = 0
    best: dict[str, int] = {}
    counts: dict[str, int] = {}
    for t, d, _ in pts:
        conc += d
        day = str(np.array(int(t), dtype="datetime64[us]").astype("datetime64[D]"))
        best[day] = max(best.get(day, -10**9), conc)
        counts[day] = counts.get(day, 0) + 1
    assert set(got.index) == set(best)
    for day in best:
        assert got.loc[day, "max_concurrent"] == best[day], day
        assert got.loc[day, "n_points"] == counts[day]
    # sanity: concurrency returns to zero after the final point
    assert conc == 0


def test_twap_matches_python_hold_weights(spark):
    got = (
        QUERIES["timeseries_twap"](spark, SF_DIR)
        .toPandas()
        .set_index(["event_type", "day"])
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = (
        pd.to_datetime(ev["ts"]).values.astype("datetime64[us]").astype(
            "int64"
        )
    )
    df = pd.DataFrame(
        {
            "t": ev["event_type"],
            "us": us,
            "eid": ev["event_id"],
            "cents": np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(
                "int64"
            ),
        }
    )
    df["day"] = (
        (df["us"] // 86_400_000_000) * 86_400_000_000
    )
    for (t, day_us), g in df.groupby(["t", "day"]):
        g = g.sort_values(["us", "eid"], ignore_index=True)
        end = day_us + 86_400_000_000
        nxt = list(g["us"][1:]) + [end]
        dur = [(n - u) // 1_000_000 for u, n in zip(g["us"], nxt)]
        day = str(np.array(int(day_us), dtype="datetime64[us]").astype(
            "datetime64[D]"
        ))
        row = got.loc[(t, day)]
        assert row["n_events"] == len(g)
        assert row["held_s"] == sum(dur)
        wsum = sum(c * d for c, d in zip(g["cents"], dur))
        assert row["weighted_cents_s"] == wsum
        assert row["twap_cents"] == wsum // max(sum(dur), 1)
        # holdings never exceed the day — the overflow-proofness argument
        assert sum(dur) <= 86_400


def test_markov_2step_is_matrix_square(spark):
    got = (
        QUERIES["events_markov_2step"](spark, SF_DIR)
        .toPandas()
        .set_index(["src", "dst"])
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    from collections import defaultdict

    c = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for x, y in zip(types, types[1:]):
            c[(x, y)] += 1
    r = defaultdict(int)
    for (a, _), v in c.items():
        r[a] += v
    ref = defaultdict(lambda: [0, 0])
    for (a, b), cab in c.items():
        for (b2, d), cbd in c.items():
            if b2 == b:
                ref[(a, d)][0] += 1
                ref[(a, d)][1] += cab * cbd * 1_000_000 // (r[a] * r[b])
    assert set(got.index) == set(ref)
    for k, (n, p) in ref.items():
        assert got.loc[k, "n_paths"] == n
        assert got.loc[k, "p2_micro"] == p


def test_decontamination_attribution_matches_python(spark):
    got = QUERIES["decontaminate_attribution"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    def grams(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 8]) for i in range(len(t) - 7)}
    ev = {
        r["doc_id"]: grams(r["text"])
        for _, r in docs[docs["doc_id"] % 11 == 0].iterrows()
        if len(r["text"].split(" ")) >= 8
    }
    ref = {}
    for _, r in docs[docs["doc_id"] % 11 != 0].iterrows():
        g = grams(r["text"])
        for ed, eg in ev.items():
            shared = len(g & eg)
            if shared:
                ref[(r["doc_id"], ed)] = shared
    assert ref, "fixture must exercise the match path"
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        assert ref[(r["train_doc"], r["eval_doc"])] == r["shared_grams"]


def test_char_entropy_null_text_degrades_to_zero(spark):
    """A NULL (or empty) text row must score entropy 0.0 — exactly what
    the DuckDB oracle's CASE terms produce on NULL (every `cnt > 0` is
    false, the sum is 0) — never the entropy of the literal string
    'None' that an unmasked astype(str) would decode. Real text in the
    same batch stays pinned to the hand-computed value, so the null mask
    can't perturb neighbors (round-7 ADVICE fix)."""
    from mapreduce_6_824_lab1_spark.operators.text_analysis import (
        _char_entropy_batches,
    )

    df = spark.createDataFrame(
        [(0, "en", None), (1, "en", ""), (2, "en", "aab")],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: r.char_entropy
        for r in df.mapInPandas(
            _char_entropy_batches,
            "doc_id long, lang string, char_entropy double",
        ).collect()
    }
    # H("aab") = -(2/3·ln(2/3) + 1/3·ln(1/3)), floor-rounded to 1e-4
    expect = -(2 / 3 * np.log(2 / 3) + 1 / 3 * np.log(1 / 3))
    expect = np.floor(expect * 10000 + 0.5) / 10000
    assert got == {0: 0.0, 1: 0.0, 2: expect}


def test_kmeans_assign_keeps_null_embedding_rows(spark):
    """A NULL embedding ROW (not just a NaN element) must ride the same
    degrade path as NaN vectors: every centroid distance inf, assigned
    to the lowest cid, row conserved — the replaced crossJoin/min-struct
    formulation degraded this way, and np.stack over a None would raise
    instead (round-7 ADVICE fix)."""
    from mapreduce_6_824_lab1_spark.operators.kmeans import assign

    vectors = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    centroids = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "cid int, centroid array<double>",
    )
    got = {r.vec_id: r.cid for r in assign(vectors, centroids).collect()}
    assert got == {0: 0, 1: 1, 2: 0}
