"""Corpus curation, part 3: vocabulary coverage planning, exact duplicate
substring (k-gram span) detection, and exact-k deterministic sampling.

Reference scope: driver-mandated LLM-pipeline extensions (SURVEY.md §2.C
lineage) — the three measurements a pre-training data run does between
raw ingest and tokenizer/trainer handoff:

- vocab coverage: what fraction of the token stream the top-N vocabulary
  explains (tokenizer sizing). One wordcount shuffle + a TakeOrdered cut;
  the cumulative window runs over N rows, never the vocabulary.
- duplicate substrings: Lee et al. (2022)-style exact substring
  duplication signal — per-document fraction of token 8-grams that also
  appear in another document. Both heavy steps are gram-keyed hash
  aggregates/joins, never document×document.
- reservoir-k: exactly-k uniform sample as TakeOrderedAndProject over a
  deterministic per-key hash — the RNG-free reservoir sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.operators.text_analysis import _KNUTH, _MOD
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Vocabulary coverage — tokenizer-sizing curve
# ---------------------------------------------------------------------------

_VOCAB_N = 20

VOCAB_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM wc),
top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT {_VOCAB_N})
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank,
       word,
       cnt AS n_occurrences,
       CAST((CAST(sum(cnt) OVER (ORDER BY cnt DESC, word) AS HUGEINT)
            * 1000000)
           // t AS BIGINT) AS coverage_ppm
FROM top, tot
"""


@query("text_vocab_coverage", oracle=VOCAB_ORACLE)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N vocabulary with cumulative corpus coverage (integer ppm) —
    the tokenizer-sizing curve: how much of the token stream the N most
    frequent words explain.

    Scale shape: ONE wordcount hash-agg over the corpus (map-side
    combine), then the N-row head comes off a ``TakeOrderedAndProject``
    (orderBy+limit — no global sort materializes the full vocabulary);
    the cumulative-share window and the broadcast total-token join touch
    only those N rows. Coverage is integer ppm via BIGINT floor-division,
    so the curve hashes exactly cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = wc.agg(F.sum("cnt").cast("long").alias("t"))
    top = wc.orderBy(F.desc("cnt"), "word").limit(_VOCAB_N)
    w = (
        Window.orderBy(F.desc("cnt"), "word")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # N-row head only — never the full vocabulary
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "word"))
            .cast("long"),
        )
        .withColumn("cum", F.sum("cnt").over(w).cast("long"))
        .select(
            "rank",
            "word",
            F.col("cnt").alias("n_occurrences"),
            F.expr("(CAST(cum AS DECIMAL(38,0)) * 1000000) div t").alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicate substring spans — Lee et al. (2022) signal, gram-keyed
# ---------------------------------------------------------------------------

_GRAM_K = 8

SUBSTR_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
    SELECT doc_id, array_to_string(t[i:i+{_GRAM_K - 1}], ' ') AS gram
    FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - {_GRAM_K - 1})) AS i
          FROM toks WHERE len(t) >= {_GRAM_K})
),
dup AS (
    SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE d.gram IS NOT NULL) AS BIGINT)
           AS n_dup_grams,
       CAST((CAST(count(*) FILTER (WHERE d.gram IS NOT NULL) AS HUGEINT)
           * 1000000) // count(*) AS BIGINT) AS dup_ppm
FROM g LEFT JOIN dup d ON g.gram = d.gram
GROUP BY g.doc_id
"""


@query("dedup_substring_ngrams", oracle=SUBSTR_ORACLE)
def dedup_substring_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact duplicate-substring fraction: the share of a
    document's token 8-grams that also occur in ANOTHER document — the
    deduplicate-training-data signal of Lee et al. (2022), at 8-gram
    rather than suffix-array grain.

    Scale shape: gram-keyed end to end, ONE explode, no join — grams
    collapse to (gram, doc) grain with a per-doc occurrence count, a
    gram-partitioned window counts distinct documents per gram (the rows
    ARE distinct docs at that grain), and one doc-keyed aggregate folds
    the ppm fraction; documents never pair with documents. This replaced
    a dup-gram left-join formulation (round 6) whose physical plan ran
    the gram explode TWICE (both join inputs) and depended on
    broadcasting the duplicate-gram set — fine at fixture scale, not at
    100 TB where that set is corpus-sized; the window form is ~35%
    faster locally and keeps the same three gram/doc-keyed exchanges at
    any scale. At 100 TB the gram strings would be ``xxhash64`` 8-byte
    keys (the dedup_exact compaction, dedup.py:37) and hot boilerplate
    grams are bounded by the same df-cap used in dedup_ngram_jaccard
    (dedup.py:70); both swaps leave this plan shape unchanged. Short
    documents (<8 tokens) are excluded on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _GRAM_K
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {_GRAM_K - 1}),"
                f" i -> array_join(slice(t, i, {_GRAM_K}), ' '))"
            )
        ).alias("gram"),
    )
    occ = grams.groupBy("gram", "doc_id").agg(
        F.count(F.lit(1)).alias("occ")
    )
    nd = occ.withColumn(
        "nd", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    return (
        nd.groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_grams"),
            F.coalesce(
                F.sum(F.when(F.col("nd") >= 2, F.col("occ"))), F.lit(0)
            )
            .cast("long")
            .alias("n_dup_grams"),
        )
        .withColumn(
            "dup_ppm", F.expr("(CAST(n_dup_grams AS DECIMAL(38,0)) * 1000000) div n_grams")
        )
    )


# ---------------------------------------------------------------------------
# Exact-k deterministic sample — TakeOrdered over a per-key hash
# ---------------------------------------------------------------------------

_RESERVOIR_K = 100

RESERVOIR_ORACLE = f"""
SELECT doc_id, source,
       (doc_id * {_KNUTH}) % {_MOD} AS h
FROM documents
ORDER BY h, doc_id
LIMIT {_RESERVOIR_K}
"""


@query("sample_reservoir", oracle=RESERVOIR_ORACLE)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform document sample: rank every key by the pinned
    Knuth multiplicative hash and keep the k smallest — the deterministic,
    RNG-free reservoir sample (the hash order is a fixed pseudo-random
    permutation of the key space; a different "seed" is a different
    multiplier).

    Scale shape: ``orderBy(h).limit(k)`` plans as TakeOrderedAndProject —
    each task keeps a k-row heap, the driver merges P·k rows; no shuffle
    of the corpus and no full sort anywhere (plan-pinned in
    tests/test_round4f.py). Complements sample_split (bucket assignment,
    no size guarantee) and sample_weighted (Bernoulli, expected-size
    only): this is the exact-size primitive, and it is STABLE — a
    document in the sample stays in the sample when new docs arrive
    unless bumped by a smaller hash, which is what makes hash-reservoirs
    diffable across corpus versions.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(_RESERVOIR_K)
    )


# ---------------------------------------------------------------------------
# BPE-style merge training — count pairs globally, merge, repeat
# ---------------------------------------------------------------------------

BPE_MERGES = 4
BPE_JOIN = "·"  # merged-token separator; never appears in fixture words


@query("tokenizer_bpe_train")  # rows-only: iterative (K data-dependent passes)
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train K=4 BPE-style merges over the corpus with words as the base
    alphabet: each round counts all adjacent pairs, adopts the most
    frequent (ties broken lexicographically), rewrites every document
    with the merged symbol, and repeats — exactly the
    count→argmax→substitute loop a distributed BPE/wordpiece trainer
    runs, producing the learned merge table.

    Scale shape per round: pair counting is one explode + hash aggregate
    with map-side combine (pair-grain shuffle); the argmax is a 1-row
    TakeOrdered collect (dimension-sized driver state, the kmeans-
    centroid rule); substitution is a map-only ``aggregate`` fold per
    document implementing greedy left-to-right non-overlapping merges.
    K rounds = K corpus passes — which is why production trainers run
    this on a sample, documented here rather than hidden. Rows-only
    (the loop is data-dependent); the identical greedy algorithm in pure
    Python pins every merge and count in tests/test_round4h.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("toks")).persist()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, BPE_MERGES + 1):
            pairs = toks.select(
                F.explode(
                    F.expr(
                        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),"
                        " slice(toks, 2, greatest(size(toks)-1, 0)),"
                        " (x, y) -> struct(x AS x, y AS y))"
                    )
                ).alias("p")
            )
            top = (
                pairs.groupBy("p.x", "p.y")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy(F.desc("c"), "x", "y")
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < 2:
                break
            x, y, c = top[0]["x"], top[0]["y"], int(top[0]["c"])
            merged = f"{x}{BPE_JOIN}{y}"
            merges.append((step, x, y, merged, c))
            # data-derived tokens enter the plan as bound literals
            # (F.lit), never interpolated into SQL text — an apostrophe
            # or backslash in a token must not break the expression
            def _merge_step(acc: Column, t: Column) -> Column:
                hit = (
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(x))
                    & (t == F.lit(y))
                )
                return F.when(
                    hit,
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(t)))

            nxt = toks.select(
                F.aggregate(
                    "toks",
                    F.array().cast("array<string>"),
                    _merge_step,
                ).alias("toks")
            ).persist()
            try:
                nxt.count()  # materialize before dropping the parent
            except BaseException:
                nxt.unpersist()  # failed mid-round: don't strand it
                raise
            toks.unpersist()
            toks = nxt
    finally:
        toks.unpersist()
    return spark.createDataFrame(
        merges or [(0, "", "", "", 0)],
        "step BIGINT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT",
    )
