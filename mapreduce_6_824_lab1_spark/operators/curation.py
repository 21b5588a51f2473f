"""Corpus-curation operators (LLM-data-pipeline extension, SURVEY.md §2.C).

Three stages every large-scale pretraining pipeline runs between dedup and
the trainer, each in its scale-correct Spark formulation:

- decontaminate      — drop/flag corpus docs sharing any n-gram with a
                       held-out eval set (broadcast the eval shingles: eval
                       benchmarks are MBs, the corpus is the 100 TB side)
- pack_sequences     — concatenate-and-chunk token packing: assign docs to
                       fixed-token-budget training sequences via a windowed
                       running sum (the batch form of what a dataloader's
                       sequence packer does)
- sample_stratified  — per-language hash-fraction downsampling (language
                       rebalancing) in ONE corpus scan, deterministic and
                       engine-portable unlike ``df.sampleBy``

All three are pure built-in-function plans — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround
from mapreduce_6_824_lab1_spark.functions.text import tokens_col
from mapreduce_6_824_lab1_spark.operators.dedup import (
    _SHINGLES_FROM_TOKS,
    _SHINGLES_SQL,
    JACCARD_THRESHOLD,
    NGRAM_ORACLE,
    SHINGLE_DF_CAP,
    jaccard_pairs,
    shingle_sets,
)
from mapreduce_6_824_lab1_spark.operators.text_analysis import (
    _KNUTH,
    _MOD,
    _STOP_SQL,
    STOPWORDS,
)
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Decontamination — the fixture's held-out "benchmark" is sources src0/src1;
# everything else is the training corpus. A corpus doc is contaminated if it
# shares ANY word-trigram shingle with any eval doc (the standard 13-gram
# check scaled down to the fixture's 31-word vocabulary).
# ---------------------------------------------------------------------------

EVAL_SOURCES = ("src0", "src1")

_EVAL_IN = "('" + "', '".join(EVAL_SOURCES) + "')"

DECONTAMINATE_ORACLE = f"""
WITH sh AS (
    SELECT doc_id, lang, source,
           unnest(list_distinct({_SHINGLES_SQL})) AS shingle
    FROM documents
),
eval_shingles AS (
    SELECT DISTINCT shingle FROM sh WHERE source IN {_EVAL_IN}
)
SELECT s.doc_id, s.lang, s.source, count(*) AS shared_shingles
FROM sh s JOIN eval_shingles e USING (shingle)
WHERE s.source NOT IN {_EVAL_IN}
GROUP BY s.doc_id, s.lang, s.source
"""


@query("decontaminate", oracle=DECONTAMINATE_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus docs whose shingles overlap the held-out eval set.

    Plan shape: the eval side collapses to a DISTINCT shingle set and is
    broadcast into the corpus-side join — the corpus is scanned once,
    map-side, with no corpus shuffle before the per-doc count aggregate.
    100 TB: eval benchmarks are tiny (MBs of n-grams) regardless of corpus
    size, so the broadcast never grows with the data; this is the same
    shape production decontamination uses (broadcast bloom/exact n-gram
    set). The per-doc count is one partial-agg shuffle on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "lang", "source", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.array_distinct(F.expr(_SHINGLES_FROM_TOKS))
        ).alias("shingle"),
    )
    eval_shingles = (
        sh.where(F.col("source").isin(*EVAL_SOURCES))
        .select("shingle")
        .distinct()
    )
    corpus = sh.where(~F.col("source").isin(*EVAL_SOURCES))
    return (
        corpus.join(broadcast(eval_shingles), "shingle")
        .groupBy("doc_id", "lang", "source")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the same contract as ``decontaminate``
# but with the production-scale probe structure: a k=2 Bloom filter over the
# eval shingle set, expressed relationally (Spark's BloomFilterAggregate /
# might_contain pair is not registered in the public SQL function registry,
# and DataFrameStatFunctions.bloomFilter is JVM-only), then an exact verify
# join that removes the Bloom's false positives. The bit array is the
# DISTINCT set of hash buckets; "bit test" is a broadcast LEFT SEMI hash
# join per hash function. Why it matters at 100 TB: the broadcast shrinks
# from the full eval shingle STRINGS (unbounded length) to 2 int sets of at
# most m entries, and the two semi-joins drop almost every corpus shingle
# map-side before the string join materializes; only candidate survivors
# carry their text into the exact phase.
# ---------------------------------------------------------------------------

BLOOM_MIN_BITS = 1 << 17  # m floor: unchanged at every fixture/driver scale
BLOOM_BITS_PER_KEY = 8  # k=2, m/n=8 -> FPR ~ (1-e^(-1/4))^2 ~ 5%
BLOOM_SEEDS = (17, 41)  # k=2 independent xxhash64 seeds


def bloom_bits(n_eval: int) -> int:
    """Bit-array size per hash function for an n_eval-shingle eval set:
    smallest power of two >= BLOOM_MIN_BITS with m >= 8*n_eval. A FIXED m
    saturates as the eval suite grows — FPR drifts toward 1 and the
    prefilter silently passes the whole corpus to the exact join (correct
    but the 100 TB map-side drop evaporates) — the same fixed-capacity
    defect class as the sign-LSH width ``similarity.adaptive_sign_bits``
    fixed. Growing m is free at broadcast time: the shipped "bit array"
    is the DISTINCT set of occupied buckets, whose size is <= n_eval
    whatever m is."""
    m = BLOOM_MIN_BITS
    while m < n_eval * BLOOM_BITS_PER_KEY:
        m <<= 1
    return m


@query("decontaminate_bloom", oracle=DECONTAMINATE_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase decontamination: Bloom-bucket prefilter + exact verify.

    Result is identical to ``decontaminate`` (same oracle): the Bloom
    phase only drops TRUE negatives, and the exact join removes its false
    positives — the rewrite is purely physical, like the salted join.
    The bit-array size adapts to the eval shingle count (:func:`bloom_bits`
    — one count(*) on the checkpointed eval set, which the plan was
    already re-deriving per seed; the checkpoint also stops that).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "lang", "source", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.array_distinct(F.expr(_SHINGLES_FROM_TOKS))
        ).alias("shingle"),
    )
    # localCheckpoint: the eval set is re-read per seed and by the exact
    # verify join (3 plan uses); eval sources are a small fixed slice, so
    # the materialization is broadcast-grade, and its count sizes the Bloom.
    eval_shingles = (
        sh.where(F.col("source").isin(*EVAL_SOURCES))
        .select("shingle")
        .distinct()
        .localCheckpoint()
    )
    m = bloom_bits(eval_shingles.count())
    corpus = sh.where(~F.col("source").isin(*EVAL_SOURCES))
    for seed in BLOOM_SEEDS:
        bits = eval_shingles.select(
            F.pmod(F.xxhash64("shingle", F.lit(seed)), F.lit(m)).alias("bit")
        ).distinct()
        corpus = corpus.join(
            broadcast(bits),
            F.pmod(F.xxhash64(corpus["shingle"], F.lit(seed)), F.lit(m))
            == bits["bit"],
            "left_semi",
        )
    return (
        corpus.join(broadcast(eval_shingles), "shingle")
        .groupBy("doc_id", "lang", "source")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Sequence packing — concatenate docs in deterministic (doc_id) order within
# each (lang, source) group and chunk the stream into SEQ_LEN-token training
# sequences: a doc's sequence id is its starting offset div SEQ_LEN.
# ---------------------------------------------------------------------------

SEQ_LEN = 256

PACK_ORACLE = f"""
WITH tok AS (
    SELECT lang, source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
offs AS (
    SELECT lang, source, doc_id, n_tokens,
           COALESCE(sum(n_tokens) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS start_off
    FROM tok
)
SELECT lang, source,
       CAST(floor(start_off / {SEQ_LEN}) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM offs
GROUP BY lang, source, seq_id
"""


@query("pack_sequences", oracle=PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing via a windowed running sum.

    The window is partitioned by (lang, source) — packing only needs LOCAL
    contiguity, never a global order, so there is no single-partition
    window anywhere. 100 TB: groups here are corpus slices that can grow
    unboundedly; since sequence boundaries are arbitrary, the scale move is
    to refine the partition key with a doc_id bucket (``doc_id div B``) so
    every window partition is bounded — same semantics, same plan, bounded
    state. One shuffle for the window, one partial-agg shuffle for the
    per-sequence rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tok.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        offs.withColumn(
            "seq_id",
            F.floor(F.col("start_off") / SEQ_LEN).cast("long"),
        )
        .groupBy("lang", "source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("seq_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified sampling — language rebalancing by per-stratum hash fractions.
# Same Knuth multiplicative hash as sample_split (text_analysis.py), so the
# kept set is append-stable and reproducible on any engine; df.sampleBy is
# deliberately NOT used (seeded per-partition RNG => not engine-portable,
# and resampling churns on repartition).
# ---------------------------------------------------------------------------

STRATA_FRACTIONS = {"en": 0.5, "de": 0.75}  # others keep everything

_FRAC_CASE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {int(frac * _MOD)}"
    for lang, frac in STRATA_FRACTIONS.items()
) + f" ELSE {_MOD} END"

SAMPLE_STRATIFIED_ORACLE = f"""
WITH h AS (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ((doc_id * {_KNUTH}) % {_MOD}) < ({_FRAC_CASE_SQL}) AS kept
    FROM documents
)
SELECT lang,
       count(*) AS n_total,
       CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
       CAST(COALESCE(sum(n_tokens) FILTER (WHERE kept), 0) AS BIGINT)
           AS kept_tokens
FROM h
GROUP BY lang
"""


@query("sample_stratified", oracle=SAMPLE_STRATIFIED_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language hash-fraction downsampling, audited in one scan.

    Keep doc iff ``hash(doc_id) < fraction(lang) * 2^32``. The whole query
    is one map-side projection plus one partial-agg shuffle on lang — the
    filter costs nothing extra because kept/total are counted in the same
    aggregate pass (conditional aggregation, not two scans). 100 TB: no
    stored sample table, no RNG state; re-running on a grown corpus keeps
    every previously-kept doc (append-stable), which is what incremental
    pipeline reruns need.
    """
    docs = load_table(spark, sf_dir, "documents")
    cutoff = F.lit(_MOD)
    for lang, frac in STRATA_FRACTIONS.items():
        cutoff = (
            F.when(F.col("lang") == lang, int(frac * _MOD)).otherwise(cutoff)
        )
    kept = F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)) < cutoff
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select("lang", n_tokens.alias("n_tokens"), kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
            )
            .cast("long")
            .alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Adaptive quality filtering — the threshold is a per-language quantile of
# the corpus's own score distribution, not a hand-picked constant, so the
# filter keeps the same fraction as the corpus mix drifts. Score formula is
# the text_quality one (text_analysis.py), rounded to 4 decimals BEFORE the
# quantile so both engines interpolate over bit-identical inputs.
# ---------------------------------------------------------------------------

QUALITY_CUT_P = 0.10

_QUALITY_SQL = f"""
    SELECT lang,
           floor((0.5 * least(len(string_split(text, ' ')) / 50.0, 1.0)
                 + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                                    x -> x IN {_STOP_SQL}))
                          * 1.0 / len(string_split(text, ' ')))
                 + 0.2 * least((n_chars - (len(string_split(text, ' ')) - 1))
                               * 1.0 / len(string_split(text, ' ')) / 8.0,
                               1.0)) * 10000 + 0.5) / 10000 AS quality
    FROM documents
"""

QUALITY_FILTER_ORACLE = f"""
WITH q AS ({_QUALITY_SQL}),
thr AS (
    SELECT lang, quantile_cont(quality, {QUALITY_CUT_P}) AS cutoff
    FROM q GROUP BY lang
)
SELECT q.lang,
       floor((any_value(thr.cutoff)) * 10000 + 0.5) / 10000 AS cutoff,
       count(*) AS n_kept,
       floor((avg(q.quality)) * 10000 + 0.5) / 10000 AS avg_quality_kept
FROM q JOIN thr USING (lang)
WHERE q.quality >= thr.cutoff
GROUP BY q.lang
"""


@query("quality_filter_quantile", oracle=QUALITY_FILTER_ORACLE)
def quality_filter_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the worst-quality decile per language (adaptive threshold).

    Two passes over the projected (lang, quality) pairs: one partial-agg
    shuffle computes the 5-row per-language cutoff table, which broadcasts
    back into the filter — the corpus itself shuffles only for the final
    per-language rollup. 100 TB: exact ``percentile`` keeps all values per
    group in memory; at scale swap to ``approx_percentile`` with a pinned
    accuracy (same plan, sketch state instead) — kept exact here so the
    DuckDB oracle can reproduce the interpolation bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("lang", "n_chars", tokens_col().alias("toks"))
    n_words = F.size("toks")
    stop_ratio = (
        F.size(
            F.filter(
                "toks", lambda x: (x == STOPWORDS[0]) | (x == STOPWORDS[1])
            )
        )
        / n_words
    )
    avg_word_len = (F.col("n_chars") - (n_words - 1)) / n_words
    quality = hround(
        0.5 * F.least(n_words / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - stop_ratio)
        + 0.2 * F.least(avg_word_len / 8.0, F.lit(1.0)),
        4,
    )
    q = toked.select("lang", quality.alias("quality"))
    thr = q.groupBy("lang").agg(
        F.percentile("quality", QUALITY_CUT_P).alias("cutoff")
    )
    return (
        q.join(broadcast(thr), "lang")
        .where(F.col("quality") >= F.col("cutoff"))
        .groupBy("lang")
        .agg(
            hround(F.any_value("cutoff"), 4).alias("cutoff"),
            F.count(F.lit(1)).alias("n_kept"),
            hround(F.avg("quality"), 4).alias("avg_quality_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental near-dup dedup — admit a new batch (doc_id >= SPLIT) against
# the already-ingested corpus (doc_id < SPLIT) without re-pairing the
# corpus against itself: batch shingles probe the corpus's inverted index,
# so candidate work scales with the BATCH, not the corpus squared.
# ---------------------------------------------------------------------------

INCR_SPLIT = 400

DEDUP_INCREMENTAL_ORACLE = f"""
WITH pairs AS ({NGRAM_ORACLE})
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id >= {INCR_SPLIT}
  AND NOT EXISTS (
      SELECT 1 FROM pairs p
      WHERE p.doc_b = d.doc_id AND p.jaccard >= {JACCARD_THRESHOLD}
  )
"""


@query("dedup_incremental", oracle=DEDUP_INCREMENTAL_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit new docs unless they near-dup the corpus or an earlier new doc.

    The truly incremental plan: corpus shingles become posting lists once
    (at scale: a MAINTAINED inverted-index table, not recomputed per
    batch), hot shingles above SHINGLE_DF_CAP are dropped exactly as in
    ``dedup_ngram_jaccard``, and only BATCH shingles probe them — cross
    candidates are O(batch x df), never corpus x corpus. Batch-internal
    pairs reuse ``jaccard_pairs`` on the (small) batch alone. The oracle is
    the global pair query restricted to rejected batch docs — identical
    result because every cross pair has its batch doc on the doc_b side
    (doc_a < doc_b and corpus ids precede batch ids).
    """
    docs = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs).withColumn("sz", F.size("shs"))
    corpus = sets.where(F.col("doc_id") < INCR_SPLIT)
    batch = sets.where(F.col("doc_id") >= INCR_SPLIT)

    corpus_post = (
        corpus.select("doc_id", "sz", F.explode("shs").alias("shingle"))
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .where(F.col("df") <= SHINGLE_DF_CAP)
    )
    batch_sh = batch.select(
        F.col("doc_id").alias("b_id"),
        F.col("sz").alias("b_sz"),
        F.explode("shs").alias("shingle"),
    )
    cross = (
        batch_sh.join(corpus_post, "shingle")
        .groupBy("b_id", "b_sz", "doc_id", "sz")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(
            F.col("shared")
            / (F.col("b_sz") + F.col("sz") - F.col("shared"))
            >= JACCARD_THRESHOLD
        )
        .select(F.col("b_id").alias("rej_id"))
    )
    in_batch = jaccard_pairs(batch.select("doc_id", "shs")).select(
        F.col("doc_b").alias("rej_id")
    )
    rejects = cross.union(in_batch).distinct()
    return (
        docs.where(F.col("doc_id") >= INCR_SPLIT)
        # rejects ⊆ the incoming batch's ids — batch-bounded by the
        # incremental contract, so the broadcast stays driver-safe at
        # any corpus size (unlike pipeline_training_data's corpus-scaled
        # drop list, which must shuffle)
        .join(broadcast(rejects), docs.doc_id == rejects.rej_id, "left_anti")
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# PII masking — the redaction pass a corpus runs before text reaches a
# trainer: pseudonymize identifiers (keyed hash, joinable but not
# reversible), redact digit runs, and generalize quasi-identifiers
# (k-anonymity-style value bucketing). Map-only — no shuffle, no Python:
# sha2 / regexp_replace / floor are all codegen'd, so at 100 TB this runs
# at scan speed alongside any other map-only curation stage.
# ---------------------------------------------------------------------------

ACCTBAL_BUCKET = 500


@query(
    "pii_mask",
    oracle=f"""
SELECT c_custkey,
       substr(sha256(c_name), 1, 12) AS name_pseudonym,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_redacted,
       floor(c_acctbal / {ACCTBAL_BUCKET}) * {ACCTBAL_BUCKET} AS acctbal_bucket,
       c_mktsegment
FROM customer
""",
)
def pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize, redact, and generalize customer PII in one map pass.

    - ``name_pseudonym``: sha256 prefix — stable join key across tables
      without exposing the raw identifier (both engines emit lowercase hex);
    - ``name_redacted``: every digit replaced (Spark's regexp_replace is
      global by default; DuckDB needs the explicit 'g' flag);
    - ``acctbal_bucket``: value generalized to a fixed-width band so the
      column survives as an analytics feature with reduced identifiability.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.substring(F.sha2("c_name", 256), 1, 12).alias("name_pseudonym"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_redacted"),
        (F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET) * ACCTBAL_BUCKET)
        .cast("double")
        .alias("acctbal_bucket"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# Feature assembly — the last hop before a trainer: join per-doc text
# statistics with the doc's embedding-derived features into one wide
# training-feature row. The fixture aligns embeddings.vec_id with
# documents.doc_id 1:1, which is exactly the production case (features
# keyed by example id). Equi-join on the id — co-partitionable, and with
# both tables bucketed on the key (operators/storage.py) it is
# shuffle-free.
# ---------------------------------------------------------------------------


@query(
    "feature_assembly",
    oracle="""
SELECT doc_id, lang, source, n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       label,
       floor((sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * x)))) * 10000 + 0.5) / 10000
           AS emb_l2
FROM documents JOIN embeddings ON doc_id = vec_id
""",
)
def feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide feature row per example: text stats ⋈ embedding stats.

    The L2 norm uses the same float64-promoted aggregate as
    ``arrow_embedding_norm`` but stays entirely JVM-side (HOF aggregate) —
    no Python worker in this plan at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            "label",
            hround(l2, 4).alias("emb_l2"),
        )
    )


# ---------------------------------------------------------------------------
# Data profiling — the audit every ingestion pipeline runs before anything
# else touches a new drop: per-column null counts and distinct
# cardinalities. ONE scan: all 2N aggregates share a single aggregate node
# (Catalyst plans one Expand for the distincts), then the 1-row result is
# exploded into a row per column — profiling cost does not multiply with
# column count. At 100 TB swap count_distinct for approx_count_distinct
# (or the HLL sketches in agg_hll_merge) — exact distincts are the only
# non-mergeable piece here.
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


@query(
    "table_profile",
    oracle=" UNION ALL ".join(
        f"""
SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       count(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/distinct profile of the orders table, one row per column."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    one = o.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


# ---------------------------------------------------------------------------
# Feature bucketization — equal-frequency (decile) quantization, the
# standard preprocessing for tree models and feature hashing. Production
# shape: per-group cutoffs come from ONE aggregate (t-digest sketch at
# scale, exact percentiles here for the oracle), broadcast back on the
# group key, and assignment is a map-side array comparison — the fact
# table is scanned twice, never shuffled by value. Cutoffs are rounded to
# 6 dp on BOTH engines before comparing so interpolation ulp noise cannot
# flip a bucket at an exact-tie boundary.
# ---------------------------------------------------------------------------

_DECILES = [i / 10 for i in range(1, 10)]


@query(
    "feature_bucketize",
    oracle=f"""
WITH cuts AS (
    SELECT o_orderpriority,
           list_transform(quantile_cont(o_totalprice,
               [{", ".join(str(q) for q in _DECILES)}]),
               c -> floor(c * 1000000 + 0.5) / 1000000) AS cs
    FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       1 + len(list_filter(cs, c -> o_totalprice > c)) AS bucket,
       count(*) AS n_orders,
       floor((avg(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
FROM orders o JOIN cuts USING (o_orderpriority)
GROUP BY 1, 2
""",
)
def feature_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority decile buckets of order value, with per-bucket stats."""
    o = load_table(spark, sf_dir, "orders")
    qs = ", ".join(str(q) for q in _DECILES)
    cuts = o.groupBy("o_orderpriority").agg(
        F.expr(
            f"transform(percentile(o_totalprice, array({qs})), "
            "c -> floor(c * 1000000 + 0.5) / 1000000)"
        ).alias("cs")
    )
    bucket = 1 + F.size(
        F.filter("cs", lambda c: F.col("o_totalprice") > c)
    ).cast("long")
    return (
        o.join(broadcast(cuts), "o_orderpriority")
        .select("o_orderpriority", bucket.alias("bucket"), "o_totalprice")
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            hround(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )
