"""Training-data curation, part 2 — corpus statistics that gate admission.

Four operators a 100 TB pre-training pipeline runs between raw crawl and
tokenizer (lineage: the published CCNet / C4 / Gopher data pipelines; the
reference checkout at /root/reference/README.md is a 2-line stub, so these
extend SURVEY.md §2's extension mandate rather than porting code):

- quality_lm_score — CCNet-style unigram language-model scoring: train the
  LM on the corpus in one aggregate pass, score every document by its mean
  per-word negative log-likelihood. Degenerate/boilerplate docs score low
  (all high-frequency words), gibberish scores high.
- dedup_chunks    — C4-style chunk-level dedup: every 3-token chunk is
  kept only at its first corpus occurrence; per-document retention stats.
- mix_sources_uniform — data mixing: equalize the per-source document
  mixture to the smallest source via deterministic hash-threshold
  acceptance (no RNG state, append-stable, map-only after one tiny agg).
- shard_assign    — deterministic training-shard assignment (hash → shard)
  with per-shard balance stats; the write side of a shuffled-shard layout.

Engine-parity design notes (the how of every oracle pair here):
- word probabilities are quantized to integer MICRO-nats per word
  (floor(-ln(p)·1e6 + 0.5)) BEFORE summation, so document scores are sums
  of exact integers — order-insensitive across engines, same pattern as
  the integer-cents money sums (sql_tpch_q11, stream_topk_complete);
- first-occurrence ownership uses min(doc_id·1e6 + chunk_id) — an exact
  BIGINT min, not a min-by over floats;
- sampling/sharding reuse the pinned Knuth multiplicative hash
  (text_analysis._KNUTH/_MOD) that sample_split/sample_stratified already
  share with their oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround, sql_hround
from mapreduce_6_824_lab1_spark.functions.text import SQL_TOKENS, tokens_col
from mapreduce_6_824_lab1_spark.operators.text_analysis import _KNUTH, _MOD
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Unigram LM quality scoring
# ---------------------------------------------------------------------------

LM_QUANT = 1_000_000  # micro-nats per word: integer, order-insensitive sums

QUALITY_LM_ORACLE = f"""
WITH words AS (
    SELECT doc_id, lang, unnest({SQL_TOKENS}) AS word FROM documents
),
wc AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM wc),
vocab AS (
    SELECT word,
           CAST(floor(ln(tot.n / cnt) * {LM_QUANT} + 0.5) AS BIGINT)
               AS nll_micro
    FROM wc CROSS JOIN tot
),
per_doc AS (
    SELECT w.doc_id, w.lang,
           CAST(floor(CAST(sum(v.nll_micro) AS DOUBLE) / count(*)) AS BIGINT)
               AS doc_nll_micro
    FROM words w JOIN vocab v USING (word)
    GROUP BY w.doc_id, w.lang
)
SELECT lang,
       count(*) AS n_docs,
       {sql_hround(f"CAST(sum(doc_nll_micro) AS DOUBLE) / count(*) / {LM_QUANT}", 4)}
           AS avg_word_nll,
       CAST(max(doc_nll_micro) AS BIGINT) AS max_doc_nll_micro,
       CAST(min(doc_nll_micro) AS BIGINT) AS min_doc_nll_micro
FROM per_doc
GROUP BY lang
"""


@query("quality_lm_score", oracle=QUALITY_LM_ORACLE)
def quality_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language unigram-LM negative-log-likelihood statistics.

    The LM is the corpus itself (one wordcount pass; vocabulary-sized
    result, broadcast to the scorer). Per-word -ln p(w) is quantized to
    integer micro-nats BEFORE summing so per-document scores are exact
    integer sums — no float accumulation-order divergence between engines.
    Residual parity risk: ln() may differ by 1 ulp across libm
    implementations, which flips the micro-nat only if ln(total/cnt)·1e6
    lands within ~1e-10 of a .5 boundary — the same accepted boundary
    class as hround (pinned green at sf0.001/0.01/0.1).
    100 TB: vocab table is tiny (≤ a few M rows) → broadcast join; the
    scorer is one explode + one partial-agg shuffle on doc_id; per-lang
    rollup is a second |langs|-row aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(tokens_col("text")).alias("word")
    )
    # total word count derives from the vocabulary aggregate (sum of per-
    # word counts) — no third corpus scan just for the denominator
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    vocab = counts.crossJoin(broadcast(total)).select(
        "word",
        F.floor(
            F.log(F.col("total") / F.col("cnt")) * LM_QUANT + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    per_doc = (
        words.join(broadcast(vocab), "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(
                F.sum("nll_micro").cast("double") / F.count(F.lit(1))
            )
            .cast("long")
            .alias("doc_nll_micro")
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        hround(
            F.sum("doc_nll_micro").cast("double")
            / F.count(F.lit(1))
            / LM_QUANT,
            4,
        ).alias("avg_word_nll"),
        F.max("doc_nll_micro").alias("max_doc_nll_micro"),
        F.min("doc_nll_micro").alias("min_doc_nll_micro"),
    )


# ---------------------------------------------------------------------------
# Chunk-level (C4-style) dedup
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 3  # fixture vocabulary is 31 words — 3-token chunks give a
#                   real (~19%) duplicate rate; production uses sentences

# chunk ownership = min(doc_id) per distinct chunk: an exact BIGINT min
# with no positional encoding (an earlier doc_id*1e6+chunk_id key silently
# overflowed for 3M-token documents); position within the owning doc is
# irrelevant for doc-level retention counts


def chunk_frame(toks: DataFrame) -> DataFrame:
    """(doc_id, toks) → (doc_id, chunk_id, chunk): fixed-size token chunks,
    the final chunk partial. explode(sequence)+slice — map-only, no UDF.

    Empty arrays yield ZERO rows (matching the oracle's range(0, 0)):
    Spark's sequence(0, -1) would step backwards and emit [0, -1], so the
    id list is guarded to an empty array, which explode drops."""
    n_chunks = F.ceil(F.size("toks") / F.lit(CHUNK_TOKENS)).cast("long")
    ids = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    return toks.select(
        "doc_id",
        F.explode(ids).alias("chunk_id"),
        "toks",
    ).select(
        "doc_id",
        "chunk_id",
        F.array_join(
            F.slice(
                "toks",
                (F.col("chunk_id") * CHUNK_TOKENS + 1).cast("int"),
                CHUNK_TOKENS,
            ),
            " ",
        ).alias("chunk"),
    )

DEDUP_CHUNKS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT)))
               AS chunk_id
    FROM t
),
ch AS (
    SELECT doc_id, chunk_id,
           array_to_string(
               toks[(chunk_id*{CHUNK_TOKENS}+1):(chunk_id*{CHUNK_TOKENS}+{CHUNK_TOKENS})],
               ' ') AS chunk
    FROM c
),
owners AS (
    SELECT chunk, min(doc_id) AS doc_id FROM ch GROUP BY chunk
),
kept AS (
    SELECT doc_id, count(*) AS kept_chunks FROM owners GROUP BY doc_id
),
totals AS (
    SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_chunks,
       coalesce(k.kept_chunks, 0) AS kept_chunks,
       t.n_chunks - coalesce(k.kept_chunks, 0) AS dropped_chunks
FROM totals t LEFT JOIN kept k ON k.doc_id = t.doc_id
"""


@query("dedup_chunks", oracle=DEDUP_CHUNKS_ORACLE)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style chunk dedup: each distinct 3-token chunk survives only in
    its first owning document (lowest doc_id); returns per-document
    total/kept/dropped chunk counts.

    Scale shape — deliberately NOT a row_number window over chunk text: a
    boilerplate chunk repeated billions of times would send every copy to
    one reducer. Instead ownership is min(doc_id) under groupBy(chunk) —
    an algebraic aggregate with map-side combine, so the hot chunk
    collapses to one partial per task. Kept counts then come from the
    DISTINCT-chunk owner table (one row per chunk), never by joining the
    raw copies back.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    chunks = chunk_frame(toks)
    owners = chunks.groupBy("chunk").agg(F.min("doc_id").alias("doc_id"))
    kept = owners.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_chunks")
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("kept_chunks", F.lit(0)).alias("kept_chunks"),
        (F.col("n_chunks") - F.coalesce("kept_chunks", F.lit(0))).alias(
            "dropped_chunks"
        ),
    )


# ---------------------------------------------------------------------------
# Source mixing
# ---------------------------------------------------------------------------

MIX_ORACLE = f"""
WITH counts AS (
    SELECT source, count(*) AS n_total FROM documents GROUP BY source
),
m AS (SELECT min(n_total) AS m FROM counts),
marked AS (
    SELECT d.source, c.n_total,
           CASE WHEN (d.doc_id * {_KNUTH}) % {_MOD}
                     < CAST(floor(CAST(m.m AS DOUBLE) / c.n_total * {_MOD})
                            AS BIGINT)
                THEN 1 ELSE 0 END AS kept
    FROM documents d
    JOIN counts c USING (source)
    CROSS JOIN m
)
SELECT source,
       CAST(max(n_total) AS BIGINT) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       {sql_hround("CAST(sum(kept) AS DOUBLE) / max(n_total)", 4)} AS kept_frac
FROM marked
GROUP BY source
"""


@query("mix_sources_uniform", oracle=MIX_ORACLE)
def mix_sources_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalize the source mixture to the smallest source's volume via
    deterministic hash-threshold acceptance (keep iff
    knuth(doc_id) < (min_count/count_source)·2³²).

    This is the data-mixing primitive: given target weights (here uniform),
    admission is a pure function of (document key, acceptance fraction) —
    no RNG state, no stored sample. Because the rule is a fixed-hash
    threshold, samples are NESTED: lowering a source's fraction (as the
    corpus grows around it) always keeps a subset of the previous sample,
    never an arbitrary reshuffle — the property that keeps incremental
    pipeline reruns from churning membership. 100 TB: the
    per-source count table is tiny → broadcast; admission is map-only; the
    audit is one partial-agg shuffle on source. (Exact-count mixing would
    need a per-source rank — a windowed shuffle; the hash threshold is the
    scale-correct approximation, ±O(√n) per source.)
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("m"))
    marked = (
        docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(m))
        .select(
            "source",
            "n_total",
            F.when(
                F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD))
                < F.floor(
                    F.col("m").cast("double") / F.col("n_total") * _MOD
                ).cast("long"),
                1,
            )
            .otherwise(0)
            .alias("kept"),
        )
    )
    return marked.groupBy("source").agg(
        F.max("n_total").alias("n_total"),
        F.sum("kept").alias("n_kept"),
        hround(
            F.sum("kept").cast("double") / F.max("n_total"), 4
        ).alias("kept_frac"),
    )


# ---------------------------------------------------------------------------
# Shard assignment
# ---------------------------------------------------------------------------

N_SHARDS = 16

SHARD_ORACLE = f"""
SELECT (d.doc_id * {_KNUTH}) % {_MOD} % {N_SHARDS} AS shard,
       count(*) AS n_docs,
       CAST(sum(len({SQL_TOKENS})) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT lang) AS n_langs
FROM documents d
GROUP BY 1
"""


@query("shard_assign", oracle=SHARD_ORACLE)
def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + balance audit.

    shard = knuth(doc_id) mod 16: the multiplicative hash decorrelates the
    shard from every natural ordering (crawl time, source, doc length), so
    shards are statistically interchangeable — the property a trainer's
    data loader needs. The audit (one partial-agg shuffle) verifies
    balance; the production write is
    ``df.repartition(N_SHARDS, shard).write`` — same single shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.pmod(F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)), F.lit(N_SHARDS))
            .alias("shard"),
            F.size(tokens_col("text")).cast("long").alias("n_toks"),
            "n_chars",
            "lang",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking — the RAG/pre-training segmentation primitive:
# fixed token windows with overlap (stride < window), so no boundary ever
# splits context that both neighbors need. Complements dedup_chunks'
# disjoint windows: same explode(sequence)+slice plan, overlapping starts.
# ---------------------------------------------------------------------------

CHUNK_WINDOW = 6  # tokens per chunk
CHUNK_STRIDE = 4  # tokens between chunk starts (overlap = 2)

CHUNK_SLIDING_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(greatest(len(toks) - {CHUNK_WINDOW}, 0)
                                     / {CHUNK_STRIDE}.0) AS BIGINT) + 1))
               AS chunk_id
    FROM t
    WHERE len(toks) > 0
)
SELECT doc_id,
       chunk_id,
       chunk_id * {CHUNK_STRIDE} AS start_tok,
       CAST(least({CHUNK_WINDOW},
                  len(toks) - chunk_id * {CHUNK_STRIDE}) AS BIGINT)
           AS chunk_tokens,
       array_to_string(
           toks[(chunk_id*{CHUNK_STRIDE}+1):(chunk_id*{CHUNK_STRIDE}+{CHUNK_WINDOW})],
           ' ') AS chunk
FROM c
"""


@query("chunk_sliding", oracle=CHUNK_SLIDING_ORACLE)
def chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks (window=6 tokens, stride=4) per
    document, with start offset and actual chunk length — the segmentation
    every RAG indexer / fixed-context pre-training loader runs first.

    Chunk-start rule (pinned identically in the oracle): starts are
    0, 4, 8, … and the LAST start is the first one whose window reaches
    the end of the document — ceil(max(n−window, 0)/stride) + 1 starts
    total, so a doc shorter than one window yields exactly one (partial)
    chunk and nothing is emitted past the end.

    Scale shape: map-only — explode(sequence) + slice + array_join, no
    shuffle at all (the only wide op in a production run would be the
    sink's repartition). Overlap multiplies output bytes by
    window/stride, not compute; at 100 TB the operator streams through
    whole-stage codegen with zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("toks")).where(
        F.size("toks") > 0
    )
    return sliding_chunks(toks)


def sliding_chunks(toks: DataFrame) -> DataFrame:
    """(doc_id, toks) → overlapping (doc_id, chunk_id, start_tok,
    chunk_tokens, chunk) windows; the map-only core of ``chunk_sliding``,
    reusable over any tokenized frame (property-tested on arbitrary
    corpora in tests/test_properties.py)."""
    n_starts = (
        F.ceil(
            F.greatest(F.size("toks") - F.lit(CHUNK_WINDOW), F.lit(0))
            / F.lit(CHUNK_STRIDE)
        ).cast("long")
        + 1
    )
    start = (F.col("chunk_id") * CHUNK_STRIDE).cast("long")
    return (
        toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_starts - 1)
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            start.alias("start_tok"),
            F.least(
                F.lit(CHUNK_WINDOW).cast("long"),
                F.size("toks").cast("long") - start,
            ).alias("chunk_tokens"),
            F.array_join(
                F.slice("toks", (start + 1).cast("int"), CHUNK_WINDOW), " "
            ).alias("chunk"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing — the multilingual/multi-source sampling
# rule (XLM-R / mT5: p_s ∝ n_s^alpha). mix_sources_uniform flattens the
# mixture completely; temperature alpha=0.5 flattens it HALFWAY, keeping
# sqrt(n_min/n_s)-scaled acceptance so big sources still dominate, just
# less. Same deterministic nested-sample hash threshold.
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.5

MIX_TEMP_ORACLE = f"""
WITH counts AS (
    SELECT source, count(*) AS n_total FROM documents GROUP BY source
),
m AS (SELECT min(n_total) AS m FROM counts),
marked AS (
    SELECT d.source, c.n_total,
           CASE WHEN (d.doc_id * {_KNUTH}) % {_MOD}
                     < CAST(floor(pow(CAST(m.m AS DOUBLE) / c.n_total,
                                      1.0 - {MIX_ALPHA}) * {_MOD})
                            AS BIGINT)
                THEN 1 ELSE 0 END AS kept
    FROM documents d
    JOIN counts c USING (source)
    CROSS JOIN m
)
SELECT source,
       CAST(max(n_total) AS BIGINT) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       {sql_hround("CAST(sum(kept) AS DOUBLE) / max(n_total)", 4)} AS kept_frac
FROM marked
GROUP BY source
"""


@query("mix_sources_temperature", oracle=MIX_TEMP_ORACLE)
def mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture: keep
    iff knuth(doc_id) < (n_min/n_s)^(1-alpha)·2³², alpha=0.5 — the
    multinomial temperature-sampling rule of the published multilingual
    pipelines, made deterministic with the same nested hash threshold as
    ``mix_sources_uniform`` (alpha=0 reproduces it exactly; alpha=1 keeps
    everything).

    The acceptance rate is a double on both engines, but computed in ONE
    pinned shape — pow(min/n, 1−alpha) then floor(rate·2³²) to an integer
    threshold — so the hash compare is exact. Scale shape is unchanged
    from the uniform mixer: tiny broadcast count table, map-only
    admission, one partial-agg audit shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("m"))
    rate = F.pow(
        F.col("m").cast("double") / F.col("n_total"), F.lit(1.0 - MIX_ALPHA)
    )
    marked = (
        docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(m))
        .select(
            "source",
            "n_total",
            F.when(
                F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD))
                < F.floor(rate * _MOD).cast("long"),
                1,
            )
            .otherwise(0)
            .alias("kept"),
        )
    )
    return marked.groupBy("source").agg(
        F.max("n_total").alias("n_total"),
        F.sum("kept").alias("n_kept"),
        hround(
            F.sum("kept").cast("double") / F.max("n_total"), 4
        ).alias("kept_frac"),
    )
