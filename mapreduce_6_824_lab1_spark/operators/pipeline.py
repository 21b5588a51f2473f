"""End-to-end training-data pipeline — the composite flagship.

Every LLM-data stage this engine implements, composed into ONE lazy plan:

    documents → near-dup removal (exact dupes are jaccard=1.0, so the
    pair-drop subsumes exact dedup) → deterministic train/val/test split
    → per-split corpus statistics

This is the query a data-curation team actually ships: the per-stage keys
(``dedup_ngram_jaccard``, ``sample_split``, ``text_tokens``) prove each
piece in isolation; this one proves they COMPOSE without materialization
barriers — Catalyst sees the whole pipeline and the near-dup drop list is
broadcast into an anti-join, so the corpus is scanned exactly twice (once
to build pairs, once to aggregate survivors), never collected.

Scale shape: the jaccard stage's two shuffles dominate (posting lists,
pair agg — see ``dedup.jaccard_pairs``); the drop list is tiny relative to
the corpus (duplicates, not uniques) so the anti-join is broadcast; split
assignment is a pure projection (multiplicative hash of the key); the
final aggregate is one partial-agg shuffle on (split, lang). At 100 TB the
near-dup stage swaps to ``dedup_minhash_lsh`` candidates with the same
drop-list contract — one line, same plan downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround
from mapreduce_6_824_lab1_spark.operators.dedup import (
    NGRAM_ORACLE,
    jaccard_pairs,
    shingle_sets,
)
from mapreduce_6_824_lab1_spark.operators.text_analysis import _KNUTH, _MOD
from mapreduce_6_824_lab1_spark.registry import query

PIPELINE_ORACLE = f"""
WITH base AS ({NGRAM_ORACLE}),
drops AS (SELECT DISTINCT doc_b AS doc_id FROM base),
clean AS (
    SELECT d.doc_id, d.lang, d.text, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = d.doc_id)
)
SELECT CASE WHEN h < {int(0.90 * _MOD)} THEN 'train'
            WHEN h < {int(0.95 * _MOD)} THEN 'val'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars
FROM (SELECT *, (doc_id * {_KNUTH}) % {_MOD} AS h FROM clean) t
GROUP BY 1, 2
"""


@query("pipeline_training_data", oracle=PIPELINE_ORACLE)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cleaned, split-assigned corpus statistics in one plan.

    The drop list is CORPUS-scaled (dup rate × N docs — billions of ids
    at 100 TB), so the anti-join is deliberately unhinted: it shuffles
    16-byte doc_ids, never forces the full dup list through the driver
    (contrast dedup_incremental, whose reject list is batch-bounded and
    may broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingle_sets(docs))
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    clean = docs.join(drops, "doc_id", "left_anti")
    h = F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD))
    split = (
        F.when(h < int(0.90 * _MOD), "train")
        .when(h < int(0.95 * _MOD), "val")
        .otherwise("test")
    )
    return (
        clean.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias(
                "total_tokens"
            ),
            hround(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Pretraining corpus build v2 — five curation stages, ONE lazy plan
# ---------------------------------------------------------------------------

_PP_GRAM = 8
_PP_MIN_CHARS = 100
_PP_MIN_TOKENS = 20
_PP_EVAL_MOD = 97  # doc_id % 97 == 0 plays the held-out eval set
_PP_SHARDS = 4

PRETRAIN_ORACLE = f"""
WITH gated AS (
    SELECT doc_id, text,
           (doc_id * {_KNUTH}) % {_MOD} AS h,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    WHERE n_chars >= {_PP_MIN_CHARS}
      AND len(string_split(text, ' ')) >= {_PP_MIN_TOKENS}
),
deduped AS (
    SELECT doc_id, text, h, n_tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM gated
    ) WHERE rn = 1
),
evalg AS (
    SELECT DISTINCT array_to_string(t[i:i+{_PP_GRAM - 1}], ' ') AS gram
    FROM (SELECT string_split(text, ' ') AS t,
                 unnest(generate_series(1,
                        len(string_split(text, ' ')) - {_PP_GRAM - 1})) AS i
          FROM documents
          WHERE doc_id % {_PP_EVAL_MOD} = 0
            AND len(string_split(text, ' ')) >= {_PP_GRAM})
),
traing AS (
    SELECT d.doc_id, array_to_string(t[i:i+{_PP_GRAM - 1}], ' ') AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS t,
                 unnest(generate_series(1,
                        len(string_split(text, ' ')) - {_PP_GRAM - 1})) AS i
          FROM deduped) d
),
contaminated AS (
    SELECT DISTINCT t.doc_id FROM traing t JOIN evalg e ON t.gram = e.gram
),
clean AS (
    SELECT * FROM deduped
    WHERE doc_id % {_PP_EVAL_MOD} != 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT CASE WHEN h < {int(0.90 * _MOD)} THEN 'train'
            WHEN h < {int(0.95 * _MOD)} THEN 'val'
            ELSE 'test' END AS split,
       (h // 65536) % {_PP_SHARDS} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(h) AS BIGINT) AS checksum
FROM clean
GROUP BY 1, 2
"""


def _token_grams(col: str, k: int):
    """JVM-side token k-gram generator (the curation3 recipe)."""
    return F.explode(
        F.expr(
            f"transform(sequence(1, size({col}) - {k - 1}),"
            f" i -> array_join(slice({col}, i, {k}), ' '))"
        )
    )


@query("pipeline_pretraining_corpus", oracle=PRETRAIN_ORACLE)
def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining corpus build as ONE lazy plan: quality gate → exact
    content dedup → eval-set decontamination → split assignment → shard
    assignment → per-(split, shard) manifest with an order-insensitive
    integer checksum. The v2 of ``pipeline_training_data``: five curation
    stages (each also a standalone registry key family) composed so
    Catalyst plans them as one DAG — no intermediate materialization,
    filters and the md5 projection pushed into the shared scan.

    Stage scale notes: the gate is map-only integer arithmetic; dedup is
    min(doc_id) per text group (algebraic, map-side combine; bodies
    shuffle exactly once at 100 TB — the same volume every prior form
    paid, since the winning text must survive the exchange either way).
    Round 14 replaced ``min(struct(doc_id, text, …))`` — a struct-typed
    aggregation buffer, which HashAggregate cannot hold (UnsafeRow
    buffers are primitive-only), so Catalyst fell back to SortAggregate
    and SORTED THE FULL TEXT CORPUS on both sides of the exchange — with
    grouping on the text plus primitive-only aggregates (min doc_id;
    n_tokens is text-functional), restoring hash aggregation (plan diff
    in plans/r14/pipeline_pretraining_corpus_{before,after}.txt: 4 Sorts
    + 4 SortAggregates → 0). Round 15 dropped the redundant md5(text)
    grouping column (ADVICE r14): with text itself in the key the digest
    selected identical groups while costing one full-body md5 per gated
    row before the shuffle. Oracle caveat (unchanged across all three
    forms): the oracle partitions by md5(text) alone, so two DISTINCT
    texts sharing an md5 digest would keep two survivors here and one
    there — md5 collisions are not constructible by the fixture
    generator, and no digest-only form can both hash-aggregate and carry
    the winning text. ``h`` is recomputed from the winning doc_id,
    exactly the oracle's ``(doc_id * KNUTH) % MOD``;
    decontamination broadcasts the EVAL gram set (eval
    benchmarks are tiny by construction) into a semi-join marking +
    anti-join drop, so the corpus never shuffles on grams; split/shard
    are pure hash functions of the key (disjoint bit ranges of the same
    Knuth hash, so shard is uncorrelated with split); the manifest
    checksum is an exact BIGINT sum — stable under any row order,
    diffable across corpus versions.
    """
    docs = load_table(spark, sf_dir, "documents")
    gated = (
        docs.select(
            "doc_id",
            "text",
            F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)).alias("h"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            "n_chars",
        )
        .filter(
            (F.col("n_chars") >= _PP_MIN_CHARS)
            & (F.col("n_tokens") >= _PP_MIN_TOKENS)
        )
        .drop("n_chars")
    )
    deduped = (
        gated.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "text",
            F.pmod(F.col("doc_id") * _KNUTH, F.lit(_MOD)).alias("h"),
            "n_tokens",
        )
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _PP_GRAM
    )
    evalg = (
        toks.filter(F.pmod("doc_id", F.lit(_PP_EVAL_MOD)) == 0)
        .select(_token_grams("t", _PP_GRAM).alias("gram"))
        .distinct()
    )
    traing = deduped.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", _token_grams("t", _PP_GRAM).alias("gram"))
    contaminated = traing.join(broadcast(evalg), "gram", "left_semi").select(
        "doc_id"
    ).distinct()
    clean = deduped.filter(
        F.pmod("doc_id", F.lit(_PP_EVAL_MOD)) != 0
    ).join(contaminated, "doc_id", "left_anti")
    split = (
        F.when(F.col("h") < int(0.90 * _MOD), "train")
        .when(F.col("h") < int(0.95 * _MOD), "val")
        .otherwise("test")
    )
    return (
        clean.select(
            split.alias("split"),
            F.pmod(F.expr("h div 65536"), F.lit(_PP_SHARDS)).alias("shard"),
            "n_tokens",
            "h",
        )
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("h").cast("long").alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Decontamination attribution — the audit trail behind the drop decision
# ---------------------------------------------------------------------------

# Wider eval slice than the pipeline's %97: the audit must EXERCISE the
# match path at every fixture SF (the %97 slice shares zero 8-grams at
# sf0.01 — a 0-row audit verifies nothing), and a steward reviewing drops
# wants the report dense enough to see the leakage-vs-boilerplate split.
_ATTR_EVAL_MOD = 11

DECON_ATTR_ORACLE = f"""
WITH evalg AS (
    SELECT doc_id AS eval_doc, array_to_string(t[i:i+{_PP_GRAM - 1}], ' ')
               AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS t,
                 unnest(generate_series(1,
                        len(string_split(text, ' ')) - {_PP_GRAM - 1})) AS i
          FROM documents
          WHERE doc_id % {_ATTR_EVAL_MOD} = 0
            AND len(string_split(text, ' ')) >= {_PP_GRAM})
),
traing AS (
    SELECT doc_id AS train_doc, array_to_string(t[i:i+{_PP_GRAM - 1}], ' ')
               AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS t,
                 unnest(generate_series(1,
                        len(string_split(text, ' ')) - {_PP_GRAM - 1})) AS i
          FROM documents
          WHERE doc_id % {_ATTR_EVAL_MOD} != 0
            AND len(string_split(text, ' ')) >= {_PP_GRAM})
)
SELECT t.train_doc, e.eval_doc,
       CAST(count(DISTINCT t.gram) AS BIGINT) AS shared_grams
FROM traing t JOIN evalg e ON t.gram = e.gram
GROUP BY t.train_doc, e.eval_doc
"""


@query("decontaminate_attribution", oracle=DECON_ATTR_ORACLE)
def decontaminate_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit trail behind every decontamination drop: for each
    (train doc, eval doc) pair sharing at least one 8-gram, how many
    DISTINCT grams they share — the evidence a data steward reviews
    before accepting that `pipeline_pretraining_corpus` (and
    `decontaminate`) removed the right documents, and the number that
    separates true leakage (many shared grams) from a single boilerplate
    collision.

    Scale shape: the eval side is tiny by construction (held-out
    benchmarks), so its gram table BROADCASTS with eval_doc attribution
    riding along; the train side streams through a broadcast hash join —
    no shuffle of train grams at all — and the only aggregate is at
    (train, eval)-pair grain, bounded by matches, not corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _PP_GRAM
    )
    evalg = (
        toks.filter(F.pmod("doc_id", F.lit(_ATTR_EVAL_MOD)) == 0)
        .select(
            F.col("doc_id").alias("eval_doc"),
            _token_grams("t", _PP_GRAM).alias("gram"),
        )
        .distinct()
    )
    traing = (
        toks.filter(F.pmod("doc_id", F.lit(_ATTR_EVAL_MOD)) != 0)
        .select(
            F.col("doc_id").alias("train_doc"),
            _token_grams("t", _PP_GRAM).alias("gram"),
        )
        .distinct()
    )
    return (
        traing.join(broadcast(evalg), "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count_distinct("gram").alias("shared_grams"))
    )
