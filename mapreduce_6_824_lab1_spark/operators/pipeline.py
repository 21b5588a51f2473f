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
    """Near-dup-cleaned, split-assigned corpus statistics in one plan."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingle_sets(docs))
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    clean = docs.join(broadcast(drops), "doc_id", "left_anti")
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
