"""Property-based cross-implementation checks (hypothesis).

The lab's own test strategy is "two implementations must agree" (sequential
vs distributed golden diff). Here: the declarative wordcount plan, the RDD
mapF/reduceF homage, and a plain Python Counter must agree on ARBITRARY
generated corpora — not just the fixtures."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_6_824_lab1_spark.functions.text import words_of

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=30
)
CORPUS = st.lists(WORDS, min_size=1, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_wordcount_matches_python_counter(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        r.word: r.cnt
        for r in words_of(docs)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = Counter(w for ws in corpus for w in ws)
    assert got == dict(want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_rdd_mapreduce_matches_declarative(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)], ["doc_id", "text"]
    )
    declarative = {
        r.word: r.cnt
        for r in words_of(docs)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    rdd = (
        docs.rdd.flatMap(lambda r: [(w, 1) for w in r.text.split(" ")])
        .reduceByKey(lambda a, b: a + b)
        .collect()
    )
    assert dict(rdd) == declarative


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_sliding_chunks_reconstruct_any_corpus(spark, corpus):
    """Lossless segmentation on ARBITRARY corpora: first `stride` tokens of
    every non-final chunk plus the whole final chunk reproduce the doc."""
    from mapreduce_6_824_lab1_spark.operators.curation2 import (
        CHUNK_STRIDE,
        sliding_chunks,
    )

    toks = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(corpus)], ["doc_id", "toks"]
    )
    pdf = sliding_chunks(toks).toPandas()
    for doc_id, ws in enumerate(corpus):
        grp = pdf[pdf["doc_id"] == doc_id].sort_values("chunk_id")
        rows = grp.to_dict("records")
        assert rows, doc_id
        out: list[str] = []
        for row in rows[:-1]:
            out.extend(row["chunk"].split(" ")[:CHUNK_STRIDE])
        out.extend(rows[-1]["chunk"].split(" "))
        assert out == ws, (doc_id, out, ws)
