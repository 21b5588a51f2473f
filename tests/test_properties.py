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
