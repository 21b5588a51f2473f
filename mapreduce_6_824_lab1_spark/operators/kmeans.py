"""K-means over the embeddings table — the canonical *iterative* MapReduce
application (each Lloyd iteration is one map (assign) + one reduce (mean)).

Fully deterministic: centroids initialize to the vectors of vec_id 0..k-1,
iterations are fixed-count, and assignment ties break toward the lower
centroid id. Declared rows-only for the driver (centroid means accumulate
float error in engine-specific order, so exact cross-engine hashing is not
honest here); the unit test instead checks assignments and centroids against
an independent numpy implementation of the same algorithm to 1e-6.

Scale shape per iteration (the whole point):
- centroids (k×64 doubles) are driver-held between iterations (collected
  once per iteration — iteration-control-grade data, not a data-scale
  collect; the collect boundary truncates lineage), then re-broadcast as
  ONE packed array<struct(cid, centroid)> row;
- assignment is a map-only pass (no shuffle): argmin over k distances
  computed with codegen'd higher-order array functions — a least() fold
  over (dist, cid) structs, one row in → one row out;
- new centroids via ONE partial-aggregated shuffle of (cid, dim) sums —
  the paper's combiner pattern; traffic is O(partitions · k · dim), never
  O(rows). Per-iteration lineage is truncated at the collect boundary, so
  iteration N never re-executes iterations 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround
from mapreduce_6_824_lab1_spark.registry import query

K = 8
ITERATIONS = 3
DIM = 64  # embeddings.parquet vector length (all SFs)


def _sq_dist(a, b) -> F.Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Map phase: nearest centroid per vector — GENUINELY map-only.

    The k centroids are packed into ONE array<struct(cid, centroid)> row
    (``collect_list`` aggregate) and attached to every vector via
    ``crossJoin(broadcast(...))`` — the engine's 1-row-aggregate idiom;
    the argmin is a ``least()``-over-(dist, cid)-structs fold across that
    array, evaluated row-local: one row in → one row out, ZERO shuffle of
    the corpus. (The earlier crossJoin(broadcast)+groupBy(vec_id,
    embedding) form shuffled the whole corpus — embeddings included —
    once per iteration to dedupe the k-expanded rows; at 100 TB that is
    4 corpus shuffles Lloyd's doesn't need.) The fold is min over structs
    compared lexicographically (d, cid) — order-independent, so the
    nondeterministic collect_list order doesn't matter and distance ties
    still break toward the lower centroid id. Keeping the centroid
    VALUES in the broadcast row (not inlined as literals) means one
    compiled codegen template serves every iteration.

    NaN guard: a NaN element anywhere in a vector makes every centroid
    distance NaN, and Spark's struct ordering ranks NaN ABOVE Infinity —
    an unguarded fold would keep the init sentinel and the row would
    silently vanish in the cid join downstream. ``nanvl`` maps NaN
    distances to Infinity so such a row ties every centroid at (inf,
    cid) and lands on cid 0 — same outcome as the earlier
    min-over-structs aggregate (NaN tied with NaN there, lowest cid
    won), and the row stays counted.
    """
    packed = centroids.agg(
        F.collect_list(
            F.struct(
                F.col("cid").cast("int").alias("cid"),
                F.col("centroid").alias("centroid"),
            )
        ).alias("cents")
    )
    init = F.struct(
        F.lit(float("inf")).alias("d"),
        F.lit(2**31 - 1).cast("int").alias("cid"),  # loses every (inf, cid<k) tie
    )
    best = F.aggregate(
        F.col("cents"),
        init,
        lambda acc, c: F.least(
            acc,
            F.struct(
                F.nanvl(
                    _sq_dist("embedding", c.getField("centroid")),
                    F.lit(float("inf")),
                ).alias("d"),
                c.getField("cid").alias("cid"),
            ),
        ),
    )
    return (
        vectors.crossJoin(broadcast(packed))
        .select("vec_id", "embedding", best.getField("cid").alias("cid"))
    )


def recompute(assigned: DataFrame) -> DataFrame:
    """Reduce phase: element-wise mean per centroid — DIM parallel
    ``sum(element_at(embedding, i))`` aggregate expressions plus one count,
    reassembled into an ordered array. One hash aggregate on ``cid``, no
    map-side row expansion: the earlier posexplode formulation multiplied
    every row 64× before the partial agg, where parallel agg expressions
    (the same trick as the minhash signature agg, dedup.py) keep the scan
    at one row per vector and shuffle only k×(DIM+1) partials per task.

    A centroid that attracts no vectors drops out (standard Lloyd's
    degenerate case; with k=8 over a gaussian-ish corpus and nearest-vector
    init it does not occur at the fixture scales — the reference test would
    fail loudly if it ever did)."""
    sums = [
        F.sum(F.element_at("embedding", i + 1).cast("double")).alias(f"s{i}")
        for i in range(DIM)
    ]
    return (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("c"), *sums)
        .select(
            "cid",
            F.array(
                *[F.col(f"s{i}") / F.col("c") for i in range(DIM)]
            ).alias("centroid"),
        )
    )


@query("kmeans_embeddings")  # rows-only: float accumulation order is
# engine-specific; verified against a numpy reference in tests instead
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # iteration shuffles are centroid/assignment-grain: scope them to a
    # small partition count (the connected_components sizing rule) so a
    # vanilla 200-partition session doesn't run near-empty tasks per round
    from mapreduce_6_824_lab1_spark.session import scoped_conf

    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "16"}):
        return _kmeans_impl(spark, sf_dir)


def _kmeans_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vectors = e.select("vec_id", "embedding")
    centroids = (
        e.filter(F.col("vec_id") < K)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )
    # Materialize the k new centroids at each iteration boundary (one
    # collect of k×DIM doubles — the driver-held state the module
    # docstring promises). Rebuilding the frame from rows truncates the
    # lineage, so iteration N never re-executes iterations 1..N-1 and the
    # final plan's TWO uses of `centroids` (assign + the norm join) read
    # a literal, not a nested iterative plan.
    for _ in range(ITERATIONS):
        assigned = assign(vectors, centroids)
        centroids = spark.createDataFrame(
            recompute(assigned).collect(),
            "cid int, centroid array<double>",
        )
    final = assign(vectors, centroids)
    norm = F.sqrt(
        F.aggregate(
            F.transform("centroid", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        final.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(centroids.select("cid", norm.alias("nrm")), "cid")
        .select("cid", "n_members", hround(F.col("nrm"), 4).alias("centroid_norm"))
    )
