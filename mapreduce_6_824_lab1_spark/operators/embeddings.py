"""Embedding-column utilities beyond search: storage quantization.

``embedding_quantize_int8`` is the vector-store compression step every
100 TB embedding corpus runs before serving (float32 → int8 = 4× smaller,
cache-resident ANN): per-dimension min/max over the corpus define an affine
code, vectors are quantized, and the operator audits the round-trip
reconstruction error per label group.

Engine-parity design: the per-dimension stats are 2·64 parallel aggregate
expressions (the kmeans.py pattern — one partial-agg shuffle, no explode);
quantization + reconstruction error are evaluated with the SAME expression
tree in both engines, and each vector's squared error is quantized to an
integer micro-unit BEFORE the per-group sum, so group averages are exact
integer arithmetic (the sql_tpch_q11 integer-cents pattern applied to
vector math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround, sql_hround
from mapreduce_6_824_lab1_spark.registry import query

DIM = 64
ERR_QUANT = 1_000_000  # micro-units for the per-vector squared error

_DIMS = range(1, DIM + 1)

# Per-dimension affine code: q_i = clamp(floor((x_i - mn_i)/scale_i + 0.5),
# 0, 255) - 128; dequant x̂_i = mn_i + (q_i + 128)·scale_i.
# scale uses greatest(..., 1e-12) so a constant dimension can't divide by 0.

_SQL_STATS = ", ".join(
    f"min(CAST(embedding[{i}] AS DOUBLE)) AS mn{i}, "
    f"max(CAST(embedding[{i}] AS DOUBLE)) AS mx{i}"
    for i in _DIMS
)

_SQL_ERR_TERMS = " + ".join(
    f"power(CAST(e.embedding[{i}] AS DOUBLE) - (s.mn{i} + "
    f"(least(greatest(floor((CAST(e.embedding[{i}] AS DOUBLE) - s.mn{i})"
    f" / greatest((s.mx{i} - s.mn{i}) / 255.0, 1e-12) + 0.5), 0), 255))"
    f" * greatest((s.mx{i} - s.mn{i}) / 255.0, 1e-12)), 2)"
    for i in _DIMS
)

QUANTIZE_ORACLE = f"""
WITH s AS (SELECT {_SQL_STATS} FROM embeddings),
per_vec AS (
    SELECT e.label,
           CAST(floor(({_SQL_ERR_TERMS}) * {ERR_QUANT} + 0.5) AS BIGINT)
               AS err_micro
    FROM embeddings e CROSS JOIN s
)
SELECT label,
       count(*) AS n_vectors,
       CAST(sum(err_micro) AS BIGINT) AS total_err_micro,
       {sql_hround(f"CAST(sum(err_micro) AS DOUBLE) / count(*) / {ERR_QUANT}", 6)}
           AS avg_sq_err
FROM per_vec
GROUP BY label
"""


@query("embedding_quantize_int8", oracle=QUANTIZE_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 affine quantization audit: per-label count and round-trip
    squared reconstruction error of the corpus-calibrated int8 code.

    One aggregate pass computes all 128 per-dimension min/max stats
    (partial-aggregated, map-side combined); the 1-row stats frame is
    broadcast; quantize + dequant + error is a pure map-side projection.
    100 TB: scan → broadcast → scan, no shuffle wider than |labels| rows.

    Parity note: both engines evaluate the identical expression tree over
    identical float32→double inputs (min/max are order-insensitive exact
    picks), so the per-vector error is bit-identical before integer
    quantization; the floor(x·1e6+0.5) boundary is the standard accepted
    hround class.
    """
    e = load_table(spark, sf_dir, "embeddings")
    stats = e.agg(
        *[
            agg
            for i in _DIMS
            for agg in (
                F.min(F.element_at("embedding", i).cast("double")).alias(
                    f"mn{i}"
                ),
                F.max(F.element_at("embedding", i).cast("double")).alias(
                    f"mx{i}"
                ),
            )
        ]
    )
    err = None
    for i in _DIMS:
        x = F.element_at("embedding", i).cast("double")
        mn, mx = F.col(f"mn{i}"), F.col(f"mx{i}")
        scale = F.greatest((mx - mn) / 255.0, F.lit(1e-12))
        q = F.least(
            F.greatest(F.floor((x - mn) / scale + 0.5), F.lit(0)),
            F.lit(255),
        )
        term = F.pow(x - (mn + q * scale), 2)
        err = term if err is None else err + term
    per_vec = e.crossJoin(broadcast(stats)).select(
        "label",
        F.floor(err * ERR_QUANT + F.lit(0.5)).cast("long").alias("err_micro"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("err_micro").alias("total_err_micro"),
        hround(
            F.sum("err_micro").cast("double") / F.count(F.lit(1)) / ERR_QUANT,
            6,
        ).alias("avg_sq_err"),
    )


# ---------------------------------------------------------------------------
# Gram matrix (X^T X) — the distributed normal-equations / PCA primitive
# ---------------------------------------------------------------------------

GRAM_QUANT = 1_000_000  # per-row products quantize to integer micro-units

GRAM_ORACLE = f"""
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[j] AS DOUBLE)
                           * {GRAM_QUANT} + 0.5) AS BIGINT)) AS BIGINT)
           AS g_micro
FROM embeddings,
     generate_series(1, {DIM}) AS g1(i),
     generate_series(1, {DIM}) AS g2(j)
WHERE j >= i
GROUP BY i, j
"""


@query("embedding_gram_matrix", oracle=GRAM_ORACLE)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix X^T X over the embedding corpus (upper triangle,
    d(d+1)/2 = 2080 cells at d=64) — the single aggregate behind
    normal-equation linear regression, covariance/PCA, and ridge solvers
    at scale: the driver only ever sees d² numbers, never a row.

    Per-partition partial Grams are accumulated with numpy inside ONE
    Arrow-batched ``mapInPandas`` (the MLlib computeGramianMatrix shape:
    each task folds every row it scans into a local d×d int64 accumulator
    and emits exactly d(d+1)/2 cells), then a single hash aggregate sums
    the partials — the shuffle is O(tasks·d²), independent of corpus
    size. Products quantize to integer micro-units BEFORE the sum, so the
    matrix is an exact integer and hash-identical cross-engine regardless
    of summation order (the float-sum would not be). Floats promote to
    float64 before multiplying (house vector rule) — bit-identical to the
    oracle's CAST(AS DOUBLE) products, verified cell-exact at sf0.1.
    This replaced a JVM nested-transform + explode formulation (round 6):
    same plan shape, but the d²-per-row work is BLAS-grade vectorized
    instead of 2080 codegen'd struct allocations per row — 2.1 s → 1.0 s
    warm at sf0.1, and the gap widens with corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        _partial_gram, "i long, j long, p long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("p").cast("long").alias("g_micro")
    )


def _partial_gram(batches):
    """Per-partition Gram fold for ``embedding_gram_matrix``: accumulate
    quantized outer products into one d×d int64 matrix, emit the upper
    triangle once per partition (nothing for empty partitions).

    Dirty rows degrade exactly like the JVM/SQL formulation this
    replaced, where any NULL/out-of-range operand made the cell product
    NULL and the SUM skipped it — skipping a term IS adding 0, and a
    zeroed operand contributes floor(0·x·Q + 0.5) = 0, so: NULL rows
    drop, short rows contribute only their in-range cells, NULL/NaN
    elements contribute nothing. The uniform-corpus fast path is one
    ``np.stack``; the per-row pad only runs for batches that actually
    contain ragged/NULL rows (pinned against the original JVM expression
    in tests/test_round4g.py)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    acc = np.zeros((DIM, DIM), dtype=np.int64)
    seen = False
    for pdf in batches:
        arrs = pdf["embedding"].to_numpy()
        try:
            x = np.stack(arrs).astype(np.float64)
            if x.ndim != 2 or x.shape[1] != DIM:
                raise ValueError("ragged embedding batch")
        except (ValueError, TypeError):
            x = np.zeros((len(arrs), DIM), dtype=np.float64)
            for r, a in enumerate(arrs):
                if a is None:
                    continue
                v = np.asarray(a, dtype=np.float64)[:DIM]
                x[r, : len(v)] = v
        x[np.isnan(x)] = 0.0  # NULL/NaN elements: the SUM-skip semantics
        # chunk the n×d×d outer-product tensor so peak memory stays
        # ~64 MB regardless of the Arrow batch size conf
        for lo in range(0, len(x), 2048):
            c = x[lo : lo + 2048]
            prod = c[:, :, None] * c[:, None, :]
            acc += np.floor(prod * GRAM_QUANT + 0.5).astype(np.int64).sum(
                axis=0
            )
        seen = True
    if not seen:
        return  # empty partition: emit nothing, not a zero matrix
    ii, jj = np.triu_indices(DIM)
    yield pd.DataFrame({"i": ii + 1, "j": jj + 1, "p": acc[ii, jj]})


# ---------------------------------------------------------------------------
# Top principal component — power iteration on the collected Gram matrix
# ---------------------------------------------------------------------------

PCA_ITERS = 200  # spectrum is tight on near-random embeddings (gap ratio ~0.93): 200 fixed iterations push the residual below 1e-6 while staying a <1 ms driver loop


@query("embedding_pca_power")  # rows-only: eigenvectors aren't SQL
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding corpus via
    power iteration on the Gram matrix — the two-phase PCA recipe that
    actually scales: phase 1 is the distributed d²-cell integer aggregate
    (``embedding_gram_matrix``), phase 2 collects only the d×d matrix and
    iterates driver-side with numpy (64×64 — dimension-sized, the
    pagerank/localCheckpoint rule for when driver math is legitimate).

    Deterministic end to end: the Gram matrix is exact integer, the start
    vector is all-ones, iteration count is fixed, and the sign is pinned
    by making the largest-|loading| component positive. Output loadings
    are micro-quantized. Verified against numpy.linalg.eigh in
    tests/test_round4g.py (rows-only key — no SQL oracle can express an
    eigenvector).
    """
    import numpy as np  # noqa: PLC0415 — driver-side, d×d only

    cells = embedding_gram_matrix(spark, sf_dir).collect()  # 2080 rows
    G = np.zeros((DIM, DIM))
    for r in cells:
        G[r["i"] - 1, r["j"] - 1] = r["g_micro"]
        G[r["j"] - 1, r["i"] - 1] = r["g_micro"]
    v = np.ones(DIM)
    for _ in range(PCA_ITERS):
        v = G @ v
        v /= np.linalg.norm(v)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    rows = [
        (int(i + 1), int(np.floor(v[i] * GRAM_QUANT + 0.5)))
        for i in range(DIM)
    ]
    return spark.createDataFrame(rows, "dim BIGINT, loading_micro BIGINT")


# ---------------------------------------------------------------------------
# Deterministic negative sampling — contrastive-training pair generation
# ---------------------------------------------------------------------------

NEG_K = 4
_NEG_KNUTH = 2654435761
_NEG_KNUTH_VB = 2246822519  # independent odd constant for the vector bucket
_NEG_MOD = 4294967296
NEG_TARGET_BUCKET = 64  # candidate-bucket size the bucket count aims for

NEGATIVES_ORACLE = f"""
WITH nn AS (
    SELECT GREATEST(CAST(count(*) AS BIGINT) // {NEG_TARGET_BUCKET}, 1) AS nb
    FROM embeddings
),
vec AS (
    SELECT vec_id AS neg_id, CAST(label AS BIGINT) AS neg_label,
           (vec_id * {_NEG_KNUTH_VB}) % {_NEG_MOD} % nn.nb AS vb
    FROM embeddings, nn
),
cand AS (
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS anchor_label,
           CAST(i AS BIGINT) AS slot,
           ((e.vec_id + i) * {_NEG_KNUTH}) % {_NEG_MOD} % nn.nb AS cb
    FROM embeddings e, generate_series(1, {NEG_K}) AS gs(i), nn
),
hits AS (
    SELECT c.vec_id, c.slot, c.anchor_label, v.neg_id, v.neg_label,
           ((v.neg_id + c.slot) * {_NEG_KNUTH}) % {_NEG_MOD} AS pick
    FROM cand c JOIN vec v ON v.vb = c.cb AND v.neg_id != c.vec_id
)
SELECT vec_id, slot, arg_min(neg_id, pick) AS neg_id, anchor_label,
       arg_min(neg_label, pick) AS neg_label,
       anchor_label != arg_min(neg_label, pick) AS is_informative
FROM hits GROUP BY vec_id, slot, anchor_label
"""


@query("sample_contrastive_negatives", oracle=NEGATIVES_ORACLE)
def sample_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 deterministic negative samples per anchor vector for
    contrastive training: each anchor-slot hashes to a candidate BUCKET
    (Knuth hash mod an adaptive bucket count), joins the bucket's
    vectors, and keeps the arg-min of a second Knuth rank — one negative
    per slot, with the negative's label flagging informative pairs.

    RNG-free by design — the pair set is a pure function of the corpus,
    so shuffling, retries, and re-runs reproduce identical training
    pairs (the property epoch-reproducible pipelines need). The earlier
    formulation hashed to an ID (``hash mod n``) and equi-joined on it,
    which silently assumed a DENSE 0..n-1 id space: on the round-6
    key-offset-replicated sf1 corpus 90% of candidates missed the inner
    join and most anchors lost their negatives (7,994 of the expected
    80,000 rows) — and any real filtered/sharded corpus has the same
    sparse ids. Bucketing by id HASH is density-independent: every
    anchor-slot finds a non-empty bucket (~NEG_TARGET_BUCKET vectors,
    bucket count = max(n/64, 1) keeps the join fan-out linear in n and
    the key cardinality high). The pick rank ((neg_id+slot)·knuth mod
    2³²) is injective in neg_id within a slot, so the arg-min is
    deterministic on both engines. Scale shape: one count aggregate
    (broadcast 1-row), one hash equi-join on the bucket id, one
    partial-aggregated group-by; (id+K)·knuth stays < 2⁶³ for ids
    < ~3·10⁹ (documented Knuth domain rule, text_analysis.py:394).

    CONTRACT (relaxed vs the pre-round-6 dense-id form): the output is
    AT MOST n·K rows, not exactly — an anchor-slot whose hashed bucket
    is empty or contains only the anchor itself drops out of the inner
    join (no padding row, mirrored by the oracle's identical join).
    With bucket count = max(n/64, 1) the expected bucket holds ~64
    vectors, so a lost slot needs all ~64 to collide onto the anchor —
    coverage ≥99% is pinned in tests/test_round4g.py; consumers that
    need exactly K negatives per anchor must re-slot the residue
    themselves (a second-seed retry band was considered and rejected:
    it doubles the join for a <1% residue and breaks oracle parity).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    nn = emb.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.greatest(
            F.floor(F.col("n") / NEG_TARGET_BUCKET).cast("long"), F.lit(1)
        ).alias("nb")
    )
    vec = (
        emb.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").cast("long").alias("neg_label"),
        )
        .crossJoin(broadcast(nn))
        .select(
            "neg_id",
            "neg_label",
            F.pmod(
                F.pmod(F.col("neg_id") * _NEG_KNUTH_VB, F.lit(_NEG_MOD)),
                F.col("nb"),
            ).alias("vb"),
        )
    )
    cand = (
        emb.select(
            "vec_id", F.col("label").cast("long").alias("anchor_label")
        )
        .crossJoin(broadcast(nn))
        .select(
            "vec_id",
            "anchor_label",
            F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("slot"),
            "nb",
        )
        .select(
            "vec_id",
            "anchor_label",
            F.col("slot").cast("long").alias("slot"),
            F.pmod(
                F.pmod(
                    (F.col("vec_id") + F.col("slot")) * _NEG_KNUTH,
                    F.lit(_NEG_MOD),
                ),
                F.col("nb"),
            ).alias("cb"),
        )
    )
    hits = cand.join(
        vec,
        (F.col("cb") == F.col("vb")) & (F.col("neg_id") != F.col("vec_id")),
    ).withColumn(
        "pick",
        F.pmod((F.col("neg_id") + F.col("slot")) * _NEG_KNUTH, F.lit(_NEG_MOD)),
    )
    return (
        hits.groupBy("vec_id", "slot", "anchor_label")
        .agg(
            F.min_by("neg_id", "pick").alias("neg_id"),
            F.min_by("neg_label", "pick").alias("neg_label"),
        )
        .select(
            "vec_id",
            "slot",
            "neg_id",
            "anchor_label",
            "neg_label",
            (F.col("anchor_label") != F.col("neg_label")).alias(
                "is_informative"
            ),
        )
    )
