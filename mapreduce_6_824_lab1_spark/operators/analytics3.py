"""Path mining, EWMA smoothing, skyline, sliding median, weighted
sampling, rolling correlation, robust MAD anomaly fences, ABC classes,
incremental top-k.

Analytical shapes rounding out the event/curation surface (reference has
no equivalent — driver extension mandate, SURVEY.md §2.C lineage). Each
picks the scale-correct plan over the obvious one:

- path mining: rank-truncate per user BEFORE building the path string —
  the per-user state is the first k events, never the whole history.
- EWMA: truncated exponential weights as k explicit ``lag`` columns over
  ONE window pass, in pure integer arithmetic (powers of two), so both
  engines produce bit-identical results; the naive recursive definition
  is a sequential scan no engine parallelizes.
- skyline (pareto frontier): collapse to one row per price point with a
  hash aggregate FIRST; the final dominance window runs over the bounded
  price domain, not the row count.
- sliding median: exact, via a bounded ROWS frame list — constant
  per-row state; a percentile over an unbounded frame would be
  per-row-quadratic.
- weighted sampling: fixed-hash threshold acceptance (same Knuth-hash
  family as sample_split/mix_sources_*) — map-only, RNG-free, and
  samples are nested under weight changes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround, sql_hround
from mapreduce_6_824_lab1_spark.functions.prefix import bucketed_running_sum
from mapreduce_6_824_lab1_spark.operators.text_analysis import _KNUTH, _MOD
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# Top-k user journey prefixes (sequence mining)
# ---------------------------------------------------------------------------

PATH_LEN = 3
PATH_TOPK = 10

PATH_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
),
paths AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path,
           count(*) AS n
    FROM seq WHERE rn <= {PATH_LEN}
    GROUP BY user_id
    HAVING count(*) = {PATH_LEN}
)
SELECT path, count(*) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path
LIMIT {PATH_TOPK}
"""


@query("events_path_topk", oracle=PATH_ORACLE)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common first-3-event journeys across users.

    ``row_number`` over (user, time) with an immediate ``rn <= 3`` filter
    bounds per-user state to the path prefix before any string is built —
    the full event history never leaves the window operator. Path
    cardinality is at most |event_types|³, so the final count + top-k is
    a tiny aggregate; ties at the cut are pinned (count desc, path asc).
    100 TB: one shuffle on user_id (window), one on the ≤|types|³ path
    table; the limit is a TakeOrdered, no global sort materialized.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        e.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= PATH_LEN)
    )
    paths = (
        seq.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == PATH_LEN)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# Truncated EWMA over the daily value series (integer-exact)
# ---------------------------------------------------------------------------

EWMA_K = 8  # truncation depth; alpha = 1/2 => weight 2^(K-1-k) for lag k

_EWMA_NUM_SQL = " + ".join(
    f"coalesce(lag(day_cents, {k}) OVER w, 0) * {1 << (EWMA_K - 1 - k)}"
    for k in range(EWMA_K)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(day_cents, {k}) OVER w IS NOT NULL"
    f" THEN {1 << (EWMA_K - 1 - k)} ELSE 0 END)"
    for k in range(EWMA_K)
)

EWMA_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS day_cents
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
),
smoothed AS (
    SELECT event_type, day, day_cents,
           {_EWMA_NUM_SQL} AS num,
           {_EWMA_DEN_SQL} AS den
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, day_cents,
       num // den AS ewma_cents
FROM smoothed
"""


@query("timeseries_ewma", oracle=EWMA_ORACLE)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=1/2, depth 8) of the
    per-event-type daily value series, in exact integer arithmetic.

    The recursive EWMA definition (s_t = αx_t + (1-α)s_{t-1}) is a
    sequential dependency; truncating at K=8 steps (weight < 1% beyond)
    turns it into K shifted reads of ONE sort — all ``lag`` columns share
    a single window frame, so Spark evaluates them in one pass. With
    α=1/2 the weights are powers of two: numerator and denominator stay
    in BIGINT and the floor-divided result is bit-identical across
    engines — no float accumulation order to disagree on.
    100 TB: the daily pre-aggregate collapses raw events to
    |types|×|days| rows (the only full shuffle); the window partitions
    are day-count sized, trivially parallel per type.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("day_cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = reduce(
        lambda a, k: a
        + F.coalesce(F.lag("day_cents", k).over(w), F.lit(0))
        * F.lit(1 << (EWMA_K - 1 - k)),
        range(1, EWMA_K),
        F.col("day_cents") * F.lit(1 << (EWMA_K - 1)),
    )
    den = reduce(
        lambda a, k: a
        + F.when(
            F.lag("day_cents", k).over(w).isNotNull(),
            F.lit(1 << (EWMA_K - 1 - k)),
        ).otherwise(0),
        range(1, EWMA_K),
        F.lit(1 << (EWMA_K - 1)),
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_cents",
        (num.alias("num")),
        (den.alias("den")),
    ).select(
        "event_type",
        "day",
        "day_cents",
        F.expr("num div den").alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): cheapest price for every achievable size
# ---------------------------------------------------------------------------

PARETO_ORACLE = """
WITH pts AS (
    SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
           max(p_size) AS best_size,
           count(*) AS n_parts
    FROM part
    GROUP BY CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
),
ranked AS (
    SELECT price_cents, best_size, n_parts,
           max(best_size) OVER (ORDER BY price_cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS best_prev
    FROM pts
)
SELECT price_cents, best_size, n_parts
FROM ranked
WHERE best_prev IS NULL OR best_size > best_prev
"""


@query("pareto_frontier", oracle=PARETO_ORACLE)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of the part catalog: points where no part is both cheaper
    and at-least-as-large (minimize price, maximize size).

    The naive skyline is an O(n²) dominance self-join. Instead: hash-agg
    to one row per price point (keeping the max size there — everything
    else at that price is dominated by definition), then a running-max
    window ordered by price keeps a point iff it beats every cheaper
    point's best size. The single-partition window is over the price
    DOMAIN (cents granularity, bounded range — 1000 distinct values in
    the fixtures), not the part count, so it does not grow with data
    volume. 100 TB: one partial-agg shuffle + a domain-sized window; the
    classic distributed-skyline local-prune step is subsumed by the
    price-point aggregate.
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy(
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents")
    ).agg(
        F.max("p_size").alias("best_size"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    w = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = pts.withColumn("best_prev", F.max("best_size").over(w))
    return ranked.filter(
        F.col("best_prev").isNull()
        | (F.col("best_size") > F.col("best_prev"))
    ).select("price_cents", "best_size", "n_parts")


# ---------------------------------------------------------------------------
# Exact sliding median of event values (bounded ROWS frame)
# ---------------------------------------------------------------------------

MEDIAN_WIN = 5

MEDIAN_ORACLE = f"""
WITH framed AS (
    SELECT user_id, event_id,
           list(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {MEDIAN_WIN - 1} PRECEDING
                     AND CURRENT ROW) AS l
    FROM events
)
SELECT user_id, event_id,
       list_sort(l)[CAST((len(l) + 1) // 2 AS INT)] AS med_cents,
       CAST(len(l) AS BIGINT) AS n_win
FROM framed
"""


@query("window_sliding_median", oracle=MEDIAN_ORACLE)
def window_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (lower) median of each user's last 5 event values — robust
    per-event baseline for anomaly scoring, where the mean (anomaly_zscore)
    is outlier-sensitive.

    No engine has an exact median window function; percentile_approx is
    rank-nondeterministic across partitionings. A 5-row ROWS frame
    collected to an array + sort + middle element IS exact, with O(w log w)
    per-row cost at constant w — per-row state never exceeds the frame.
    Values are integer cents so the result admits a bit-exact cross-engine
    hash. 100 TB: one shuffle on user_id; frame state is 5 longs per row
    regardless of history length.
    """
    e = load_table(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MEDIAN_WIN - 1), 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    framed = e.select(
        "user_id",
        "event_id",
        F.collect_list(cents).over(wf).alias("l"),
    )
    return framed.select(
        "user_id",
        "event_id",
        F.element_at(
            F.array_sort("l"),
            F.expr("CAST((size(l) + 1) div 2 AS INT)"),
        ).alias("med_cents"),
        F.size("l").cast("long").alias("n_win"),
    )


# ---------------------------------------------------------------------------
# Weighted deterministic sampling (acceptance ∝ order value)
# ---------------------------------------------------------------------------

SAMPLE_W_ORACLE = f"""
WITH priced AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
),
mx AS (SELECT max(cents) AS mx FROM priced),
marked AS (
    SELECT o_orderstatus, cents,
           CASE WHEN (o_orderkey * {_KNUTH}) % {_MOD}
                     < (cents * {_MOD}) // mx.mx
                THEN 1 ELSE 0 END AS kept
    FROM priced CROSS JOIN mx
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN kept = 1 THEN cents END), 0) AS BIGINT)
           AS kept_cents,
       {sql_hround("CAST(sum(kept) AS DOUBLE) / count(*)", 4)} AS kept_frac
FROM marked
GROUP BY o_orderstatus
"""


@query("sample_weighted", oracle=SAMPLE_W_ORACLE)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-weighted Bernoulli sample of orders (P[keep] ∝ o_totalprice),
    audited per order status.

    Acceptance is a pure function of the key: keep iff
    knuth(o_orderkey) mod 2³² < cents·2³²/max_cents — integer arithmetic
    end to end (cents ≤ ~10⁷, so cents·2³² fits BIGINT with 10³ margin).
    Like mix_sources_* the sample is NESTED: raising max_cents (new data)
    only ever evicts, never reshuffles membership, which keeps
    incremental pipeline reruns stable. 100 TB: max is one broadcast
    scalar, admission is map-only, the audit is one partial-agg shuffle
    on status.
    """
    orders = load_table(spark, sf_dir, "orders")
    priced = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    mx = priced.agg(F.max("cents").alias("mx"))
    marked = priced.crossJoin(broadcast(mx)).select(
        "o_orderstatus",
        "cents",
        F.when(
            F.pmod(F.col("o_orderkey") * _KNUTH, F.lit(_MOD))
            < F.expr(f"(cents * {_MOD}) div mx"),
            1,
        )
        .otherwise(0)
        .alias("kept"),
    )
    return marked.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("kept") == 1, F.col("cents"))), F.lit(0)
        )
        .cast("long")
        .alias("kept_cents"),
        hround(
            F.sum("kept").cast("double") / F.count(F.lit(1)), 4
        ).alias("kept_frac"),
    )


# ---------------------------------------------------------------------------
# Rolling correlation over the daily (count, value) series
# ---------------------------------------------------------------------------

CORR_WIN = 8

ROLLCORR_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
),
sums AS (
    SELECT event_type, day,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(x) OVER w AS BIGINT) AS sx,
           CAST(sum(y) OVER w AS BIGINT) AS sy,
           CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
           CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
           CAST(sum(y * y) OVER w AS BIGINT) AS syy
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {CORR_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n AS n_win,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                       * 1000000 + 0.5) / 1000000
            ELSE NULL END AS corr8
FROM sums
"""


@query("window_rolling_corr", oracle=ROLLCORR_ORACLE)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 8-day Pearson correlation between daily event count and
    daily value per event type — does activity volume track revenue, and
    when does the relationship break?

    ``corr() OVER frame`` exists in both engines but accumulates floats in
    engine-specific order — it can never hash-match. Instead the five
    algebraic sums (Σx, Σy, Σxy, Σx², Σy²) run as INTEGER window sums
    (exact, order-insensitive) over one shared frame, and the correlation
    is a single pinned-shape IEEE expression over those exact integers —
    both engines perform the identical sqrt/divide on identical inputs
    (the text_collocations_pmi technique, lifted to window frames).
    Degenerate frames (n<2 or zero variance) are honestly NULL.
    100 TB: daily pre-agg is the only full shuffle; six window aggregates
    share one frame over |types|×|days| rows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(CORR_WIN - 1), 0)
    )
    sums = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.floor(
        num.cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        * 1000000
        + F.lit(0.5)
    ) / 1000000
    return sums.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_win"),
        F.when(
            (F.col("n") >= 2) & (varx > 0) & (vary > 0), corr
        ).alias("corr8"),
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median/MAD (integer-exact two-pass)
# ---------------------------------------------------------------------------

MAD_K = 6  # flag |x - med| > K * MAD (~4 sigma if normal; MAD≈0.674σ)

ANOMALY_MAD_ORACLE = f"""
WITH t AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
med AS (
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
    FROM t GROUP BY event_type
),
dev AS (
    SELECT t.event_type, t.cents, med.med,
           abs(t.cents - med.med) AS adev
    FROM t JOIN med USING (event_type)
),
mad AS (
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
    FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(max(d.med) AS BIGINT) AS med_cents,
       CAST(max(m.mad) AS BIGINT) AS mad_cents,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN d.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@query("anomaly_mad_robust", oracle=ANOMALY_MAD_ORACLE)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via median/MAD — the
    heavy-tail-safe complement of ``anomaly_zscore`` (one planted extreme
    value drags a mean+stddev fence toward itself; the median and the
    median-absolute-deviation barely move).

    Exact and integer end-to-end: both medians are ``percentile_disc``
    over integer cents (engine-agreement pinned in customer_rfm's
    machinery), and the fence is the integer comparison
    |x−med| > K·MAD. Two aggregate passes with the per-type statistics
    broadcast back — the same two-pass broadcast-moments shape as
    anomaly_zscore, so the robust version costs the same at 100 TB:
    no per-row window, no sort of the full data.
    """
    e = load_table(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
    )
    med = t.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
        ).alias("med")
    )
    dev = t.join(broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)"
        ).alias("mad")
    )
    return (
        dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").cast("long").alias("med_cents"),
            F.max("mad").cast("long").alias("mad_cents"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    F.col("adev") > MAD_K * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# ABC / Pareto-share classification of parts by revenue
# ---------------------------------------------------------------------------

ABC_ORACLE = """
WITH rev AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem
    GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, cents,
           sum(cents) OVER (ORDER BY cents DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
           sum(cents) OVER () AS total
    FROM rev
),
classed AS (
    SELECT l_partkey, cents,
           CASE WHEN cum * 100 <= total * 80 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc
    FROM ranked
)
SELECT abc,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents
FROM classed
GROUP BY abc
"""


@query("abc_classification", oracle=ABC_ORACLE)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto-share) inventory classification: parts covering the
    first 80% of cumulative revenue are class A, to 95% B, the tail C.

    The cumulative share is an integer comparison (cum·100 ≤ total·80) on
    exact cent sums — no ratio ever floats. The running sum orders by
    (revenue desc, partkey) so ties split deterministically.

    Scale shape: parts grow linearly with SF (unlike pareto_frontier's
    bounded price domain), so the running revenue sum must NOT be a
    single-partition global window over the part-grain aggregate. It
    reuses distributed_sort's bucket+offset decomposition: per-part
    revenue buckets by a fixed cents width (the per-part revenue DOMAIN
    is SF-independent — lineitems-per-part is constant in TPC-H — so the
    bucket count is bounded while buckets fill up), the cumsum windows
    WITHIN each bucket, and each bucket's starting revenue is the
    broadcast exclusive prefix over whole-bucket sums (bucket-grain,
    dimension-sized). Equal cents always share a bucket, so the
    (cents desc, partkey) order composes exactly across the cut. The
    grand total rides in as a broadcast 1-row crossJoin, not an
    unpartitioned window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                "long"
            )
        ).cast("long").alias("cents")
    )
    total = rev.agg(F.sum("cents").cast("long").alias("total"))
    ranked = bucketed_running_sum(
        rev,
        "cents",
        [F.desc("cents"), F.asc("l_partkey")],
        # ascending bucket == descending cents; width 16384 cents bounds
        # the bucket count by the SF-independent per-part revenue domain
        F.expr("-(cents div 16384)"),
        name="cum",
    ).crossJoin(F.broadcast(total))
    # DECIMAL(38,0) like the other widened ppm sites: cum·100 passes
    # BIGINT range once total cents nears 9·10¹⁶ (DuckDB's windowed sum
    # is HUGEINT already, so the oracle needs no change)
    classed = ranked.withColumn(
        "abc",
        F.when(
            F.expr(
                "CAST(cum AS DECIMAL(38,0)) * 100"
                " <= CAST(total AS DECIMAL(38,0)) * 80"
            ),
            "A",
        )
        .when(
            F.expr(
                "CAST(cum AS DECIMAL(38,0)) * 100"
                " <= CAST(total AS DECIMAL(38,0)) * 95"
            ),
            "B",
        )
        .otherwise("C"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("long").alias("class_cents"),
    )


# ---------------------------------------------------------------------------
# Incremental top-k maintenance (TakeOrdered as a merge of segment top-ks)
# ---------------------------------------------------------------------------

INC_TOPK_K = 25
INC_TOPK_CUTOFF = "1998-01-01"

INC_TOPK_ORACLE = f"""
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day
FROM orders
ORDER BY cents DESC, o_orderkey
LIMIT {INC_TOPK_K}
"""


@query("incremental_topk", oracle=INC_TOPK_ORACLE)
def incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k maintenance under append-only ingest: the global top-25 is
    recomputed as top-k(top-k(history) ∪ top-k(delta)) — never a rescan
    of history's full order set.

    Sound because static top-k is a monoid: any row in the merged top-k
    is in its segment's top-k (k-truncation below rank k can never evict
    a global winner). The oracle is the flat one-shot TakeOrdered over
    everything — merging must be exactly equivalent, tie-break included
    (cents desc, orderkey asc pinned on every cut). 100 TB: history
    contributes a k-row summary, so a refresh touches only the delta
    partition plus 2k rows — the TakeOrdered sibling of
    ``incremental_agg``'s partial-merge argument.
    """
    orders = load_table(spark, sf_dir, "orders")
    priced = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )
    hist = priced.filter(F.col("order_day") < INC_TOPK_CUTOFF)
    delta = priced.filter(F.col("order_day") >= INC_TOPK_CUTOFF)
    top = lambda df: df.orderBy(  # noqa: E731 - local plan builder
        F.desc("cents"), "o_orderkey"
    ).limit(INC_TOPK_K)
    return top(top(hist).unionByName(top(delta)))
