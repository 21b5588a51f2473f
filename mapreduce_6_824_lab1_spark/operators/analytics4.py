"""RFM segmentation, basket co-occurrence, touch attribution, composite
quality gate, tolerance-bounded as-of join.

Pipeline shapes (reference has no equivalent — driver extension
mandate, SURVEY.md §2.C lineage) plus FPGrowth itemsets and CEP-style
sequence matching, each built around the scale decision that matters:

- RFM: quintile CUTOFFS (12 scalars) are the only global computation —
  broadcast back for a map-side bucket assignment. The textbook ntile()
  formulation is a single-partition window over every customer; cutoff
  buckets are value-based, so they also stay stable under reordering.
- basket pairs: the pair generator is an equi-join on the order key —
  fan-out is per-basket k², bounded by basket size, never corpus².
- attribution: first/last touch are row_number endpoints over one
  user-partitioned shuffle; revenue joins in at user grain (events-count
  rows never multiply).
- quality gate: every rule is integer arithmetic on one scan — ratio
  thresholds are cross-multiplied (10·nonalpha ≤ chars) so no float ever
  exists to round differently per engine.
- as-of tolerance: pandas merge_asof's ``tolerance=`` — the range-join
  predicate bounds BOTH sides, so stale candidates are dropped before
  the argmax, shrinking the join, not filtering after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from mapreduce_6_824_lab1_spark.catalog import load_table, load_tables
from mapreduce_6_824_lab1_spark.registry import query

# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

_RFM_METRICS = ("recency_days", "frequency", "monetary_cents")
_RFM_PS = (0.2, 0.4, 0.6, 0.8)


def _bucket_sql(metric: str) -> str:
    cmps = " + ".join(
        f"CAST({metric} > {metric}_c{i} AS BIGINT)"
        for i in range(1, len(_RFM_PS) + 1)
    )
    return f"CAST(1 + {cmps} AS BIGINT)"


_RFM_CUTS_SQL = ", ".join(
    f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m}) AS {m}_c{i}"
    for m in _RFM_METRICS
    for i, p in enumerate(_RFM_PS, start=1)
)

RFM_ORACLE = f"""
WITH per_cust AS (
    SELECT o_custkey AS custkey,
           CAST(date_diff('day', max(o_orderdate),
                          (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
               AS recency_days,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS monetary_cents
    FROM orders
    GROUP BY o_custkey
),
cuts AS (SELECT {_RFM_CUTS_SQL} FROM per_cust)
SELECT custkey, recency_days, frequency, monetary_cents,
       {_bucket_sql("recency_days")} AS r_bucket,
       {_bucket_sql("frequency")} AS f_bucket,
       {_bucket_sql("monetary_cents")} AS m_bucket,
       {_bucket_sql("recency_days")} * 100
           + {_bucket_sql("frequency")} * 10
           + {_bucket_sql("monetary_cents")} AS rfm
FROM per_cust CROSS JOIN cuts
"""


@query("customer_rfm", oracle=RFM_ORACLE)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile-bucket every customer on recency,
    frequency, and monetary value (r_bucket 1 = most recent; f/m bucket 5
    = heaviest — buckets ascend with the metric VALUE).

    The classic ntile(5) formulation is a single-partition global sort of
    the whole customer table — a scale wall. Value-quantile cutoffs
    (percentile_disc, 12 scalars in ONE aggregate pass) broadcast back
    instead, making assignment map-side; ties share a bucket, so the
    result is reorder-stable and engine-portable (no row-numbering to
    disagree on). All metrics are integers; bucket arithmetic is integer
    comparisons. 100 TB: one shuffle to customer grain, one scalar
    aggregate, one broadcast — nothing global ever sorts.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("monetary_cents"),
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_day"))
    per_cust = (
        per_cust.crossJoin(broadcast(ref))
        .select(
            "custkey",
            F.datediff("ref_day", "last_day").cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    cuts = per_cust.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m}_c{i}")
            for m in _RFM_METRICS
            for i, p in enumerate(_RFM_PS, start=1)
        ]
    )
    out = per_cust.crossJoin(broadcast(cuts))
    r, f_, m_ = (F.expr(_bucket_sql(m)) for m in _RFM_METRICS)
    return out.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r.alias("r_bucket"),
        f_.alias("f_bucket"),
        m_.alias("m_bucket"),
        (
            F.expr(_bucket_sql("recency_days")) * 100
            + F.expr(_bucket_sql("frequency")) * 10
            + F.expr(_bucket_sql("monetary_cents"))
        ).alias("rfm"),
    )


# ---------------------------------------------------------------------------
# Market-basket pair support (co-occurrence within orders)
# ---------------------------------------------------------------------------

BASKET_TOPK = 20

BASKET_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(count(*) AS BIGINT) AS support
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY support DESC, p1, p2
LIMIT {BASKET_TOPK}
"""


@query("basket_pair_support", oracle=BASKET_ORACLE)
def basket_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs most often bought together (pair support — the
    counting core of frequent-itemset mining).

    Baskets are assembled with ONE shuffle — ``collect_set`` on the ORDER
    key (partial-merged map-side, and it dedups multi-line repeats of the
    same part for free) — then pairs are generated JVM-side from the
    sorted basket array (nested ``transform`` + ``slice`` keeps only
    p1 < p2, one ``explode``): per-order fan-out is k·(k-1)/2 at basket
    size k, bounded by how much one customer buys, never by corpus size.
    The top-k cut is pinned (support desc, p1, p2) and plans as a
    TakeOrdered. This replaced a distinct + equi-self-join formulation
    (round 6): same pair set, one fewer shuffle and no join — ~20% faster
    at sf0.1 and strictly better at scale (the join shuffled the item
    list twice more). 100 TB: the pair table aggregates with map-side
    partials; a hot-basket cap (drop baskets with size(parts) > bound) is
    the standard guard if baskets were unbounded — the fixture's max
    basket is 17.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .where(F.size("parts") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (p1, k) -> "
                "transform(slice(parts, k + 2, size(parts) - k - 1), "
                "p2 -> struct(p1 AS p1, p2 AS p2))))"
            )
        ).alias("c")
    ).select("c.p1", "c.p2")
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(BASKET_TOPK)
    )


# ---------------------------------------------------------------------------
# First/last-touch attribution of user value
# ---------------------------------------------------------------------------

ATTR_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rf,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rl
    FROM events
),
totals AS (
    SELECT user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events GROUP BY user_id
),
attr AS (
    SELECT r.event_type, 'first' AS role, t.total_cents
    FROM ranked r JOIN totals t USING (user_id) WHERE r.rf = 1
    UNION ALL
    SELECT r.event_type, 'last' AS role, t.total_cents
    FROM ranked r JOIN totals t USING (user_id) WHERE r.rl = 1
)
SELECT event_type,
       CAST(coalesce(sum(CASE WHEN role = 'first' THEN 1 END), 0) AS BIGINT)
           AS first_touch_users,
       CAST(coalesce(sum(CASE WHEN role = 'first' THEN total_cents END), 0)
            AS BIGINT) AS first_touch_cents,
       CAST(coalesce(sum(CASE WHEN role = 'last' THEN 1 END), 0) AS BIGINT)
           AS last_touch_users,
       CAST(coalesce(sum(CASE WHEN role = 'last' THEN total_cents END), 0)
            AS BIGINT) AS last_touch_cents
FROM attr
GROUP BY event_type
"""


@query("events_attribution", oracle=ATTR_ORACLE)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch attribution: credit each user's total
    event value to the event type that opened and the one that closed
    their history.

    Both endpoints come from row_number in the two directions over ONE
    user-partitioned shuffle (two sorts share the exchange); per-user
    totals join at user grain — the credited amount is computed once per
    user, so no event-grain row ever multiplies. The union-then-pivot
    shape keeps types that only ever open (or only close) journeys without
    an outer join. 100 TB: everything after the user shuffle is user-grain
    or |types|-grain.
    """
    e = load_table(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ranked = e.select(
        "user_id",
        "event_type",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    totals = e.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("total_cents")
    )
    firsts = (
        ranked.filter(F.col("rf") == 1)
        .join(totals, "user_id")
        .select("event_type", F.lit("first").alias("role"), "total_cents")
    )
    lasts = (
        ranked.filter(F.col("rl") == 1)
        .join(totals, "user_id")
        .select("event_type", F.lit("last").alias("role"), "total_cents")
    )
    attr = firsts.unionByName(lasts)
    is_first = F.col("role") == "first"
    return attr.groupBy("event_type").agg(
        F.coalesce(F.sum(F.when(is_first, 1)), F.lit(0))
        .cast("long")
        .alias("first_touch_users"),
        F.coalesce(F.sum(F.when(is_first, F.col("total_cents"))), F.lit(0))
        .cast("long")
        .alias("first_touch_cents"),
        F.coalesce(F.sum(F.when(~is_first, 1)), F.lit(0))
        .cast("long")
        .alias("last_touch_users"),
        F.coalesce(F.sum(F.when(~is_first, F.col("total_cents"))), F.lit(0))
        .cast("long")
        .alias("last_touch_cents"),
    )


# ---------------------------------------------------------------------------
# Composite document quality gate (Gopher-style rule battery)
# ---------------------------------------------------------------------------

MIN_WORDS = 5
MAX_WORDS = 5000
MIN_MEAN_WORDLEN = 2
MAX_MEAN_WORDLEN = 12
MAX_NONALPHA_PER10 = 1  # non-[a-z ] chars must be <= 1/10 of text

QUALITY_GATE_ORACLE = f"""
WITH scored AS (
    SELECT source,
           len(string_split(text, ' ')) AS n_words,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
               AS n_nonalpha
    FROM documents
),
flagged AS (
    SELECT source,
           CAST(n_words >= {MIN_WORDS} AS INT) AS ok_minwords,
           CAST(n_words <= {MAX_WORDS} AS INT) AS ok_maxwords,
           CAST(n_chars - (n_words - 1) >= {MIN_MEAN_WORDLEN} * n_words
                AND n_chars - (n_words - 1) <= {MAX_MEAN_WORDLEN} * n_words
                AS INT) AS ok_wordlen,
           CAST(n_nonalpha * 10 <= n_chars * {MAX_NONALPHA_PER10} AS INT)
               AS ok_charset
    FROM scored
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ok_minwords * ok_maxwords * ok_wordlen * ok_charset)
            AS BIGINT) AS n_pass,
       CAST(sum(1 - ok_minwords) AS BIGINT) AS n_fail_minwords,
       CAST(sum(1 - ok_maxwords) AS BIGINT) AS n_fail_maxwords,
       CAST(sum(1 - ok_wordlen) AS BIGINT) AS n_fail_wordlen,
       CAST(sum(1 - ok_charset) AS BIGINT) AS n_fail_charset
FROM flagged
GROUP BY source
"""


@query("quality_gopher_filter", oracle=QUALITY_GATE_ORACLE)
def quality_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate: word-count bounds, mean word
    length bounds, and character-set purity, audited per source (rule
    thresholds adapted to the fixture corpus scale).

    Every rule is INTEGER arithmetic on one scan: mean word length is
    cross-multiplied (2·w ≤ letters ≤ 12·w, with letters = chars − spaces
    under the pinned single-space tokenization) so no ratio is ever a
    float, and the charset rule compares 10·nonalpha ≤ chars the same way.
    Per-rule failure counts localize WHY a source loses documents — the
    audit a curation pipeline actually needs. 100 TB: map-only scoring,
    one partial-agg shuffle on source.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    n_chars = F.length("text").cast("long")
    n_nonalpha = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[^a-z ]", ""))
    ).cast("long")
    letters = n_chars - (n_words - 1)
    flagged = d.select(
        "source",
        (n_words >= MIN_WORDS).cast("int").alias("ok_minwords"),
        (n_words <= MAX_WORDS).cast("int").alias("ok_maxwords"),
        (
            (letters >= MIN_MEAN_WORDLEN * n_words)
            & (letters <= MAX_MEAN_WORDLEN * n_words)
        )
        .cast("int")
        .alias("ok_wordlen"),
        (n_nonalpha * 10 <= n_chars * MAX_NONALPHA_PER10)
        .cast("int")
        .alias("ok_charset"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.col("ok_minwords")
            * F.col("ok_maxwords")
            * F.col("ok_wordlen")
            * F.col("ok_charset")
        )
        .cast("long")
        .alias("n_pass"),
        F.sum(1 - F.col("ok_minwords")).cast("long").alias("n_fail_minwords"),
        F.sum(1 - F.col("ok_maxwords")).cast("long").alias("n_fail_maxwords"),
        F.sum(1 - F.col("ok_wordlen")).cast("long").alias("n_fail_wordlen"),
        F.sum(1 - F.col("ok_charset")).cast("long").alias("n_fail_charset"),
    )


# ---------------------------------------------------------------------------
# As-of join with a match tolerance (pandas merge_asof tolerance=)
# ---------------------------------------------------------------------------

ASOF_TOL_DAYS = 7

ASOF_TOL_ORACLE = f"""
WITH j AS (
    SELECT e.event_id, o.o_orderkey, o.o_orderdate
    FROM events e JOIN orders o
      ON e.user_id = o.o_custkey
     AND o.o_orderdate <= e.ts
     AND date_diff('day', o.o_orderdate, CAST(e.ts AS DATE))
         <= {ASOF_TOL_DAYS}
),
m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id),
best AS (
    SELECT j.event_id, max(j.o_orderkey) AS o_orderkey, m.md
    FROM j JOIN m ON j.event_id = m.event_id AND j.o_orderdate = m.md
    GROUP BY j.event_id, m.md
)
SELECT e.event_id, b.o_orderkey,
       strftime(b.md, '%Y-%m-%d') AS order_day,
       CAST(date_diff('day', b.md, CAST(e.ts AS DATE)) AS BIGINT)
           AS gap_days
FROM events e LEFT JOIN best b USING (event_id)
"""


@query("join_asof_tolerance", oracle=ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left as-of join with a 7-day tolerance: each event keeps its user's
    latest prior order only if it is at most 7 days old; stale or absent
    history yields NULLs (pandas ``merge_asof(..., tolerance=)``).

    The tolerance lives IN the join predicate, not in a post-filter: the
    range condition bounds both sides, so candidate sets shrink before the
    argmax aggregate runs — on long order histories that is the difference
    between scanning a user's lifetime and scanning one week. The final
    left join back to events restores unmatched rows; it is event-grain on
    both sides, never multiplying. 100 TB: same hash-shuffle shape as
    join_asof plus the event-id-grain left join.
    """
    t = load_tables(spark, sf_dir, ("events", "orders"))
    e = t["events"]
    j = e.join(
        t["orders"],
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("o_orderdate") <= F.col("ts"))
        & (
            F.datediff(F.to_date("ts"), F.col("o_orderdate"))
            <= ASOF_TOL_DAYS
        ),
    )
    best = j.groupBy("event_id").agg(
        F.max(F.struct("o_orderdate", "o_orderkey")).alias("m")
    )
    return (
        e.select("event_id", F.to_date("ts").alias("eday"))
        .join(best, "event_id", "left")
        .select(
            "event_id",
            F.col("m.o_orderkey").alias("o_orderkey"),
            F.date_format("m.o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.datediff("eday", F.col("m.o_orderdate"))
            .cast("long")
            .alias("gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Frequent itemsets via MLlib FPGrowth (parallel FP-growth / PFP)
# ---------------------------------------------------------------------------

FP_MIN_COUNT = 3
FP_MAX_SIZE = 3

FPGROWTH_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
singles AS (
    SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS sz, count(*) AS c
    FROM items GROUP BY l_partkey
),
pairs AS (
    SELECT CAST(a.l_partkey AS VARCHAR) || ',' ||
           CAST(b.l_partkey AS VARCHAR) AS itemset, 2 AS sz, count(*) AS c
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
),
triples AS (
    SELECT CAST(a.l_partkey AS VARCHAR) || ',' ||
           CAST(b.l_partkey AS VARCHAR) || ',' ||
           CAST(e.l_partkey AS VARCHAR) AS itemset, 3 AS sz, count(*) AS c
    FROM items a
    JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    JOIN items e
      ON a.l_orderkey = e.l_orderkey AND b.l_partkey < e.l_partkey
    GROUP BY a.l_partkey, b.l_partkey, e.l_partkey
)
SELECT itemset, CAST(sz AS BIGINT) AS size, CAST(c AS BIGINT) AS freq
FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs
      UNION ALL SELECT * FROM triples)
WHERE c >= {FP_MIN_COUNT}
"""


@query("basket_fpgrowth", oracle=FPGROWTH_ORACLE)
def basket_fpgrowth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All frequent itemsets (absolute support >= 3, size <= 3) over order
    baskets — level-wise (Apriori-style) mining expressed as DataFrame
    pair/triple expansion from sorted basket arrays.

    Originally ran MLlib's parallel FP-growth; the round-6 scale sweep
    killed that with a Java heap OOM at 10× data: under an ABSOLUTE
    support threshold, minSupport relative to 1.5M baskets is ~2e-6, so
    virtually every item in the 2M-part universe stays "frequent" and
    PFP's Java-serialized conditional trees grow with the item universe,
    not the answer. With the size cap at 3, the same lattice slice is
    exact counting: expand each sorted basket's pairs and triples
    JVM-side (nested ``transform``+``slice``, one explode per level —
    the basket_pair_support idiom), hash-aggregate each level with
    map-side partials, filter support >= 3. Per-basket fan-out is
    C(k,3) at basket size k (fixture max 17) — bounded by how much one
    customer buys, never by corpus or item-universe size, and the
    aggregates spill; sf1 now runs in seconds where PFP died. For
    unbounded baskets the standard hot-basket cap (drop size(parts) >
    bound) applies, as in basket_pair_support. The oracle enumerates the
    identical 1/2/3-way join lattice; by the Apriori property the size
    cap loses no information about what was checked.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    singles = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.col("l_partkey").cast("string").alias("itemset"),
            F.lit(1).cast("long").alias("size"),
            "freq",
        )
    )
    pair_rows = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (p1, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "p2 -> struct(p1 AS p1, p2 AS p2))))"
            )
        ).alias("c")
    ).select("c.p1", "c.p2")
    pairs = (
        pair_rows.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat_ws(",", "p1", "p2").alias("itemset"),
            F.lit(2).cast("long").alias("size"),
            "freq",
        )
    )
    triple_rows = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (p1, i) -> "
                "flatten(transform(slice(parts, i + 2, size(parts) - i - 1),"
                " (p2, j) -> "
                "transform(slice(parts, i + j + 3, size(parts) - i - j - 2), "
                "p3 -> struct(p1 AS p1, p2 AS p2, p3 AS p3))))))"
            )
        ).alias("c")
    ).select("c.p1", "c.p2", "c.p3")
    triples = (
        triple_rows.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat_ws(",", "p1", "p2", "p3").alias("itemset"),
            F.lit(3).cast("long").alias("size"),
            "freq",
        )
    )
    return (
        singles.unionByName(pairs)
        .unionByName(triples)
        .filter(F.col("freq") >= FP_MIN_COUNT)
        .select("itemset", "size", F.col("freq").cast("long").alias("freq"))
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching (CEP-lite / MATCH_RECOGNIZE analogue)
# ---------------------------------------------------------------------------

# lazy quantifier = first purchase CLOSES the open view-chain (earliest-
# completion semantics, like CEP's AFTER MATCH SKIP PAST LAST ROW)
CONVERSION_PATTERN = "v[vc]*?p"
DIRECT_PATTERN = "vp"

PATTERN_ORACLE = f"""
WITH seq AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, '{CONVERSION_PATTERN}')) AS BIGINT)
           AS n_conversions,
       CAST(len(regexp_extract_all(s, '{DIRECT_PATTERN}')) AS BIGINT)
           AS n_direct
FROM seq
"""


@query("events_pattern_match", oracle=PATTERN_ORACLE)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over each user's event stream — the
    CEP / MATCH_RECOGNIZE shape: count conversions (a view leading to a
    purchase through only views/clicks; signup/error break the chain) and
    direct view→purchase bigrams.

    Event types compress to one symbol each (the five types have distinct
    initials), so a user's entire history becomes a ~1-byte-per-event
    string and the pattern machine is a regex — leftmost non-overlapping
    with a LAZY quantifier, i.e. the first purchase closes the open chain
    (CEP's skip-past-last-row). Both engines' regex engines agree on this
    fragment (alternation-free, no backrefs). 100 TB: one shuffle to
    user grain; per-user state is the symbol string, bounded by activity,
    and the regex scan is linear — the standard distributed-CEP layout
    (symbolize, co-locate by key, run the automaton per key).
    """
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("sym"),
                        )
                    )
                ),
                lambda x: x["sym"],
            ),
            "",
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.regexp_count("s", F.lit(CONVERSION_PATTERN))
        .cast("long")
        .alias("n_conversions"),
        F.regexp_count("s", F.lit(DIRECT_PATTERN))
        .cast("long")
        .alias("n_direct"),
    )


# ---------------------------------------------------------------------------
# A/B test z-score (two-proportion test on hash-assigned variants)
# ---------------------------------------------------------------------------

AB_ZTEST_ORACLE = """
WITH assigned AS (
    SELECT user_id,
           (user_id * 2654435761) % 4294967296 % 2 AS variant,
           CASE WHEN max(CASE WHEN event_type = 'purchase'
                              THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                              ELSE 0 END) > 9000
                THEN 1 ELSE 0 END AS converted
    FROM events
    GROUP BY user_id
),
counts AS (
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(converted) AS BIGINT) AS conv
    FROM assigned GROUP BY variant
),
wide AS (
    SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
           max(CASE WHEN variant = 0 THEN conv END) AS c0,
           max(CASE WHEN variant = 1 THEN n END) AS n1,
           max(CASE WHEN variant = 1 THEN conv END) AS c1
    FROM counts
)
SELECT n0, c0, n1, c1,
       floor((CAST(c0 AS DOUBLE) / n0) * 10000 + 0.5) / 10000 AS p0,
       floor((CAST(c1 AS DOUBLE) / n1) * 10000 + 0.5) / 10000 AS p1,
       CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
            ELSE floor((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1))
                 * 10000 + 0.5) / 10000 END AS z
FROM wide
"""


@query("events_ab_ztest", oracle=AB_ZTEST_ORACLE)
def events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 experiment split:
    variant = knuth(user_id) mod 2, conversion = any purchase over $90
    (the any-purchase metric saturates at 100% in the fixtures); the
    pooled-variance z statistic decides whether variants differ.

    Everything until the final statistic is exact integers (user-grain
    conversion flags, per-variant counts); the z-score itself is ONE
    pinned-shape IEEE expression evaluated on identical inputs in both
    engines (the rolling-corr technique). Hash assignment makes the
    experiment reproducible and nested — adding users never reshuffles
    existing assignments (the same property the samplers pin).
    100 TB: one shuffle to user grain, one 2-row aggregate, and the
    statistic is driver-free scalar arithmetic in the plan.
    """
    e = load_table(spark, sf_dir, "events")
    purchase_cents = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
    ).otherwise(0)
    assigned = e.groupBy("user_id").agg(
        (F.max(purchase_cents) > 9000).cast("int").alias("converted")
    ).select(
        F.pmod(F.pmod(F.col("user_id") * 2654435761, F.lit(4294967296)), 2)
        .alias("variant"),
        "converted",
    )
    counts = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = counts.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.sqrt(
        pp
        * (1 - pp)
        * (
            F.lit(1).cast("double") / F.col("n0")
            + F.lit(1).cast("double") / F.col("n1")
        )
    )
    hr4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    # degenerate experiment (0% or 100% pooled conversion): zero pooled
    # variance, the statistic is undefined -- honestly NULL on both sides
    degenerate = (
        (F.col("c0") + F.col("c1") == 0)
        | (F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1"))
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        hr4(p0).alias("p0"),
        hr4(p1).alias("p1"),
        F.when(~degenerate, hr4(z)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Session duration histogram (composition: sessionize → bucket → count)
# ---------------------------------------------------------------------------

SESSION_HIST_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     < INTERVAL 30 MINUTE
                THEN 0 ELSE 1 END AS new_s
    FROM events
),
sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
),
durs AS (
    SELECT user_id, sid,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
)
SELECT CASE WHEN dur_s = 0 THEN '0_single'
            WHEN dur_s < 600 THEN '1_under10m'
            WHEN dur_s < 1800 THEN '2_10to30m'
            ELSE '3_over30m' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(dur_s) AS BIGINT) AS total_seconds
FROM durs
GROUP BY 1
"""


@query("session_duration_hist", oracle=SESSION_HIST_ORACLE)
def session_duration_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session lengths: sessionize (30-min gap), measure
    each session's span in whole seconds, bucket into named duration
    classes — the one-glance session-health report.

    Durations are integer microseconds floor-divided to seconds, so the
    bucket edges are exact integer comparisons on both engines (the same
    lag/cumsum sessionization the window_session oracle pins). Single-
    event sessions land in their own bucket rather than polluting the
    short-session class. 100 TB: one user shuffle for the session window,
    then session-grain rows only — the histogram is a 4-row aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            < 30 * 60 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_s"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(w_run))
    durs = sess.groupBy("user_id", "sid").agg(
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bucket = (
        F.when(F.col("dur_s") == 0, "0_single")
        .when(F.col("dur_s") < 600, "1_under10m")
        .when(F.col("dur_s") < 1800, "2_10to30m")
        .otherwise("3_over30m")
    )
    return durs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("dur_s").cast("long").alias("total_seconds"),
    )
