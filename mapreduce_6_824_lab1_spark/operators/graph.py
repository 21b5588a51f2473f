"""Iterative graph analytics — PageRank over a derived source-link graph.

PageRank is the MapReduce paper's marquee iterative application (the
original motivation for the "chain of MapReduce jobs" pattern; MIT 6.824
Lab 1's wordcount/indexer apps are its warm-ups — /root/reference/README.md
is a stub, so lineage is to the published paper, not checkout code). Each
iteration is one map (emit rank/out_degree along each edge) + one reduce
(sum contributions per target): exactly the shape ``dedup_clusters``
already proved for connected components.

Graph derivation (pure relational, deterministic): document *i*'s source
"links to" the source of document *i + (n_chars(i) mod 7) + 1* — a
content-dependent skip so the digraph is irregular (a plain *i → i+1*
chain degenerates to a perfect cycle under the corpus's round-robin
doc→source assignment, which makes PageRank uniform and the query
vacuous). Edge weight = number of such transitions; a weighted,
self-loop-including digraph over ~20 source nodes at test SFs, millions
at corpus scale.

Scale shape per iteration (the whole point):
- the normalized edge list is the loop invariant — partitioned by ``src``
  once and reused every iteration (a production loop persists it; at test
  scale we stay fully lazy and let the 3-deep plan recompute it);
- contributions: one shuffle on ``src`` (join ranks→edges), one partial-
  aggregated shuffle on ``dst`` — traffic O(edges), never O(nodes²);
- node count rides along as a broadcast 1-row aggregate (no collect);
- fixed iteration count ⇒ no driver-side action at all: the whole
  3-iteration rank is ONE lazy plan, and the DuckDB oracle unrolls the
  same three steps as CTEs.

Dangling nodes (no out-edges) leak their mass rather than redistributing
it — the simplification is applied identically in the oracle, so parity is
exact. With the citation-chain derivation every source except possibly the
chain tail has out-edges, so the leak is at most one node's damped rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.functions.numeric import hround, sql_hround
from mapreduce_6_824_lab1_spark.registry import query

DAMPING = 0.85
TELEPORT = 0.15
PR_ITERATIONS = 3


def _iter_cte(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""r{i} AS (
    SELECT nodes.node,
           {TELEPORT} / nn.n
           + {DAMPING} * coalesce(sum({prev}.rank * e.nw), 0) AS rank
    FROM nodes CROSS JOIN nn
    LEFT JOIN enorm e ON e.dst = nodes.node
    LEFT JOIN {prev} ON {prev}.node = e.src
    GROUP BY nodes.node, nn.n
)"""


PAGERANK_ORACLE = f"""
WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
edges AS (
    SELECT a.source AS src, b.source AS dst, count(*) AS w
    FROM docs a JOIN docs b ON b.doc_id = a.doc_id + (a.n_chars % 7) + 1
    GROUP BY 1, 2
),
enorm AS (
    SELECT src, dst, w * 1.0 / sum(w) OVER (PARTITION BY src) AS nw
    FROM edges
),
nodes AS (SELECT DISTINCT source AS node FROM docs),
nn AS (SELECT count(*) * 1.0 AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
{",".join(_iter_cte(i) for i in range(1, PR_ITERATIONS + 1))}
SELECT node AS source, {sql_hround("rank", 6)} AS rank
FROM r{PR_ITERATIONS}
"""


@query("pagerank_sources", oracle=PAGERANK_ORACLE)
def pagerank_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 3 fixed iterations) over the source graph."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    linked = docs.select(
        (F.col("doc_id") + F.col("n_chars") % 7 + 1).alias("target_id"),
        F.col("source").alias("src"),
    )
    succ = docs.select(F.col("doc_id").alias("tid"), F.col("source").alias("dst"))
    edges = (
        linked.join(succ, linked["target_id"] == succ["tid"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # normalize by out-weight with a window on src: stays on the same
    # partitioning as the groupBy above — no extra shuffle, no outw join
    from pyspark.sql.window import Window

    ow = F.sum("w").over(Window.partitionBy("src"))
    enorm = edges.select("src", "dst", (F.col("w") / ow).alias("nw"))
    nodes = docs.select(F.col("source").alias("node")).distinct()
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.crossJoin(broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(PR_ITERATIONS):
        contribs = (
            ranks.join(enorm, ranks["node"] == enorm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("nw")).alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(broadcast(n_df))
            .join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT) / F.col("n")
                    + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("source"), hround("rank", 6).alias("rank")
    )


# ---------------------------------------------------------------------------
# Triangle counting — the other canonical "graph as a chain of MapReduce
# jobs" application (node-iterator join algorithm). Triangles are counted
# once each by canonically ordering every undirected edge (u < v) and
# closing wedges u->v->w with the u->w edge, u < v < w.
#
# Scale shape: two equi-joins on node keys. Wedge generation is the
# quadratic risk (Σ deg(v)²); production orients edges from lower- to
# higher-degree endpoint so every wedge pivots on its lowest-degree node,
# bounding the blow-up — noted here, skipped at fixture scale where the
# lexicographic orientation is exact and cheaper. Per-node participation is
# an explode + one partial-agg shuffle.
# ---------------------------------------------------------------------------

TRIANGLES_ORACLE = """
WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
ed AS (
    SELECT DISTINCT a.source AS src, b.source AS dst
    FROM docs a JOIN docs b ON b.doc_id = a.doc_id + (a.n_chars % 7) + 1
    WHERE a.source <> b.source
),
und AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM ed
),
tri AS (
    SELECT w.u AS x, w.v AS y, e2.v AS z
    FROM (SELECT e0.u, e0.v, e1.v AS w_end
          FROM und e0 JOIN und e1 ON e1.u = e0.v) w(u, v, w_end)
    JOIN und e2 ON e2.u = w.u AND e2.v = w.w_end
),
per_node AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
SELECT node AS source, count(*) AS n_triangles
FROM per_node GROUP BY node
"""


@query("graph_triangles", oracle=TRIANGLES_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the derived source graph."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    linked = docs.select(
        (F.col("doc_id") + F.col("n_chars") % 7 + 1).alias("target_id"),
        F.col("source").alias("src"),
    )
    succ = docs.select(F.col("doc_id").alias("tid"), F.col("source").alias("dst"))
    und = (
        linked.join(succ, linked["target_id"] == succ["tid"])
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    e0, e1, e2 = und.alias("e0"), und.alias("e1"), und.alias("e2")
    wedges = e0.join(e1, F.col("e0.v") == F.col("e1.u")).select(
        F.col("e0.u").alias("x"), F.col("e0.v").alias("y"), F.col("e1.v").alias("z")
    )
    tri = wedges.join(
        e2, (F.col("x") == F.col("e2.u")) & (F.col("z") == F.col("e2.v"))
    ).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
