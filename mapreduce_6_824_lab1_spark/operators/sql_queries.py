"""SQL entry point: TPC-H-style analytics via ``spark.sql``.

The reference has no SQL surface (its API is mapF/reduceF plugins), but the
rebuild's users get Spark's full SQL front end for free. These queries are
written in the ANSI dialect BOTH engines parse, so the ORACLE STRING IS THE
QUERY STRING — zero drift by construction. Date constants are adapted to the
fixture's order span (1995-2001) and real TPC-H dimension values (region
names, market segments).

Scale: identical plans to the DataFrame formulations — Catalyst doesn't care
which front end built the logical plan. Q3/Q5/Q10 are the classic star-join
shapes: dims broadcast, facts shuffle once for the join key, partial aggs
before the group-by shuffle, TakeOrderedAndProject for the LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_6_824_lab1_spark.catalog import load_tables
from mapreduce_6_824_lab1_spark.registry import query

Q3_SQL = """
SELECT o_orderkey,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01'
  AND l_shipdate  > TIMESTAMP '1996-06-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

Q5_SQL = """
SELECT n_name,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_SQL_TABLES = ("customer", "orders", "lineitem", "supplier", "nation", "region")


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    for name, df in load_tables(spark, sf_dir, _SQL_TABLES).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)


@query("sql_tpch_q3", oracle=Q3_SQL)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top unshipped orders by revenue."""
    return _run_sql(spark, sf_dir, Q3_SQL)


@query("sql_tpch_q5", oracle=Q5_SQL)
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation within a region,
    with the classic c_nationkey = s_nationkey locality constraint."""
    return _run_sql(spark, sf_dir, Q5_SQL)


@query("sql_tpch_q10", oracle=Q10_SQL)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top customers by returned revenue."""
    return _run_sql(spark, sf_dir, Q10_SQL)


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 180
)
GROUP BY c_custkey, c_name, o_orderkey
"""


@query("sql_tpch_q18", oracle=Q18_SQL)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): grouped IN-subquery with HAVING —
    Catalyst rewrites the subquery to a left-semi join on the aggregated
    lineitem; both engines parse the identical SQL text."""
    return _run_sql(spark, sf_dir, Q18_SQL)


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       floor((sum(volume)) * 100 + 0.5) / 100 AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
        OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("sql_tpch_q7", oracle=Q7_SQL)
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the nation table joined TWICE under
    different aliases with a disjunctive cross-nation predicate."""
    return _run_sql(spark, sf_dir, Q7_SQL)
