"""Set operations (SURVEY.md §2.2-G).

Output column names follow the left input (both engines agree), so oracles
alias the right side only where needed. ``set_except``/``set_intersect``
use customers-without-orders — non-trivial by fixture construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


@register(
    "set_union_all",
    """
    SELECT c_nationkey AS nkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nkey")
    )
    return cust.unionByName(supp)


@register(
    "set_union",
    """
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nkey")
    )
    return cust.unionByName(supp).distinct()


@register(
    "set_intersect",
    """
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.intersect(orders)


@register(
    "set_except",
    """
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering customers outside the BUILDING segment (EXCEPT DISTINCT)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders.subtract(building)


@register(
    "dedup_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, CAST(YEAR(l_shipdate) AS INT) AS ship_year
    FROM lineitem
    """,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).distinct()


@register(
    "set_except_all",
    """
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS o_custkey FROM customer
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: multiplicities subtract instead of the
    distinct set difference (a customer with 12 orders keeps 11 rows)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return orders.exceptAll(cust)


@register(
    "set_intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber = 1
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber = 2
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL: min multiplicity per value survives."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "set_union_evolved",
    """
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
           c_mktsegment AS mktsegment
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal,
           NULL AS mktsegment
    FROM supplier
    """,
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across evolved schemas: the supplier side lacks mktsegment,
    so ``unionByName(allowMissingColumns=True)`` aligns by NAME and
    NULL-fills the gap — the append path when a long-lived table grew a
    column and old extracts haven't. (Positional UNION would silently
    misalign; the oracle spells the NULL fill explicitly.)"""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@register(
    "set_symmetric_diff",
    """
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        (SELECT DISTINCT k FROM a EXCEPT SELECT DISTINCT k FROM b)
        UNION ALL
        (SELECT DISTINCT k FROM b EXCEPT SELECT DISTINCT k FROM a)
    )
    GROUP BY k
    ORDER BY k
    """,
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference (customers with only-finished XOR only-open
    orders): both EXCEPT directions unioned — the membership-drift query
    between two snapshots. Each EXCEPT is a hash anti-join on the key;
    the final count is a formality (symmetric difference is dup-free) that
    pins bag semantics in the oracle comparison."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    sym = a.distinct().exceptAll(b.distinct()).unionAll(
        b.distinct().exceptAll(a.distinct())
    )
    return (
        sym.groupBy("k").agg(F.count(F.lit(1)).alias("n")).orderBy("k")
    )
