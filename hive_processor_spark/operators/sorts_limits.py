"""Sorts, limits, top-k (SURVEY.md §2.2-F).

Determinism rule: any query whose *row set* depends on order (LIMIT/OFFSET/
top-k) orders by a key chain that is provably unique in the fixtures. Null
ordering is always explicit — Spark defaults NULLS FIRST on ASC, DuckDB
NULLS LAST.

Scale note: ``ORDER BY … LIMIT k`` plans as TakeOrderedAndProject — each
partition keeps its local top-k and only k×partitions rows reach the driver;
a global sort only materializes for unbounded ORDER BY output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


@register(
    "sort_multi",
    """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_nationkey", "c_acctbal").orderBy(
        F.asc("c_nationkey"), F.desc("c_acctbal")
    )


@register(
    "sort_nulls",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st
    FROM orders
    ORDER BY st DESC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized nulls sorted with an explicit NULLS FIRST; the LIMIT makes
    the null-ordering observable in the row set."""
    orders = load_table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select("o_orderkey", st.alias("st"))
        .orderBy(F.col("st").desc_nulls_first(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
    )


@register(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
