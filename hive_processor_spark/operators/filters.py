"""Filter / projection / predicate operators (SURVEY.md §2.2-B).

All predicates are plain Catalyst expressions — they stay inside
whole-stage codegen and are eligible for Parquet pushdown; none of them
require Python execution. Per-row derived doubles are floor-quantized
(``FLOOR(x*10^k)/10^k``) rather than rounded: both engines floor the same
IEEE double identically, whereas half-up/half-even rounding diverges on the
exact decimal ties this data is full of (see functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


def floor_q(c: Column, scale: int = 2) -> Column:
    """Deterministic fixed-scale quantization of a double expression."""
    factor = float(10**scale)
    return F.floor(c * F.lit(factor)) / F.lit(factor)


def sql_floor_q(expr: str, scale: int = 2) -> str:
    factor = float(10**scale)
    return f"(FLOOR(({expr}) * {factor!r}) / {factor!r})"


@register(
    "filter_compare",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag
    FROM lineitem
    WHERE (l_quantity >= 30.0 AND l_discount < 0.05)
       OR (NOT (l_returnflag = 'N') AND l_tax > 0.07)
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") >= 30.0) & (F.col("l_discount") < 0.05)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_tax") > 0.07)
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_returnflag"
    )


@register(
    "filter_in",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "filter_between",
    """
    SELECT l_orderkey, l_linenumber, STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1996-12-31"))
        )
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


@register(
    "filter_like",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE (p_name LIKE '%red%' OR p_name LIKE 'sm%') AND p_name NOT LIKE '%bolt%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pred = (F.col("p_name").like("%red%") | F.col("p_name").like("sm%")) & (
        ~F.col("p_name").like("%bolt%")
    )
    return part.filter(pred).select("p_partkey", "p_name")


@register(
    "filter_null",
    """
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixtures contain zero NULLs (measured) — IS NULL paths are exercised
    on nulls synthesized via NULLIF."""
    cust = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.select("c_custkey", seg.alias("seg")).filter(F.col("seg").isNull())


@register(
    "project_arith",
    f"""
    SELECT l_orderkey, l_linenumber,
           {sql_floor_q('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charge,
           {sql_floor_q('l_extendedprice - l_quantity * 100.0')} AS spread,
           l_orderkey % 7 AS bucket
    FROM lineitem
    """,
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    spread = F.col("l_extendedprice") - F.col("l_quantity") * F.lit(100.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        floor_q(charge).alias("charge"),
        floor_q(spread).alias("spread"),
        (F.col("l_orderkey") % 7).alias("bucket"),
    )


@register(
    "project_case",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10.0 THEN 'low'
                WHEN l_quantity < 25.0 THEN 'mid'
                ELSE 'high' END AS qty_band
    FROM lineitem
    """,
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10.0, "low")
        .when(F.col("l_quantity") < 25.0, "mid")
        .otherwise("high")
    )
    return li.select("l_orderkey", "l_linenumber", band.alias("qty_band"))


@register(
    "project_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS DOUBLE) AS ln_d,
           CAST(l_orderkey AS VARCHAR) AS ok_s,
           CAST(FLOOR(l_quantity) AS INT) AS qty_i,
           STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_s
    FROM lineitem
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int↔double↔string↔date casts, restricted to directions where Spark
    (ANSI) and DuckDB agree; double→int goes through FLOOR because bare
    casts disagree (Spark truncates, DuckDB rounds)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("double").alias("ln_d"),
        F.col("l_orderkey").cast("string").alias("ok_s"),
        F.floor("l_quantity").cast("int").alias("qty_i"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_s"),
    )
