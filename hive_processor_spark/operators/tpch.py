"""Decision-support query shapes (TPC-H Q15/Q17/Q18/Q22 adapted to the
fixture's column subset) — the correlated-aggregate / having / anti-join
composites that stress-test optimizer behavior beyond single-operator
queries.

Scale posture: every per-key aggregate here is partial→final; the
correlated comparisons (Q17's per-part average, Q15's max revenue, Q22's
global average) become joins against small aggregate sides that broadcast;
Q22's "no orders" is a shuffle-free-able anti join. All float sums use the
exact.py quantized discipline, so threshold comparisons (revenue = max,
quantity < 0.2·avg, balance > avg) are bit-identical in both engines —
boundary rows cannot flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.exact import dsum, sql_dsum
from hive_processor_spark.sources.tables import load_table


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 4) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue per supplier over a quarter, keep the max.
    The "= MAX(...)" correlated comparison is safe only because revenue is
    a quantized exact sum — with plain double sums the max could differ
    between engines by 1 ulp and return different suppliers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_qty_revenue",
    f"""
    WITH pa AS (
        SELECT l_partkey,
               0.2 * ({sql_dsum('l_quantity')} / COUNT(*)) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND({sql_dsum('l.l_extendedprice')} / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'SMALL'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_threshold
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from below-average-quantity lines of one part
    class. The correlated per-part average becomes a join against the
    per-part aggregate (broadcastable here; shuffle join at scale); the
    0.2·avg threshold is quantized-exact, so boundary lines agree across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    pa = li.groupBy("l_partkey").agg(
        (0.2 * (dsum("l_quantity") / F.count(F.lit(1)))).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(dsum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "tpch_q18_large_orders",
    f"""
    WITH big AS (
        SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {sql_dsum('l_quantity')} > 250.0
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total line quantity exceeds a threshold,
    decorated with customer info. The HAVING filter shrinks the join input
    to the rare heavy orders before either join; at scale that aggregate
    is the only full-lineitem pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q22_inactive_wealthy",
    f"""
    WITH avg_bal AS (
        SELECT {sql_dsum('c_acctbal')} / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND({sql_dsum('c.c_acctbal')}, 4) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_orderdate >= DATE '1997-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def tpch_q22_inactive_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders, grouped
    by segment (the order side sliced to recent urgent orders so inactivity
    actually occurs at fixture density). The global average is a broadcast
    scalar; "no orders" is a
    left-anti join (never a correlated per-row subquery at scale); the
    average threshold is quantized so both engines cut the same boundary."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.to_date(F.lit("1997-01-01")))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(dsum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
