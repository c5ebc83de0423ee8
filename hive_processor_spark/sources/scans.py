"""Scan-path operators (SURVEY.md §2.2-A, non-roundtrip half).

These look trivial at sf0.01 but encode the 100 TB posture: projection and
filter are expressed declaratively so Catalyst pushes them into the Parquet
scan (column pruning + row-group predicate pushdown — `ReadSchema` /
`PushedFilters` in explain; asserted in tests/test_plans.py). A scan that
reads all 11 lineitem columns for a 3-column projection would be wrong at
scale, not just slow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table, register_views


@register("scan_full", "SELECT * FROM region ORDER BY r_regionkey")
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").orderBy("r_regionkey")


@register(
    "scan_projection",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "scan_filter_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 3.0 AND l_returnflag = 'R'
    """,
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result is identical to a plain WHERE; the point is *where* the
    predicate runs — tests assert it reaches the Parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") < 3.0) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


_CATALOG_SQL = """
SELECT n.n_name, r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


@register("catalog_view_sql", _CATALOG_SQL)
def catalog_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temp-view + SQL entry point: the same SQL text runs on the Spark
    catalog and on the DuckDB oracle (the reference's analog is handlers
    issuing SQL strings to Postgres, reference src/processor.ts:26)."""
    register_views(spark, sf_dir)
    return spark.sql(_CATALOG_SQL)
