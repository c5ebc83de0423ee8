"""Source/sink round-trips (SURVEY.md §2.2-A): CSV, JSON-lines, Parquet,
partitioned Parquet.

Each query materializes a fixture table through the format under test into a
scratch directory, reads it back, and returns the re-read result; the oracle
is the original table, so any loss in the round-trip (types, precision,
partition pruning) breaks the hash.

Scale note: writes use the table's natural partitioning; `sink_partitioned`
lays data out by a low-cardinality column — the layout that makes dynamic
partition pruning possible on the read side of a 100 TB table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table

_SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/hive_spark_scratch")


def _scratch(tag: str) -> str:
    os.makedirs(_SCRATCH_ROOT, exist_ok=True)
    return tempfile.mkdtemp(prefix=f"{tag}-", dir=_SCRATCH_ROOT)


@register("scan_csv_roundtrip", "SELECT * FROM nation")
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "nation")
    path = _scratch("csv")
    src.write.mode("overwrite").option("header", "true").csv(path)
    # Read back with the source schema (CSV carries no types; inference
    # would widen int32 → int and break schema parity).
    return spark.read.option("header", "true").schema(src.schema).csv(path)


@register("scan_json_roundtrip", "SELECT * FROM supplier")
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "supplier")
    path = _scratch("json")
    src.write.mode("overwrite").json(path)
    return spark.read.schema(src.schema).json(path)


@register(
    "sink_parquet_roundtrip",
    "SELECT * FROM orders WHERE o_totalprice > 400000.0",
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    path = _scratch("parquet")
    src.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "sink_partitioned",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write, re-read, count per partition. The
    re-read count runs off directory metadata + partition column only —
    the same layout that gives static/dynamic partition pruning at scale."""
    src = load_table(spark, sf_dir, "orders")
    path = _scratch("part")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("o_orderstatus").cast("string").alias("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
