"""Semantic and plan invariants for wave-95 operators (aggregate
pushdown, ANALYZE stats audit, maxRecordsPerFile sink)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_aggregate_pushdown_values_and_plan(spark):
    res = _Q["scan_aggregate_pushdown"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    assert res["n_rows"] == len(o)
    assert res["min_price"] == pytest.approx(o["o_totalprice"].min())
    assert res["max_price"] == pytest.approx(o["o_totalprice"].max())
    assert res["min_key"] == o["o_orderkey"].min()
    assert res["max_key"] == o["o_orderkey"].max()
    # the pushdown actually fires: rebuild the plan under the conf and
    # look for PushedAggregation in the v2 scan
    prev = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    prev_list = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{SF_DIR}/orders.parquet").agg(
            F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*)" in plan or "PushedAggregation" in plan
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev)
        if prev_list is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", prev_list)


def test_catalog_stats_fresh(spark):
    res = _Q["catalog_analyze_stats"](spark, SF_DIR).toPandas().iloc[0]
    # catalog row count equals the actual scan, and distinct estimate for
    # a unique key is within HLL tolerance of truth
    assert res["stats_fresh"] == 1
    assert res["catalog_rows"] == res["actual_rows"]
    assert res["catalog_distinct"] == pytest.approx(
        res["actual_distinct"], rel=0.1
    )


def test_max_records_per_file_contract(spark):
    res = _Q["sink_max_records_per_file"](spark, SF_DIR).toPandas().iloc[0]
    assert res["all_files_within_cap"] == 1
    assert res["n_files"] == math.ceil(res["rows_written"] / 400)
