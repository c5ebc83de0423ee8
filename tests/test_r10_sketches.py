"""Round-10 sketch promotions (agg_approx_distinct / agg_approx_quantile /
agg_hll_merge / agg_approx_topk): the operators moved off engine-internal
sketches (HLL++, GK summaries, approx_top_k tracking maps) onto
engine-mirrorable ones (KMV, quantized histogram, count-min) so the
ESTIMATES carry full value-level DuckDB oracles. These tests keep the
built-ins as an independent cross-check family (the MLlib-minhash
discipline) and pin the estimators' accuracy and merge properties.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from hive_processor_spark import queries
from hive_processor_spark.operators.aggregates import (
    _AD_KMV_K,
    _kmv_hash_spark,
)
from hive_processor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
_QUERIES = queries()


def test_kmv_distinct_tracks_exact_and_hll(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact_p = li.select("l_partkey").distinct().count()
    exact_o = li.select("l_orderkey").distinct().count()
    got = _QUERIES["agg_approx_distinct"](spark, SF_DIR).head()
    # KMV at k=1024: σ ≈ 1/√(k-2) ≈ 3.1%; pin at 10%.
    assert abs(got["approx_parts"] - exact_p) / exact_p < 0.10
    assert abs(got["approx_orders"] - exact_o) / exact_o < 0.10
    # independent sketch family: HLL++ built-in agrees with exact too
    hll = li.agg(
        F.approx_count_distinct("l_partkey").alias("p"),
        F.approx_count_distinct("l_orderkey").alias("o"),
    ).head()
    assert abs(hll["p"] - exact_p) / exact_p < 0.10
    assert abs(hll["o"] - exact_o) / exact_o < 0.10


def test_kmv_merge_equals_global_sketch(spark):
    """The union-merge property the operator demonstrates: the k smallest
    of the per-group k-smallest sets ARE the global k smallest — exact
    frame equality, not an accuracy bound."""
    orders = load_table(spark, SF_DIR, "orders")
    h = _kmv_hash_spark("o_custkey").alias("h")
    global_state = [
        r["h"]
        for r in orders.select(h).distinct().orderBy("h").limit(_AD_KMV_K).collect()
    ]
    dh = orders.select("o_orderpriority", h).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("h")
    merged = [
        r["h"]
        for r in dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _AD_KMV_K)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(_AD_KMV_K)
        .collect()
    ]
    assert merged == global_state


def test_hll_merge_operator_tracks_exact_and_builtin(spark):
    orders = load_table(spark, SF_DIR, "orders")
    exact = orders.select("o_custkey").distinct().count()
    got = _QUERIES["agg_hll_merge"](spark, SF_DIR).head()
    assert abs(got["merged_estimate"] - exact) / exact < 0.10
    # groupwise-exact sum ≥ true distinct (customers span priorities)
    assert got["sum_groupwise_exact"] >= exact
    # the DataSketches built-in merge pipeline, kept as a cross-check
    per_group = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    hll = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).head()["e"]
    assert abs(hll - exact) / exact < 0.10


def test_histogram_quantiles_within_half_bucket(spark):
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    got = _QUERIES["agg_approx_quantile"](spark, SF_DIR).head()
    for p, name in [(0.5, "approx_p50"), (0.9, "approx_p90")]:
        k = math.ceil(p * n)
        type1 = (
            orders.select("o_totalprice")
            .orderBy("o_totalprice")
            .limit(k)
            .agg(F.max("o_totalprice"))
            .head()[0]
        )
        # bucket-midpoint estimate: within half a $10 bucket of the
        # type-1 order statistic by construction
        assert abs(got[name] - type1) <= 5.0 + 1e-9, (name, got[name], type1)
        # GK cross-check: percentile_approx lands in the same neighborhood
        gk = orders.agg(
            F.percentile_approx("o_totalprice", F.lit(p), F.lit(10000))
        ).head()[0]
        assert abs(gk - type1) / max(type1, 1.0) < 0.01


def test_cms_topk_exact_at_fixture_scale(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    got = _QUERIES["agg_approx_topk"](spark, SF_DIR).collect()
    assert {r["l_partkey"] for r in got} == {r["l_partkey"] for r in exact}
    # CMS guarantees est >= true per key
    true_n = {r["l_partkey"]: r["n"] for r in exact}
    for r in got:
        assert r["est_n"] >= true_n[r["l_partkey"]]
    # the Spark built-in frequent-items sketch, kept as a cross-check
    from hive_processor_spark.sources.tables import register_views

    register_views(li.sparkSession, SF_DIR)
    rows = li.sparkSession.sql(
        "SELECT t.item AS k, t.count AS n FROM ("
        " SELECT EXPLODE(approx_top_k(l_partkey, 10, 1000000)) AS t"
        " FROM lineitem) ORDER BY n DESC, k"
    ).collect()
    # tie-robust: the built-in breaks rank-10 ties engine-internally (the
    # reason it was Tier-R), so compare the count PROFILE, not the keys
    assert sorted((r["n"] for r in rows), reverse=True) == sorted(
        (r["n"] for r in exact), reverse=True
    )
