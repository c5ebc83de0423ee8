"""Caching / serving plane (SURVEY.md §2.2-L) — the Redis analog.

The reference hands every handler a per-request Redis client for KV caching
(reference ``src/processor.ts:69``, ``return_buffers: true``). In-engine,
the hot-dataset role is played by ``df.cache()`` (in-memory columnar, zero
serialization boundary) and the small-dimension KV-lookup role by broadcast
hash joins (the dim table ships once to every executor — O(dim) memory,
zero shuffle of the probe side, exactly a distributed HGET).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.exact import dsum, sql_dsum
from hive_processor_spark.sources.tables import load_table


@register(
    "cache_table",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a materialized hot copy; cached results must equal
    uncached (the oracle runs the uncached equivalent).

    ``localCheckpoint`` rather than ``cache()``: a plain ``cache()`` enters
    the session-wide CacheManager, which then silently substitutes the
    InMemoryRelation into *every* later plan scanning the same path —
    defeating parquet filter pushdown engine-wide and, at 100 TB, pinning a
    whole fact table in executor memory as a side effect of one query.
    ``localCheckpoint`` materializes to executor storage for this lineage
    only (the per-request Redis client of the reference, not a global one).
    """
    li = load_table(spark, sf_dir, "lineitem").localCheckpoint(eager=True)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "cache_broadcast_lookup",
    """
    SELECT c_custkey, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def cache_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension KV lookup as a broadcast join (Redis HGET analog)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")


@register("plan_broadcast_threshold_audit")
def plan_broadcast_threshold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy selection audit: the same customer⋈nation query is
    planned twice — once with the default autoBroadcastJoinThreshold
    (the 25-row nation dim must broadcast) and once with the threshold
    disabled (-1, forcing the sort-merge/shuffle-hash path) — and the
    audit pins (a) which physical join each plan chose and (b) that
    both strategies return IDENTICAL results (row count and an
    order-insensitive checksum). This is the regression guard for the
    single most scale-critical planner decision this engine leans on
    (every ``F.broadcast`` hint in the repo assumes the strategy
    boundary behaves); a platform upgrade that silently flips it
    shows up here as a changed strategy column, not as a mystery 10×
    shuffle at 100 TB. Tier R: plan introspection has no DuckDB twin.

    Scale: the audit query itself is dim-sized; run cost is two tiny
    plans."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def run(threshold: str):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        try:
            df = (
                c.join(n, c.c_nationkey == n.n_nationkey)
                .groupBy("n_name")
                .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "BroadcastHashJoin" in plan:
                strat = "broadcast_hash"
            elif "SortMergeJoin" in plan:
                strat = "sort_merge"
            elif "ShuffledHashJoin" in plan:
                strat = "shuffled_hash"
            else:
                strat = "other"
            rows = df.collect()
            chk = sum(hash((r["n_name"], r["n_cust"])) for r in rows) % (1 << 31)
            return strat, len(rows), chk
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    s_def, n_def, c_def = run("10485760")
    s_off, n_off, c_off = run("-1")
    return spark.createDataFrame(
        [
            (
                s_def,
                s_off,
                n_def,
                n_off,
                int(n_def == n_off and c_def == c_off),
            )
        ],
        "strategy_default string, strategy_disabled string,"
        " rows_default bigint, rows_disabled bigint, results_identical int",
    )


@register("profile_float_sum_stability")
def profile_float_sum_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demonstration behind this repo's exact.py discipline: the
    SAME revenue total is computed as a naive SUM(double) under three
    different partitionings (1, 8, 64) and as the floor-quantized
    decimal sum. The naive sums disagree across layouts (tree-
    aggregation order changes, IEEE addition is not associative) while
    the quantized sum is bit-identical — the measured spread IS the
    reason every hash-gated operator routes float folds through
    integer quantization, and the reason a 100 TB job re-planned by
    AQE would otherwise publish a different total than yesterday's
    run. Tier R (the op's point is engine-layout behavior, which a
    single-threaded DuckDB oracle cannot exhibit); the quantized
    invariance and the nonzero-spread expectation are pinned in
    tests.

    Scale: three aggregations of one column + one quantized pass."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    naive = []
    for parts in (1, 8, 64):
        v = (
            li.repartition(parts)
            .agg(F.sum("l_extendedprice").alias("s"))
            .collect()[0]["s"]
        )
        naive.append(float(v))
    quantized = [
        float(
            li.repartition(parts)
            .agg(
                (
                    F.sum(
                        F.floor(F.col("l_extendedprice") * 1e4).cast(
                            "decimal(28,0)"
                        )
                    ).cast("double")
                    / 1e4
                ).alias("s")
            )
            .collect()[0]["s"]
        )
        for parts in (1, 8, 64)
    ]
    spread = max(naive) - min(naive)
    qspread = max(quantized) - min(quantized)
    return spark.createDataFrame(
        [
            (
                naive[0],
                naive[1],
                naive[2],
                spread,
                quantized[0],
                qspread,
                int(qspread == 0.0),
            )
        ],
        "naive_p1 double, naive_p8 double, naive_p64 double,"
        " naive_spread double, quantized_total double,"
        " quantized_spread double, quantized_stable int",
    )
