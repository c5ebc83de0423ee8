"""Data-profiling / data-quality operators — the "what is in this table"
pass every ingestion pipeline runs before trusting 100 TB of new data
(reference parity: the hive-processor surface exposes ad-hoc SQL; these are
the canned quality queries a user of it runs constantly).

Scale posture: each profile is ONE full-table aggregation pass computing
every per-column metric simultaneously (partial→final, map-side combined),
then a constant-size reshape to long form — never one scan per column. The
SCD2 builder is a per-key window (shuffle on the entity key, parallel
across keys); the point-in-time probe is a filter over the interval table,
which at scale sits partitioned/z-ordered by validity range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table

_ORDERS_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}
_ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle() -> str:
    parts = []
    for c in _ORDERS_COLS:
        if c in _ORDERS_NUMERIC:
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("profile_columns", _profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of a table: row count, null count, exact distinct
    count, numeric min/max. The oracle spells it as one SELECT per column
    (the readable form); the engine computes ALL columns' metrics in a
    single aggregation pass — multi-distinct compiles to one expand+agg,
    so a 6-column profile of 100 TB is one scan, not six — then unpivots
    the 1×N metric row to long form with ``stack`` (constant-size,
    driver-free). Exact distinct counts are the expensive honest choice;
    the approx variant for quick looks is ``agg_approx_distinct``."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _ORDERS_COLS:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in _ORDERS_NUMERIC:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _ORDERS_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_ORDERS_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_null, n_distinct, min_num, max_num)"
        )
    ).orderBy("column_name")


@register(
    "scd_point_in_time",
    """
    WITH hist AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM hist
    WHERE valid_from <= TIMESTAMP '1998-06-15 12:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-15 12:00:00')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scd_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build + point-in-time query: turn
    an event log into validity intervals (valid_from = event ts, valid_to =
    next event's ts per user via LEAD; open-ended for the latest), then ask
    "what state was every user in at time T" — the training-data question
    behind feature snapshots and label leakage audits. The window orders by
    (ts, event_id) so equal-timestamp events produce a deterministic chain
    in both engines. One shuffle on user_id builds the history; the PIT
    probe is a filter that at scale prunes by partition on valid_from."""
    ev = load_table(spark, sf_dir, "events")
    t = F.to_timestamp(F.lit("1998-06-15 12:00:00"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return (
        hist.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )
