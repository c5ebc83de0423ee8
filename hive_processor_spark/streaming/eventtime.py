"""Event-time window operators in batch mode (SURVEY.md §2.2-I, Tier H).

Spark's ``window``/``session_window`` functions work identically in batch
queries, so the *semantics* are hash-checked here against DuckDB oracles
that reimplement the bucket arithmetic; true incremental execution
(watermarks, state, late data) is exercised in :mod:`streaming.smoke`.

Buckets are emitted as epoch seconds (bigint), never raw timestamps — the
fixture's ns precision differs between engines below the second grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


@register(
    "stream_tumbling",
    """
    SELECT CAST(FLOOR(FLOOR(EPOCH(ts)) / 300) * 300 AS BIGINT) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "stream_sliding",
    """
    SELECT bucket_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
        SELECT UNNEST([b - 300, b]) AS bucket_start, event_type
        FROM (SELECT CAST(FLOOR(FLOOR(EPOCH(ts)) / 300) * 300 AS BIGINT) AS b,
                     event_type
              FROM events) t
    ) u
    GROUP BY bucket_start, event_type
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly two
    buckets (the oracle unnests both bucket starts explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "stream_session",
    """
    WITH e AS (
        SELECT user_id, EPOCH_US(ts) AS us FROM events
    ), flagged AS (
        SELECT user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ), numbered AS (
        SELECT user_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(FLOOR(MIN(us) / 1000000) AS BIGINT) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user. The oracle is the classic
    gaps-and-islands rewrite at µs precision (``epoch_us``), matching
    Spark's µs event-time and its half-open merge rule (a gap of exactly
    30 min starts a new session)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based duplicate removal; the projection is value-agnostic
    (which surviving row dropDuplicates keeps is nondeterministic)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
    )


@register(
    "stream_gapfill",
    """
    WITH b AS (
        SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi
        FROM events
    ), hours AS (
        SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
    ), grid AS (
        SELECT CAST(EPOCH(h) AS BIGINT) AS bucket_start, event_type
        FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ), counts AS (
        SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS bucket_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.bucket_start, g.event_type,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN counts c
      ON g.bucket_start = c.bucket_start AND g.event_type = c.event_type
    """,
)
def stream_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup with gap filling: hourly counts per event
    type over the *dense* hour grid — empty buckets appear as zeros instead
    of silently missing (what a time-series store calls ``time_bucket`` +
    gapfill).

    Fully declarative: the bounds row is a 1-row aggregate cross-joined and
    exploded into the grid (no driver-side collect), the grid side is tiny
    and broadcast into the left join against the real per-hour counts. At
    scale the counts side shuffles once on (hour, type) — the same shuffle
    the plain rollup already needs — and the grid stays O(hours × types).
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    ).select(F.unix_timestamp("h").alias("bucket_start"))
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    counts = (
        ev.select(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket_start"),
            "event_type",
        )
        .groupBy("bucket_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return F.broadcast(grid).join(
        counts, ["bucket_start", "event_type"], "left"
    ).select(
        "bucket_start",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
    )
