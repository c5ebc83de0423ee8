"""Batch event-log analytics (retention, funnel, modal behavior) — the
product-analytics queries every event pipeline serves alongside the
streaming operators in ``streaming/eventtime.py``.

Scale posture: everything reduces to hash aggregations and one equi-join
on ``(user_id, day)`` — per-user event counts are bounded, so there is no
skew hazard beyond what AQE's skew-join handles, and every aggregate ships
map-side partials. At 100 TB the event table would be date-partitioned;
all three queries prune to the days they touch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.exact import dsum, sql_dsum
from hive_processor_spark.sources.tables import load_table


@register(
    "events_retention",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT STRFTIME(a.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS retained_next_day
    FROM du a
    LEFT JOIN du b ON b.user_id = a.user_id AND b.d = a.d + 1
    GROUP BY a.d
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention per calendar day: of the users active on day d,
    how many were also active on d+1. The (user, day) de-dup happens
    before the self-join, so join input is bounded by DAU, not raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    b = du.select(F.col("user_id").alias("u2"), F.col("d").alias("d2"))
    joined = du.join(
        b, (du.user_id == b.u2) & (b.d2 == F.date_add(du.d, 1)), "left"
    )
    return joined.groupBy(
        F.date_format("d", "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.countDistinct("u2").alias("retained_next_day"),
    )


@register(
    "events_funnel",
    """
    WITH t AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT)
               AS viewed,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
               AS clicked_after_view,
           CAST(COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click
                      THEN 1 END) AS BIGINT) AS purchased_after_click
    FROM t
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase on first-touch
    timestamps: one hash aggregation builds the per-user stage times, one
    global aggregation counts survivors at each stage (NULL comparisons
    are unknown → not counted, in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    t = ev.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@register(
    "agg_mode",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ), r AS (
        SELECT user_id, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c
    )
    SELECT user_id, event_type AS modal_type, n AS n_events
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type (the MODE aggregate, which Spark lacks
    natively): count per (user, value), keep the top row per user with a
    deterministic tiebreak (count desc, then value asc) — both engines
    walk the identical window, so ties cannot diverge."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), F.col("n").alias("n_events"))
    )


@register(
    "events_sessionize",
    """
    WITH e AS (
        SELECT event_id, user_id, EPOCH_US(ts) AS us FROM events
    ), flagged AS (
        SELECT event_id, user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_no
    FROM flagged
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment (gaps-and-islands): every event gets
    its user-local session ordinal under the 30-minute-gap rule — the
    feature-generation output shape, complementing ``stream_session``'s
    per-session aggregates. Two stacked windows over one (user) shuffle;
    event_id breaks timestamp ties so the numbering is deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.select(
        "event_id",
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) >= 1800000000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session").over(run).cast("long").alias("session_no"),
    )


@register(
    "events_anomaly",
    f"""
    WITH st AS (
        SELECT event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS s1,
               {sql_dsum('value * value')} AS s2
        FROM events
        GROUP BY event_type
    ), z AS (
        SELECT e.event_id, e.event_type, e.value,
               (e.value - s.s1 / s.n)
                   / SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS zval
        FROM events e JOIN st s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, ROUND(value, 2) AS value, ROUND(zval, 4) AS z
    FROM z
    WHERE ABS(zval) > 3.0
    ORDER BY event_id
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection on event values, per event type: one
    hash-aggregate pass for per-type (n, Σx, Σx²) — quantized exact sums, so
    the mean/std are bit-identical at any parallelism — then a broadcast
    join of the 5-row stats table back onto the stream and a codegen filter
    on |z| > 3. At 100 TB this is one map-side-combinable aggregate plus a
    map-only pass; the stats side never grows past the type cardinality."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    z = (
        ev.join(F.broadcast(st), "event_type")
        .withColumn(
            "zval",
            (F.col("value") - F.col("s1") / F.col("n"))
            / F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ),
        )
        .filter(F.abs("zval") > 3.0)
    )
    return z.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.round("zval", 4).alias("z"),
    ).orderBy("event_id")


@register(
    "events_cohort",
    """
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
    )
    SELECT STRFTIME(f.cohort_day, '%Y-%m-%d') AS cohort,
           CAST(a.act_day - f.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM first_seen f JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    ORDER BY cohort, day_offset
    """,
)
def events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    distinct per (cohort day, day offset). The first-seen aggregate and
    the (user, day) de-dup both shrink to user-cardinality before the
    join, so the matrix join never touches raw events twice — the
    standard shape at any scale; the matrix itself is tiny (days²)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.to_date("ts").alias("act_day")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy("cohort_day", F.datediff("act_day", "cohort_day").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "n_active",
        )
        .orderBy("cohort", "day_offset")
    )


@register(
    "events_streaks",
    """
    WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d
               ) AS INT) AS anchor
        FROM du
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS streak_days,
           STRFTIME(MIN(d), '%Y-%m-%d') AS streak_start
    FROM isl
    GROUP BY user_id, anchor
    ORDER BY streak_days DESC, user_id, streak_start
    LIMIT 50
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streaks per user.
    The classic `date - row_number()` anchor turns consecutive runs into
    equal group keys — one window over (user, day) after a user-bounded
    de-dup, then a hash aggregate; no self-join, no recursion, and the
    window partitions by user so it parallelizes across the cluster."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = du.withColumn(
        "anchor", F.date_sub("d", F.row_number().over(w))
    )
    return (
        isl.groupBy("user_id", "anchor")
        .agg(
            F.count(F.lit(1)).alias("streak_days"),
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        )
        .select("user_id", "streak_days", "streak_start")
        .orderBy(F.desc("streak_days"), "user_id", "streak_start")
        .limit(50)
    )


@register(
    "events_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), c AS (
        SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
               AS p
    FROM c
    ORDER BY event_type, next_type
    """,
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences — the
    Markov estimate behind next-action prediction and anomalous-flow
    detection. One LEAD window partitioned by user (ties broken by
    event_id so the sequence is total-ordered), a hash aggregate to the
    type×type matrix, and a window normalization over the 25-cell result.
    The heavy window parallelizes per user; the matrix is O(types²)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("event_type")
    return (
        c.select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 6).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "events_rfm",
    """
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    pu AS (
        SELECT user_id,
               DATE_DIFF('day', CAST(MAX(ts) AS DATE),
                         CAST((SELECT m FROM mx) AS DATE)) AS rec,
               CAST(COUNT(*) AS BIGINT) AS freq,
               (CAST(SUM(CAST(FLOOR(value * 10000.0) AS DECIMAL(28,0))) AS DOUBLE)
                / 10000.0) AS mon
        FROM events GROUP BY user_id
    )
    SELECT CASE WHEN rec = 0 AND freq >= 67 THEN 'champion'
                WHEN rec = 0 THEN 'active'
                WHEN freq >= 67 THEN 'frequent_lapsing'
                ELSE 'at_risk' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(CAST(FLOOR(mon * 10000.0) AS DECIMAL(28,0))) AS DOUBLE)
                 / 10000.0, 4) AS total_value
    FROM pu GROUP BY 1 ORDER BY 1
    """,
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    canonical activation analysis over an event log. Per-user stats are one
    partial→final aggregation on user_id; the corpus-wide max timestamp is
    a 1-row broadcast scalar (never a correlated subquery); segment
    assignment is a codegen CASE; the final rollup is |segments| rows.
    Recency is an integer day-diff and the monetary sums are quantized, so
    the segment boundaries cut identically in both engines. The fixed
    thresholds stand in for the quantile cuts production would compute in a
    prior calibration pass (quantiles over doubles are engine-divergent;
    thresholds-as-config is also what real RFM dashboards do)."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            (
                F.sum(F.floor(F.col("value") * 10000.0).cast("decimal(28,0)"))
                .cast("double")
                / 10000.0
            ).alias("mon"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(F.to_date("m"), F.to_date("last_ts")).alias("rec"),
            "freq",
            "mon",
        )
    )
    segment = (
        F.when((F.col("rec") == 0) & (F.col("freq") >= 67), "champion")
        .when(F.col("rec") == 0, "active")
        .when(F.col("freq") >= 67, "frequent_lapsing")
        .otherwise("at_risk")
    )
    return (
        pu.select(segment.alias("segment"), "freq", "mon")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("freq").alias("total_events"),
            F.round(
                F.sum(F.floor(F.col("mon") * 10000.0).cast("decimal(28,0)"))
                .cast("double")
                / 10000.0,
                4,
            ).alias("total_value"),
        )
        .orderBy("segment")
    )


@register(
    "events_rolling_active",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    fan AS (SELECT user_id, d + INTERVAL (i) DAY AS d2 FROM ud, RANGE(0, 3) t(i)),
    dedup AS (SELECT DISTINCT user_id, CAST(d2 AS DATE) AS d2 FROM fan)
    SELECT STRFTIME(d2, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS active_3d
    FROM dedup GROUP BY d2 ORDER BY d2
    """,
)
def events_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-day active users per day (the WAU/MAU rollup shape).
    COUNT(DISTINCT user) OVER a sliding window isn't expressible as a
    window function in either engine; the scalable rewrite is the standard
    fan-out: dedup to (user, day), replicate each row to the k days it
    keeps the user "active" for, dedup again, count per day. Cost is a k×
    fan-out of the *per-day distinct users* (already ≪ events) and two
    hash shuffles — linear in users·k, never quadratic, and no per-day
    self-join against a date grid. k generalizes to 7/30 for WAU/MAU."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("i")).alias("d2"))
    return (
        fan.distinct()
        .groupBy("d2")
        .agg(F.count(F.lit(1)).alias("active_3d"))
        .select(F.date_format("d2", "yyyy-MM-dd").alias("day"), "active_3d")
        .orderBy("day")
    )


@register(
    "events_concurrency",
    """
    WITH iv AS (
        SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e,
               CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS mid
        FROM events
    ), seg AS (
        SELECT CAST(s AS DATE) AS day, s, LEAST(e, mid) AS e FROM iv
        UNION ALL
        SELECT CAST(mid AS DATE) AS day, mid AS s, e FROM iv WHERE e > mid
    ), pts AS (
        SELECT day, s AS t, 1 AS delta FROM seg
        UNION ALL
        SELECT day, e AS t, -1 AS delta FROM seg
    ), run AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS cur
        FROM pts
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           CAST(MAX(cur) AS BIGINT) AS max_concurrent
    FROM run GROUP BY day ORDER BY day
    """,
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day via a sweep line: treat each event as a
    half-open 30-minute activity interval, clip it at day boundaries (at
    most 2 segments per event — never a per-minute fan-out), emit +1/-1
    endpoint deltas, and take the max running sum within each day. The
    window partitions by day, so days sweep in parallel and no global sort
    exists; at 100 TB the hazard is one hot day, which AQE skew-split
    handles since every day is independent. Ordering ties (equal t) don't
    affect the max: -1s sort first and a run of same-sign deltas reaches
    its extremum at the run's end regardless of intra-run order."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        (F.to_date("ts").cast("timestamp") + F.expr("INTERVAL 1 DAY")).alias("mid"),
    )
    seg1 = iv.select(
        F.to_date("s").alias("day"), "s", F.least("e", "mid").alias("e")
    )
    seg2 = iv.filter(F.col("e") > F.col("mid")).select(
        F.to_date("mid").alias("day"), F.col("mid").alias("s"), "e"
    )
    seg = seg1.unionAll(seg2)
    pts = seg.select("day", F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        seg.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("day", F.sum("delta").over(w).alias("cur"))
    return (
        run.groupBy("day")
        .agg(F.max("cur").cast("long").alias("max_concurrent"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "max_concurrent")
        .orderBy("day")
    )


@register(
    "events_cumulative_unique",
    """
    WITH first_day AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ), per_day AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_day GROUP BY d
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM per_day ORDER BY day
    """,
)
def events_cumulative_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query. A naive
    COUNT(DISTINCT) per day over an expanding window rescans history per
    day; the linear rewrite is first-seen attribution: each user counts
    exactly once, on their first-activity day (one groupBy user), then
    per-day new-user counts accumulate with a running sum over the tiny
    day-grain series. The only full-data shuffle is keyed by user_id; the
    unpartitioned window runs over |days| rows (thousands), which is the
    deliberate, bounded exception to the no-global-window rule."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_day.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


#: EWMA weights 2^(K-j) for lag j in 0..K — exact integer weights for
#: alpha = 1/2 (each day's weight halves), spelled as a CASE ladder so
#: neither engine goes near float pow().
_EWMA_K = 8
_EWMA_W = {j: 1 << (_EWMA_K - j) for j in range(_EWMA_K + 1)}


@register(
    "ts_ewma",
    f"""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), j AS (
        SELECT a.day, a.n,
               DATE_DIFF('day', b.day, a.day) AS lag, b.n AS nb
        FROM daily a JOIN daily b
          ON b.day <= a.day AND b.day >= a.day - INTERVAL 8 DAY
    )
    SELECT day, n,
           ROUND(CAST(SUM(nb * CASE lag {' '.join(f'WHEN {j} THEN {w}' for j, w in _EWMA_W.items())} END) AS DOUBLE)
                 / CAST(SUM(CASE lag {' '.join(f'WHEN {j} THEN {w}' for j, w in _EWMA_W.items())} END) AS DOUBLE), 6)
               AS ewma
    FROM j
    GROUP BY day, n
    ORDER BY day
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2, 8-day lookback)
    of the daily event count — the smoothed-traffic series every
    monitoring/forecast pipeline derives first.

    Exactness: with alpha = 1/2 the truncated-window EWMA is a ratio of two
    integer sums (weights 2^(K-j)), so the only float op is the final
    division — bit-stable at any parallelism. The spine self-join is a
    bounded range join over one row per day (at 100 TB: still one row per
    day — the daily rollup is the heavy stage, and it's a partial-final
    count); windows at the head of the series renormalize over the
    available days, so no warm-up rows are dropped."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    lag = F.datediff(F.col("a.day").cast("date"), F.col("b.day").cast("date"))
    weight = F.lit(None)
    for j, wgt in _EWMA_W.items():
        weight = F.when(lag == j, F.lit(wgt)) if j == 0 else weight.when(
            lag == j, F.lit(wgt)
        )
    joined = a.join(
        b,
        (F.col("b.day") <= F.col("a.day"))
        & (F.col("b.day") >= F.col("a.day") - F.expr(f"INTERVAL {_EWMA_K} DAYS")),
    )
    return (
        joined.select(
            F.col("a.day").alias("day"),
            F.col("a.n").alias("n"),
            (F.col("b.n") * weight).alias("wn"),
            weight.alias("w"),
        )
        .groupBy("day", "n")
        .agg(
            F.round(
                F.sum("wn").cast("double") / F.sum("w").cast("double"), 6
            ).alias("ewma")
        )
        .orderBy("day")
    )


@register(
    "events_attribution",
    """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE event_type IN ('click', 'view', 'signup')
    ), j AS (
        SELECT p.event_id,
               t.event_type,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY t.ts DESC, t.event_id DESC) AS rn
        FROM p JOIN t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts >= p.ts - INTERVAL 7 DAY
    ), last AS (
        SELECT event_id, event_type FROM j WHERE rn = 1
    )
    SELECT COALESCE(l.event_type, 'none') AS touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM p LEFT JOIN last l ON p.event_id = l.event_id
    GROUP BY touch
    ORDER BY touch
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's most
    recent click/view/signup in the preceding 7 days (or 'none') — the
    marketing query behind every conversion dashboard.

    The join is an equi-join on user_id with the time window as a residual
    predicate — at scale a shuffle join keyed on the user, with per-user
    fan-out bounded by activity × window. The winner-pick is a window over
    each purchase's candidate set with a total (ts, event_id) order, so the
    credited touch is deterministic even with tied timestamps."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    t = ev.filter(F.col("event_type").isin("click", "view", "signup")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    last = (
        j.select("p_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("p_id", "event_type")
    )
    return (
        p.join(last, "p_id", "left")
        .select(F.coalesce("event_type", F.lit("none")).alias("touch"))
        .groupBy("touch")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("touch")
    )


@register(
    "events_path_analysis",
    """
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 10 most common 3-step event paths over each
    user's time-ordered stream — the navigation-flow query behind every
    product-analytics "paths" view. One shuffle on user_id for the LEAD
    windows (per-user frames, parallel across users), then an exact count
    over path trigrams; ties broken lexicographically so the LIMIT is
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "ts_rolling_median",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), framed AS (
        SELECT day, x,
               LIST_SORT(LIST(x) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        FROM daily
    )
    SELECT day,
           CAST(LEN(arr) AS INTEGER) AS n_days,
           CAST(arr[CAST(FLOOR((LEN(arr) + 1) / 2.0) AS BIGINT)]
                + arr[CAST(FLOOR((LEN(arr) + 2) / 2.0) AS BIGINT)] AS DOUBLE)
               / 200.0 AS rolling_median
    FROM framed
    ORDER BY day
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling MEDIAN of the daily event-value total — the
    robust smoother dashboards prefer over rolling means when spikes are
    real but rare.

    The frame is collected per row (≤ 7 integers), sorted, and the two
    middle order statistics averaged — sorting makes the collection order
    irrelevant, so the windowed collect is deterministic on both engines,
    and the math stays integral until the final /200. The window runs over
    one row per day; the daily rollup below it is the only fact-scale
    stage (partial→final integer sum)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100.0).cast("long")).cast("long").alias("x")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    framed = daily.select(
        "day", F.array_sort(F.collect_list("x").over(w)).alias("arr")
    )
    n = F.size("arr")
    lo = F.floor((n + 1) / 2.0).cast("int")
    hi = F.floor((n + 2) / 2.0).cast("int")
    return framed.select(
        "day",
        n.alias("n_days"),
        (
            (F.element_at("arr", lo) + F.element_at("arr", hi)).cast("double")
            / 200.0
        ).alias("rolling_median"),
    ).orderBy("day")


@register(
    "events_pattern_match",
    """
    WITH seq AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS s
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(CASE WHEN REGEXP_MATCHES(s, 'v.*c.*p') THEN 1 END)
                AS BIGINT) AS n_matched,
           ROUND(CAST(COUNT(CASE WHEN REGEXP_MATCHES(s, 'v.*c.*p') THEN 1 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS match_rate
    FROM seq
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (the MATCH_RECOGNIZE shape): users whose
    event history contains view → … → click → … → purchase in order. Each
    user's history is folded to a compact initial-string — built from a
    sorted struct collection so the order is total (ts, event_id) on both
    engines — and the pattern is one regex per user. At scale this is a
    single user-keyed aggregation; per-user strings are bounded by
    activity, and the regex scan is map-side."""
    ev = load_table(spark, sf_dir, "events")
    item = F.struct(
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.substring("event_type", 1, 1).alias("c"),
    )
    seq = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(item)).alias("arr"))
        .select(
            F.array_join(
                F.transform(F.col("arr"), lambda x: x.getField("c")), ""
            ).alias("s")
        )
    )
    matched = F.count(F.when(F.col("s").rlike("v.*c.*p"), 1))
    return seq.agg(
        F.count(F.lit(1)).alias("n_users"),
        matched.alias("n_matched"),
        F.round(
            matched.cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("match_rate"),
    )


@register(
    "events_cohort_ltv",
    """
    WITH first AS (
        SELECT o_custkey,
               MIN(YEAR(o_orderdate) * 12 + (MONTH(o_orderdate) - 1)) AS first_mo
        FROM orders GROUP BY o_custkey
    ), facts AS (
        SELECT CAST(FLOOR(f.first_mo / 12.0) AS BIGINT) AS cohort_year,
               (YEAR(o.o_orderdate) * 12 + (MONTH(o.o_orderdate) - 1)) - f.first_mo
                   AS age_months,
               o.o_custkey,
               CAST(FLOOR(o.o_totalprice * 10000.0) AS DECIMAL(28,0)) AS revq
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    )
    SELECT cohort_year,
           CAST(age_months AS INTEGER) AS age_months,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(revq) AS DOUBLE) / 10000.0 AS revenue
    FROM facts
    WHERE age_months <= 24
    GROUP BY cohort_year, age_months
    ORDER BY cohort_year, age_months
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-purchase cohort
    year, revenue tracked by account age in months (first two years) — the
    LTV curve every growth team draws. Month arithmetic is pure integers
    (year·12+month), so cohort/age bucketing cannot drift between engines;
    revenue rides the quantized-decimal plane. Two fact-table passes (first
    purchase, then the age join — at scale the first-purchase dim is tiny
    and broadcasts back onto the fact shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    mo = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    first = orders.groupBy("o_custkey").agg(F.min(mo).alias("first_mo"))
    facts = orders.join(F.broadcast(first), "o_custkey").select(
        F.floor(F.col("first_mo") / 12.0).cast("long").alias("cohort_year"),
        (mo - F.col("first_mo")).cast("int").alias("age_months"),
        "o_custkey",
        F.floor(F.col("o_totalprice") * 10000.0).cast("decimal(28,0)").alias("revq"),
    )
    return (
        facts.filter(F.col("age_months") <= 24)
        .groupBy("cohort_year", "age_months")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            (F.sum("revq").cast("double") / 10000.0).alias("revenue"),
        )
        .orderBy("cohort_year", "age_months")
    )


@register(
    "ts_mom_growth",
    """
    WITH monthly AS (
        SELECT YEAR(o_orderdate) * 12 + (MONTH(o_orderdate) - 1) AS mo,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS DECIMAL(28,0))) AS revq
        FROM orders GROUP BY 1
    ), g AS (
        SELECT mo, revq,
               LAG(revq, 1) OVER (ORDER BY mo) AS prev_mo,
               LAG(revq, 12) OVER (ORDER BY mo) AS prev_yr
        FROM monthly
    )
    SELECT CAST(FLOOR(mo / 12.0) AS BIGINT) AS year,
           CAST(mo % 12 + 1 AS INTEGER) AS month,
           CAST(revq AS DOUBLE) / 10000.0 AS revenue,
           ROUND(CAST(revq - prev_mo AS DOUBLE) / CAST(prev_mo AS DOUBLE), 6)
               AS mom_growth,
           ROUND(CAST(revq - prev_yr AS DOUBLE) / CAST(prev_yr AS DOUBLE), 6)
               AS yoy_growth
    FROM g
    ORDER BY mo
    """,
)
def ts_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the
    period-comparison query on every executive dashboard. Months are pure
    integers (y·12+m-1) so LAG(1)/LAG(12) offsets are calendar-exact;
    revenue rides the quantized-decimal plane and the growth ratios are
    single double divisions of exact integers (NULL for the first
    month/year, identically on both engines). Fact-scale work is one
    monthly rollup; the windows run over |months| rows."""
    orders = load_table(spark, sf_dir, "orders")
    mo = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    monthly = orders.groupBy(mo.alias("mo")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 10000.0).cast("decimal(28,0)")
        ).alias("revq")
    )
    w = Window.orderBy("mo")
    g = monthly.select(
        "mo",
        "revq",
        F.lag("revq", 1).over(w).alias("prev_mo"),
        F.lag("revq", 12).over(w).alias("prev_yr"),
    )
    ratio = lambda cur, prev: F.round(  # noqa: E731
        (F.col(cur) - F.col(prev)).cast("double") / F.col(prev).cast("double"), 6
    )
    return g.select(
        F.floor(F.col("mo") / 12.0).cast("long").alias("year"),
        (F.col("mo") % 12 + 1).cast("int").alias("month"),
        (F.col("revq").cast("double") / 10000.0).alias("revenue"),
        ratio("revq", "prev_mo").alias("mom_growth"),
        ratio("revq", "prev_yr").alias("yoy_growth"),
    ).orderBy("year", "month")


@register(
    "ts_seasonality",
    """
    WITH d AS (
        SELECT CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
        FROM events GROUP BY 1
    ), tot AS (
        SELECT SUM(n) AS tn, SUM(n_days) AS td FROM d
    )
    SELECT dow, n, n_days,
           ROUND(CAST(n AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS per_day,
           ROUND((CAST(n AS DOUBLE) / CAST(n_days AS DOUBLE))
                 / (CAST(tn AS DOUBLE) / CAST(td AS DOUBLE)), 6)
               AS seasonal_index
    FROM d CROSS JOIN tot
    ORDER BY dow
    """,
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: events per active day by weekday,
    indexed against the overall daily rate (1.0 = flat) — the first
    decomposition a traffic forecaster makes. Exact integer counts; the
    index is a ratio of identically-parenthesized double divisions.
    Spark's DAYOFWEEK is Sunday=1 while DuckDB's is Sunday=0, so the
    oracle shifts by one. One aggregation pass; the
    7-row join is a broadcast formality."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )
    tot = d.agg(F.sum("n").alias("tn"), F.sum("n_days").alias("td"))
    per_day = F.col("n").cast("double") / F.col("n_days").cast("double")
    overall = F.col("tn").cast("double") / F.col("td").cast("double")
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n",
            "n_days",
            F.round(per_day, 6).alias("per_day"),
            F.round(per_day / overall, 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "events_abandonment",
    """
    WITH s AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS INTEGER) AS clicked,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS INTEGER) AS purchased
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(clicked) AS BIGINT) AS n_clickers,
           CAST(SUM(CASE WHEN clicked = 1 AND purchased = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_abandoned,
           ROUND(CAST(SUM(CASE WHEN clicked = 1 AND purchased = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(clicked) AS DOUBLE), 6)
               AS abandonment_rate
    FROM s
    """,
)
def events_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abandonment: users who clicked but never purchased, as count and
    rate — the funnel's complement, the number the growth team actually
    stares at. One user-keyed aggregation pass (boolean MAX flags), one
    scalar reduce; exact integers until the final ratio."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("clicked"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("purchased"),
    )
    abandoned = F.sum(
        ((F.col("clicked") == 1) & (F.col("purchased") == 0)).cast("int")
    )
    return s.agg(
        F.sum("clicked").cast("long").alias("n_clickers"),
        abandoned.cast("long").alias("n_abandoned"),
        F.round(
            abandoned.cast("double") / F.sum("clicked").cast("double"), 6
        ).alias("abandonment_rate"),
    )


@register(
    "events_feature_vector",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
               AS n_click,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
               AS n_view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS n_purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
               AS n_signup,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
               AS n_error,
           CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value,
           ROUND(CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS DOUBLE)
                 / 100.0 / COUNT(*), 6) AS mean_value,
           CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS last_seen_epoch
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ML feature assembly — the feature-store materialization
    every behavioral model trains on: per-type activity counts, exact
    value totals/means, and recency, one wide row per user in ONE
    aggregation pass (conditional counts compile to a single
    partial→final hash aggregate; no pivot shuffle, no multiple scans).
    At 100 TB this is the canonical "wide-agg feature build" — map-side
    combine does most of the work before the user-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    vq = F.sum(F.floor(F.col("value") * 100.0).cast("long"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("signup"),
            cnt("error"),
            (vq.cast("double") / 100.0).alias("total_value"),
            F.round(vq.cast("double") / 100.0 / F.count(F.lit(1)), 6).alias(
                "mean_value"
            ),
            F.unix_timestamp(F.max("ts")).cast("long").alias("last_seen_epoch"),
        )
        .orderBy("user_id")
    )


@register(
    "events_inter_arrival",
    """
    WITH g AS (
        SELECT event_type,
               EPOCH_US(ts) - LAG(EPOCH_US(ts))
                   OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id)
                   AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           ROUND(CAST(SUM(gap_us) AS DOUBLE) / 1e6 / COUNT(gap_us), 6)
               AS mean_gap_s,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type (gap = time since the
    user's previous event of any type) — the cadence profile behind
    session-timeout choices and bot detection. Gaps are integer epoch-µs
    differences from a totally-ordered per-user window; sums/max are exact
    integers, the mean is one double division. One user-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / 1e6 / F.count("gap_us"), 6
            ).alias("mean_gap_s"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_dau_stickiness",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d
    ), mau AS (
        SELECT YEAR(d) * 12 + (MONTH(d) - 1) AS mo,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM du GROUP BY 1
    )
    SELECT mau.mo AS month_index,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(dau.dau) AS DOUBLE) / COUNT(*), 6) AS avg_dau,
           MAX(mau.mau) AS mau,
           ROUND((CAST(SUM(dau.dau) AS DOUBLE) / COUNT(*))
                 / CAST(MAX(mau.mau) AS DOUBLE), 6) AS stickiness
    FROM dau JOIN mau ON YEAR(dau.d) * 12 + (MONTH(dau.d) - 1) = mau.mo
    GROUP BY mau.mo
    ORDER BY month_index
    """,
)
def agg_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement ratio product teams
    track weekly. One (user, day) de-dup feeds both the daily and monthly
    distinct counts; months are integer-encoded. Exact integer counts;
    two double divisions at the end with fixed parenthesization."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    mo = F.year("d") * 12 + (F.month("d") - 1)
    mau = du.groupBy(mo.alias("mo")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    joined = dau.join(F.broadcast(mau), mo.alias("mo2") == F.col("mo"))
    avg_dau = F.sum("dau").cast("double") / F.count(F.lit(1))
    return (
        joined.groupBy(F.col("mo").cast("long").alias("month_index"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(avg_dau, 6).alias("avg_dau"),
            F.max("mau").alias("mau"),
            F.round(avg_dau / F.max("mau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("month_index")
    )


@register(
    "events_forecast_naive",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), f AS (
        SELECT day, n,
               LAG(n, 7) OVER (ORDER BY day) AS forecast
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           ROUND(CAST(SUM(ABS(n - forecast)) AS DOUBLE) / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(ABS(n - forecast)) AS DOUBLE)
                 / CAST(SUM(n) AS DOUBLE), 6) AS wape
    FROM f WHERE forecast IS NOT NULL
    """,
)
def events_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event count
    with the value 7 days earlier, score MAE and WAPE — the baseline every
    forecasting system must beat, and the shape of a backtest harness
    (lag-as-forecast + error aggregation). Errors are exact integer
    absolute differences; the two error ratios are single double
    divisions. Window runs over one row per day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    f = daily.select(
        "n", F.lag("n", 7).over(w).alias("forecast")
    ).filter(F.col("forecast").isNotNull())
    abs_err = F.sum(F.abs(F.col("n") - F.col("forecast")))
    return f.agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.round(abs_err.cast("double") / F.count(F.lit(1)), 6).alias("mae"),
        F.round(abs_err.cast("double") / F.sum("n").cast("double"), 6).alias(
            "wape"
        ),
    )


@register(
    "events_slo_burn",
    """
    WITH d AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
                   AS n_err
        FROM events GROUP BY 1
    )
    SELECT day, n, n_err,
           ROUND(CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE), 6) AS error_rate,
           CAST(CASE WHEN CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE) > 0.25
                     THEN 1 ELSE 0 END AS INTEGER) AS slo_breach,
           ROUND((CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)) / 0.25, 6)
               AS burn_rate
    FROM d
    ORDER BY day
    """,
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate SLI against a 25% error-budget SLO with burn rate
    (rate/budget — >1 means the budget depletes early) — the SRE alerting
    query. One conditional aggregation pass; exact counts until the two
    final divisions, identically parenthesized; the breach flag compares
    a bit-stable ratio so it cannot flip between engines."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
    )
    rate = F.col("n_err").cast("double") / F.col("n").cast("double")
    return d.select(
        "day",
        "n",
        "n_err",
        F.round(rate, 6).alias("error_rate"),
        F.when(rate > 0.25, 1).otherwise(0).alias("slo_breach"),
        F.round(rate / 0.25, 6).alias("burn_rate"),
    ).orderBy("day")


@register(
    "events_funnel_constrained",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT v.user_id, MIN(e.ts) AS t_click
        FROM v JOIN events e
          ON e.user_id = v.user_id AND e.event_type = 'click'
         AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
        GROUP BY v.user_id
    ), p AS (
        SELECT c.user_id
        FROM c JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR
        GROUP BY c.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS viewed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS clicked_24h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS purchased_24h
    """,
)
def events_funnel_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: first view → first click WITHIN 24 h of it
    → purchase within 24 h of that click — the conversion-window semantics
    real funnels use (an unconstrained MIN would credit clicks weeks
    later). Each stage is an aggregate-then-join against the event stream
    keyed on the user (at scale: the per-user stage frames are tiny and
    broadcast back); stage times are exact timestamps, so stage counts
    cannot drift."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("et2"),
        F.col("ts").alias("ts2"),
    )
    c = (
        v.join(
            e2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("et2") == "click")
            & (F.col("ts2") > F.col("t_view"))
            & (F.col("ts2") <= F.col("t_view") + day),
        )
        .groupBy("user_id")
        .agg(F.min("ts2").alias("t_click"))
    )
    p = (
        c.join(
            e2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("et2") == "purchase")
            & (F.col("ts2") > F.col("t_click"))
            & (F.col("ts2") <= F.col("t_click") + day),
        )
        .select("user_id")
        .distinct()
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_24h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_24h")))
    )
    return counts


@register(
    "agg_runs_test",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS x
        FROM orders GROUP BY 1
    ), moves AS (
        SELECT day,
               CASE WHEN x > LAG(x) OVER (ORDER BY day) THEN 1 ELSE 0 END AS up,
               LAG(x) OVER (ORDER BY day) AS prev
        FROM daily
    ), m AS (
        SELECT up,
               CASE WHEN up <> LAG(up) OVER (ORDER BY day) THEN 1 ELSE 0 END
                   AS new_run
        FROM moves WHERE prev IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(up) AS BIGINT) AS n_up,
           CAST(SUM(new_run) + 1 AS BIGINT) AS n_runs
    FROM m
    """,
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs count over the daily-revenue up/down sequence —
    the randomness diagnostic (too few runs = trending, too many =
    oscillating). Moves come from exact integer comparisons over the
    day-ordered window; run boundaries are LAG inequalities. Everything is
    integer, so the run count is bit-stable. (The z-score against the
    expected-runs formula is client-side arithmetic on these three
    integers.)"""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).alias("x")
    )
    w = Window.orderBy("day")
    m = (
        daily.select(
            "day",
            F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("up"),
            F.lag("x").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .select(
            "up",
            F.when(F.col("up") != F.lag("up").over(Window.orderBy("day")), 1)
            .otherwise(0)
            .alias("new_run"),
        )
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum("up").cast("long").alias("n_up"),
        (F.sum("new_run") + 1).cast("long").alias("n_runs"),
    )


@register(
    "ts_max_drawdown",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS x
        FROM orders GROUP BY 1
    ), cum AS (
        SELECT day,
               SUM(x) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c
        FROM daily
    ), dd AS (
        SELECT day, c,
               MAX(c) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM cum
    )
    SELECT CAST(MAX(peak - c) AS DOUBLE) / 10000.0 AS max_drawdown,
           ROUND(CAST(MAX(CAST(peak - c AS DOUBLE)
                          / CAST(peak AS DOUBLE)) AS DOUBLE), 6)
               AS max_drawdown_pct
    FROM dd
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative-revenue curve (largest
    peak-to-trough fall, absolute and relative) — the risk metric of any
    cumulative series. Two stacked running windows (prefix sum, running
    max) over one row per day; peak−trough stays an exact integer, and
    the relative form divides exact integers per row before the max.
    Deterministic because every window has the total day order."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).alias("x")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select("day", F.sum("x").over(w).alias("c"))
    dd = cum.select("day", "c", F.max("c").over(w).alias("peak"))
    return dd.agg(
        ((F.max(F.col("peak") - F.col("c"))).cast("double") / 10000.0).alias(
            "max_drawdown"
        ),
        F.round(
            F.max(
                (F.col("peak") - F.col("c")).cast("double")
                / F.col("peak").cast("double")
            ),
            6,
        ).alias("max_drawdown_pct"),
    )


@register(
    "events_alert_suppress",
    """
    WITH e AS (
        SELECT event_id, user_id, EPOCH_US(ts) AS us FROM events
        WHERE event_type = 'error'
    ), flagged AS (
        SELECT event_id, user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w >= 3600000000
                    THEN 1 ELSE 0 END AS new_burst
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), bursts AS (
        SELECT event_id, user_id, us, new_burst,
               SUM(new_burst) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_no
        FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(SUM(new_burst) AS BIGINT) AS n_alerts,
           CAST(COUNT(*) - SUM(new_burst) AS BIGINT) AS n_suppressed
    FROM bursts
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_alert_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert de-duplication with a 1-hour suppression window: per user,
    an error opens a burst and subsequent errors within an hour OF THE
    PREVIOUS error extend it silently — gap-based suppression (the
    PagerDuty grouping rule), spelled as gaps-and-islands so it stays one
    window pass instead of an iterative fold. Emitted-alert and
    suppressed counts per user; totally-ordered windows make burst
    boundaries deterministic."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    e = ev.select("event_id", "user_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) >= 3600000000),
            1,
        )
        .otherwise(0)
        .alias("new_burst"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.sum("new_burst").cast("long").alias("n_alerts"),
            (F.count(F.lit(1)) - F.sum("new_burst")).cast("long").alias(
                "n_suppressed"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "events_interval_union",
    """
    WITH iv AS (
        SELECT user_id, EPOCH_US(ts) AS s, EPOCH_US(ts) + 900000000 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ), merged AS (
        SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS total_active_us
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (coverage): each event opens a 15-minute activity
    interval; overlapping intervals merge, and the operator reports each
    user's merged-interval count and total covered time — the interval
    algebra behind billing for concurrent usage and SLA uptime stitching.
    The merge is gaps-and-islands on a running MAX(end) (an interval
    starts a new island iff it begins after everything before it ended) —
    one window pass per user, no self-join. All epoch-µs integers."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 900000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("me") - F.col("ms")).cast("long").alias("total_active_us"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_rebase_index",
    """
    WITH monthly AS (
        SELECT YEAR(o_orderdate) * 12 + (MONTH(o_orderdate) - 1) AS mo,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS revq
        FROM orders GROUP BY 1
    )
    SELECT CAST(FLOOR(mo / 12.0) AS BIGINT) AS year,
           CAST(mo % 12 + 1 AS INTEGER) AS month,
           ROUND(100.0 * CAST(revq AS DOUBLE)
                 / CAST(FIRST_VALUE(revq) OVER (ORDER BY mo) AS DOUBLE), 6)
               AS index_base100
    FROM monthly
    ORDER BY mo
    """,
)
def ts_rebase_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebased index series: monthly revenue expressed as an index with
    the first month = 100 — the normalization every comparison chart
    applies before overlaying series. FIRST_VALUE over the month-ordered
    window of exact integers; one double ratio per row."""
    orders = load_table(spark, sf_dir, "orders")
    mo = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    monthly = orders.groupBy(mo.alias("mo")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).alias("revq")
    )
    w = Window.orderBy("mo")
    return monthly.select(
        F.floor(F.col("mo") / 12.0).cast("long").alias("year"),
        (F.col("mo") % 12 + 1).cast("int").alias("month"),
        F.round(
            F.lit(100.0)
            * F.col("revq").cast("double")
            / F.first("revq").over(w).cast("double"),
            6,
        ).alias("index_base100"),
    ).orderBy("year", "month")


@register(
    "ts_seasonal_anomaly",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT dow,
               CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(n) AS DOUBLE) AS s1,
               CAST(SUM(n * n) AS DOUBLE) AS s2
        FROM daily GROUP BY dow
    )
    SELECT day, d.dow, n,
           ROUND((CAST(n AS DOUBLE) - s1 / k)
                 / SQRT((s2 - s1 * s1 / k) / (k - 1)), 6) AS seasonal_z
    FROM daily d JOIN base USING (dow)
    ORDER BY day
    """,
)
def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly score: each day's event count z-scored
    against ITS OWN WEEKDAY's distribution (Mondays vs Mondays) — the
    adjustment that stops weekly rhythm from drowning real anomalies.
    Weekday baselines are exact integer moments broadcast back onto the
    daily frame; the z is one identically-parenthesized expression.
    Everything runs over |days| rows after one fact-scale rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    k, s1, s2 = F.col("k"), F.col("s1"), F.col("s2")
    z = (F.col("n").cast("double") - s1 / k) / F.sqrt(
        (s2 - s1 * s1 / k) / (k - 1)
    )
    return (
        daily.join(F.broadcast(base), "dow")
        .select("day", "dow", "n", F.round(z, 6).alias("seasonal_z"))
        .orderBy("day")
    )


@register(
    "events_power_law_fit",
    """
    WITH activity AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY user_id
    ), tail AS (
        SELECT k FROM activity WHERE k >= 10
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           ROUND(1.0 + CAST(COUNT(*) AS DOUBLE)
                 / (CAST(SUM(CAST(FLOOR(LN(CAST(k AS DOUBLE) / 9.5) * 1e9)
                                  AS BIGINT)) AS DOUBLE) / 1e9), 6)
               AS alpha_hat
    FROM tail
    """,
)
def events_power_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law tail exponent of user activity via the discrete Hill/MLE
    estimator α̂ = 1 + n / Σ ln(k / (kmin − ½)) over users with ≥ kmin
    events — the "how heavy is the whale tail" fit behind capacity
    planning and bot thresholds (Clauset–Shalizi–Newman form). Each log
    term is 1e-9-quantized before the exact sum; one rollup plus one
    scalar aggregate."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("k"))
    tail = activity.filter(F.col("k") >= 10)
    lnq = F.floor(F.log(F.col("k").cast("double") / 9.5) * 1e9).cast("long")
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1)).cast("double") / (F.sum(lnq).cast("double") / 1e9),
            6,
        ).alias("alpha_hat"),
    )


@register(
    "events_heatmap",
    """
    SELECT CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS dow,
           CAST(HOUR(ts) AS INTEGER) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events
    GROUP BY dow, hr
    ORDER BY dow, hr
    """,
)
def events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × weekday activity heatmap with a purchase overlay — the
    when-are-users-here grid behind every scheduling decision (campaign
    sends, maintenance windows). One exact aggregation to a ≤168-row
    grid; UTC-pinned session keeps hour buckets identical on both
    engines (DuckDB's 0-based DAYOFWEEK shifted to match Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
        )
        .orderBy("dow", "hr")
    )

@register(
    "ts_changepoint",
    """
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, day, x,
               SUM(x) OVER (PARTITION BY event_type ORDER BY day) AS c,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS d,
               SUM(x) OVER (PARTITION BY event_type) AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), scored AS (
        SELECT event_type, day,
               n * c - d * s AS t,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(n * c - d * s) DESC, day) AS rk,
               n, s
        FROM cum
    )
    SELECT event_type, day AS change_day,
           ROUND(CAST(ABS(t) AS DOUBLE) / (n * s), 6) AS cusum_stat
    FROM scored WHERE rk = 1
    ORDER BY event_type
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily event-count series, one
    change day per event type: the day d maximizing |n·cum_d − d·total| —
    the integer-scaled cumulative deviation from a constant rate (the
    classic offline CUSUM argmax). Every intermediate is an exact integer
    (counts, cumulative counts, row indexes), so the argmax and the
    normalized statistic are deterministic at any parallelism; ties break
    to the earliest day by the ranked window. Scale shape: the raw table
    reduces to one row per (type, day) first; the windows run over that
    reduced frame, partitioned by type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w_cum = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("x").over(w_cum).alias("c"),
        F.row_number().over(w_cum).alias("d"),
        F.sum("x").over(w_all).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    t = F.col("n") * F.col("c") - F.col("d") * F.col("s")
    scored = cum.select(
        "event_type",
        "day",
        t.alias("t"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(F.abs(t).desc(), "day"))
        .alias("rk"),
        "n",
        "s",
    )
    return (
        scored.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round(
                F.abs(F.col("t")).cast("double") / (F.col("n") * F.col("s")), 6
            ).alias("cusum_stat"),
        )
        .orderBy("event_type")
    )

_DS_CASE = " ".join(f"WHEN {j} THEN {w}" for j, w in _EWMA_W.items())


@register(
    "ts_double_smoothing",
    f"""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), s1 AS (
        SELECT a.day, a.n,
               ROUND(CAST(SUM(b.n * CASE DATE_DIFF('day', b.day, a.day)
                               {_DS_CASE} END) AS DOUBLE)
                     / CAST(SUM(CASE DATE_DIFF('day', b.day, a.day)
                               {_DS_CASE} END) AS DOUBLE), 6) AS s1
        FROM daily a JOIN daily b
          ON b.day <= a.day AND b.day >= a.day - INTERVAL {_EWMA_K} DAY
        GROUP BY a.day, a.n
    ), s2 AS (
        SELECT a.day, a.n, a.s1,
               ROUND(CAST(SUM(CAST(FLOOR(1000000.0 * b.s1
                               * (CASE DATE_DIFF('day', b.day, a.day)
                                  {_DS_CASE} END)) AS BIGINT)) AS DOUBLE)
                     / 1000000.0
                     / CAST(SUM(CASE DATE_DIFF('day', b.day, a.day)
                               {_DS_CASE} END) AS DOUBLE), 6) AS s2
        FROM s1 a JOIN s1 b
          ON b.day <= a.day AND b.day >= a.day - INTERVAL {_EWMA_K} DAY
        GROUP BY a.day, a.n, a.s1
    )
    SELECT day, n, s1, s2, ROUND(2.0 * s1 - s2, 6) AS forecast_next
    FROM s2 ORDER BY day
    """,
)
def ts_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing of the daily event count —
    level (s1), double-smoothed level (s2), and the one-step trend-aware
    forecast 2·s1 − s2. Built as the EWMA operator applied twice: two
    bounded-range self-joins over the ONE-ROW-PER-DAY spine, with
    integer 2^(K−j) weights (exact first stage) and floor-quantized
    second-stage terms so both engines sum identically. At 100 TB only
    the daily rollup touches raw data; the smoothing joins cost
    |days|·(K+1) rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )

    def weight(lag):
        w = None
        for j, wgt in _EWMA_W.items():
            w = F.when(lag == j, F.lit(wgt)) if w is None else w.when(
                lag == j, F.lit(wgt)
            )
        return w

    def smooth(frame: DataFrame, col: str, quantized: bool) -> DataFrame:
        a, b = frame.alias("a"), frame.alias("b")
        lag = F.datediff(F.col("a.day").cast("date"), F.col("b.day").cast("date"))
        # broadcast the lookback side: one row per day by construction at
        # any corpus scale, and without it the pure range condition plans
        # as a CartesianProduct (caught by tools/plan_lint)
        j = a.join(
            F.broadcast(b),
            (F.col("b.day") <= F.col("a.day"))
            & (
                F.col("b.day")
                >= F.col("a.day") - F.expr(f"INTERVAL {_EWMA_K} DAYS")
            ),
        )
        w = weight(lag)
        if quantized:
            num = F.sum(
                F.floor(F.lit(1000000.0) * F.col(f"b.{col}") * w).cast("bigint")
            ).cast("double") / F.lit(1000000.0)
        else:
            num = F.sum(F.col(f"b.{col}") * w).cast("double")
        keep = [F.col(f"a.{c}").alias(c) for c in frame.columns]
        return (
            j.groupBy(*keep)
            .agg(F.round(num / F.sum(w).cast("double"), 6).alias("sm"))
        )

    s1 = smooth(daily, "n", quantized=False).withColumnRenamed("sm", "s1")
    s2 = smooth(s1, "s1", quantized=True).withColumnRenamed("sm", "s2")
    return s2.select(
        "day",
        "n",
        "s1",
        "s2",
        F.round(2.0 * F.col("s1") - F.col("s2"), 6).alias("forecast_next"),
    ).orderBy("day")

@register(
    "events_retention_curve",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS cohort_day
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day
        FROM events
    ), cohort_sizes AS (
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY cohort_day
    ), offsets AS (
        SELECT f.cohort_day,
               DATE_DIFF('day', f.cohort_day, a.day) AS day_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM firsts f JOIN active a ON a.user_id = f.user_id
        WHERE DATE_DIFF('day', f.cohort_day, a.day) BETWEEN 0 AND 7
        GROUP BY 1, 2
    )
    SELECT o.cohort_day, CAST(o.day_offset AS INT) AS day_offset,
           o.n_active, s.n_users,
           ROUND(CAST(o.n_active AS DOUBLE) / s.n_users, 6) AS retention
    FROM offsets o JOIN cohort_sizes s ON s.cohort_day = o.cohort_day
    ORDER BY o.cohort_day, day_offset
    """,
)
def events_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retention triangle: for each signup cohort (first-seen
    day), the fraction of users active at day offsets 0…7 — the curve
    behind every "D1/D7 retention" dashboard, where ``events_retention``
    reports only the next-day point. Three reduced frames (first-seen per
    user, distinct user-days, cohort sizes) joined on the user key; the
    raw table is touched twice, both times collapsing straight into
    partial→final aggregates, and the triangle itself is
    |cohorts|×8 rows."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = ev.select("user_id", day.alias("day")).distinct()
    sizes = firsts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_users"))
    off = F.datediff(F.col("day").cast("date"), F.col("cohort_day").cast("date"))
    offsets = (
        firsts.join(active, "user_id")
        .select("cohort_day", off.alias("day_offset"), "user_id")
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        offsets.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_active",
            "n_users",
            F.round(
                F.col("n_active").cast("double") / F.col("n_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_velocity_flags",
    """
    WITH w AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT), 2)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS span3
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE span3 IS NOT NULL AND span3 <= 3600)
                AS BIGINT) AS n_bursts,
           CAST(MIN(span3) AS BIGINT) AS tightest_span_s
    FROM w
    GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE span3 IS NOT NULL AND span3 <= 3600) > 0
    ORDER BY user_id
    """,
)
def events_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity / rapid-fire detection: users with 3 events inside any
    one-hour span (the sliding trigger behind rate limits and fraud
    rules; the window is a tuning knob — fixture traffic is ~1 event/40
    min/user, so an hour is the "suspiciously fast" grain here), counted
    exactly with a 2-back LAG — the span of events
    (i−2, i−1, i) is one subtraction per row, no interval self-join.
    One window partitioned by the natural key; at 100 TB the per-user
    ordering is the same shuffle every sessionization already pays."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    span3 = epoch - F.lag(epoch, 2).over(w)
    flagged = ev.select("user_id", span3.alias("span3"))
    burst = F.col("span3").isNotNull() & (F.col("span3") <= 3600)
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count_if(burst).alias("n_bursts"),
            F.min("span3").alias("tightest_span_s"),
        )
        .filter(F.col("n_bursts") > 0)
        .orderBy("user_id")
    )

@register(
    "events_lifecycle_stages",
    """
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(wk) AS first_wk FROM weekly GROUP BY user_id
    ), staged AS (
        SELECT w.wk, w.user_id,
               CASE
                 WHEN w.wk = f.first_wk THEN 'new'
                 WHEN LAG(w.wk) OVER (PARTITION BY w.user_id ORDER BY w.wk)
                      = w.wk - INTERVAL 7 DAY THEN 'retained'
                 ELSE 'resurrected'
               END AS stage
        FROM weekly w JOIN firsts f ON f.user_id = w.user_id
    ), churned AS (
        SELECT wk + INTERVAL 7 DAY AS wk, CAST(COUNT(*) AS BIGINT) AS n
        FROM weekly w1
        WHERE NOT EXISTS (
            SELECT 1 FROM weekly w2
            WHERE w2.user_id = w1.user_id AND w2.wk = w1.wk + INTERVAL 7 DAY
        )
        AND wk + INTERVAL 7 DAY <= (SELECT MAX(wk) FROM weekly)
        GROUP BY 1
    )
    SELECT s.wk,
           CAST(COUNT(*) FILTER (WHERE stage = 'new') AS BIGINT) AS n_new,
           CAST(COUNT(*) FILTER (WHERE stage = 'retained') AS BIGINT)
               AS n_retained,
           CAST(COUNT(*) FILTER (WHERE stage = 'resurrected') AS BIGINT)
               AS n_resurrected,
           COALESCE(MAX(c.n), 0) AS n_churned
    FROM staged s LEFT JOIN churned c ON c.wk = s.wk
    GROUP BY s.wk
    ORDER BY s.wk
    """,
)
def events_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every (user, week) classified as new (first
    week ever), retained (also active the prior week), or resurrected
    (returning after a gap), plus the churned count (active last week,
    absent this week) — the weekly DAU-accounting identity every growth
    team reports (new + retained + resurrected = WAU; churn closes the
    ledger). One distinct (user, week) reduction, a per-user LAG, and an
    anti-join for churn — all shuffles keyed by user or week at
    |users|·|weeks| scale, far below the raw event count."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    w = Window.partitionBy("user_id").orderBy("wk")
    staged = (
        weekly.join(firsts, "user_id")
        .select(
            "wk",
            "user_id",
            F.when(F.col("wk") == F.col("first_wk"), "new")
            .when(
                F.lag("wk").over(w) == F.col("wk") - F.expr("INTERVAL 7 DAYS"),
                "retained",
            )
            .otherwise("resurrected")
            .alias("stage"),
        )
    )
    max_wk = weekly.agg(F.max("wk").alias("max_wk"))
    nxt = weekly.select(
        "user_id", (F.col("wk") + F.expr("INTERVAL 7 DAYS")).alias("wk")
    )
    churned = (
        nxt.join(weekly, ["user_id", "wk"], "left_anti")
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk") <= F.col("max_wk"))
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_churned_raw"))
    )
    return (
        staged.groupBy("wk")
        .agg(
            F.count_if(F.col("stage") == "new").alias("n_new"),
            F.count_if(F.col("stage") == "retained").alias("n_retained"),
            F.count_if(F.col("stage") == "resurrected").alias("n_resurrected"),
        )
        .join(F.broadcast(churned), "wk", "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned_raw", F.lit(0)).alias("n_churned"),
        )
        .orderBy("wk")
    )

@register(
    "ts_stl_lite",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               DAYOFWEEK(ts) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), tr AS (
        SELECT day, dow, n,
               ROUND(CAST(SUM(n) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 6) AS trend
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), se AS (
        SELECT day, n, trend,
               ROUND(CAST(SUM(CAST(FLOOR(1000000.0 * (n - trend)) AS BIGINT))
                          OVER (PARTITION BY dow) AS DOUBLE)
                     / COUNT(*) OVER (PARTITION BY dow) / 1000000.0, 6)
                   AS seasonal
        FROM tr
    )
    SELECT day, n, trend, seasonal,
           ROUND(n - trend - seasonal, 6) AS residual
    FROM se ORDER BY day
    """,
)
def ts_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of the daily event series:
    trend = centered 7-day moving mean, seasonal = per-weekday mean of
    the detrended series, residual = the rest — the one-pass
    approximation of Cleveland's STL that a monitoring pipeline uses
    before alerting on residuals (the loess loops of full STL buy little
    on integer count series). Both windows run over the one-row-per-day
    frame; detrended terms are micro-quantized before the per-weekday
    mean so the decomposition is bit-stable. The weekday key is computed
    per-engine (numbering differs) but never emitted."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "dow",
        "n",
        F.round(
            F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("trend"),
    )
    wd = Window.partitionBy("dow")
    det_q = F.floor(F.lit(1000000.0) * (F.col("n") - F.col("trend"))).cast(
        "bigint"
    )
    se = tr.select(
        "day",
        "n",
        "trend",
        F.round(
            F.sum(det_q).over(wd).cast("double")
            / F.count(F.lit(1)).over(wd)
            / F.lit(1000000.0),
            6,
        ).alias("seasonal"),
    )
    return se.select(
        "day",
        "n",
        "trend",
        "seasonal",
        F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6).alias(
            "residual"
        ),
    ).orderBy("day")


@register(
    "events_type_overlap",
    """
    WITH d AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
        SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type
    ), inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS overlap
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(sa.n AS BIGINT) AS users_a,
           CAST(sb.n AS BIGINT) AS users_b,
           CAST(i.overlap AS BIGINT) AS overlap,
           ROUND(CAST(i.overlap AS DOUBLE) / (sa.n + sb.n - i.overlap), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def events_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the user sets behind
    every pair of event types — the segmentation question ("do purchasers
    also error?") answered with exact set algebra, no sketches. Plan:
    distinct (type, user) once (one shuffle ∝ distinct pairs, map-side
    combined), self-join keyed on user (co-grouped, never all-pairs), then
    a 10-row join against the per-type sizes. At 100 TB the user-keyed
    self-join is the standard audience-intersection shape; HLL sketches
    (`agg_hll_merge`) are the documented approximate sibling."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    sizes = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("users_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("users_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("users_a").cast("bigint").alias("users_a"),
            F.col("users_b").cast("bigint").alias("users_b"),
            F.col("overlap").cast("bigint").alias("overlap"),
            F.round(
                F.col("overlap").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "events_conversion_lag",
    """
    WITH s AS (
        SELECT user_id, MIN(EPOCH_US(ts)) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(EPOCH_US(e.ts)) - MAX(s.s_us) AS lag_us
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND EPOCH_US(e.ts) > s.s_us
        GROUP BY e.user_id
    ), r AS (
        SELECT lag_us, ROW_NUMBER() OVER (ORDER BY lag_us, user_id) AS rn,
               COUNT(*) OVER () AS cnt
        FROM p
    )
    SELECT CAST(MAX(cnt) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(CAST(lag_us AS DECIMAL(28,0))) AS DOUBLE)
                 / MAX(cnt) / 3.6e9, 4) AS avg_lag_hours,
           ROUND(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN lag_us END) / 3.6e9, 4)
               AS p50_lag_hours,
           ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.9 * cnt) AS BIGINT)
                          THEN lag_us END) / 3.6e9, 4) AS p90_lag_hours
    FROM r
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion lag distribution: per user, microseconds
    between the first signup and the first purchase after it; reported as
    converted-user count, mean, and explicit-order-statistic p50/p90 (no
    engine interpolation — both engines pick the same ranked element, the
    house exact-median discipline).

    Order statistics never rank the per-user frame through one partition
    (round-5 verdict #3 — lag values are all-distinct at µs granularity,
    so the plain value-histogram demotion of ``stats_mad_outliers`` buys
    nothing here; this is the TWO-LEVEL variant): (1) a coarse HOUR-BUCKET
    histogram — bounded by the observation window (209 buckets at sf0.1),
    not by users — locates, via the cumulative frame, which bucket holds
    each target rank and the residual rank within it; (2) only the two
    target buckets' rows are then ranked, in a window PARTITIONED by
    quantile whose partition size is one bucket's population. At 100 TB
    the per-user frame shuffles once into the bucket histogram
    (map-side combined) and once more for the two-bucket rank — no
    unpartitioned WindowExec over an unbounded frame anywhere in the
    plan (plan-asserted in tests/test_plans.py). Lags are exact integer
    µs until the final divide."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("s_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(us > F.col("s_us"))
        .groupBy("user_id")
        .agg((F.min(us) - F.max("s_us")).alias("lag_us"))
    )
    hour_us = F.lit(3_600_000_000)
    pb = p.select(
        "user_id", "lag_us", F.floor(F.col("lag_us") / hour_us).alias("bkt")
    )
    hist = pb.groupBy("bkt").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_prev = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # cumulative over the BOUNDED bucket frame (hours in the observation
    # window), not over per-user rows
    cum = hist.select(
        "bkt",
        "c",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).alias("cumprev"),
    )
    tot = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col("lag_us").cast("decimal(28,0)")).alias("lag_sum"),
    )
    targets = tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("q"),
                    F.floor((F.col("cnt") + 1) / 2).cast("bigint").alias("k"),
                ),
                F.struct(
                    F.lit("p90").alias("q"),
                    F.ceil(0.9 * F.col("cnt")).cast("bigint").alias("k"),
                ),
            )
        ).alias("t")
    ).select(F.col("t.q").alias("q"), F.col("t.k").alias("k"))
    # locate each target rank's bucket and residual rank within it
    loc = targets.join(
        cum,
        (F.col("k") > F.col("cumprev"))
        & (F.col("k") <= F.col("cumprev") + F.col("c")),
    ).select("q", "bkt", (F.col("k") - F.col("cumprev")).alias("r"))
    wq = Window.partitionBy("q").orderBy("lag_us", "user_id")
    hits = (
        pb.join(F.broadcast(loc), "bkt")
        .select("q", "lag_us", "r", F.row_number().over(wq).alias("rn"))
        .filter(F.col("rn") == F.col("r"))
        .agg(
            F.max(F.when(F.col("q") == "p50", F.col("lag_us"))).alias(
                "p50_us"
            ),
            F.max(F.when(F.col("q") == "p90", F.col("lag_us"))).alias(
                "p90_us"
            ),
        )
    )
    return tot.crossJoin(F.broadcast(hits)).select(
        F.col("cnt").alias("n_converted"),
        F.round(
            F.col("lag_sum").cast("double") / F.col("cnt") / 3.6e9, 4
        ).alias("avg_lag_hours"),
        F.round(F.col("p50_us") / 3.6e9, 4).alias("p50_lag_hours"),
        F.round(F.col("p90_us") / 3.6e9, 4).alias("p90_lag_hours"),
    )


@register(
    "events_user_entropy",
    """
    WITH counts AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    ), probs AS (
        SELECT user_id, c, SUM(c) OVER (PARTITION BY user_id) AS t
        FROM counts
    ), ent AS (
        SELECT user_id,
               CAST(MAX(t) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS INT) AS n_types,
               ROUND(CAST(SUM(CAST(FLOOR(
                   -(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                   * LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9)
                   AS BIGINT)) AS DOUBLE) / 1e9, 6) AS entropy_nats
        FROM probs GROUP BY user_id
    )
    SELECT user_id, n_events, n_types, entropy_nats
    FROM ent ORDER BY entropy_nats DESC, user_id LIMIT 20
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity score: Shannon entropy (nats) of each user's
    event-type mix, top-20 most diverse users — the segmentation feature
    that separates single-purpose visitors from engaged explorers, and
    the same aggregation shape used for bot detection (too-uniform mixes
    score suspiciously high). One (user, type) count pass, a per-user
    window total, then per-term 1e-9 floor quantization before the
    entropy sum (same LN-parity discipline as `text_entropy`). Shuffle ∝
    distinct (user, type) pairs; everything after is per-user-sized."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    probs = counts.select(
        "user_id",
        "c",
        F.sum("c").over(Window.partitionBy("user_id")).alias("t"),
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    term = F.floor(-p * F.log(p) * 1e9).cast("bigint")
    ent = probs.groupBy("user_id").agg(
        F.max("t").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("int").alias("n_types"),
        F.round(F.sum(term).cast("double") / 1e9, 6).alias("entropy_nats"),
    )
    return ent.orderBy(F.col("entropy_nats").desc(), "user_id").limit(20)


@register(
    "events_markov_stationary",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY EPOCH_US(ts), event_id)
                   AS nxt
        FROM events
    ), trans AS (
        SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS DOUBLE) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), p AS (
        SELECT src, dst, c / SUM(c) OVER (PARTITION BY src) AS pr
        FROM trans
    ), types AS (
        SELECT DISTINCT event_type AS t, 1.0 / 5 AS v FROM events
    ), v1 AS (
        SELECT p.dst AS t,
               CAST(SUM(CAST(FLOOR(ty.v * p.pr * 1e12) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS v
        FROM p JOIN types ty ON ty.t = p.src GROUP BY p.dst
    ), v2 AS (
        SELECT p.dst AS t,
               CAST(SUM(CAST(FLOOR(v1.v * p.pr * 1e12) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS v
        FROM p JOIN v1 ON v1.t = p.src GROUP BY p.dst
    )
    SELECT t AS event_type, ROUND(v, 6) AS stationary_share
    FROM v2 ORDER BY event_type
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary behavior mix: two power-iteration steps of the
    event-type Markov chain (uniform start, vᵀP per step) — the long-run
    "where do user journeys spend their time" estimate that a raw count
    histogram biases toward entry events. Linear algebra as joins: the
    25-cell transition matrix broadcasts, each step is a src-keyed join +
    1e-12-quantized sum — at 100 TB only the LEAD sequencing pass
    (user-keyed window over the event stream) touches data; the iteration
    is constant-sized. Deterministic to the bit at any parallelism."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.unix_micros(F.col("ts")), "event_id"
            )
        )
        .alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    p = trans.select(
        "src",
        "dst",
        (F.col("c") / F.sum("c").over(Window.partitionBy("src"))).alias("pr"),
    )
    types = ev.select(F.col("event_type").alias("t")).distinct().withColumn(
        "v", F.lit(1.0 / 5)
    )

    def step(vec: DataFrame) -> DataFrame:
        return (
            p.join(F.broadcast(vec), p["src"] == vec["t"])
            .groupBy(F.col("dst").alias("t"))
            .agg(
                (
                    F.sum(
                        F.floor(F.col("v") * F.col("pr") * 1e12).cast("bigint")
                    ).cast("double")
                    / 1e12
                ).alias("v")
            )
        )

    v2 = step(step(types))
    return v2.select(
        F.col("t").alias("event_type"),
        F.round("v", 6).alias("stationary_share"),
    ).orderBy("event_type")


@register(
    "events_bounce_rate",
    """
    WITH seq AS (
        SELECT user_id, EPOCH_US(ts) AS us,
               LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
                                       ORDER BY EPOCH_US(ts), event_id)
                   AS prev_us
        FROM events
    ), marked AS (
        SELECT user_id, us,
               CASE WHEN prev_us IS NULL
                         OR us - prev_us > 1800000000 THEN 1 ELSE 0 END
                   AS new_session
        FROM seq
    ), sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY us
                                      ROWS UNBOUNDED PRECEDING) AS session_no,
               us
        FROM marked
    ), sized AS (
        SELECT user_id, session_no,
               COUNT(*) AS n_events,
               CAST(FLOOR(MIN(us) / 86400000000) AS BIGINT) AS epoch_day
        FROM sessions GROUP BY user_id, session_no
    )
    SELECT epoch_day,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS bounces,
           ROUND(CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM sized GROUP BY epoch_day ORDER BY epoch_day
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, keyed by the day the session started — the
    engagement KPI that catches landing-page regressions a raw event
    count hides. Same user-keyed gap sessionization as
    `events_sessionize` (one window pass over the per-user stream), one
    per-session rollup, one per-day reduction; everything after the first
    window is session-sized. Exact integer µs and counts."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    marked = ev.select(
        "user_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = marked.select(
        "user_id", "us", F.sum("new_session").over(run).alias("session_no")
    )
    sized = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.min("us") / 86400000000).cast("bigint").alias("epoch_day"),
    )
    return (
        sized.groupBy("epoch_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sessions"),
            F.count_if(F.col("n_events") == 1).cast("bigint").alias("bounces"),
            F.round(
                F.count_if(F.col("n_events") == 1).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("epoch_day")
    )


@register(
    "events_burstiness",
    """
    WITH g AS (
        SELECT user_id,
               (EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
                    PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id))
                   // 1000 AS gap_ms
        FROM events
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(gap_ms) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_ms) AS DOUBLE) AS sum_ms,
               CAST(SUM(CAST(gap_ms AS DECIMAL(19,0)) * gap_ms) AS DOUBLE)
                   AS sumsq_ms
        FROM g
        WHERE gap_ms IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap_ms) >= 5
    )
    SELECT user_id, n_gaps,
           ROUND(sum_ms / n_gaps / 1000.0, 6) AS mean_gap_s,
           ROUND(
               (SQRT(sumsq_ms / n_gaps - (sum_ms/n_gaps)*(sum_ms/n_gaps))
                    - sum_ms / n_gaps)
               / (SQRT(sumsq_ms / n_gaps - (sum_ms/n_gaps)*(sum_ms/n_gaps))
                    + sum_ms / n_gaps), 6) AS burstiness
    FROM s
    ORDER BY user_id
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness coefficient B = (sigma - mu) / (sigma + mu) over
    inter-arrival gaps (Goh & Barabasi 2008): B -> -1 for metronomic
    traffic, 0 for Poisson, +1 for extreme bursts — the bot/automation
    signal behind the velocity flags. Gaps are integer epoch-ms from a
    totally-ordered per-user window; n/sum/sum-of-squares are exact
    integers (squares summed in DECIMAL(38,0) — a 1e25 headroom), so the
    final sqrt/divide runs on bit-identical operands in both engines. One
    user-keyed shuffle, sufficient-statistics reduction."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    g = ev.select(
        "user_id",
        F.floor(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1000
        ).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap_ms").cast("bigint").alias("n_gaps"),
            F.sum("gap_ms").cast("double").alias("sum_ms"),
            F.sum(F.col("gap_ms").cast("decimal(19,0)") * F.col("gap_ms"))
            .cast("double")
            .alias("sumsq_ms"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    mean = F.col("sum_ms") / F.col("n_gaps")
    std = F.sqrt(F.col("sumsq_ms") / F.col("n_gaps") - mean * mean)
    return s.select(
        "user_id",
        "n_gaps",
        F.round(mean / 1000.0, 6).alias("mean_gap_s"),
        F.round((std - mean) / (std + mean), 6).alias("burstiness"),
    ).orderBy("user_id")


@register(
    "events_next_event_accuracy",
    """
    WITH tr AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
               ) AS nxt
        FROM events
    ),
    c AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tr WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    r AS (
        SELECT cur, nxt, cnt,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY cnt DESC, nxt) AS rk,
               SUM(cnt) OVER (PARTITION BY cur) AS tot
        FROM c
    )
    SELECT cur AS from_type, nxt AS predicted_next,
           CAST(tot AS BIGINT) AS n_transitions,
           ROUND(CAST(cnt AS DOUBLE) / tot, 6) AS top1_accuracy
    FROM r WHERE rk = 1
    ORDER BY from_type
    """,
)
def events_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax next-event predictor evaluated in-engine: from the Markov
    transition counts (``events_transitions``' shape), predict the modal
    next event type per current type and report its top-1 hit rate — the
    "how predictable is the journey" baseline every sequence model must
    beat before it earns GPUs. Ties break lexicographically so the
    prediction is deterministic. One per-user LEAD window feeds a
    |types|^2-row aggregate; the ranking window runs over that tiny
    frame, never the raw events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    tr = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = tr.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    wr = Window.partitionBy("cur").orderBy(F.desc("cnt"), F.asc("nxt"))
    wt = Window.partitionBy("cur")
    r = c.select(
        "cur",
        "nxt",
        "cnt",
        F.row_number().over(wr).alias("rk"),
        F.sum("cnt").over(wt).alias("tot"),
    )
    return (
        r.filter(F.col("rk") == 1)
        .select(
            F.col("cur").alias("from_type"),
            F.col("nxt").alias("predicted_next"),
            F.col("tot").cast("bigint").alias("n_transitions"),
            F.round(F.col("cnt").cast("double") / F.col("tot"), 6).alias(
                "top1_accuracy"
            ),
        )
        .orderBy("from_type")
    )


@register(
    "ts_bollinger",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ), d2 AS (
        SELECT day, cents, CAST(FLOOR(cents / 100.0) AS BIGINT) AS dollars
        FROM daily
    ), w AS (
        SELECT day, cents,
               COUNT(*) OVER win AS n,
               SUM(dollars) OVER win AS s,
               SUM(dollars * dollars) OVER win AS ss,
               SUM(cents) OVER win AS sc
        FROM d2
        WINDOW win AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ), b AS (
        SELECT day, cents,
               CAST(sc AS DOUBLE) / 2000.0 AS ma_raw,
               SQRT(CAST(20 * ss - s * s AS DOUBLE) / 380.0) AS sd_raw
        FROM w WHERE n = 20
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(ma_raw, 4) AS ma20,
           ROUND(sd_raw, 4) AS sd20,
           ROUND(ma_raw + 2.0 * sd_raw, 4) AS upper_band,
           ROUND(ma_raw - 2.0 * sd_raw, 4) AS lower_band,
           CAST(CASE WHEN cents / 100.0 > ma_raw + 2.0 * sd_raw THEN 1
                     WHEN cents / 100.0 < ma_raw - 2.0 * sd_raw THEN -1
                     ELSE 0 END AS INT) AS breach
    FROM b ORDER BY day
    """,
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily revenue series: 20-day rolling mean
    ± 2 rolling standard deviations, plus a breach flag (+1 above the
    upper band, −1 below the lower) — the volatility-envelope anomaly
    primitive for any KPI series. Determinism discipline: the daily sum
    is floor-quantized cents (exact integers), the rolling mean divides
    the exact cents sum once, and the rolling variance is the exact
    integer ``20·Σx² − (Σx)²`` over whole-dollar quantities divided by
    380 — no order-dependent double accumulation anywhere, so bands are
    bit-identical at any parallelism (at petabyte day-counts the
    integer sums ride in DECIMAL(38,0) instead of BIGINT; same plan).
    Scale shape: one grouped sum over the fact table shuffles ∝ distinct
    days; the window pass runs on the tiny daily frame."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .withColumn("dollars", F.floor(F.col("cents") / 100.0).cast("long"))
    )
    win = Window.orderBy("day").rowsBetween(-19, 0)
    w = daily.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("dollars").over(win).alias("s"),
        F.sum(F.col("dollars") * F.col("dollars")).over(win).alias("ss"),
        F.sum("cents").over(win).alias("sc"),
    ).filter(F.col("n") == 20)
    b = w.select(
        "day",
        "cents",
        (F.col("sc").cast("double") / 2000.0).alias("ma_raw"),
        F.sqrt(
            (20 * F.col("ss") - F.col("s") * F.col("s")).cast("double") / 380.0
        ).alias("sd_raw"),
    )
    rev = F.col("cents") / 100.0
    up = F.col("ma_raw") + 2.0 * F.col("sd_raw")
    lo = F.col("ma_raw") - 2.0 * F.col("sd_raw")
    return b.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(rev, 2).alias("revenue"),
        F.round("ma_raw", 4).alias("ma20"),
        F.round("sd_raw", 4).alias("sd20"),
        F.round(up, 4).alias("upper_band"),
        F.round(lo, 4).alias("lower_band"),
        F.when(rev > up, F.lit(1))
        .when(rev < lo, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("breach"),
    ).orderBy("day")


@register(
    "ts_hurst",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                          / 100.0) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn FROM daily
    ), sized AS (
        SELECT m.m, CAST(FLOOR(rn / m.m) AS BIGINT) AS blk,
               rn % m.m AS t, x
        FROM idx CROSS JOIN (SELECT UNNEST([8, 16, 32, 64]) AS m) m
    ), cum AS (
        SELECT m, blk, t, x,
               SUM(x) OVER (PARTITION BY m, blk ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cs,
               SUM(x) OVER (PARTITION BY m, blk) AS bs
        FROM sized
    ), blkagg AS (
        SELECT m, blk,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS ss,
               CAST(MAX(m * cs - (t + 1) * bs) AS BIGINT) AS zmax,
               CAST(MIN(m * cs - (t + 1) * bs) AS BIGINT) AS zmin
        FROM cum GROUP BY m, blk
    ), rs AS (
        SELECT m,
               CAST(SUM(CAST(FLOOR(
                   CAST(zmax - zmin AS DOUBLE)
                   / SQRT(CAST(m * ss - s * s AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS rs_q,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM blkagg
        WHERE n = m AND m * ss - s * s > 0
        GROUP BY m
    ), pts AS (
        SELECT MAX(CASE WHEN m = 8 THEN CAST(rs_q AS DOUBLE) / 1e6 / nb END)
                   AS r8,
               MAX(CASE WHEN m = 16 THEN CAST(rs_q AS DOUBLE) / 1e6 / nb END)
                   AS r16,
               MAX(CASE WHEN m = 32 THEN CAST(rs_q AS DOUBLE) / 1e6 / nb END)
                   AS r32,
               MAX(CASE WHEN m = 64 THEN CAST(rs_q AS DOUBLE) / 1e6 / nb END)
                   AS r64
        FROM rs
    )
    SELECT ROUND(r8, 4) AS rs_8, ROUND(r16, 4) AS rs_16,
           ROUND(r32, 4) AS rs_32, ROUND(r64, 4) AS rs_64,
           ROUND((4.0 * (LN(8.0) * LN(r8) + LN(16.0) * LN(r16)
                         + LN(32.0) * LN(r32) + LN(64.0) * LN(r64))
                  - (LN(8.0) + LN(16.0) + LN(32.0) + LN(64.0))
                    * (LN(r8) + LN(r16) + LN(r32) + LN(r64)))
                 / (4.0 * (LN(8.0) * LN(8.0) + LN(16.0) * LN(16.0)
                           + LN(32.0) * LN(32.0) + LN(64.0) * LN(64.0))
                    - (LN(8.0) + LN(16.0) + LN(32.0) + LN(64.0))
                      * (LN(8.0) + LN(16.0) + LN(32.0) + LN(64.0))), 4)
               AS hurst
    FROM pts
    """,
)
def ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily revenue series by classic rescaled-range
    (R/S) analysis: split the series into blocks of 8/16/32/64 days,
    compute each block's range-of-cumulative-deviations over its std,
    average per size, and fit the log-log slope — H≈0.5 says random walk,
    H>0.5 long-range persistence (seasonality/trend memory the forecast
    operators should exploit). Exactness discipline: block deviations use
    the integer identity ``m·cumsum − t·blocksum`` (no mean subtraction in
    doubles), the R/S ratio is the ONLY double op and is floor-quantized
    before the per-size average, and the 4-point OLS slope is a
    fixed-form closed expression on one pivoted row — bit-stable at any
    parallelism. Shape: one grouped sum to the daily frame, a 4× explode
    of THAT small frame, window cumsums inside (size, block) keys — at
    100 TB only the first pass touches the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.floor(
                F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
                / 100.0
            )
            .cast("long")
            .alias("x")
        )
    )
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("rn")
    )
    sizes = spark.range(0).sparkSession.createDataFrame(
        [(8,), (16,), (32,), (64,)], "m: int"
    )
    sized = idx.crossJoin(F.broadcast(sizes)).select(
        "m",
        F.floor(F.col("rn") / F.col("m")).cast("bigint").alias("blk"),
        (F.col("rn") % F.col("m")).alias("t"),
        "x",
    )
    wcum = (
        Window.partitionBy("m", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("m", "blk")
    cum = sized.select(
        "m",
        "blk",
        "t",
        "x",
        F.sum("x").over(wcum).alias("cs"),
        F.sum("x").over(wall).alias("bs"),
    )
    z = (F.col("m") * F.col("cs") - (F.col("t") + 1) * F.col("bs")).cast(
        "bigint"
    )
    blkagg = cum.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
        F.max(z).cast("bigint").alias("zmax"),
        F.min(z).cast("bigint").alias("zmin"),
    )
    var_n = (F.col("m") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    rs = (
        blkagg.filter(
            (F.col("n") == F.col("m"))
            & (F.col("m") * F.col("ss") - F.col("s") * F.col("s") > 0)
        )
        .groupBy("m")
        .agg(
            F.sum(
                F.floor(
                    (F.col("zmax") - F.col("zmin")).cast("double")
                    / F.sqrt(var_n)
                    * 1e6
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("rs_q"),
            F.count(F.lit(1)).cast("bigint").alias("nb"),
        )
    )

    def pick(m: int):
        return F.max(
            F.when(
                F.col("m") == m, F.col("rs_q").cast("double") / 1e6 / F.col("nb")
            )
        )

    pts = rs.agg(
        pick(8).alias("r8"),
        pick(16).alias("r16"),
        pick(32).alias("r32"),
        pick(64).alias("r64"),
    )
    import math

    lns = [math.log(m) for m in (8, 16, 32, 64)]
    sx = sum(lns)
    sxx = sum(v * v for v in lns)
    ly = [F.ln(F.col(c)) for c in ("r8", "r16", "r32", "r64")]
    sxy = (
        F.lit(lns[0]) * ly[0]
        + F.lit(lns[1]) * ly[1]
        + F.lit(lns[2]) * ly[2]
        + F.lit(lns[3]) * ly[3]
    )
    sy = ly[0] + ly[1] + ly[2] + ly[3]
    slope = (4.0 * sxy - F.lit(sx) * sy) / F.lit(4.0 * sxx - sx * sx)
    return pts.select(
        F.round("r8", 4).alias("rs_8"),
        F.round("r16", 4).alias("rs_16"),
        F.round("r32", 4).alias("rs_32"),
        F.round("r64", 4).alias("rs_64"),
        F.round(slope, 4).alias("hurst"),
    )


@register(
    "ts_rsi",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), diffs AS (
        SELECT day, cents,
               cents - LAG(cents) OVER (ORDER BY day) AS d
        FROM daily
    ), gl AS (
        SELECT day, cents,
               GREATEST(d, 0) AS gain, GREATEST(-d, 0) AS loss,
               COUNT(d) OVER win AS n,
               SUM(GREATEST(d, 0)) OVER win AS sg,
               SUM(GREATEST(-d, 0)) OVER win AS sl
        FROM diffs
        WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(100.0 * sg / (sg + sl), 4) AS rsi,
           CASE WHEN 100.0 * sg / (sg + sl) > 70.0 THEN 'overbought'
                WHEN 100.0 * sg / (sg + sl) < 30.0 THEN 'oversold'
                ELSE 'neutral' END AS signal
    FROM gl WHERE n = 14 AND sg + sl > 0
    ORDER BY day
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Cutler's 14-day SMA variant) over the
    daily order-revenue series, with overbought/oversold signals — the
    momentum-oscillator anomaly primitive, stated window-functionally
    (the SMA variant, unlike Wilder's recursive EMA, is a pure sliding
    window — the form you want distributed). Exact throughout: daily
    closes are integer cents, day-over-day gains/losses are integer
    differences, the 14-day sums are exact, and RSI = 100·Σgain/(Σgain+
    Σloss) is one final division — bit-stable at any parallelism.
    Shape: one grouped sum over the fact table (shuffle ∝ distinct
    days), then lag + sliding window on the tiny daily frame."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wlag = Window.orderBy("day")
    diffs = daily.select(
        "day", "cents", (F.col("cents") - F.lag("cents").over(wlag)).alias("d")
    )
    win = Window.orderBy("day").rowsBetween(-13, 0)
    gain = F.greatest(F.col("d"), F.lit(0))
    loss = F.greatest(-F.col("d"), F.lit(0))
    gl = diffs.select(
        "day",
        "cents",
        F.count("d").over(win).alias("n"),
        F.sum(gain).over(win).alias("sg"),
        F.sum(loss).over(win).alias("sl"),
    ).filter((F.col("n") == 14) & (F.col("sg") + F.col("sl") > 0))
    rsi = 100.0 * F.col("sg") / (F.col("sg") + F.col("sl"))
    return gl.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(rsi, 4).alias("rsi"),
        F.when(rsi > 70.0, F.lit("overbought"))
        .when(rsi < 30.0, F.lit("oversold"))
        .otherwise(F.lit("neutral"))
        .alias("signal"),
    ).orderBy("day")


@register(
    "events_peak_detection",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), w AS (
        SELECT day, cnt,
               LAG(cnt) OVER (ORDER BY day) AS prv,
               LEAD(cnt) OVER (ORDER BY day) AS nxt,
               COUNT(*) OVER win AS n,
               SUM(cnt) OVER win AS s
        FROM daily
        WINDOW win AS (ORDER BY day ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           cnt,
           ROUND(CAST(s AS DOUBLE) / 11.0, 2) AS local_mean,
           ROUND(CAST(11 * cnt AS DOUBLE) / s, 4) AS prominence
    FROM w
    WHERE n = 11 AND cnt > prv AND cnt > nxt AND 100 * 11 * cnt > 105 * s
    ORDER BY day
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection on the daily event-count series: a day is a peak
    iff it strictly exceeds both neighbors AND rises >5% above its
    centered 11-day local mean (the fixture's ~uniform arrivals make
    large bursts rare; the threshold is a parameter) — the burst-day
    detector behind incident review and campaign attribution. The
    prominence threshold is evaluated as the pure INTEGER inequality
    ``1100·cnt > 105·Σwindow``
    (no double compare can flip on a boundary tie), and the local mean
    is only materialized for display — results are bit-identical at any
    parallelism. One grouped count (shuffle ∝ distinct days), then
    lag/lead + one sliding window over the daily frame; full-window
    days only, so edges never fake a peak."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wo = Window.orderBy("day")
    win = Window.orderBy("day").rowsBetween(-5, 5)
    w = daily.select(
        "day",
        "cnt",
        F.lag("cnt").over(wo).alias("prv"),
        F.lead("cnt").over(wo).alias("nxt"),
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cnt").over(win).alias("s"),
    )
    return (
        w.filter(
            (F.col("n") == 11)
            & (F.col("cnt") > F.col("prv"))
            & (F.col("cnt") > F.col("nxt"))
            & (100 * 11 * F.col("cnt") > 105 * F.col("s"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            F.round(F.col("s").cast("double") / 11.0, 2).alias("local_mean"),
            F.round((11 * F.col("cnt")).cast("double") / F.col("s"), 4).alias(
                "prominence"
            ),
        )
        .orderBy("day")
    )


@register(
    "events_dow_effect",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ISODOW(CAST(ts AS DATE)) AS INT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), g AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS total
        FROM daily GROUP BY 1
    ), o AS (
        SELECT CAST(SUM(total) AS BIGINT) AS grand,
               CAST(SUM(n_days) AS BIGINT) AS all_days
        FROM g
    )
    SELECT g.dow,
           g.n_days, g.total,
           ROUND(CAST(g.total AS DOUBLE) / g.n_days, 2) AS mean_per_day,
           ROUND((CAST(g.total AS DOUBLE) / g.n_days)
                 / (CAST(o.grand AS DOUBLE) / o.all_days), 4) AS lift,
           ROUND((CAST(g.total AS DOUBLE)
                  - CAST(g.n_days AS DOUBLE) * o.grand / o.all_days)
                 / SQRT(CAST(g.n_days AS DOUBLE) * o.grand / o.all_days), 4)
               AS z_poisson
    FROM g CROSS JOIN o ORDER BY g.dow
    """,
)
def events_dow_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect on event volume: per-ISO-weekday mean daily
    count, lift vs the all-days mean, and a Poisson z-score for whether
    the weekday's total deviates from its expected share — the
    calendar-seasonality screen run before any forecasting operator.
    Counts are exact integers end-to-end; lift and z are fixed-form
    final expressions over one 7-row frame joined to one 1-row frame —
    bit-stable at any parallelism. Shape: one grouped count (shuffle ∝
    distinct days), one 7-row rollup; at 100 TB only the first count
    touches the data."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.dayofweek(F.to_date("ts")).alias("dow_sun1"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # Spark dayofweek: Sunday=1; ISO dow: Monday=1..Sunday=7
    daily = daily.withColumn(
        "dow",
        F.when(F.col("dow_sun1") == 1, F.lit(7)).otherwise(
            F.col("dow_sun1") - 1
        ).cast("int"),
    )
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    o = g.agg(
        F.sum("total").cast("bigint").alias("grand"),
        F.sum("n_days").cast("bigint").alias("all_days"),
    )
    mean = F.col("total").cast("double") / F.col("n_days")
    expect = (
        F.col("n_days").cast("double") * F.col("grand") / F.col("all_days")
    )
    return (
        g.crossJoin(F.broadcast(o))
        .select(
            "dow",
            "n_days",
            "total",
            F.round(mean, 2).alias("mean_per_day"),
            F.round(
                mean / (F.col("grand").cast("double") / F.col("all_days")), 4
            ).alias("lift"),
            F.round(
                (F.col("total").cast("double") - expect) / F.sqrt(expect), 4
            ).alias("z_poisson"),
        )
        .orderBy("dow")
    )


@register(
    "ts_sma_crossover",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), w AS (
        SELECT day, cents,
               COUNT(*) OVER w50 AS n50,
               SUM(cents) OVER w20 AS s20,
               SUM(cents) OVER w50 AS s50
        FROM daily
        WINDOW w20 AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
               w50 AS (ORDER BY day ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    ), s AS (
        SELECT day, s20, s50,
               CASE WHEN 5 * s20 > 2 * s50 THEN 1
                    WHEN 5 * s20 < 2 * s50 THEN -1 ELSE 0 END AS sgn
        FROM w WHERE n50 = 50
    ), x AS (
        SELECT day, s20, s50, sgn,
               LAG(sgn) OVER (ORDER BY day) AS prev_sgn
        FROM s
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           FLOOR((s20 + 10) / 20.0) / 100.0 AS sma20,
           FLOOR((s50 + 25) / 50.0) / 100.0 AS sma50,
           CASE WHEN sgn > prev_sgn THEN 'golden_cross'
                ELSE 'death_cross' END AS signal
    FROM x WHERE prev_sgn IS NOT NULL AND sgn <> prev_sgn AND sgn <> 0
    ORDER BY day
    """,
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detector on daily revenue: days where the
    20-day SMA crosses the 50-day SMA (golden cross up, death cross
    down) — the regime-change signal primitive. The comparison never
    touches a double: SMA20 > SMA50 ⇔ 5·Σ20 > 2·Σ50 over exact integer
    cents (common denominator 100), so the crossing days are
    bit-identical at any parallelism; the displayed SMAs are final-form
    divisions. One grouped sum (shuffle ∝ distinct days), two frame
    sizes over one ordered window pass, one lag."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    w50 = Window.orderBy("day").rowsBetween(-49, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(w50).alias("n50"),
        F.sum("cents").over(w20).alias("s20"),
        F.sum("cents").over(w50).alias("s50"),
    ).filter(F.col("n50") == 50)
    sgn = (
        F.when(5 * F.col("s20") > 2 * F.col("s50"), F.lit(1))
        .when(5 * F.col("s20") < 2 * F.col("s50"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s = w.select("day", "s20", "s50", sgn.alias("sgn"))
    x = s.withColumn("prev_sgn", F.lag("sgn").over(Window.orderBy("day")))
    return (
        x.filter(
            F.col("prev_sgn").isNotNull()
            & (F.col("sgn") != F.col("prev_sgn"))
            & (F.col("sgn") != 0)
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            # the SMAs are exact rationals (integer cents / window size);
            # ROUND of their double form flips at .5 representation
            # boundaries (sf0.001 gate, round 10) — half-up in integer
            # space: floor(s/w + 1/2) == floor((s + w/2) / w)
            (F.floor((F.col("s20") + 10) / 20.0) / 100.0).alias("sma20"),
            (F.floor((F.col("s50") + 25) / 50.0) / 100.0).alias("sma50"),
            F.when(F.col("sgn") > F.col("prev_sgn"), F.lit("golden_cross"))
            .otherwise(F.lit("death_cross"))
            .alias("signal"),
        )
        .orderBy("day")
    )


@register(
    "events_bot_detection",
    """
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
                   AS span_us
        FROM events GROUP BY 1
    ), tc AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), dom AS (
        SELECT user_id, CAST(MAX(c) AS BIGINT) AS top_cnt FROM tc GROUP BY 1
    ), flags AS (
        SELECT u.user_id, u.n_events,
               ROUND(CAST(u.n_events AS DOUBLE) / u.n_days, 4)
                   AS events_per_day,
               ROUND(CAST(dom.top_cnt AS DOUBLE) / u.n_events, 4)
                   AS top_type_share,
               ROUND(CAST(u.span_us AS DOUBLE) / (u.n_events - 1) / 1e6, 2)
                   AS mean_gap_s,
               CAST(CASE WHEN 10 * u.n_events > 28 * u.n_days
                         THEN 1 ELSE 0 END AS INT) AS f_velocity,
               CAST(CASE WHEN 100 * dom.top_cnt > 28 * u.n_events
                         THEN 1 ELSE 0 END AS INT) AS f_monotone,
               CAST(CASE WHEN u.span_us < 33000000000 * (u.n_events - 1)
                         THEN 1 ELSE 0 END AS INT) AS f_rapid
        FROM u JOIN dom ON dom.user_id = u.user_id
        WHERE u.n_events > 1
    )
    SELECT user_id, n_events, events_per_day, top_type_share, mean_gap_s,
           f_velocity, f_monotone, f_rapid,
           CAST(f_velocity + f_monotone + f_rapid AS INT) AS bot_score
    FROM flags
    WHERE f_velocity + f_monotone + f_rapid >= 1
    ORDER BY bot_score DESC, user_id
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot scoring per user: three independent flags — daily
    velocity above 2.8 events/day, one event type above a 28% dominance
    share, mean inter-event gap under 33000 s — summed into a ranked
    bot score, the abuse-triage pass that runs before any model. Every
    flag is a PURE INTEGER inequality (10n > 28d; 100·top > 28n;
    span_µs < 33e9·(n−1)) so no boundary tie can flip with summation
    order — results are bit-identical at any parallelism; the displayed
    rates are final-form divisions. Shape: two grouped passes over
    events (per-user and per-(user, type), both shuffle ∝ users) joined
    on user_id; the flag filter keeps the output to the suspicious tail
    at any scale. Thresholds are fixture-calibrated parameters of the
    rule engine, not constants of the operator."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("n_days"),
        (F.max(us) - F.min(us)).cast("bigint").alias("span_us"),
    )
    dom = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("bigint").alias("top_cnt"))
    )
    j = u.join(dom, "user_id").filter(F.col("n_events") > 1)
    f_velocity = (
        F.when(10 * F.col("n_events") > 28 * F.col("n_days"), 1)
        .otherwise(0)
        .cast("int")
    )
    f_monotone = (
        F.when(100 * F.col("top_cnt") > 28 * F.col("n_events"), 1)
        .otherwise(0)
        .cast("int")
    )
    f_rapid = (
        F.when(
            F.col("span_us") < F.lit(33000000000) * (F.col("n_events") - 1), 1
        )
        .otherwise(0)
        .cast("int")
    )
    flags = j.select(
        "user_id",
        "n_events",
        F.round(F.col("n_events").cast("double") / F.col("n_days"), 4).alias(
            "events_per_day"
        ),
        F.round(
            F.col("top_cnt").cast("double") / F.col("n_events"), 4
        ).alias("top_type_share"),
        F.round(
            F.col("span_us").cast("double") / (F.col("n_events") - 1) / 1e6, 2
        ).alias("mean_gap_s"),
        f_velocity.alias("f_velocity"),
        f_monotone.alias("f_monotone"),
        f_rapid.alias("f_rapid"),
    )
    score = F.col("f_velocity") + F.col("f_monotone") + F.col("f_rapid")
    return (
        flags.withColumn("bot_score", score.cast("int"))
        .filter(F.col("bot_score") >= 1)
        .orderBy(F.col("bot_score").desc(), "user_id")
    )


@register(
    "events_conversion_windows",
    """
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ), p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS conv_us
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
        GROUP BY 1
    ), lagt AS (
        SELECT s.user_id,
               p.conv_us - s.signup_us AS lag_us
        FROM s LEFT JOIN p ON p.user_id = s.user_id
    ), wins AS (SELECT UNNEST([1, 3, 7]) AS w_days)
    SELECT w.w_days,
           CAST(COUNT(*) AS BIGINT) AS n_signup_users,
           CAST(COUNT(*) FILTER (
               WHERE lag_us IS NOT NULL
                 AND lag_us <= w.w_days * 86400000000) AS BIGINT)
               AS n_converted,
           ROUND(CAST(COUNT(*) FILTER (
               WHERE lag_us IS NOT NULL
                 AND lag_us <= w.w_days * 86400000000) AS DOUBLE)
                 / COUNT(*), 6) AS conversion_rate
    FROM lagt CROSS JOIN wins w
    GROUP BY w.w_days ORDER BY w.w_days
    """,
)
def events_conversion_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity for the signup→purchase funnel:
    the conversion rate under 1-, 3-, and 7-day windows computed in ONE
    pass — the analysis that tells you how much of "conversion" is just
    window definition. Per-user first-signup and first-subsequent-
    purchase are exact epoch-µs minima; the per-window test is a pure
    integer comparison against W·86400·10⁶, fanned out by a 3-row
    cross join on the per-USER frame (never the raw events) — the same
    explode-the-aggregate trick as the permutation test. At 100 TB:
    two grouped passes over events, then a 3× fan-out of the small
    frame."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("signup_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(us >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min(us).alias("conv_us"))
    )
    lagt = s.join(p, "user_id", "left").select(
        "user_id", (F.col("conv_us") - F.col("signup_us")).alias("lag_us")
    )
    wins = spark.createDataFrame([(1,), (3,), (7,)], "w_days: int")
    conv = F.col("lag_us").isNotNull() & (
        F.col("lag_us") <= F.col("w_days").cast("bigint") * F.lit(86400000000)
    )
    return (
        lagt.crossJoin(F.broadcast(wins))
        .groupBy("w_days")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signup_users"),
            F.count_if(conv).cast("bigint").alias("n_converted"),
            F.round(
                F.count_if(conv).cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
        .orderBy("w_days")
    )


@register(
    "ts_periodogram",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), idx AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t,
               AVG(cnt) OVER () AS mu
        FROM daily
    ), p AS (
        SELECT per.p,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * COS(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS c_q,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * SIN(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS s_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM idx CROSS JOIN (SELECT UNNEST([7, 14, 30]) AS p) per
        GROUP BY per.p
    )
    SELECT p AS period_days,
           ROUND((POW(c_q / 1e6, 2.0) + POW(s_q / 1e6, 2.0)) / n, 4)
               AS power,
           n AS n_days
    FROM p ORDER BY period_days
    """,
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram probe of the daily event-count series at candidate
    periods 7/14/30 days: spectral power |Σ(x−μ)e^{−2πit/p}|²/n — the
    Fourier test for "is there weekly seasonality", complementing the
    groupBy-shaped seasonality operators with the spectral view. Each
    cos/sin projection term is floor-quantized to micro-units and
    integer-summed (order-independent); the power is a fixed-form final
    expression. The 3× period fan-out happens on the DAILY frame, not
    the raw events — one grouped count, one tiny cross join, one more
    grouped sum. μ is the windowed full-frame average of exact integer
    counts, identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wall = Window.partitionBy()
    idx = daily.select(
        "cnt",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        F.avg("cnt").over(wall).alias("mu"),
    )
    pers = spark.createDataFrame([(7,), (14,), (30,)], "p: int")
    import math as _math

    ang = 2 * _math.pi * F.col("t") / F.col("p")
    p = (
        idx.crossJoin(F.broadcast(pers))
        .groupBy("p")
        .agg(
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.cos(ang) * 1e6).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("c_q"),
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.sin(ang) * 1e6).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("s_q"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return p.select(
        F.col("p").alias("period_days"),
        F.round(
            (
                F.pow(F.col("c_q") / 1e6, 2.0)
                + F.pow(F.col("s_q") / 1e6, 2.0)
            )
            / F.col("n"),
            4,
        ).alias("power"),
        F.col("n").alias("n_days"),
    ).orderBy("period_days")


@register(
    "events_order_violations",
    """
    WITH s AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               epoch_us(ts) AS us
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ), m AS (
        SELECT user_id, day,
               MIN(CASE WHEN event_type = 'view' THEN us END) AS first_view,
               MIN(CASE WHEN event_type = 'click' THEN us END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase' THEN us END)
                   AS first_purchase
        FROM s GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE first_click IS NOT NULL
                                   AND (first_view IS NULL
                                        OR first_click < first_view))
                AS BIGINT) AS click_before_view,
           CAST(COUNT(*) FILTER (WHERE first_purchase IS NOT NULL
                                   AND (first_click IS NULL
                                        OR first_purchase < first_click))
                AS BIGINT) AS purchase_before_click,
           CAST(COUNT(*) FILTER (WHERE first_purchase IS NOT NULL
                                   AND (first_view IS NULL
                                        OR first_purchase < first_view))
                AS BIGINT) AS purchase_before_view,
           ROUND(CAST(COUNT(*) FILTER (
                     WHERE (first_click IS NOT NULL
                            AND (first_view IS NULL
                                 OR first_click < first_view))
                        OR (first_purchase IS NOT NULL
                            AND (first_click IS NULL
                                 OR first_purchase < first_click))) AS DOUBLE)
                 / COUNT(*), 6) AS violation_rate
    FROM m
    """,
)
def events_order_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-order contract validation per user-day session: a healthy
    funnel sees view → click → purchase; this counts sessions where the
    first click precedes any view, or the first purchase precedes any
    click/view — the data-quality check that catches instrumentation
    bugs (mis-clocked SDKs, replayed batches) before they poison funnel
    metrics. First-occurrence timestamps are exact epoch-µs minima per
    (user, day); every violation test is an integer comparison. One
    grouped pass (shuffle ∝ sessions) + one global conditional-count
    reduction — the same two-stage shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    m = s.groupBy("user_id", "day").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "first_purchase"
        ),
    )
    cbv = F.col("first_click").isNotNull() & (
        F.col("first_view").isNull()
        | (F.col("first_click") < F.col("first_view"))
    )
    pbc = F.col("first_purchase").isNotNull() & (
        F.col("first_click").isNull()
        | (F.col("first_purchase") < F.col("first_click"))
    )
    pbv = F.col("first_purchase").isNotNull() & (
        F.col("first_view").isNull()
        | (F.col("first_purchase") < F.col("first_view"))
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count_if(cbv).cast("bigint").alias("click_before_view"),
        F.count_if(pbc).cast("bigint").alias("purchase_before_click"),
        F.count_if(pbv).cast("bigint").alias("purchase_before_view"),
        F.round(
            F.count_if(cbv | pbc).cast("double") / F.count(F.lit(1)), 6
        ).alias("violation_rate"),
    )


@register(
    "ts_hampel_filter",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), framed AS (
        SELECT day, x,
               LIST_SORT(LIST(x) OVER (ORDER BY day
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS arr
        FROM daily
    ), med AS (
        SELECT day, x, LEN(arr) AS n,
               arr[CAST(FLOOR((LEN(arr) + 1) / 2.0) AS BIGINT)]
               + arr[CAST(FLOOR((LEN(arr) + 2) / 2.0) AS BIGINT)] AS med2
        FROM framed
    ), dev AS (
        SELECT day, x, n, med2,
               LIST_SORT(LIST(ABS(2 * x - med2)) OVER (ORDER BY day
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS darr
        FROM med
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           ROUND(x / 100.0, 2) AS value,
           ROUND(med2 / 200.0, 2) AS rolling_median,
           ROUND((darr[CAST(FLOOR((LEN(darr) + 1) / 2.0) AS BIGINT)]
                  + darr[CAST(FLOOR((LEN(darr) + 2) / 2.0) AS BIGINT)])
                 / 400.0, 2) AS rolling_mad,
           CAST(CASE WHEN CAST(ABS(2 * x - med2) AS DOUBLE) * 10000
                          > 3 * 14826
                            * CAST(darr[CAST(FLOOR((LEN(darr) + 1) / 2.0)
                                             AS BIGINT)]
                                   + darr[CAST(FLOOR((LEN(darr) + 2) / 2.0)
                                               AS BIGINT)] AS DOUBLE) / 2
                     THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM dev WHERE n = 11 ORDER BY day
    """,
)
def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter on the daily value series: flag days whose
    deviation from the centered 11-day rolling MEDIAN exceeds
    3 × 1.4826 × rolling MAD — the robust despiking filter that, unlike
    z-scores, is immune to the outliers it hunts. Exactness: the window
    is collected as a sorted integer array (exact cents), the median is
    carried DOUBLED (lo+hi, still integer), the MAD doubles again via
    |2x − med2| — so the outlier test reduces to the pure integer
    comparison ``|2x−med2|·10⁴ > 3·14826·mad2/2`` with no float
    boundary ambiguity (14826 = 1.4826·10⁴). This is the decomposed
    two-pass Hampel variant: pass 1 computes every point's own rolling
    median, pass 2 takes the rolling median of the resulting deviation
    SERIES (streaming-friendly: each pass is one windowed scan, vs the
    textbook per-center re-median which is quadratic in window size).
    Shape: one grouped sum to
    the daily frame, two windowed array collects over it (window = 11
    ints, bounded memory). At 100 TB the daily frame is still tiny;
    for high-frequency series the same plan runs range-partitioned."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    win = Window.orderBy("day").rowsBetween(-5, 5)
    framed = daily.select(
        "day",
        "x",
        F.array_sort(F.collect_list("x").over(win)).alias("arr"),
    )

    def med2(arr):
        n = F.size(arr)
        lo = F.element_at(arr, F.floor((n + 1) / 2.0).cast("int"))
        hi = F.element_at(arr, F.floor((n + 2) / 2.0).cast("int"))
        return lo + hi

    med = framed.select(
        "day", "x", F.size("arr").alias("n"), med2(F.col("arr")).alias("med2")
    )
    dev = med.select(
        "day",
        "x",
        "n",
        "med2",
        F.array_sort(
            F.collect_list(F.abs(2 * F.col("x") - F.col("med2"))).over(win)
        ).alias("darr"),
    )
    mad2 = med2(F.col("darr"))
    return (
        dev.filter(F.col("n") == 11)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("x") / 100.0, 2).alias("value"),
            F.round(F.col("med2") / 200.0, 2).alias("rolling_median"),
            F.round(mad2 / 400.0, 2).alias("rolling_mad"),
            F.when(
                F.abs(2 * F.col("x") - F.col("med2")).cast("double") * 10000
                > 3 * 14826 * mad2.cast("double") / 2,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_outlier"),
        )
        .orderBy("day")
    )


@register(
    "ts_haar_energy",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t FROM daily
    ), lv AS (
        SELECT l.lvl, CAST(FLOOR(t / (2 * POW(2, l.lvl - 1))) AS BIGINT)
                   AS blk,
               CAST(t % CAST(2 * POW(2, l.lvl - 1) AS BIGINT)
                    < POW(2, l.lvl - 1) AS INT) AS half,
               x
        FROM idx CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS lvl) l
    ), pairs AS (
        SELECT lvl, blk,
               CAST(SUM(CASE WHEN half = 1 THEN x ELSE 0 END) AS BIGINT)
                   AS left_sum,
               CAST(SUM(CASE WHEN half = 0 THEN x ELSE 0 END) AS BIGINT)
                   AS right_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lv GROUP BY 1, 2
    ), detail AS (
        SELECT lvl,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(CAST(FLOOR(
                   POW((left_sum - right_sum)
                       / POW(2, lvl) / 100.0, 2.0)) AS BIGINT)) AS BIGINT)
                   AS energy_q
        FROM pairs WHERE n = CAST(2 * POW(2, lvl - 1) AS BIGINT)
        GROUP BY 1
    )
    SELECT lvl AS level,
           CAST(POW(2, lvl) AS BIGINT) AS block_days,
           n_blocks,
           CAST(energy_q AS DOUBLE) AS detail_energy
    FROM detail ORDER BY level
    """,
)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet detail energy of the daily revenue series at three
    dyadic scales (2/4/8-day blocks): each level's detail coefficient is
    (left-half sum − right-half sum)/2^level, and the per-level energy
    Σd² localizes WHERE the series' variance lives — fast scales mean
    day-to-day noise, slow scales mean regime drift (the multiresolution
    companion to the Fourier periodogram, which localizes frequency but
    not time). Block sums are exact integer cents; the detail energy
    floor-quantizes each squared coefficient before the integer sum.
    Shape: one grouped sum to the daily frame, a 3-level fan-out of
    THAT frame, and one grouped pass per the (level, block) key — at
    100 TB the fact-table pass is the entire cost."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    )
    lvls = spark.createDataFrame([(1,), (2,), (3,)], "lvl: int")
    half_len = F.pow(2.0, F.col("lvl") - 1)
    blk_len = 2 * half_len
    lv = idx.crossJoin(F.broadcast(lvls)).select(
        "lvl",
        F.floor(F.col("t") / blk_len).cast("bigint").alias("blk"),
        (F.col("t") % blk_len.cast("bigint") < half_len)
        .cast("int")
        .alias("half"),
        "x",
    )
    pairs = lv.groupBy("lvl", "blk").agg(
        F.sum(F.when(F.col("half") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("left_sum"),
        F.sum(F.when(F.col("half") == 0, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("right_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    coeff = (
        (F.col("left_sum") - F.col("right_sum"))
        / F.pow(2.0, F.col("lvl"))
        / 100.0
    )
    detail = (
        pairs.filter(
            F.col("n") == (2 * F.pow(2.0, F.col("lvl") - 1)).cast("bigint")
        )
        .groupBy("lvl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.floor(F.pow(coeff, 2.0)).cast("long"))
            .cast("bigint")
            .alias("energy_q"),
        )
    )
    return detail.select(
        F.col("lvl").alias("level"),
        F.pow(2.0, F.col("lvl")).cast("bigint").alias("block_days"),
        "n_blocks",
        F.col("energy_q").cast("double").alias("detail_energy"),
    ).orderBy("level")


@register(
    "events_markov_entropy",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS nxt
        FROM events
    ), trans AS (
        SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), rowtot AS (
        SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM trans GROUP BY 1
    ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM trans),
    rows_h AS (
        SELECT t.a, r.ra, tot.n,
               CAST(SUM(CAST(FLOOR(
                   -1.0 * (CAST(t.c AS DOUBLE) / r.ra)
                   * LN(CAST(t.c AS DOUBLE) / r.ra) / LN(2.0) * 1e9)
                   AS BIGINT)) AS BIGINT) AS h_q
        FROM trans t JOIN rowtot r ON r.a = t.a CROSS JOIN tot
        GROUP BY t.a, r.ra, tot.n
    )
    SELECT a AS state,
           CAST(ra AS BIGINT) AS n_transitions,
           ROUND(CAST(ra AS DOUBLE) / n, 6) AS stationary_weight,
           ROUND(h_q / 1e9, 6) AS row_entropy_bits,
           ROUND(CAST(SUM(CAST(FLOOR(CAST(ra AS DOUBLE) / n * h_q / 1e3)
                                AS BIGINT)) OVER () AS DOUBLE) / 1e6, 6)
               AS entropy_rate_bits
    FROM rows_h ORDER BY state
    """,
)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain: per-state
    transition-row entropy H(next | state) and the chain's entropy rate
    Σ π·H(row) with π estimated by empirical transition mass — "how
    predictable is the next event", the single number that says whether
    a next-event model can beat chance (log₂ 5 ≈ 2.32 bits is the
    ceiling here). Transition counts are exact; each −p·log₂p term is
    floor-quantized to nano-bits and integer-summed, the π weighting
    quantizes again at micro-bits — order-independent end to end.
    Shape: one lead window per user (shuffle ∝ events once), a 25-cell
    transition table, then 5-row algebra."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rowtot = trans.groupBy("a").agg(F.sum("c").cast("bigint").alias("ra"))
    tot = trans.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("ra")
    rows_h = (
        trans.join(F.broadcast(rowtot), "a")
        .crossJoin(F.broadcast(tot))
        .groupBy("a", "ra", "n")
        .agg(
            F.sum(
                F.floor(-1.0 * p * F.ln(p) / F.ln(F.lit(2.0)) * 1e9).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("h_q")
        )
    )
    wall = Window.partitionBy()
    return rows_h.select(
        F.col("a").alias("state"),
        F.col("ra").cast("bigint").alias("n_transitions"),
        F.round(F.col("ra").cast("double") / F.col("n"), 6).alias(
            "stationary_weight"
        ),
        F.round(F.col("h_q") / 1e9, 6).alias("row_entropy_bits"),
        F.round(
            F.sum(
                F.floor(
                    F.col("ra").cast("double") / F.col("n") * F.col("h_q") / 1e3
                ).cast("long")
            )
            .over(wall)
            .cast("double")
            / 1e6,
            6,
        ).alias("entropy_rate_bits"),
    ).orderBy("state")


@register(
    "ts_record_highs",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), r AS (
        SELECT day, cents,
               MAX(cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    recs AS (
        SELECT day, cents, rn,
               rn - LAG(rn) OVER (ORDER BY day) AS gap_days
        FROM r WHERE prev_max IS NULL OR cents > prev_max
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           STRFTIME(MAX(day), '%Y-%m-%d') AS last_record_day,
           ROUND(MAX(cents) / 100.0, 2) AS all_time_high,
           CAST(MAX(gap_days) AS BIGINT) AS longest_drought_days,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_days), 6)
               AS record_rate
    FROM recs CROSS JOIN tot
    """,
)
def ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record analysis of daily revenue: how many days set a new
    all-time high, when the last record fell, the longest drought
    between records, and the record rate — the "are we still growing"
    scoreboard (for an i.i.d. series the expected record count is
    harmonic ≈ ln n, so a higher rate signals trend). The running max
    uses an exact-integer window; record days are strict integer
    comparisons; droughts are row-number gaps. One grouped sum + two
    ordered windows over the daily frame."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    r = daily.select(
        "day",
        "cents",
        F.max("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max"),
        F.row_number().over(w).alias("rn"),
    )
    recs = r.filter(
        F.col("prev_max").isNull() | (F.col("cents") > F.col("prev_max"))
    ).select(
        "day",
        "cents",
        "rn",
        (F.col("rn") - F.lag("rn").over(Window.orderBy("day"))).alias(
            "gap_days"
        ),
    )
    tot = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return recs.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_record_day"),
        F.round(F.max("cents") / 100.0, 2).alias("all_time_high"),
        F.max("gap_days").cast("bigint").alias("longest_drought_days"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.max("n_days"), 6
        ).alias("record_rate"),
    )


@register(
    "ts_twap",
    """
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   AS nxt_us
        FROM events
    ), wt AS (
        SELECT user_id, cents, nxt_us - us AS dur_us
        FROM seq WHERE nxt_us IS NOT NULL
    ), g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(cents AS HUGEINT) * dur_us) AS HUGEINT) AS num,
               CAST(SUM(dur_us) AS BIGINT) AS den,
               CAST(SUM(cents) AS BIGINT) AS plain_sum
        FROM wt GROUP BY 1
    )
    SELECT user_id, n,
           FLOOR(CAST(num AS DOUBLE) / den * 100.0) / 10000.0 AS twap,
           FLOOR(CAST(plain_sum AS DOUBLE) / n * 100.0) / 10000.0
               AS naive_mean,
           FLOOR(CAST(num AS DOUBLE) / den * 100.0) / 10000.0
           - FLOOR(CAST(plain_sum AS DOUBLE) / n * 100.0) / 10000.0 + 0.0
               AS twap_bias
    FROM g ORDER BY user_id
    """,
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    weighted by its holding duration until the next event — the
    financial/IoT estimator that corrects the naive mean's bias toward
    burst periods, reported alongside the naive mean and the bias gap.
    Weights are exact epoch-µs durations, the numerator Σ cents·µs runs
    in a 128-bit-safe accumulator (cents·duration products reach ~5e13
    per row), and the TWAP is one final division — bit-stable anywhere.
    Shape: one lead window per user (the single shuffle), one grouped
    sum."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    wt = seq.select(
        "user_id", "cents", (F.col("nxt_us") - F.col("us")).alias("dur_us")
    )
    g = wt.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us")).alias(
            "num"
        ),
        F.sum("dur_us").cast("bigint").alias("den"),
        F.sum("cents").cast("bigint").alias("plain_sum"),
    )
    twap = F.col("num").cast("double") / F.col("den") / 100.0
    naive = F.col("plain_sum").cast("double") / F.col("n") / 100.0
    twap_q = F.floor(F.col("num").cast("double") / F.col("den") * 100.0) / 10000.0
    naive_q = (
        F.floor(F.col("plain_sum").cast("double") / F.col("n") * 100.0)
        / 10000.0
    )
    return g.select(
        "user_id",
        "n",
        twap_q.alias("twap"),
        naive_q.alias("naive_mean"),
        (twap_q - naive_q + F.lit(0.0)).alias("twap_bias"),
    ).orderBy("user_id")


@register(
    "ts_var_cvar",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), diffs AS (
        SELECT day, cents - LAG(cents) OVER (ORDER BY day) AS d
        FROM daily
    ), nz AS (SELECT day, d FROM diffs WHERE d IS NOT NULL),
    ranked AS (
        SELECT day, d,
               ROW_NUMBER() OVER (ORDER BY d, day) AS rn,
               COUNT(*) OVER () AS n
        FROM nz
    ), var_row AS (
        SELECT d AS var_cents, n FROM ranked
        WHERE rn = CAST(CEIL(0.05 * n) AS BIGINT)
    )
    SELECT CAST(v.n AS BIGINT) AS n_days,
           ROUND(v.var_cents / 100.0, 2) AS var95,
           ROUND(CAST(SUM(CASE WHEN r.d <= v.var_cents THEN r.d ELSE 0 END)
                      AS DOUBLE)
                 / SUM(CASE WHEN r.d <= v.var_cents THEN 1 ELSE 0 END)
                 / 100.0, 2) AS cvar95,
           ROUND(MIN(r.d) / 100.0, 2) AS worst_day_change,
           CAST(SUM(CASE WHEN r.d <= v.var_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tail_days
    FROM ranked r CROSS JOIN var_row v
    GROUP BY v.n, v.var_cents
    """,
)
def ts_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Conditional VaR (expected shortfall) of
    day-over-day revenue changes at the 95% level: the exact empirical
    5th-percentile change (order statistic, not interpolated — integer
    selection via row_number with a day tie-break) and the mean of the
    tail at or below it — the risk pair every financial control report
    carries, computed with zero float ordering ambiguity (all diffs are
    exact integer cents). Shape: one grouped sum to the daily frame,
    one ordered window for the order statistic, one conditional
    aggregate over the same small frame joined to the 1-row VaR."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    nz = daily.select(
        "day", (F.col("cents") - F.lag("cents").over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    wr = Window.orderBy("d", "day")
    wall = Window.partitionBy()
    ranked = nz.select(
        "day",
        "d",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    var_row = ranked.filter(
        F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint")
    ).select(F.col("d").alias("var_cents"), F.col("n").alias("n_days_all"))
    tail = F.col("d") <= F.col("var_cents")
    return (
        ranked.drop("n")
        .crossJoin(F.broadcast(var_row))
        .groupBy("n_days_all", "var_cents")
        .agg(
            F.round(F.max("var_cents") / 100.0, 2).alias("var95"),
            F.round(
                F.sum(F.when(tail, F.col("d")).otherwise(0)).cast("double")
                / F.sum(F.when(tail, 1).otherwise(0))
                / 100.0,
                2,
            ).alias("cvar95"),
            F.round(F.min("d") / 100.0, 2).alias("worst_day_change"),
            F.sum(F.when(tail, 1).otherwise(0))
            .cast("bigint")
            .alias("n_tail_days"),
        )
        .select(
            F.col("n_days_all").cast("bigint").alias("n_days"),
            "var95",
            "cvar95",
            "worst_day_change",
            "n_tail_days",
        )
    )


@register(
    "ts_forecast_mase",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT day, x,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               LAG(x) OVER (ORDER BY day) AS prev,
               LAG(x, 7) OVER (ORDER BY day) AS season,
               COUNT(*) OVER () AS n
        FROM daily
    ), marked AS (
        SELECT *, CAST(FLOOR(0.8 * n) AS BIGINT) AS split FROM idx
    ), scale AS (
        SELECT CAST(SUM(ABS(x - prev)) AS BIGINT) AS sae,
               CAST(COUNT(*) AS BIGINT) AS sn
        FROM marked WHERE rn <= split AND prev IS NOT NULL
    ), test AS (
        SELECT CAST(SUM(ABS(x - season)) AS BIGINT) AS seas_ae,
               CAST(SUM(ABS(x - prev)) AS BIGINT) AS naive_ae,
               CAST(COUNT(*) AS BIGINT) AS tn
        FROM marked WHERE rn > split AND season IS NOT NULL
    )
    SELECT t.tn AS n_test,
           ROUND(CAST(s.sae AS DOUBLE) / s.sn / 100.0, 4) AS naive_scale,
           ROUND(CAST(t.seas_ae AS DOUBLE) / t.tn / 100.0, 4)
               AS seasonal_naive_mae,
           ROUND(CAST(t.naive_ae AS DOUBLE) / t.tn / 100.0, 4)
               AS naive_mae,
           ROUND((CAST(t.seas_ae AS DOUBLE) / t.tn)
                 / (CAST(s.sae AS DOUBLE) / s.sn), 6) AS mase_seasonal,
           ROUND((CAST(t.naive_ae AS DOUBLE) / t.tn)
                 / (CAST(s.sae AS DOUBLE) / s.sn), 6) AS mase_naive
    FROM scale s CROSS JOIN test t
    """,
)
def ts_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy scoring with MASE (mean absolute SCALED error,
    Hyndman–Koehler): hold out the last 20% of days, forecast each test
    day with the seasonal-naive (value 7 days earlier) and the naive
    (previous day) rules, and scale both test MAEs by the in-train
    one-step naive MAE — the scale-free metric that makes forecast
    errors comparable across series (MASE < 1 beats the naive baseline).
    Every absolute error is an exact integer-cents difference; the split
    point is an integer row-number threshold; ratios are final-form.
    One grouped sum to the daily frame, one windowed pass (two lags +
    row numbers), two conditional reductions."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "x",
        F.row_number().over(w).alias("rn"),
        F.lag("x").over(w).alias("prev"),
        F.lag("x", 7).over(w).alias("season"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).withColumn("split", F.floor(0.8 * F.col("n")).cast("bigint"))
    scale = idx.filter(
        (F.col("rn") <= F.col("split")) & F.col("prev").isNotNull()
    ).agg(
        F.sum(F.abs(F.col("x") - F.col("prev"))).cast("bigint").alias("sae"),
        F.count(F.lit(1)).cast("bigint").alias("sn"),
    )
    test = idx.filter(
        (F.col("rn") > F.col("split")) & F.col("season").isNotNull()
    ).agg(
        F.sum(F.abs(F.col("x") - F.col("season")))
        .cast("bigint")
        .alias("seas_ae"),
        F.sum(F.abs(F.col("x") - F.col("prev")))
        .cast("bigint")
        .alias("naive_ae"),
        F.count(F.lit(1)).cast("bigint").alias("tn"),
    )
    j = scale.crossJoin(F.broadcast(test))
    scale_mae = F.col("sae").cast("double") / F.col("sn")
    return j.select(
        F.col("tn").alias("n_test"),
        F.round(scale_mae / 100.0, 4).alias("naive_scale"),
        F.round(
            F.col("seas_ae").cast("double") / F.col("tn") / 100.0, 4
        ).alias("seasonal_naive_mae"),
        F.round(
            F.col("naive_ae").cast("double") / F.col("tn") / 100.0, 4
        ).alias("naive_mae"),
        F.round(
            (F.col("seas_ae").cast("double") / F.col("tn")) / scale_mae, 6
        ).alias("mase_seasonal"),
        F.round(
            (F.col("naive_ae").cast("double") / F.col("tn")) / scale_mae, 6
        ).alias("mase_naive"),
    )


@register(
    "ts_ar_features",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), f AS (
        SELECT day, x,
               ROW_NUMBER() OVER (ORDER BY day) AS t,
               LAG(x, 1) OVER (ORDER BY day) AS lag1,
               LAG(x, 2) OVER (ORDER BY day) AS lag2,
               LAG(x, 7) OVER (ORDER BY day) AS lag7,
               SUM(x) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
               COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7,
               MIN(x) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS min7,
               MAX(x) OVER (ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS max7
        FROM daily
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           ROUND(x / 100.0, 2) AS y,
           CAST(t AS BIGINT) AS trend_idx,
           CAST(t % 7 AS INT) AS dow_idx,
           ROUND(lag1 / 100.0, 2) AS lag1,
           ROUND(lag2 / 100.0, 2) AS lag2,
           ROUND(lag7 / 100.0, 2) AS lag7,
           ROUND(CAST(s7 AS DOUBLE) / n7 / 100.0, 4) AS ma7_prior,
           ROUND((max7 - min7) / 100.0, 2) AS range7_prior
    FROM f WHERE n7 = 7 AND lag7 IS NOT NULL
    ORDER BY day
    """,
)
def ts_ar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoregressive feature-matrix builder for forecasting models:
    per day, the target plus leakage-safe features — lags 1/2/7, the
    PRIOR 7-day mean and range (frames end at 1 PRECEDING so the target
    never leaks into its own features), a trend index, and a
    day-of-week index. This is the canonical supervised-learning table
    a GBDT/AR forecaster trains on, produced in one windowed pass over
    the daily frame with exact integer inputs — bit-identical at any
    parallelism. Rows with incomplete history are dropped so every
    emitted row is a valid training example."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    w = Window.orderBy("day")
    prior = w.rowsBetween(-7, -1)
    f = daily.select(
        "day",
        "x",
        F.row_number().over(w).alias("t"),
        F.lag("x", 1).over(w).alias("lag1"),
        F.lag("x", 2).over(w).alias("lag2"),
        F.lag("x", 7).over(w).alias("lag7"),
        F.sum("x").over(prior).alias("s7"),
        F.count(F.lit(1)).over(prior).alias("n7"),
        F.min("x").over(prior).alias("min7"),
        F.max("x").over(prior).alias("max7"),
    )
    return (
        f.filter((F.col("n7") == 7) & F.col("lag7").isNotNull())
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("x") / 100.0, 2).alias("y"),
            F.col("t").cast("bigint").alias("trend_idx"),
            (F.col("t") % 7).cast("int").alias("dow_idx"),
            F.round(F.col("lag1") / 100.0, 2).alias("lag1"),
            F.round(F.col("lag2") / 100.0, 2).alias("lag2"),
            F.round(F.col("lag7") / 100.0, 2).alias("lag7"),
            F.round(
                F.col("s7").cast("double") / F.col("n7") / 100.0, 4
            ).alias("ma7_prior"),
            F.round((F.col("max7") - F.col("min7")) / 100.0, 2).alias(
                "range7_prior"
            ),
        )
        .orderBy("day")
    )


@register(
    "events_relative_time_curve",
    """
    WITH f AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ), rel AS (
        SELECT e.user_id,
               DATEDIFF('day', f.d0, CAST(e.ts AS DATE)) AS rel_day,
               CAST(FLOOR(e.value * 100.0) AS BIGINT) AS cents
        FROM events e JOIN f ON f.user_id = e.user_id
    )
    SELECT CAST(rel_day AS INT) AS rel_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 4)
               AS avg_value,
           ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id), 4)
               AS events_per_user
    FROM rel WHERE rel_day <= 21
    GROUP BY 1 ORDER BY 1
    """,
)
def events_relative_time_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-time alignment curve: every user's stream re-indexed to
    days since THEIR first event, then averaged per relative day — the
    lifecycle view (do users spend more or less as they age?) that
    calendar-time aggregates smear out, and the denominator-correct way
    to chart onboarding curves. One grouped min for each user's epoch,
    a broadcast-sized join back, one grouped rollup keyed on the
    relative day — exact integer datediffs and cents throughout. At
    100 TB: two aggregation passes and a user-keyed join, the standard
    cohort-alignment shape."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    rel = ev.join(f, "user_id").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.col("d0")).alias("rel_day"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    return (
        rel.filter(F.col("rel_day") <= 21)
        .groupBy(F.col("rel_day").cast("int").alias("rel_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0, 4
            ).alias("avg_value"),
            F.round(
                F.count(F.lit(1)).cast("double")
                / F.countDistinct("user_id"),
                4,
            ).alias("events_per_user"),
        )
        .orderBy("rel_day")
    )


@register(
    "ts_engle_granger",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS a
        FROM lineitem GROUP BY 1
    ), daily_o AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS b
        FROM orders GROUP BY 1
    ), j AS (
        SELECT d.day, d.a, o.b FROM daily d JOIN daily_o o ON o.day = d.day
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab,
               CAST(SUM(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb
        FROM j
    ), fit AS (
        SELECT n,
               (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                - CAST(sa AS DOUBLE) * sb)
               / (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                  - CAST(sb AS DOUBLE) * sb) AS beta,
               (CAST(sa AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                   - CAST(sa AS DOUBLE) * sb)
                  / (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                     - CAST(sb AS DOUBLE) * sb) * sb)
               / n AS alpha
        FROM s
    ), resid AS (
        SELECT day,
               CAST(FLOOR((a - fit.alpha - fit.beta * b) / 100.0)
                    AS BIGINT) AS e
        FROM j CROSS JOIN fit
    ), lagged AS (
        SELECT e - LAG(e) OVER (ORDER BY day) AS de,
               LAG(e) OVER (ORDER BY day) AS el
        FROM resid
    ), df AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(el AS HUGEINT) * de) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(el AS HUGEINT) * el) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(de AS HUGEINT) * de) AS HUGEINT) AS syy
        FROM lagged WHERE el IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((SELECT beta FROM fit), 6) AS coint_beta,
           ROUND(CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE), 6) AS gamma,
           ROUND((CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                 / SQRT(GREATEST(
                     (CAST(syy AS DOUBLE)
                      - POW(CAST(sxy AS DOUBLE), 2.0)
                        / CAST(sxx AS DOUBLE)) / (n - 1)
                     / CAST(sxx AS DOUBLE), 1e-30)), 4) AS df_t_stat,
           CAST(CASE WHEN (CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))
                 / SQRT(GREATEST(
                     (CAST(syy AS DOUBLE)
                      - POW(CAST(sxy AS DOUBLE), 2.0)
                        / CAST(sxx AS DOUBLE)) / (n - 1)
                     / CAST(sxx AS DOUBLE), 1e-30)) < -3.34
                THEN 1 ELSE 0 END AS INT) AS cointegrated_5pct
    FROM df
    """,
)
def ts_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle–Granger cointegration screen between the daily lineitem
    revenue and daily order revenue series: step 1 regresses A on B
    (exact integer moment sums in 128-bit accumulators), step 2 runs a
    Dickey–Fuller regression of Δresidual on lagged residual and
    compares the t-statistic to the −3.34 Engle–Granger 5% critical
    value — "do these two series share a long-run equilibrium", the
    prerequisite for pairs-style monitoring between any two KPIs.
    Residuals are floor-quantized to whole dollars so the DF sums are
    exact integers; both regressions are closed-form sufficient-
    statistic algebra. Shape: two grouped sums, a day-keyed join of
    the two small daily frames, one lag window."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("a")
    )
    daily_o = orders.groupBy(F.to_date("o_orderdate").alias("oday")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("b")
    )
    j = daily.join(daily_o, daily["day"] == daily_o["oday"]).select(
        "day", "a", "b"
    )
    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias("sab"),
        F.sum(F.col("b").cast("decimal(38,0)") * F.col("b")).alias("sbb"),
    )
    nd = F.col("n").cast("double")
    beta = (nd * F.col("sab").cast("double") - F.col("sa").cast("double") * F.col("sb")) / (
        nd * F.col("sbb").cast("double") - F.col("sb").cast("double") * F.col("sb")
    )
    fit = s.select(
        "n",
        beta.alias("beta"),
        ((F.col("sa").cast("double") - beta * F.col("sb")) / F.col("n")).alias(
            "alpha"
        ),
    )
    resid = j.crossJoin(F.broadcast(fit)).select(
        "day",
        F.floor(
            (F.col("a") - F.col("alpha") - F.col("beta") * F.col("b")) / 100.0
        )
        .cast("long")
        .alias("e"),
        "beta",
    )
    w = Window.orderBy("day")
    lagged = resid.select(
        "beta",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
        F.lag("e").over(w).alias("el"),
    ).filter(F.col("el").isNotNull())
    dfagg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("beta").alias("beta"),
        F.sum(F.col("el").cast("decimal(38,0)") * F.col("de")).alias("sxy"),
        F.sum(F.col("el").cast("decimal(38,0)") * F.col("el")).alias("sxx"),
        F.sum(F.col("de").cast("decimal(38,0)") * F.col("de")).alias("syy"),
    )
    gamma = F.col("sxy").cast("double") / F.col("sxx").cast("double")
    se = F.sqrt(
        F.greatest(
            (
                F.col("syy").cast("double")
                - F.pow(F.col("sxy").cast("double"), 2.0)
                / F.col("sxx").cast("double")
            )
            / (F.col("n") - 1)
            / F.col("sxx").cast("double"),
            F.lit(1e-30),
        )
    )
    t = gamma / se
    return dfagg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("beta", 6).alias("coint_beta"),
        F.round(gamma, 6).alias("gamma"),
        F.round(t, 4).alias("df_t_stat"),
        F.when(t < -3.34, 1).otherwise(0).cast("int").alias(
            "cointegrated_5pct"
        ),
    )


@register(
    "events_mrr_waterfall",
    """
    WITH cm AS (
        SELECT o_custkey AS cust,
               STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY 1, 2
    ), months AS (
        SELECT DISTINCT month FROM cm
    ), custs AS (SELECT DISTINCT cust FROM cm),
    spine AS (SELECT c.cust, m.month FROM custs c CROSS JOIN months m),
    dense AS (
        SELECT s.cust, s.month, COALESCE(cm.cents, 0) AS cents
        FROM spine s LEFT JOIN cm ON cm.cust = s.cust AND cm.month = s.month
    ), lagged AS (
        SELECT cust, month, cents,
               LAG(cents) OVER (PARTITION BY cust ORDER BY month) AS prev
        FROM dense
    )
    SELECT month,
           ROUND(SUM(CASE WHEN prev = 0 AND cents > 0 THEN cents
                          ELSE 0 END) / 100.0, 2) AS new_rev,
           ROUND(SUM(CASE WHEN prev > 0 AND cents = 0 THEN prev
                          ELSE 0 END) / 100.0, 2) AS churned_rev,
           ROUND(SUM(CASE WHEN prev > 0 AND cents > prev THEN cents - prev
                          ELSE 0 END) / 100.0, 2) AS expansion_rev,
           ROUND(SUM(CASE WHEN prev > 0 AND cents > 0 AND cents < prev
                          THEN prev - cents ELSE 0 END) / 100.0, 2)
               AS contraction_rev,
           ROUND(SUM(cents) / 100.0, 2) AS total_rev,
           ROUND(SUM(cents - COALESCE(prev, 0)) / 100.0, 2) AS net_change
    FROM lagged WHERE prev IS NOT NULL
    GROUP BY month ORDER BY month
    """,
)
def events_mrr_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-movement waterfall (the SaaS MRR bridge) over 1998
    customer-months: month-over-month revenue per customer decomposed
    into new / churned / expansion / contraction buckets, with the
    accounting identity net = new − churn + expansion − contraction
    holding EXACTLY because every bucket is an exact-integer cents sum
    over the same dense customer×month spine (zero-filled months are
    what make "churned" and "new" well-defined). Shape: one grouped
    sum to customer-month, a spine cross join of two small distinct
    frames, one lag window partitioned by customer — the canonical
    subscription-analytics plan, shuffle ∝ customer-months."""
    orders = load_table(spark, sf_dir, "orders")
    cm = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("bigint")
            .alias("cents")
        )
    )
    months = cm.select("month").distinct()
    custs = cm.select("cust").distinct()
    spine = custs.crossJoin(F.broadcast(months))
    dense = spine.join(cm, ["cust", "month"], "left").select(
        "cust", "month", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
    )
    w = Window.partitionBy("cust").orderBy("month")
    lagged = dense.select(
        "cust", "month", "cents", F.lag("cents").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c, p = F.col("cents"), F.col("prev")
    return (
        lagged.groupBy("month")
        .agg(
            F.round(
                F.sum(F.when((p == 0) & (c > 0), c).otherwise(0)) / 100.0, 2
            ).alias("new_rev"),
            F.round(
                F.sum(F.when((p > 0) & (c == 0), p).otherwise(0)) / 100.0, 2
            ).alias("churned_rev"),
            F.round(
                F.sum(F.when((p > 0) & (c > p), c - p).otherwise(0)) / 100.0,
                2,
            ).alias("expansion_rev"),
            F.round(
                F.sum(
                    F.when((p > 0) & (c > 0) & (c < p), p - c).otherwise(0)
                )
                / 100.0,
                2,
            ).alias("contraction_rev"),
            F.round(F.sum(c) / 100.0, 2).alias("total_rev"),
            F.round(F.sum(c - F.coalesce(p, F.lit(0))) / 100.0, 2).alias(
                "net_change"
            ),
        )
        .orderBy("month")
    )


@register(
    "events_resurrection",
    """
    WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day
        FROM events GROUP BY 1, 2
    ), gaps AS (
        SELECT user_id, day,
               DATEDIFF('day',
                        LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                        day) AS gap
        FROM seq
    ), r AS (SELECT * FROM gaps WHERE gap >= 7)
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_resurrected,
           CAST(COUNT(*) AS BIGINT) AS n_resurrections,
           ROUND(AVG(CAST(gap AS DOUBLE)), 4) AS avg_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days,
           STRFTIME(MIN(day), '%Y-%m-%d') AS first_resurrection_day
    FROM r
    """,
)
def events_resurrection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resurrection analysis: returns after an absence of ≥ 7 days —
    the growth-accounting counterpart to churn (resurrected users are
    the cheapest acquisitions; their count and gap distribution size
    the win-back opportunity). Distinct active days per user, one lag
    window for inter-day gaps (exact integer datediffs), one filter +
    reduction. The avg over integer gaps of a filtered set is one
    division — deterministic. Shuffle ∝ distinct (user, day) pairs."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = seq.select(
        "user_id",
        "day",
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("gap"),
    ).filter(F.col("gap") >= 7)
    return gaps.agg(
        F.countDistinct("user_id").cast("bigint").alias("users_resurrected"),
        F.count(F.lit(1)).cast("bigint").alias("n_resurrections"),
        F.round(F.avg(F.col("gap").cast("double")), 4).alias("avg_gap_days"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias(
            "first_resurrection_day"
        ),
    )


@register(
    "ts_linear_interpolate",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS rn,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS actual
        FROM orders GROUP BY 1
    ), holes AS (
        -- deterministically punch out every 7th observation
        SELECT day, rn, actual,
               CASE WHEN rn % 7 = 3 THEN NULL ELSE actual END AS observed
        FROM daily
    ), ffill AS (
        SELECT day, rn, actual, observed,
               MAX(CASE WHEN observed IS NOT NULL THEN rn END)
                   OVER (ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_rn,
               MIN(CASE WHEN observed IS NOT NULL THEN rn END)
                   OVER (ORDER BY rn
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_rn
        FROM holes
    ), vals AS (
        SELECT f.day, f.rn, f.actual, f.observed, f.prev_rn, f.next_rn,
               p.observed AS prev_val, nx.observed AS next_val
        FROM ffill f
        LEFT JOIN holes p ON p.rn = f.prev_rn
        LEFT JOIN holes nx ON nx.rn = f.next_rn
    ), interp AS (
        SELECT day, rn, actual,
               CASE WHEN observed IS NOT NULL THEN observed
                    WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
                    THEN CAST(FLOOR(prev_val
                         + CAST((next_val - prev_val) AS DOUBLE)
                           * (rn - prev_rn) / (next_rn - prev_rn))
                         AS BIGINT)
                    ELSE COALESCE(prev_val, next_val) END AS filled,
               (observed IS NULL) AS was_hole
        FROM vals
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) FILTER (WHERE was_hole) AS BIGINT) AS n_holes,
           ROUND(CAST(SUM(CASE WHEN was_hole
                               THEN ABS(filled - actual) ELSE 0 END)
                      AS DOUBLE)
                 / COUNT(*) FILTER (WHERE was_hole) / 100.0, 2)
               AS interp_mae,
           ROUND(CAST(SUM(CASE WHEN was_hole THEN ABS(filled - actual)
                               ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN was_hole THEN actual ELSE 0 END), 6)
               AS interp_mape
    FROM interp
    """,
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing observations, SELF-AUDITED:
    deterministically punch out every 7th day of the revenue series,
    reconstruct each hole by linear interpolation between its nearest
    observed neighbors (forward/backward rank fences via running
    max/min windows — the standard fill plan), and score the
    reconstruction against the held-out truth (MAE / MAPE). This both
    ships the interpolation operator AND quantifies its error on real
    data — the honest way to ship a gap-filler. Interpolated values
    floor-quantize the fractional step so both engines agree exactly;
    fences and ranks are pure integers. One window pass + two
    rank-keyed self-joins on the daily frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("day")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("long")
            .alias("actual")
        )
        .withColumn("rn", F.row_number().over(w))
    )
    holes = daily.withColumn(
        "observed",
        F.when(F.col("rn") % 7 == 3, F.lit(None)).otherwise(F.col("actual")),
    )
    wprev = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("rn").rowsBetween(0, Window.unboundedFollowing)
    obs_rn = F.when(F.col("observed").isNotNull(), F.col("rn"))
    ffill = holes.select(
        "rn",
        "actual",
        "observed",
        F.max(obs_rn).over(wprev).alias("prev_rn"),
        F.min(obs_rn).over(wnext).alias("next_rn"),
    )
    pv = holes.select(
        F.col("rn").alias("prn"), F.col("observed").alias("prev_val")
    )
    nv = holes.select(
        F.col("rn").alias("nrn"), F.col("observed").alias("next_val")
    )
    vals = ffill.join(pv, F.col("prn") == F.col("prev_rn"), "left").join(
        nv, F.col("nrn") == F.col("next_rn"), "left"
    )
    filled = (
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            F.floor(
                F.col("prev_val")
                + (F.col("next_val") - F.col("prev_val")).cast("double")
                * (F.col("rn") - F.col("prev_rn"))
                / (F.col("next_rn") - F.col("prev_rn"))
            ).cast("long"),
        )
        .otherwise(F.coalesce(F.col("prev_val"), F.col("next_val")))
    )
    interp = vals.select(
        "actual",
        filled.alias("filled"),
        F.col("observed").isNull().alias("was_hole"),
    )
    err = F.when(
        F.col("was_hole"), F.abs(F.col("filled") - F.col("actual"))
    ).otherwise(0)
    return interp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.count_if(F.col("was_hole")).cast("bigint").alias("n_holes"),
        F.round(
            F.sum(err).cast("double")
            / F.count_if(F.col("was_hole"))
            / 100.0,
            2,
        ).alias("interp_mae"),
        F.round(
            F.sum(err).cast("double")
            / F.sum(F.when(F.col("was_hole"), F.col("actual")).otherwise(0)),
            6,
        ).alias("interp_mape"),
    )


@register(
    "events_decay_score",
    """
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS asof FROM events),
    scored AS (
        SELECT e.user_id,
               DATEDIFF('day', CAST(e.ts AS DATE), mx.asof) AS age,
               CAST(FLOOR(e.value * 100.0) AS BIGINT) AS cents
        FROM events e CROSS JOIN mx
    ), terms AS (
        SELECT user_id,
               CAST(FLOOR(cents * POW(2.0, -age / 7.0) * 1e4) AS BIGINT)
                   AS w_q,
               cents
        FROM scored
    ), g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(w_q) AS BIGINT) AS score_q,
               CAST(SUM(cents) AS BIGINT) AS raw_cents
        FROM terms GROUP BY 1
    ), ranked AS (
        SELECT user_id, n_events,
               ROUND(score_q / 1e4 / 100.0, 4) AS decay_score,
               ROUND(raw_cents / 100.0, 2) AS raw_value,
               ROW_NUMBER() OVER (ORDER BY score_q DESC, user_id) AS rnk
        FROM g
    )
    SELECT CAST(rnk AS INT) AS rnk, user_id, n_events, decay_score,
           raw_value
    FROM ranked WHERE rnk <= 25 ORDER BY rnk
    """,
)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement scoring (half-life 7 days,
    anchored at the dataset's last day): each event contributes
    value·2^(−age/7), so recent activity dominates — the freshness-
    weighted ranking signal behind "active value" leaderboards and
    churn-risk ordering, where a raw sum would rank long-dormant whales
    first. Every decayed term is floor-quantized before the per-user
    integer sum, and the leaderboard orders by the quantized integer
    with a user tie-break — deterministic top-25 anywhere. One anchor
    reduce + one grouped pass; at 100 TB the decay weight computes in
    codegen during the scan."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("asof"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff(F.col("asof"), F.to_date("ts")).alias("age"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    terms = scored.select(
        "user_id",
        F.floor(
            F.col("cents") * F.pow(F.lit(2.0), -F.col("age") / 7.0) * 1e4
        )
        .cast("long")
        .alias("w_q"),
        "cents",
    )
    g = terms.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("w_q").cast("bigint").alias("score_q"),
        F.sum("cents").cast("bigint").alias("raw_cents"),
    )
    w = Window.orderBy(F.col("score_q").desc(), F.col("user_id"))
    ranked = g.select(
        "user_id",
        "n_events",
        F.round(F.col("score_q") / 1e4 / 100.0, 4).alias("decay_score"),
        F.round(F.col("raw_cents") / 100.0, 2).alias("raw_value"),
        F.row_number().over(w).alias("rnk"),
    )
    return (
        ranked.filter(F.col("rnk") <= 25)
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "user_id",
            "n_events",
            "decay_score",
            "raw_value",
        )
        .orderBy("rnk")
    )


@register(
    "ts_drawdown_episodes",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), cum AS (
        SELECT day,
               SUM(cents) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM daily
    ), dd AS (
        SELECT day, c,
               MAX(c) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM cum
    ), flagged AS (
        SELECT day, c, peak, CAST(c < peak AS INT) AS under,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM dd
    ), islands AS (
        SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY under ORDER BY rn)
                   AS grp
        FROM flagged
    ), eps AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS duration_days,
               CAST(MAX(peak - c) AS BIGINT) AS depth_cents,
               STRFTIME(MIN(day), '%Y-%m-%d') AS start_day
        FROM islands WHERE under = 1 GROUP BY grp
    )
    SELECT start_day, duration_days,
           ROUND(depth_cents / 100.0, 2) AS max_depth
    FROM eps ORDER BY depth_cents DESC, start_day LIMIT 5
    """,
)
def ts_drawdown_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown EPISODES of cumulative revenue — where max_drawdown
    reports one number, this enumerates each below-peak stretch
    (gaps-and-islands on the under-peak flag) with its start, duration,
    and maximum depth, returning the five deepest — the recovery-time
    view risk review actually needs ("how long were we under water",
    not just "how deep"). Running sums/maxima are exact integer
    windows; islands come from the row-number difference trick; the
    top-5 orders by exact integer depth with a start-day tie-break.
    One grouped sum + ordered windows on the daily frame."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        F.sum("cents").over(w).alias("c"),
    ).select(
        "day", "c", F.max("c").over(w).alias("peak")
    )
    flagged = dd.select(
        "day",
        "c",
        "peak",
        (F.col("c") < F.col("peak")).cast("int").alias("under"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    wi = Window.partitionBy("under").orderBy("rn")
    islands = flagged.withColumn(
        "grp", F.col("rn") - F.row_number().over(wi)
    )
    eps = (
        islands.filter(F.col("under") == 1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("duration_days"),
            F.max(F.col("peak") - F.col("c")).cast("bigint").alias(
                "depth_cents"
            ),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("start_day"),
        )
    )
    return (
        eps.select(
            "start_day",
            "duration_days",
            F.round(F.col("depth_cents") / 100.0, 2).alias("max_depth"),
        )
        .orderBy(F.col("max_depth").desc(), "start_day")
        .limit(5)
    )


@register(
    "ts_rolling_beta",
    """
    WITH a AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                          / 100.0) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), b AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                          / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), j AS (
        SELECT a.day, a.x, b.y FROM a JOIN b ON b.day = a.day
    ), w AS (
        SELECT day, x, y,
               COUNT(*) OVER win AS n,
               SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
               SUM(x * y) OVER win AS sxy, SUM(y * y) OVER win AS syy
        FROM j
        WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 6)
               AS beta30
    FROM w WHERE n = 30
    ORDER BY day
    """,
)
def ts_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day beta of lineitem revenue against order revenue —
    the windowed-regression slope cov(x,y)/var(y) that tracks how
    tightly one KPI follows another THROUGH TIME (a structural break
    shows as a beta shift long before a full-period regression
    notices). Daily values are floor-quantized whole dollars so every
    rolling sum (x, y, xy, y²) is an exact integer window; products
    y² ≈ 5e13 per day × 30 stay far inside bigint at this scale (the
    docstring contract: DECIMAL(38,0) at petabyte day-volumes). One
    join of two grouped daily frames + a single multi-aggregate window
    pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            / 100.0
        )
        .cast("long")
        .alias("x")
    )
    b = orders.groupBy(F.to_date("o_orderdate").alias("oday")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            / 100.0
        )
        .cast("long")
        .alias("y")
    )
    j = a.join(b, a["day"] == b["oday"]).select("day", "x", "y")
    win = Window.orderBy("day").rowsBetween(-29, 0)
    w = j.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
    ).filter(F.col("n") == 30)
    nd = F.col("n").cast("double")
    beta = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(beta, 6).alias("beta30"),
    ).orderBy("day")


@register(
    "ts_granger_lite",
    """
    WITH a AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                          / 100.0) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), b AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                          / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), j AS (
        SELECT a.day, a.x, b.y FROM a JOIN b ON b.day = a.day
    ), lagged AS (
        SELECT y,
               LAG(y) OVER (ORDER BY day) AS yl,
               LAG(x) OVER (ORDER BY day) AS xl
        FROM j
    ), t AS (SELECT * FROM lagged WHERE yl IS NOT NULL),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(yl) AS BIGINT) AS s1,
               CAST(SUM(xl) AS BIGINT) AS s2,
               CAST(SUM(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS s11,
               CAST(SUM(CAST(xl AS HUGEINT) * xl) AS HUGEINT) AS s22,
               CAST(SUM(CAST(yl AS HUGEINT) * xl) AS HUGEINT) AS s12,
               CAST(SUM(CAST(yl AS HUGEINT) * y) AS HUGEINT) AS s1y,
               CAST(SUM(CAST(xl AS HUGEINT) * y) AS HUGEINT) AS s2y,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM t
    ), c AS (
        SELECT n,
               CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS a11,
               CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS a22,
               CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS a12,
               CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS b1,
               CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS b2,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c
        FROM s
    ), fits AS (
        SELECT n,
               syy_c - b1 * b1 / a11 AS sse_restricted,
               syy_c - ((b1 * a22 - b2 * a12) * b1
                        + (b2 * a11 - b1 * a12) * b2)
                       / (a11 * a22 - a12 * a12) AS sse_full
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sse_restricted, 2) AS sse_restricted,
           ROUND(sse_full, 2) AS sse_full,
           ROUND((sse_restricted - sse_full) / (sse_full / (n - 3)), 4)
               AS granger_f,
           CAST(CASE WHEN (sse_restricted - sse_full)
                          / (sse_full / (n - 3)) > 3.85
                     THEN 1 ELSE 0 END AS INT) AS x_helps_predict_y
    FROM fits
    """,
)
def ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality screen (one lag): does yesterday's lineitem
    revenue help predict today's order revenue beyond order revenue's
    own lag? Fit the restricted AR(1) and the full model with the
    cross lag — both CLOSED-FORM from centered sufficient statistics —
    and compare via the nested-model F-test (χ²/F ≈ 3.85 at 5%, 1
    numerator df). "Granger-causes" = improves prediction, not true
    causation; it is the standard lead-lag screen between KPI series.
    Whole-dollar quantized daily values make every moment an exact
    integer in 128-bit accumulators; the two SSEs and F are fixed-form
    algebra on one row. Two grouped sums + a day join + one lag
    window."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            / 100.0
        )
        .cast("long")
        .alias("x")
    )
    b = orders.groupBy(F.to_date("o_orderdate").alias("oday")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            / 100.0
        )
        .cast("long")
        .alias("y")
    )
    j = a.join(b, a["day"] == b["oday"]).select("day", "x", "y")
    w = Window.orderBy("day")
    t = j.select(
        "y",
        F.lag("y").over(w).alias("yl"),
        F.lag("x").over(w).alias("xl"),
    ).filter(F.col("yl").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("yl").cast("bigint").alias("s1"),
        F.sum("xl").cast("bigint").alias("s2"),
        F.sum(dec(F.col("yl")) * F.col("yl")).alias("s11"),
        F.sum(dec(F.col("xl")) * F.col("xl")).alias("s22"),
        F.sum(dec(F.col("yl")) * F.col("xl")).alias("s12"),
        F.sum(dec(F.col("yl")) * F.col("y")).alias("s1y"),
        F.sum(dec(F.col("xl")) * F.col("y")).alias("s2y"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11 = d("s11") - d("s1") * F.col("s1") / nd
    a22 = d("s22") - d("s2") * F.col("s2") / nd
    a12 = d("s12") - d("s1") * F.col("s2") / nd
    b1 = d("s1y") - d("s1") * F.col("sy") / nd
    b2 = d("s2y") - d("s2") * F.col("sy") / nd
    syy_c = d("syy") - d("sy") * F.col("sy") / nd
    sse_r = syy_c - b1 * b1 / a11
    sse_f = syy_c - ((b1 * a22 - b2 * a12) * b1 + (b2 * a11 - b1 * a12) * b2) / (
        a11 * a22 - a12 * a12
    )
    fstat = (sse_r - sse_f) / (sse_f / (F.col("n") - 3))
    return s.select(
        F.col("n").alias("n"),
        F.round(sse_r, 2).alias("sse_restricted"),
        F.round(sse_f, 2).alias("sse_full"),
        F.round(fstat, 4).alias("granger_f"),
        F.when(fstat > 3.85, 1).otherwise(0).cast("int").alias(
            "x_helps_predict_y"
        ),
    )


@register(
    "ts_spectral_entropy",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), idx AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t,
               AVG(cnt) OVER () AS mu
        FROM daily
    ), p AS (
        SELECT per.p,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * COS(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS c_q,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * SIN(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS s_q
        FROM idx CROSS JOIN (SELECT UNNEST(RANGE(2, 15)) AS p) per
        GROUP BY per.p
    ), pow_t AS (
        SELECT p,
               CAST(FLOOR(POW(c_q / 1e6, 2.0) + POW(s_q / 1e6, 2.0))
                    AS BIGINT) AS pw
        FROM p
    ), tot AS (SELECT CAST(SUM(pw) AS BIGINT) AS tp FROM pow_t),
    ent AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   -1.0 * (CAST(pw AS DOUBLE) / tot.tp)
                   * LN(CAST(pw AS DOUBLE) / tot.tp) * 1e9) AS BIGINT))
                   AS BIGINT) AS h_q,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM pow_t CROSS JOIN tot WHERE pw > 0
        GROUP BY tot.tp
    )
    SELECT k AS n_frequencies,
           ROUND(h_q / 1e9, 6) AS spectral_entropy_nats,
           ROUND((h_q / 1e9) / LN(CAST(k AS DOUBLE)), 6)
               AS normalized_entropy,
           ROUND(1.0 - (h_q / 1e9) / LN(CAST(k AS DOUBLE)), 6)
               AS forecastability
    FROM ent
    """,
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the daily event-count series over periods
    2–14 days: normalize the periodogram powers into a distribution and
    take its Shannon entropy — flat spectrum (entropy → 1) means white
    noise that NO model will forecast; concentrated spectrum means
    exploitable periodic structure. The forecastability index 1−H/ln k
    is the triage that decides whether the forecasting operators are
    even worth running. Projection terms and entropy terms are both
    floor-quantized and integer-summed; powers are floor-quantized
    integers — deterministic end to end. One grouped count + a 13×
    fan-out of the daily frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wall = Window.partitionBy()
    idx = daily.select(
        "cnt",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        F.avg("cnt").over(wall).alias("mu"),
    )
    pers = spark.createDataFrame([(p,) for p in range(2, 15)], "p: int")
    import math as _math

    ang = 2 * _math.pi * F.col("t") / F.col("p")
    p = (
        idx.crossJoin(F.broadcast(pers))
        .groupBy("p")
        .agg(
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.cos(ang) * 1e6).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("c_q"),
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.sin(ang) * 1e6).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("s_q"),
        )
    )
    pow_t = p.select(
        "p",
        F.floor(
            F.pow(F.col("c_q") / 1e6, 2.0) + F.pow(F.col("s_q") / 1e6, 2.0)
        )
        .cast("bigint")
        .alias("pw"),
    )
    tot = pow_t.agg(F.sum("pw").cast("bigint").alias("tp"))
    share = F.col("pw").cast("double") / F.col("tp")
    ent = (
        pow_t.crossJoin(F.broadcast(tot))
        .filter(F.col("pw") > 0)
        .groupBy("tp")
        .agg(
            F.sum(
                F.floor(-1.0 * share * F.ln(share) * 1e9).cast("long")
            )
            .cast("bigint")
            .alias("h_q"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    h = F.col("h_q") / 1e9
    return ent.select(
        F.col("k").alias("n_frequencies"),
        F.round(h, 6).alias("spectral_entropy_nats"),
        F.round(h / F.ln(F.col("k").cast("double")), 6).alias(
            "normalized_entropy"
        ),
        F.round(1.0 - h / F.ln(F.col("k").cast("double")), 6).alias(
            "forecastability"
        ),
    )


@register(
    "events_shapley_attribution",
    """
    WITH u AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS INT) AS tv,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS INT) AS tc,
               CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS INT) AS ts_,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                              AND value >= 150.0 THEN 1 ELSE 0 END)
                    AS INT) AS conv
        FROM events
        WHERE EXTRACT(DAY FROM ts) <= 10 OR event_type = 'purchase'
        GROUP BY 1
    ), subsets AS (
        SELECT tv, tc, ts_, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS k
        FROM u GROUP BY 1, 2, 3
    ), v AS (
        -- characteristic value of each touch subset: its conversion rate
        -- in micro-units (0 for unobserved subsets)
        SELECT tv, tc, ts_,
               CAST(FLOOR(CAST(k AS DOUBLE) / n * 1e6) AS BIGINT) AS vq
        FROM subsets
    ), pick AS (
        SELECT
          MAX(CASE WHEN tv=0 AND tc=0 AND ts_=0 THEN vq ELSE 0 END) AS v000,
          MAX(CASE WHEN tv=1 AND tc=0 AND ts_=0 THEN vq ELSE 0 END) AS v100,
          MAX(CASE WHEN tv=0 AND tc=1 AND ts_=0 THEN vq ELSE 0 END) AS v010,
          MAX(CASE WHEN tv=0 AND tc=0 AND ts_=1 THEN vq ELSE 0 END) AS v001,
          MAX(CASE WHEN tv=1 AND tc=1 AND ts_=0 THEN vq ELSE 0 END) AS v110,
          MAX(CASE WHEN tv=1 AND tc=0 AND ts_=1 THEN vq ELSE 0 END) AS v101,
          MAX(CASE WHEN tv=0 AND tc=1 AND ts_=1 THEN vq ELSE 0 END) AS v011,
          MAX(CASE WHEN tv=1 AND tc=1 AND ts_=1 THEN vq ELSE 0 END) AS v111
        FROM v
    ), shap AS (
        SELECT
          ROUND((2.0 * (v100 - v000) + (v110 - v010) + (v101 - v001)
                 + 2.0 * (v111 - v011)) / 6.0 / 1e6, 6) AS shap_view,
          ROUND((2.0 * (v010 - v000) + (v110 - v100) + (v011 - v001)
                 + 2.0 * (v111 - v101)) / 6.0 / 1e6, 6) AS shap_click,
          ROUND((2.0 * (v001 - v000) + (v101 - v100) + (v011 - v010)
                 + 2.0 * (v111 - v110)) / 6.0 / 1e6, 6) AS shap_signup,
          ROUND(CAST(v111 - v000 AS DOUBLE) / 1e6, 6) AS total_effect
        FROM pick
    )
    SELECT * FROM shap
    """,
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value marketing attribution over three touchpoint
    channels (early-window view/click/signup exposure → high-value
    purchase conversion): with 3 players the Shapley sum is 8 subset
    values with factorial weights (2,1,1,2)/6 — closed form, no
    sampling — and the efficiency axiom guarantees the three credits
    sum to v(111)−v(000) (the test pins it). This is the
    game-theoretically fair division of conversion lift across
    channels, the upgrade from last-touch attribution. Subset
    conversion rates are floor-quantized micro-units from one grouped
    pass over users; the Shapley algebra runs on a single pivoted
    row."""
    ev = load_table(spark, sf_dir, "events")
    early = F.dayofmonth("ts") <= 10
    u = ev.filter(early | (F.col("event_type") == "purchase")).groupBy(
        "user_id"
    ).agg(
        F.max(
            F.when(early & (F.col("event_type") == "view"), 1).otherwise(0)
        )
        .cast("int")
        .alias("tv"),
        F.max(
            F.when(early & (F.col("event_type") == "click"), 1).otherwise(0)
        )
        .cast("int")
        .alias("tc"),
        F.max(
            F.when(early & (F.col("event_type") == "signup"), 1).otherwise(0)
        )
        .cast("int")
        .alias("ts_"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("conv"),
    )
    subsets = u.groupBy("tv", "tc", "ts_").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    v = subsets.select(
        "tv",
        "tc",
        "ts_",
        F.floor(F.col("k").cast("double") / F.col("n") * 1e6)
        .cast("bigint")
        .alias("vq"),
    )

    def pick(a, b, c):
        return F.max(
            F.when(
                (F.col("tv") == a) & (F.col("tc") == b) & (F.col("ts_") == c),
                F.col("vq"),
            ).otherwise(0)
        )

    wide = v.agg(
        pick(0, 0, 0).alias("v000"),
        pick(1, 0, 0).alias("v100"),
        pick(0, 1, 0).alias("v010"),
        pick(0, 0, 1).alias("v001"),
        pick(1, 1, 0).alias("v110"),
        pick(1, 0, 1).alias("v101"),
        pick(0, 1, 1).alias("v011"),
        pick(1, 1, 1).alias("v111"),
    )
    c = lambda name: F.col(name)  # noqa: E731
    return wide.select(
        F.round(
            (
                2.0 * (c("v100") - c("v000"))
                + (c("v110") - c("v010"))
                + (c("v101") - c("v001"))
                + 2.0 * (c("v111") - c("v011"))
            )
            / 6.0
            / 1e6,
            6,
        ).alias("shap_view"),
        F.round(
            (
                2.0 * (c("v010") - c("v000"))
                + (c("v110") - c("v100"))
                + (c("v011") - c("v001"))
                + 2.0 * (c("v111") - c("v101"))
            )
            / 6.0
            / 1e6,
            6,
        ).alias("shap_click"),
        F.round(
            (
                2.0 * (c("v001") - c("v000"))
                + (c("v101") - c("v100"))
                + (c("v011") - c("v010"))
                + 2.0 * (c("v111") - c("v110"))
            )
            / 6.0
            / 1e6,
            6,
        ).alias("shap_signup"),
        F.round((c("v111") - c("v000")).cast("double") / 1e6, 6).alias(
            "total_effect"
        ),
    )


@register(
    "events_frequent_episodes",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), epi AS (
        SELECT user_id,
               event_type || '>' || e2 || '>' || e3 AS episode
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT episode,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS support_users
    FROM epi
    GROUP BY episode
    ORDER BY n_occurrences DESC, episode
    LIMIT 20
    """,
)
def events_frequent_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-episode mining (Mannila et al. '97, serial episodes of
    length 3): the most common consecutive event-type trigrams per user
    timeline, with raw occurrence counts and user support — the
    sequential patterns behind funnel design and next-action models,
    one level deeper than the registered first-order
    ``events_transitions`` matrix.

    Scale: one window pass partitioned by user (shuffle keyed on
    user_id, each partition sorted by time — the standard sessionize
    layout every other events op shares), then a count aggregate over
    the 5³-bounded episode vocabulary. COUNT(DISTINCT user_id) expands
    to a two-level exact aggregate, ∝ episodes × users present."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    epi = seq.filter(
        F.col("e2").isNotNull() & F.col("e3").isNotNull()
    ).select(
        "user_id",
        F.concat_ws(">", "event_type", "e2", "e3").alias("episode"),
    )
    return (
        epi.groupBy("episode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("support_users"),
        )
        .orderBy(F.desc("n_occurrences"), "episode")
        .limit(20)
    )


@register(
    "ts_sharpe_sortino",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ), ret AS (
        SELECT CAST(FLOOR((CAST(rev_c AS DOUBLE)
                           / LAG(rev_c) OVER (ORDER BY day) - 1.0)
                          * 1e9) AS BIGINT) AS q
        FROM daily
    ), s AS (
        SELECT CAST(COUNT(q) AS BIGINT) AS n,
               CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS sr,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
                    AS DOUBLE) / 1e18 AS srr,
               CAST(SUM(CASE WHEN q < 0
                        THEN CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))
                        ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) / 1e18
                   AS sdd,
               CAST(COUNT(*) FILTER (WHERE q < 0) AS BIGINT) AS n_down
        FROM ret WHERE q IS NOT NULL
    )
    SELECT n AS n_days,
           n_down AS n_down_days,
           ROUND(sr / n, 6) AS mean_daily_ret,
           ROUND(SQRT((srr - sr * sr / n) / (n - 1)), 6) AS vol_daily,
           ROUND(SQRT(sdd / n), 6) AS downside_dev,
           ROUND((sr / n) / SQRT((srr - sr * sr / n) / (n - 1))
                 * SQRT(365.0), 6) AS sharpe_annual,
           ROUND((sr / n) / SQRT(sdd / n) * SQRT(365.0), 6)
               AS sortino_annual
    FROM s
    """,
)
def ts_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios of the daily revenue return
    series (zero risk-free rate) — the risk-adjusted performance pair,
    where Sortino penalizes only downside deviation (Sortino–van der
    Meer '91). Returns are data-dependent doubles, so each one is
    1e-9-floor-quantized and the sufficient statistics (Σr, Σr²,
    Σ min(r,0)²) accumulate as exact DECIMALs — the same discipline as
    ``functions/exact.py``, extended to squared terms via DECIMAL(19,0)
    multiplication so nothing overflows or reorders.

    Scale: the return series is one ordered window over the day-level
    rollup (O(days)); everything after is a single scalar reduction."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("day")
    ret = daily.select(
        F.floor(
            (
                F.col("rev_c").cast("double") / F.lag("rev_c").over(w)
                - F.lit(1.0)
            )
            * 1e9
        )
        .cast("bigint")
        .alias("q")
    ).filter(F.col("q").isNotNull())
    q19 = F.col("q").cast("decimal(19,0)")
    s = ret.agg(
        F.count("q").cast("bigint").alias("n"),
        (F.sum(F.col("q").cast("decimal(38,0)")).cast("double") / 1e9).alias(
            "sr"
        ),
        (F.sum(q19 * q19).cast("double") / 1e18).alias("srr"),
        (
            F.sum(
                F.when(F.col("q") < 0, q19 * q19).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).cast("double")
            / 1e18
        ).alias("sdd"),
        F.count_if(F.col("q") < 0).cast("bigint").alias("n_down"),
    )
    n, sr, srr, sdd = (F.col(c) for c in ("n", "sr", "srr", "sdd"))
    vol = F.sqrt((srr - sr * sr / n) / (n - 1))
    dd = F.sqrt(sdd / n)
    return s.select(
        n.alias("n_days"),
        F.col("n_down").alias("n_down_days"),
        F.round(sr / n, 6).alias("mean_daily_ret"),
        F.round(vol, 6).alias("vol_daily"),
        F.round(dd, 6).alias("downside_dev"),
        F.round((sr / n) / vol * F.sqrt(F.lit(365.0)), 6).alias(
            "sharpe_annual"
        ),
        F.round((sr / n) / dd * F.sqrt(F.lit(365.0)), 6).alias(
            "sortino_annual"
        ),
    )


@register(
    "ts_pacf",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), mu AS (
        SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS xbar FROM daily
    ), led AS (
        SELECT x,
               LEAD(x, 1) OVER (ORDER BY day) AS x1,
               LEAD(x, 2) OVER (ORDER BY day) AS x2,
               LEAD(x, 3) OVER (ORDER BY day) AS x3
        FROM daily
    ), s AS (
        SELECT
          CAST(SUM(CAST(FLOOR((x - xbar) * (x - xbar) * 10000.0) AS BIGINT))
               AS DOUBLE) AS s0,
          CAST(SUM(CASE WHEN x1 IS NOT NULL THEN
               CAST(FLOOR((x - xbar) * (x1 - xbar) * 10000.0) AS BIGINT)
               END) AS DOUBLE) AS s1,
          CAST(SUM(CASE WHEN x2 IS NOT NULL THEN
               CAST(FLOOR((x - xbar) * (x2 - xbar) * 10000.0) AS BIGINT)
               END) AS DOUBLE) AS s2,
          CAST(SUM(CASE WHEN x3 IS NOT NULL THEN
               CAST(FLOOR((x - xbar) * (x3 - xbar) * 10000.0) AS BIGINT)
               END) AS DOUBLE) AS s3
        FROM led CROSS JOIN mu
    ), r AS (
        SELECT s1 / s0 AS r1, s2 / s0 AS r2, s3 / s0 AS r3 FROM s
    ), dl AS (
        SELECT r1, r2, r3,
               r1 AS phi11,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
        FROM r
    ), dl2 AS (
        SELECT r1, r2, r3, phi11, phi22,
               phi11 - phi22 * phi11 AS phi21
        FROM dl
    )
    SELECT lag, ROUND(acf, 6) AS acf, ROUND(pacf, 6) AS pacf
    FROM (
        SELECT 1 AS lag, r1 AS acf, phi11 AS pacf FROM dl2
        UNION ALL
        SELECT 2, r2, phi22 FROM dl2
        UNION ALL
        SELECT 3, r3,
               (r3 - phi21 * r2 - phi22 * r1)
               / (1.0 - phi21 * r1 - phi22 * r2)
        FROM dl2
    ) t
    ORDER BY lag
    """,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation and PARTIAL autocorrelation of the daily event
    count at lags 1–3 via the Durbin–Levinson recursion — the ACF/PACF
    pair an ARIMA modeler reads to pick p and q (PACF cutting off at
    lag p identifies the AR order). Each covariance term is
    1e-4-floor-quantized before exact integer summation, so r₁..r₃ are
    bit-identical in both engines; the recursion itself (φ₂₂ from r₁r₂,
    φ₃₃ from the level-2 coefficients) is identically-parenthesized
    scalar algebra on those shared values.

    Scale: one day-level rollup, one ordered window (O(days)), one
    scalar reduction — the calendar-series shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    mu = daily.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("xbar")
    )
    w = Window.orderBy("day")
    led = daily.select(
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
        F.lead("x", 3).over(w).alias("x3"),
    ).crossJoin(F.broadcast(mu))

    def q(other: str):
        return F.when(
            F.col(other).isNotNull(),
            F.floor(
                (F.col("x") - F.col("xbar"))
                * (F.col(other) - F.col("xbar"))
                * 10000.0
            ).cast("long"),
        )

    s = led.agg(
        F.sum(
            F.floor(
                (F.col("x") - F.col("xbar"))
                * (F.col("x") - F.col("xbar"))
                * 10000.0
            ).cast("long")
        )
        .cast("double")
        .alias("s0"),
        F.sum(q("x1")).cast("double").alias("s1"),
        F.sum(q("x2")).cast("double").alias("s2"),
        F.sum(q("x3")).cast("double").alias("s3"),
    )
    r = s.select(
        (F.col("s1") / F.col("s0")).alias("r1"),
        (F.col("s2") / F.col("s0")).alias("r2"),
        (F.col("s3") / F.col("s0")).alias("r3"),
    )
    dl = r.select(
        "r1",
        "r2",
        "r3",
        F.col("r1").alias("phi11"),
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1"))
        ).alias("phi22"),
    )
    dl2 = dl.select(
        "*", (F.col("phi11") - F.col("phi22") * F.col("phi11")).alias("phi21")
    )
    row1 = dl2.select(
        F.lit(1).alias("lag"), F.col("r1").alias("acf"), F.col("phi11").alias("pacf")
    )
    row2 = dl2.select(
        F.lit(2).alias("lag"), F.col("r2").alias("acf"), F.col("phi22").alias("pacf")
    )
    row3 = dl2.select(
        F.lit(3).alias("lag"),
        F.col("r3").alias("acf"),
        (
            (
                F.col("r3")
                - F.col("phi21") * F.col("r2")
                - F.col("phi22") * F.col("r1")
            )
            / (
                F.lit(1.0)
                - F.col("phi21") * F.col("r1")
                - F.col("phi22") * F.col("r2")
            )
        ).alias("pacf"),
    )
    return (
        row1.unionAll(row2)
        .unionAll(row3)
        .select("lag", F.round("acf", 6).alias("acf"), F.round("pacf", 6).alias("pacf"))
        .orderBy("lag")
    )


@register(
    "sample_balanced_downsample",
    f"""
    WITH sized AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_orig
        FROM events GROUP BY event_type
    ), m AS (
        SELECT MIN(n_orig) AS m FROM sized
    ), ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY MD5(CAST(event_id AS VARCHAR)),
                                           event_id) AS rn
        FROM events
    ), kept AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               {sql_dsum('value')} AS s_kept
        FROM ranked CROSS JOIN m
        WHERE rn <= m.m
        GROUP BY event_type
    ), orig AS (
        SELECT event_type, {sql_dsum('value')} AS s_orig
        FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           s.n_orig,
           k.n_kept,
           ROUND(o.s_orig / s.n_orig, 4) AS mean_value_orig,
           ROUND(k.s_kept / k.n_kept, 4) AS mean_value_kept
    FROM sized s
    JOIN kept k ON k.event_type = s.event_type
    JOIN orig o ON o.event_type = s.event_type
    ORDER BY s.event_type
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling audit: every event type reduced to
    the minority class's size by deterministic hash order (md5 of the
    row key — reproducible across runs and engines, the property random
    samplers lack), with before/after mean ``value`` per class to show
    the selection introduced no value bias. This is the train-set
    rebalancing pass in front of any classifier on skewed labels.

    Scale: the rank window shuffles once by class — per-class sort is
    the cost (same documented shape as ``sample_bottom_k``); hash order
    means the kept set is stable under re-partitioning. Means flow
    through the quantized-sum discipline."""
    ev = load_table(spark, sf_dir, "events")
    sized = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orig")
    )
    m = sized.agg(F.min("n_orig").alias("m"))
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rn")
    )
    kept = (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            dsum("value").alias("s_kept"),
        )
    )
    orig = ev.groupBy("event_type").agg(dsum("value").alias("s_orig"))
    return (
        sized.join(kept, "event_type")
        .join(orig, "event_type")
        .select(
            "event_type",
            "n_orig",
            "n_kept",
            F.round(F.col("s_orig") / F.col("n_orig"), 4).alias(
                "mean_value_orig"
            ),
            F.round(F.col("s_kept") / F.col("n_kept"), 4).alias(
                "mean_value_kept"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_fatigue_curve",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS n_seen
        FROM events
    ), bucketed AS (
        SELECT CASE WHEN n_seen <= 5 THEN CAST(n_seen AS VARCHAR)
                    WHEN n_seen <= 10 THEN '06-10'
                    WHEN n_seen <= 20 THEN '11-20'
                    WHEN n_seen <= 50 THEN '21-50'
                    ELSE '51+' END AS exposure_bucket,
               CASE WHEN n_seen <= 5 THEN n_seen
                    WHEN n_seen <= 10 THEN 6
                    WHEN n_seen <= 20 THEN 7
                    WHEN n_seen <= 50 THEN 8
                    ELSE 9 END AS bucket_order,
               (event_type = 'purchase') AS converted
        FROM seq
    )
    SELECT exposure_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE converted) AS BIGINT) AS n_purchases,
           ROUND(CAST(COUNT(*) FILTER (WHERE converted) AS DOUBLE)
                 / COUNT(*), 6) AS purchase_rate
    FROM bucketed
    GROUP BY exposure_bucket, bucket_order
    ORDER BY bucket_order
    """,
)
def events_fatigue_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-fatigue curve: purchase rate as a function of the
    user's nth interaction (exact sequence positions 1–5, then widening
    buckets) — the habituation read behind frequency capping: does the
    nth exposure still convert? Complements the time-aligned
    ``events_relative_time_curve`` with an ordinal alignment. One
    user-partitioned sequence window (the standard sessionize layout),
    then a conditional-count rollup to ≤ 9 buckets; all counts exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.row_number().over(w).alias("n_seen")
    )
    n = F.col("n_seen")
    bucket = (
        F.when(n <= 5, n.cast("string"))
        .when(n <= 10, F.lit("06-10"))
        .when(n <= 20, F.lit("11-20"))
        .when(n <= 50, F.lit("21-50"))
        .otherwise(F.lit("51+"))
    )
    order = (
        F.when(n <= 5, n)
        .when(n <= 10, F.lit(6))
        .when(n <= 20, F.lit(7))
        .when(n <= 50, F.lit(8))
        .otherwise(F.lit(9))
    )
    conv = F.col("event_type") == "purchase"
    return (
        seq.select(
            bucket.alias("exposure_bucket"),
            order.alias("bucket_order"),
            conv.alias("converted"),
        )
        .groupBy("exposure_bucket", "bucket_order")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_if("converted").cast("bigint").alias("n_purchases"),
            F.round(
                F.count_if("converted").cast("double") / F.count(F.lit(1)), 6
            ).alias("purchase_rate"),
        )
        .orderBy("bucket_order")
        .drop("bucket_order")
    )


@register(
    "ts_pot_gpd",
    """
    WITH daily AS (
        SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ), thresh AS (
        SELECT QUANTILE_CONT(rev_c, 0.90) AS u, CAST(COUNT(*) AS BIGINT)
                   AS n_days
        FROM daily
    ), exc AS (
        SELECT (d.rev_c - t.u) / 100.0 AS y, t.u, t.n_days
        FROM daily d CROSS JOIN thresh t
        WHERE d.rev_c > t.u
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               MAX(u) AS u, MAX(n_days) AS n_days,
               CAST(SUM(CAST(FLOOR(y * 100.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 100.0 AS sy,
               CAST(SUM(CAST(FLOOR(y * y * 100.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 100.0 AS syy
        FROM exc
    ), mom AS (
        SELECT k, u, n_days,
               sy / k AS m,
               (syy - sy * sy / k) / (k - 1) AS v
        FROM s
    )
    SELECT k AS n_exceedances,
           ROUND(u / 100.0, 2) AS threshold,
           ROUND(m, 4) AS mean_excess,
           ROUND(0.5 * (1.0 - m * m / v), 6) AS gpd_xi,
           ROUND(0.5 * m * (1.0 + m * m / v), 4) AS gpd_beta,
           ROUND(u / 100.0
                 + (0.5 * m * (1.0 + m * m / v))
                   / (0.5 * (1.0 - m * m / v))
                   * (POW(100.0 * k / n_days,
                          0.5 * (1.0 - m * m / v)) - 1.0), 2)
               AS return_level_100d
    FROM mom
    """,
)
def ts_pot_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold extreme-value fit: daily-revenue exceedances
    over the 90th percentile, with generalized-Pareto shape ξ and scale
    β by the method of moments (ξ = ½(1 − m²/s²), β = ½m(1 + m²/s²) —
    Hosking & Wallis '87) and the implied 100-day return level
    u + (β/ξ)((100·k/n)^ξ − 1) — the tail-risk complement of the
    registered Hill estimator (``stats_hill_tail`` fits a power tail to
    ALL data; POT models only the excess distribution, the EVT-correct
    way to extrapolate beyond observed maxima). Exceedances are exact
    cent differences; moments flow through DECIMAL-quantized sums.

    Scale: one day rollup, one exact percentile, one scalar reduction."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    thresh = daily.agg(
        F.percentile("rev_c", F.lit(0.90)).alias("u"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    exc = (
        daily.crossJoin(F.broadcast(thresh))
        .filter(F.col("rev_c") > F.col("u"))
        .select(
            ((F.col("rev_c") - F.col("u")) / 100.0).alias("y"),
            "u",
            "n_days",
        )
    )
    s = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("u").alias("u"),
        F.max("n_days").alias("n_days"),
        (
            F.sum(F.floor(F.col("y") * 100.0).cast("decimal(28,0)")).cast(
                "double"
            )
            / 100.0
        ).alias("sy"),
        (
            F.sum(
                F.floor(F.col("y") * F.col("y") * 100.0).cast("decimal(28,0)")
            ).cast("double")
            / 100.0
        ).alias("syy"),
    )
    mom = s.select(
        "k",
        "u",
        "n_days",
        (F.col("sy") / F.col("k")).alias("m"),
        (
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("k"))
            / (F.col("k") - 1)
        ).alias("v"),
    )
    m, v = F.col("m"), F.col("v")
    xi = F.lit(0.5) * (F.lit(1.0) - m * m / v)
    beta = F.lit(0.5) * m * (F.lit(1.0) + m * m / v)
    return mom.select(
        F.col("k").alias("n_exceedances"),
        F.round(F.col("u") / 100.0, 2).alias("threshold"),
        F.round(m, 4).alias("mean_excess"),
        F.round(xi, 6).alias("gpd_xi"),
        F.round(beta, 4).alias("gpd_beta"),
        F.round(
            F.col("u") / 100.0
            + beta
            / xi
            * (
                F.pow(F.lit(100.0) * F.col("k") / F.col("n_days"), xi)
                - F.lit(1.0)
            ),
            2,
        ).alias("return_level_100d"),
    )


@register(
    "ts_sax_motifs",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT DATE_DIFF('day', DATE '1992-01-01', day) AS i, rev_c
        FROM daily
    ), segs AS (
        SELECT i // 8 AS win,
               (i % 8) // 2 AS seg,
               CAST(SUM(rev_c) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM idx GROUP BY 1, 2
    ), full_wins AS (
        SELECT win FROM segs
        GROUP BY win
        HAVING CAST(SUM(n_days) AS BIGINT) = 8
    ), sym AS (
        SELECT s.win, s.seg,
               NTILE(4) OVER (ORDER BY s.v, s.win, s.seg) AS q
        FROM segs s JOIN full_wins f ON f.win = s.win
    ), words AS (
        SELECT win,
               MAX(CASE WHEN seg = 0 THEN CHR(CAST(96 + q AS INTEGER)) END)
               || MAX(CASE WHEN seg = 1 THEN CHR(CAST(96 + q AS INTEGER)) END)
               || MAX(CASE WHEN seg = 2 THEN CHR(CAST(96 + q AS INTEGER)) END)
               || MAX(CASE WHEN seg = 3 THEN CHR(CAST(96 + q AS INTEGER)) END) AS sax_word
        FROM sym GROUP BY win
    )
    SELECT sax_word,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           strftime(DATE '1992-01-01' + INTERVAL (MIN(win) * 8) DAY,
                    '%Y-%m-%d') AS first_window_start,
           strftime(DATE '1992-01-01' + INTERVAL (MAX(win) * 8) DAY,
                    '%Y-%m-%d') AS last_window_start
    FROM words
    GROUP BY sax_word
    ORDER BY n_windows DESC, sax_word
    LIMIT 15
    """,
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif discovery (Lin–Keogh–Lonardi–Chiu DMKD'03) on the
    daily-revenue series: tumbling 8-day windows → 4-segment PAA →
     4-symbol alphabet → repeated-word (motif) counting. Two
    determinism choices keep it engine-exact: PAA segment values stay
    UNDIVIDED integer cent sums (equal-width segments make the mean a
    monotone relabeling of the sum), and the alphabet is assigned by
    NTILE(4) with a total tiebreak order (v, win, seg) — an
    equal-frequency discretization both engines compute identically,
    standing in for the Gaussian breakpoint table. Windows with
    missing days are excluded (full 8-day support only).

    Scale: raw orders reduce to one row per (window, segment) in one
    partial/final aggregate; the NTILE runs over the O(days/2) segment
    frame (documented calendar-series single-partition constraint) and
    motif counting is one more tiny reduce."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    idx = daily.select(
        F.datediff("day", F.lit("1992-01-01").cast("date")).alias("i"),
        "rev_c",
    )
    segs = idx.groupBy(
        F.expr("i div 8").alias("win"),
        F.expr("(i % 8) div 2").alias("seg"),
    ).agg(
        F.sum("rev_c").cast("bigint").alias("v"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    full_wins = (
        segs.groupBy("win")
        .agg(F.sum("n_days").alias("tot"))
        .filter(F.col("tot") == 8)
        .select("win")
    )
    wq = Window.orderBy("v", "win", "seg")
    sym = segs.join(full_wins, "win").select(
        "win", "seg", F.ntile(4).over(wq).alias("q")
    )
    def seg_sym(k: int):
        return F.max(
            F.when(F.col("seg") == k, F.chr(96 + F.col("q")))
        )
    words = sym.groupBy("win").agg(
        F.concat(seg_sym(0), seg_sym(1), seg_sym(2), seg_sym(3)).alias(
            "sax_word"
        )
    )
    epoch = F.lit("1992-01-01").cast("date")
    return (
        words.groupBy("sax_word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.date_format(
                F.date_add(epoch, (F.min("win") * 8).cast("int")),
                "yyyy-MM-dd",
            ).alias("first_window_start"),
            F.date_format(
                F.date_add(epoch, (F.max("win") * 8).cast("int")),
                "yyyy-MM-dd",
            ).alias("last_window_start"),
        )
        .orderBy(F.desc("n_windows"), "sax_word")
        .limit(15)
    )


@register(
    "ts_croston",
    """
    WITH daily AS (
        SELECT DATE_DIFF('day', DATE '1992-01-01',
                         CAST(l_shipdate AS DATE)) AS day,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
        FROM lineitem
        WHERE l_partkey % 97 = 0
        GROUP BY 1
    ), seq AS (
        SELECT day, s,
               ROW_NUMBER() OVER (ORDER BY day) AS k,
               day - LAG(day) OVER (ORDER BY day) AS q,
               COUNT(*) OVER () AS kk
        FROM daily
    ), folds AS (
        SELECT MAX(kk) AS kk,
               CAST(SUM(CASE WHEN k = 1 THEN
                       CAST(FLOOR(POWER(0.5, kk - 1) * s * 1e9) AS BIGINT)
                    ELSE
                       CAST(FLOOR(0.5 * POWER(0.5, kk - k) * s * 1e9)
                            AS BIGINT) END) AS BIGINT) AS zq,
               CAST(SUM(CASE WHEN k = 2 THEN
                       CAST(FLOOR(POWER(0.5, kk - 2) * q * 1e9) AS BIGINT)
                    WHEN k > 2 THEN
                       CAST(FLOOR(0.5 * POWER(0.5, kk - k) * q * 1e9)
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS xq,
               CAST(SUM(s) AS BIGINT) AS stot,
               CAST(MAX(day) - MIN(day) AS BIGINT) AS spanned
        FROM seq
    )
    SELECT kk AS n_demand_days,
           ROUND(CAST(stot AS DOUBLE) / kk, 6) AS mean_size,
           ROUND(CAST(spanned AS DOUBLE) / (kk - 1), 6) AS mean_interval,
           ROUND(zq / 1e9, 6) AS croston_size,
           ROUND(xq / 1e9, 6) AS croston_interval,
           ROUND((zq / 1e9) / (xq / 1e9), 6) AS forecast_rate,
           ROUND(0.75 * (zq / 1e9) / (xq / 1e9), 6) AS sba_rate
    FROM folds
    """,
)
def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (Croston '72) for INTERMITTENT demand — daily
    shipped quantity of the sparse part family partkey ≡ 0 (mod 97),
    which leaves most days at zero so plain ``ts_ewma`` would chase
    zeros: separate exponential smoothing of nonzero demand SIZES
    (z, seeded with the first demand) and of inter-demand INTERVALS
    (x, seeded with the first gap), forecast rate = z/x plus the
    Syntetos–Boylan approximation (1−α/2)·z/x that corrects Croston's
    positive bias. α = 0.5 ON PURPOSE: every smoothing weight is then
    an exact power of two, so POWER(0.5, j) is bit-identical in both
    engines and each weighted term floor-quantizes at 1e-9 into
    integer folds — the recursion is evaluated as its closed-form
    weighted sum, no sequential loop.

    Scale: one aggregate to demand days (shuffle ∝ distinct days);
    the window runs over the O(demand days) frame — the series frame
    is small by construction, same posture as ``ts_ewma``."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 97 == 0
    )
    daily = li.groupBy(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("s"))
    w_ord = Window.orderBy("day")
    seq = daily.select(
        "day",
        "s",
        F.row_number().over(w_ord).alias("k"),
        (F.col("day") - F.lag("day").over(w_ord)).alias("q"),
        F.count(F.lit(1))
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("kk"),
    )
    kk, k = F.col("kk"), F.col("k")
    z_term = F.when(
        k == 1,
        F.floor(F.pow(F.lit(0.5), kk - 1) * F.col("s") * 1e9).cast("long"),
    ).otherwise(
        F.floor(0.5 * F.pow(F.lit(0.5), kk - k) * F.col("s") * 1e9).cast("long")
    )
    x_term = (
        F.when(
            k == 2,
            F.floor(F.pow(F.lit(0.5), kk - 2) * F.col("q") * 1e9).cast("long"),
        )
        .when(
            k > 2,
            F.floor(0.5 * F.pow(F.lit(0.5), kk - k) * F.col("q") * 1e9).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0))
    )
    folds = seq.agg(
        F.max("kk").alias("kk"),
        F.sum(z_term).cast("long").alias("zq"),
        F.sum(x_term).cast("long").alias("xq"),
        F.sum("s").cast("long").alias("stot"),
        (F.max("day") - F.min("day")).cast("long").alias("spanned"),
    )
    return folds.select(
        F.col("kk").alias("n_demand_days"),
        F.round(F.col("stot").cast("double") / F.col("kk"), 6).alias(
            "mean_size"
        ),
        F.round(
            F.col("spanned").cast("double") / (F.col("kk") - 1), 6
        ).alias("mean_interval"),
        F.round(F.col("zq") / 1e9, 6).alias("croston_size"),
        F.round(F.col("xq") / 1e9, 6).alias("croston_interval"),
        F.round((F.col("zq") / 1e9) / (F.col("xq") / 1e9), 6).alias(
            "forecast_rate"
        ),
        F.round(0.75 * (F.col("zq") / 1e9) / (F.col("xq") / 1e9), 6).alias(
            "sba_rate"
        ),
    )


@register(
    "ops_littles_law",
    """
    WITH e AS (
        SELECT user_id, EPOCH_US(ts) AS us, event_id FROM events
    ), flagged AS (
        SELECT user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
        SELECT user_id, sno, MIN(us) AS s_us, MAX(us) AS e_us
        FROM (
            SELECT user_id, us,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sno
            FROM flagged
        ) GROUP BY user_id, sno
    ), pts AS (
        SELECT s_us AS t, 1 AS delta FROM sess
        UNION ALL
        SELECT e_us AS t, -1 AS delta FROM sess
    ), keyed AS (
        SELECT t, delta, t // 86400000000 AS day FROM pts
    ), within AS (
        SELECT day, t, delta,
               SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cur_in,
               LEAD(t) OVER (PARTITION BY day ORDER BY t, delta) AS t_next
        FROM keyed
    ), dayf AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS day_delta,
               MIN(t) AS day_min
        FROM keyed GROUP BY day
    ), dayoff AS (
        SELECT day,
               COALESCE(SUM(day_delta) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS off,
               LEAD(day_min) OVER (ORDER BY day) AS next_min
        FROM dayf
    ), integ AS (
        SELECT CAST(SUM((w.cur_in + o.off)
                        * (COALESCE(w.t_next, o.next_min) - w.t))
                    AS BIGINT) AS i_sweep
        FROM within w JOIN dayoff o ON o.day = w.day
        WHERE COALESCE(w.t_next, o.next_min) IS NOT NULL
    ), durs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(e_us - s_us) AS BIGINT) AS i_dur,
               CAST(MAX(e_us) - MIN(s_us) AS BIGINT) AS span_us
        FROM sess
    )
    SELECT d.n_sessions,
           ROUND(d.span_us / 3.6e9, 4) AS span_hours,
           ROUND(d.n_sessions / (d.span_us / 3.6e9), 6) AS lambda_per_hour,
           ROUND((CAST(d.i_dur AS DOUBLE) / d.n_sessions) / 3.6e9, 6)
               AS w_hours,
           ROUND(CAST(i.i_sweep AS DOUBLE) / d.span_us, 6) AS l_time_avg,
           CAST(i.i_sweep - d.i_dur AS BIGINT) AS resid_us
    FROM durs d CROSS JOIN integ i
    """,
)
def ops_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit L = λ·W over 30-minute-gap user sessions: the
    arrival rate λ and mean time-in-system W come from per-session
    aggregates, while the time-average number-in-system L comes from a
    COMPLETELY INDEPENDENT computation path — a day-partitioned
    endpoint sweep (+1/−1 deltas, running concurrency, Σ c·Δt with
    day offsets stitched from per-day delta totals and the
    cross-midnight gap term attached to the earlier day via the
    day-frame LEAD, the same chunk-stitching as ``scan_rle_audit``).
    Both paths are exact integer microseconds, so the residual
    i_sweep − i_dur is the law's conservation identity and must be
    EXACTLY 0 — a cross-check that the sweep machinery (shared with
    ``events_concurrency``) conserves occupancy-time, published as a
    BIGINT the hash gate pins.

    Scale: sessionization shuffles by user, the sweep by day; both
    windows partitioned, day-frame stitching is O(days)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", (F.unix_micros(F.col("ts"))).alias("us"), "event_id"
    )
    w_u = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w_u).isNull()
            | (F.col("us") - F.lag("us").over(w_u) >= 1800000000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        flagged.withColumn("sno", F.sum("new_session").over(w_run))
        .groupBy("user_id", "sno")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    pts = sess.select(F.col("s_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("e_us").alias("t"), F.lit(-1).alias("delta"))
    )
    keyed = pts.select("t", "delta", F.expr("t div 86400000000").alias("day"))
    w_day = Window.partitionBy("day").orderBy("t", "delta")
    within = keyed.select(
        "day",
        "t",
        "delta",
        F.sum("delta")
        .over(w_day.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cur_in"),
        F.lead("t").over(w_day).alias("t_next"),
    )
    dayf = keyed.groupBy("day").agg(
        F.sum("delta").cast("long").alias("day_delta"),
        F.min("t").alias("day_min"),
    )
    w_dord = Window.orderBy("day")
    dayoff = dayf.select(
        "day",
        F.coalesce(
            F.sum("day_delta").over(
                w_dord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
        F.lead("day_min").over(w_dord).alias("next_min"),
    )
    integ = (
        within.join(F.broadcast(dayoff), "day")
        .filter(F.coalesce(F.col("t_next"), F.col("next_min")).isNotNull())
        .agg(
            F.sum(
                (F.col("cur_in") + F.col("off"))
                * (F.coalesce(F.col("t_next"), F.col("next_min")) - F.col("t"))
            )
            .cast("long")
            .alias("i_sweep")
        )
    )
    durs = sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("e_us") - F.col("s_us")).cast("long").alias("i_dur"),
        (F.max("e_us") - F.min("s_us")).cast("long").alias("span_us"),
    )
    return durs.crossJoin(F.broadcast(integ)).select(
        "n_sessions",
        F.round(F.col("span_us") / 3.6e9, 4).alias("span_hours"),
        F.round(
            F.col("n_sessions") / (F.col("span_us") / 3.6e9), 6
        ).alias("lambda_per_hour"),
        F.round(
            (F.col("i_dur").cast("double") / F.col("n_sessions")) / 3.6e9, 6
        ).alias("w_hours"),
        F.round(F.col("i_sweep").cast("double") / F.col("span_us"), 6).alias(
            "l_time_avg"
        ),
        (F.col("i_sweep") - F.col("i_dur")).cast("long").alias("resid_us"),
    )


@register(
    "ts_dickey_fuller",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(FLOOR(LN(SUM(l_extendedprice)) * 1e6) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), lagd AS (
        SELECT x - LAG(x) OVER (ORDER BY day) AS y,
               LAG(x) OVER (ORDER BY day) AS xl
        FROM daily
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(xl) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(xl AS HUGEINT) * xl) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(xl AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM lagd WHERE xl IS NOT NULL
    ), fit AS (
        SELECT t,
               (CAST(t AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * sy)
               / (CAST(t AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sx) AS beta,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
               CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
               CAST(syy AS DOUBLE) AS syyd
        FROM s
    ), res AS (
        SELECT t, beta, sxd, sxxd,
               (syd - beta * sxd) / t AS alpha,
               (syyd - ((syd - beta * sxd) / t) * syd - beta * sxyd)
                   / (t - 2) AS s2
        FROM fit
    )
    SELECT t AS n_obs,
           ROUND(beta / 1e0, 6) AS beta,
           ROUND(alpha / 1e6, 6) AS alpha,
           ROUND(beta / SQRT(s2 * t
                 / (CAST(t AS DOUBLE) * sxxd
                    - CAST(sxd AS DOUBLE) * sxd)), 4) AS df_stat
    FROM res
    """,
)
def ts_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root regression (Dickey & Fuller '79, no
    augmentation) on daily log revenue: Δxₜ = α + β·xₜ₋₁ + εₜ; a β
    near 0 (DF statistic above the ~−2.86 critical band) means shocks
    persist (random walk), a strongly negative DF means mean
    reversion — the formal version of the departure ``ts_hurst`` and
    ``ts_variance_ratio`` measure descriptively. The series is
    1e-6-quantized ln revenue, so the five OLS sufficient sums are
    exact integers (cross-products in 128-bit) and β̂, α̂, the residual
    variance and the t-ratio β̂/se(β̂) are closed-form scalar algebra.

    Scale: one aggregate to the O(days) series; one lag window on
    that tiny frame; the regression never sees row-level data."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.floor(F.log(F.sum("l_extendedprice")) * 1e6)
        .cast("long")
        .alias("x")
    )
    w_ord = Window.orderBy("day")
    lagd = daily.select(
        (F.col("x") - F.lag("x").over(w_ord)).alias("y"),
        F.lag("x").over(w_ord).alias("xl"),
    ).filter(F.col("xl").isNotNull())
    s = lagd.agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("xl").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("xl").cast("decimal(38,0)") * F.col("xl")).alias("sxx"),
        F.sum(F.col("xl").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    t = F.col("t")
    beta = (
        t.cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        t.cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    fit = s.select(
        t,
        beta.alias("beta"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    alpha = (F.col("syd") - F.col("beta") * F.col("sxd")) / t
    s2 = (
        F.col("syyd") - alpha * F.col("syd") - F.col("beta") * F.col("sxyd")
    ) / (t - 2)
    res = fit.select(
        t, F.col("beta"), alpha.alias("alpha"), s2.alias("s2"),
        "sxd", "sxxd",
    )
    return res.select(
        t.alias("n_obs"),
        F.round(F.col("beta") / 1e0, 6).alias("beta"),
        F.round(F.col("alpha") / 1e6, 6).alias("alpha"),
        F.round(
            F.col("beta")
            / F.sqrt(
                F.col("s2") * t
                / (
                    t.cast("double") * F.col("sxxd")
                    - F.col("sxd").cast("double") * F.col("sxd")
                )
            ),
            4,
        ).alias("df_stat"),
    )


@register(
    "ts_kpss",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(FLOOR(LN(SUM(l_extendedprice)) * 1e6) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t, CAST(SUM(x) AS BIGINT) AS sx
        FROM daily
    ), e AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
               CAST(t * x - sx AS BIGINT) AS ee
        FROM daily CROSS JOIN tot
    ), spart AS (
        SELECT i, ee,
               SUM(ee) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS st
        FROM e
    ), lags AS (
        SELECT a.ee AS e0,
               LAG(a.ee, 1) OVER (ORDER BY a.i) AS e1,
               LAG(a.ee, 2) OVER (ORDER BY a.i) AS e2,
               LAG(a.ee, 3) OVER (ORDER BY a.i) AS e3,
               LAG(a.ee, 4) OVER (ORDER BY a.i) AS e4
        FROM e a
    ), gam AS (
        SELECT CAST(SUM(CAST(e0 AS HUGEINT) * e0) AS HUGEINT) AS g0,
               CAST(SUM(CAST(e0 AS HUGEINT) * e1) AS HUGEINT) AS g1,
               CAST(SUM(CAST(e0 AS HUGEINT) * e2) AS HUGEINT) AS g2,
               CAST(SUM(CAST(e0 AS HUGEINT) * e3) AS HUGEINT) AS g3,
               CAST(SUM(CAST(e0 AS HUGEINT) * e4) AS HUGEINT) AS g4
        FROM lags
    ), ssum AS (
        SELECT CAST(SUM(CAST(st AS HUGEINT) * st) AS HUGEINT) AS ss2
        FROM spart
    )
    SELECT t.t AS n_obs,
           ROUND(CAST(s.ss2 AS DOUBLE)
                 / (t.t * (CAST(g.g0 AS DOUBLE)
                           + 2 * (0.8 * CAST(g.g1 AS DOUBLE)
                                  + 0.6 * CAST(g.g2 AS DOUBLE)
                                  + 0.4 * CAST(g.g3 AS DOUBLE)
                                  + 0.2 * CAST(g.g4 AS DOUBLE)))), 6)
               AS kpss_eta,
           ROUND(CAST(g.g1 AS DOUBLE) / CAST(g.g0 AS DOUBLE), 6)
               AS rho1
    FROM tot t CROSS JOIN gam g CROSS JOIN ssum s
    """,
)
def ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (Kwiatkowski et al. '92,
    Bartlett window q=4): η = T⁻²ΣSₜ²/σ̂²_lrv over partial sums Sₜ of
    the demeaned series — the null is REVERSED relative to
    ``ts_dickey_fuller`` (stationary under H0, so DF and KPSS
    together give the confirm/deny quadrant). Exactness trick: demean
    in units of 1/T — Eₜ = T·xₜ − Σx is an EXACT integer, every
    partial sum, autocovariance Γ_l = ΣEₜEₜ₋ₗ (128-bit) and ΣSₜ² stay
    integers, and the T/1e6 scale factors CANCEL in the ratio, so
    η = ΣSₜ² / (T·(Γ₀ + 2Σ(1−l/5)Γ_l)) needs no float accumulation
    anywhere; ρ₁ = Γ₁/Γ₀ is reported as the sanity companion.

    Scale: same O(days) frame posture as ``ts_dickey_fuller``."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.floor(F.log(F.sum("l_extendedprice")) * 1e6)
        .cast("long")
        .alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("x").cast("long").alias("sx"),
    )
    w_ord = Window.orderBy("day")
    e = daily.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(w_ord).alias("i"),
        (F.col("t") * F.col("x") - F.col("sx")).cast("long").alias("ee"),
    )
    w_run = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    spart = e.select("i", "ee", F.sum("ee").over(w_run).alias("st"))
    w_i = Window.orderBy("i")
    lags = e.select(
        F.col("ee").alias("e0"),
        F.lag("ee", 1).over(w_i).alias("e1"),
        F.lag("ee", 2).over(w_i).alias("e2"),
        F.lag("ee", 3).over(w_i).alias("e3"),
        F.lag("ee", 4).over(w_i).alias("e4"),
    )
    gam = lags.agg(
        F.sum(F.col("e0").cast("decimal(38,0)") * F.col("e0")).alias("g0"),
        F.sum(F.col("e0").cast("decimal(38,0)") * F.col("e1")).alias("g1"),
        F.sum(F.col("e0").cast("decimal(38,0)") * F.col("e2")).alias("g2"),
        F.sum(F.col("e0").cast("decimal(38,0)") * F.col("e3")).alias("g3"),
        F.sum(F.col("e0").cast("decimal(38,0)") * F.col("e4")).alias("g4"),
    )
    ssum = spart.agg(
        F.sum(F.col("st").cast("decimal(38,0)") * F.col("st")).alias("ss2")
    )
    lrv = F.col("g0").cast("double") + 2 * (
        0.8 * F.col("g1").cast("double")
        + 0.6 * F.col("g2").cast("double")
        + 0.4 * F.col("g3").cast("double")
        + 0.2 * F.col("g4").cast("double")
    )
    return (
        tot.crossJoin(F.broadcast(gam))
        .crossJoin(F.broadcast(ssum))
        .select(
            F.col("t").alias("n_obs"),
            F.round(
                F.col("ss2").cast("double") / (F.col("t") * lrv), 6
            ).alias("kpss_eta"),
            F.round(
                F.col("g1").cast("double") / F.col("g0").cast("double"), 6
            ).alias("rho1"),
        )
    )


@register(
    "ts_turning_points",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), tri AS (
        SELECT LAG(x) OVER (ORDER BY day) AS a, x AS b,
               LEAD(x) OVER (ORDER BY day) AS c
        FROM daily
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) + 2 AS n,
               CAST(SUM(CASE WHEN (b > a AND b > c)
                              OR (b < a AND b < c)
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN b = a OR b = c THEN 1 ELSE 0 END)
                    AS BIGINT) AS ties
        FROM tri WHERE a IS NOT NULL AND c IS NOT NULL
    )
    SELECT n AS n_obs, tp AS n_turning_points, ties AS n_ties,
           ROUND(2.0 * (n - 2) / 3, 4) AS expected_tp,
           ROUND((tp - 2.0 * (n - 2) / 3)
                 / SQRT((16.0 * n - 29) / 90), 4) AS z
    FROM s
    """,
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test for randomness (Wald–Wolfowitz / Kendall): a
    strict local max or min at an interior day is a turning point;
    under i.i.d. noise E[TP] = 2(n−2)/3 and Var = (16n−29)/90, so the
    z-score flags either smoothness (too few turns — trend/momentum)
    or oscillation (too many — alternating/seasonal structure). The
    cheapest sanity screen before reaching for ``ts_ljung_box`` or
    the periodogram; revenue is summed in exact cents so equality
    ties are well-defined (counted, not silently broken).

    Scale: one aggregate to the O(days) series, one lag/lead pass."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    w_ord = Window.orderBy("day")
    tri = daily.select(
        F.lag("x").over(w_ord).alias("a"),
        F.col("x").alias("b"),
        F.lead("x").over(w_ord).alias("c"),
    ).filter(F.col("a").isNotNull() & F.col("c").isNotNull())
    s = tri.agg(
        (F.count(F.lit(1)) + 2).cast("long").alias("n"),
        F.sum(
            F.when(
                ((F.col("b") > F.col("a")) & (F.col("b") > F.col("c")))
                | ((F.col("b") < F.col("a")) & (F.col("b") < F.col("c"))),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when(
                (F.col("b") == F.col("a")) | (F.col("b") == F.col("c")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("ties"),
    )
    n, tp = F.col("n"), F.col("tp")
    return s.select(
        n.alias("n_obs"),
        tp.alias("n_turning_points"),
        F.col("ties").alias("n_ties"),
        F.round(2.0 * (n - 2) / 3, 4).alias("expected_tp"),
        F.round(
            (tp - 2.0 * (n - 2) / 3) / F.sqrt((16.0 * n - 29) / 90), 4
        ).alias("z"),
    )


@register(
    "ts_welch_periodogram",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), idx AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t
        FROM daily
    ), seg AS (
        SELECT s.k AS seg, i.t - s.k * 7 AS u, i.cnt
        FROM idx i
        JOIN (SELECT UNNEST(RANGE(0, 200)) AS k) s
          ON i.t >= s.k * 7 AND i.t < s.k * 7 + 14
    ), segmu AS (
        SELECT seg, AVG(cnt) AS mu, CAST(COUNT(*) AS BIGINT) AS m
        FROM seg GROUP BY seg HAVING COUNT(*) = 14
    ), terms AS (
        SELECT per.p, s.seg,
               CAST(SUM(CAST(FLOOR((s.cnt - g.mu)
                   * COS(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS c_q,
               CAST(SUM(CAST(FLOOR((s.cnt - g.mu)
                   * SIN(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS s_q
        FROM seg s JOIN segmu g ON g.seg = s.seg
        CROSS JOIN (SELECT UNNEST([7, 14]) AS p) per
        GROUP BY per.p, s.seg
    ), power AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(CAST(FLOOR(((c_q / 1e6) * (c_q / 1e6)
                          + (s_q / 1e6) * (s_q / 1e6)) / 14 * 1e6)
                          AS BIGINT)) AS BIGINT) AS pw_q
        FROM terms GROUP BY p
    )
    SELECT CAST(p AS BIGINT) AS period_days, n_segments,
           ROUND(pw_q / 1e6 / n_segments, 4) AS welch_power
    FROM power
    ORDER BY p
    """,
)
def ts_welch_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's averaged periodogram (Welch '67) for the 7- and 14-day
    lines of the daily event-count series: the signal is cut into
    half-overlapping 14-day segments (hop 7), each segment is demeaned
    LOCALLY and its periodogram power |Σ(x−μ)e^{-2πiu/p}|²/m computed,
    and powers average across segments — trading ``ts_periodogram``'s
    frequency resolution for a variance reduction ∝ 1/segments, which
    is what makes a spectral peak trustworthy on one noisy series.
    Per-segment trig terms floor-quantize at 1e-6 and per-segment
    powers at 1e-6 before the cross-segment integer fold, so the
    average is parallelism-stable.

    Scale: the segment join fans each day into ≤2 segments (hop =
    len/2); everything downstream is O(segments × 2 freqs)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_ord = Window.orderBy("day")
    idx = daily.select(
        "cnt", (F.row_number().over(w_ord) - 1).alias("t")
    )
    ks = spark.range(0, 200).select(F.col("id").alias("k"))
    seg = idx.join(
        F.broadcast(ks),
        (F.col("t") >= F.col("k") * 7) & (F.col("t") < F.col("k") * 7 + 14),
    ).select(F.col("k").alias("seg"), (F.col("t") - F.col("k") * 7).alias("u"), "cnt")
    segmu = (
        seg.groupBy("seg")
        .agg(F.avg("cnt").alias("mu"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") == 14)
    )
    ps = spark.createDataFrame([(7,), (14,)], ["p"])
    theta = 2 * math.pi * F.col("u") / F.col("p")
    terms = (
        seg.join(segmu.select("seg", "mu"), "seg")
        .crossJoin(F.broadcast(ps))
        .groupBy("p", "seg")
        .agg(
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.cos(theta) * 1e6)
                .cast("long")
            )
            .cast("long")
            .alias("c_q"),
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.sin(theta) * 1e6)
                .cast("long")
            )
            .cast("long")
            .alias("s_q"),
        )
    )
    power = terms.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(
            F.floor(
                (
                    (F.col("c_q") / 1e6) * (F.col("c_q") / 1e6)
                    + (F.col("s_q") / 1e6) * (F.col("s_q") / 1e6)
                )
                / 14
                * 1e6
            ).cast("long")
        )
        .cast("long")
        .alias("pw_q"),
    )
    return power.select(
        F.col("p").cast("long").alias("period_days"),
        "n_segments",
        F.round(F.col("pw_q") / 1e6 / F.col("n_segments"), 4).alias(
            "welch_power"
        ),
    ).orderBy("period_days")


@register(
    "agg_theil_decomposition",
    """
    WITH v AS (
        SELECT n.n_name AS grp,
               CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), per AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(y) AS BIGINT) AS sg,
               CAST(SUM(CAST(FLOOR(y * LN(CAST(y AS DOUBLE)) * 1e2)
                             AS BIGINT)) AS HUGEINT) AS ylny_q
        FROM v GROUP BY grp
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(SUM(sg) AS BIGINT) AS s,
               CAST(SUM(ylny_q) AS HUGEINT) AS ylny_q
        FROM per
    ), parts AS (
        SELECT t.n, t.s,
               CAST(t.ylny_q AS DOUBLE) / 1e2 / t.s
               - LN(CAST(t.s AS DOUBLE) / t.n) AS t_total,
               SUM((CAST(p.sg AS DOUBLE) / t.s)
                   * (CAST(p.ylny_q AS DOUBLE) / 1e2 / p.sg
                      - LN(CAST(p.sg AS DOUBLE) / p.ng))) AS t_within,
               SUM((CAST(p.sg AS DOUBLE) / t.s)
                   * LN((CAST(p.sg AS DOUBLE) / t.s)
                        / (CAST(p.ng AS DOUBLE) / t.n))) AS t_between,
               CAST(COUNT(*) AS BIGINT) AS n_groups
        FROM per p CROSS JOIN tot t
        GROUP BY t.n, t.s, t.ylny_q
    )
    SELECT n_groups, n AS n_orders,
           ROUND(t_total, 6) AS theil_total,
           ROUND(t_within, 6) AS theil_within,
           ROUND(t_between, 6) AS theil_between,
           ROUND(t_total - t_within - t_between, 9) AS closure_residual
    FROM parts
    """,
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition by customer nation: T_total =
    T_within + T_between EXACTLY — the additive decomposability that
    makes Theil (and not Gini) the index economists use to answer "is
    revenue inequality a between-country or within-country story?"
    (extends the scalar ``agg_theil_index``/``agg_atkinson`` family
    with the structural split). The identity is algebraic in the
    shared Σy·ln y group sums — both sides are built from the SAME
    1e-2-quantized integer folds, so closure_residual is pinned at
    ~1e-9 by the hash gate, the decomposition's own audit.

    Scale: one partial→final aggregate to 25 nation cells via two
    broadcast dim joins; scalar algebra after."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    v = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .select(
            F.col("n_name").alias("grp"),
            F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("y"),
        )
    )
    per = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("y").cast("long").alias("sg"),
        F.sum(
            F.floor(F.col("y") * F.log(F.col("y").cast("double")) * 1e2)
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("ylny_q"),
    )
    tot = per.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("ylny_q").alias("t_ylny_q"),
    )
    t_total = F.col("t_ylny_q").cast("double") / 1e2 / F.col("s") - F.log(
        F.col("s").cast("double") / F.col("n")
    )
    parts = per.crossJoin(F.broadcast(tot)).agg(
        F.max(F.col("n")).alias("n"),
        F.max(F.col("s")).alias("s"),
        F.max(t_total).alias("t_total"),
        F.sum(
            (F.col("sg").cast("double") / F.col("s"))
            * (
                F.col("ylny_q").cast("double") / 1e2 / F.col("sg")
                - F.log(F.col("sg").cast("double") / F.col("ng"))
            )
        ).alias("t_within"),
        F.sum(
            (F.col("sg").cast("double") / F.col("s"))
            * F.log(
                (F.col("sg").cast("double") / F.col("s"))
                / (F.col("ng").cast("double") / F.col("n"))
            )
        ).alias("t_between"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    return parts.select(
        "n_groups",
        F.col("n").alias("n_orders"),
        F.round(F.col("t_total"), 6).alias("theil_total"),
        F.round(F.col("t_within"), 6).alias("theil_within"),
        F.round(F.col("t_between"), 6).alias("theil_between"),
        F.round(
            F.col("t_total") - F.col("t_within") - F.col("t_between"), 9
        ).alias("closure_residual"),
    )


@register(
    "ts_segmented_trend",
    """
    WITH rev AS (
        SELECT DATE_DIFF('day', DATE '1996-01-01',
                         CAST(l_shipdate AS DATE)) AS t,
               CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01' THEN 1
                    ELSE 0 END AS seg,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS y
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '2000-01-01'
        GROUP BY 1, 2
    ), fits AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
               CAST(SUM(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
        FROM rev GROUP BY seg
    ), co AS (
        SELECT seg, n,
               (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                - CAST(st AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                  - CAST(st AS DOUBLE) * st) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                   - CAST(st AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * st) * st) / n AS icept
        FROM fits
    )
    SELECT a.n AS n_days_pre, b.n AS n_days_post,
           ROUND(a.slope / 100.0, 6) AS slope_pre_dollars,
           ROUND(b.slope / 100.0, 6) AS slope_post_dollars,
           ROUND((a.icept + a.slope * 730) / 100.0, 2)
               AS fitted_at_break_pre,
           ROUND((b.icept + b.slope * 730) / 100.0, 2)
               AS fitted_at_break_post,
           ROUND((b.icept + b.slope * 730 - a.icept - a.slope * 730)
                 / 100.0, 2) AS level_change_dollars,
           ROUND((b.slope - a.slope) / 100.0, 6) AS slope_change_dollars
    FROM (SELECT * FROM co WHERE seg = 0) a
    CROSS JOIN (SELECT * FROM co WHERE seg = 1) b
    """,
)
def ts_segmented_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series / segmented regression (Wagner et al.
    '02) around the 1998-01-01 break: daily revenue gets an
    independent OLS line per segment, and the policy-analysis
    quantities are the LEVEL change (gap between the two fitted lines
    AT the breakpoint, day 730) and the SLOPE change — the
    two-parameter answer "did the regime shift the level, the trend,
    or both?" that ``ab_diff_in_diff`` gives for panels and this
    gives for one series. Each segment's five OLS moments are exact
    integers (cross-products in 128-bit); both fitted-at-break values
    are published so the gap is auditable.

    Scale: one aggregate to O(days) per segment; closed-form fits."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-01-01")))
    )
    rev = li.groupBy(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1996-01-01").cast("date")
        ).alias("t"),
        F.when(
            F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")), 1
        )
        .otherwise(0)
        .alias("seg"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("y")
    )
    fits = rev.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")).alias("stt"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("y")).alias("sty"),
    )
    n = F.col("n")
    slope = (
        n.cast("double") * F.col("sty").cast("double")
        - F.col("st").cast("double") * F.col("sy")
    ) / (
        n.cast("double") * F.col("stt").cast("double")
        - F.col("st").cast("double") * F.col("st")
    )
    icept = (F.col("sy").cast("double") - slope * F.col("st")) / n
    co = fits.select("seg", n, slope.alias("slope"), icept.alias("icept"))
    a = co.filter(F.col("seg") == 0).select(
        F.col("n").alias("n_pre"),
        F.col("slope").alias("sl_a"),
        F.col("icept").alias("ic_a"),
    )
    b = co.filter(F.col("seg") == 1).select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("sl_b"),
        F.col("icept").alias("ic_b"),
    )
    fit_a = F.col("ic_a") + F.col("sl_a") * 730
    fit_b = F.col("ic_b") + F.col("sl_b") * 730
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n_pre").alias("n_days_pre"),
        F.col("n_post").alias("n_days_post"),
        F.round(F.col("sl_a") / 100.0, 6).alias("slope_pre_dollars"),
        F.round(F.col("sl_b") / 100.0, 6).alias("slope_post_dollars"),
        F.round(fit_a / 100.0, 2).alias("fitted_at_break_pre"),
        F.round(fit_b / 100.0, 2).alias("fitted_at_break_post"),
        F.round((fit_b - fit_a) / 100.0, 2).alias("level_change_dollars"),
        F.round((F.col("sl_b") - F.col("sl_a")) / 100.0, 6).alias(
            "slope_change_dollars"
        ),
    )


@register(
    "ts_poisson_changepoint",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), seq AS (
        SELECT day, x,
               ROW_NUMBER() OVER (ORDER BY day) AS i,
               SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cx,
               CAST(SUM(x) OVER () AS BIGINT) AS n,
               CAST(COUNT(*) OVER () AS BIGINT) AS t
        FROM daily
    ), llr AS (
        SELECT day, i, cx, n, t,
               CASE WHEN i < t AND cx > 0 AND cx < n THEN
                   cx * LN(CAST(cx AS DOUBLE) / i)
                   + (n - cx) * LN(CAST(n - cx AS DOUBLE) / (t - i))
                   - n * LN(CAST(n AS DOUBLE) / t)
               END AS ll
        FROM seq
    ), best AS (
        SELECT day, i, cx, n, t, ll,
               ROW_NUMBER() OVER (ORDER BY ll DESC, day) AS rk
        FROM llr WHERE ll IS NOT NULL
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS change_day,
           CAST(i AS BIGINT) AS split_index,
           t AS n_days,
           ROUND(CAST(cx AS DOUBLE) / i, 4) AS rate_before,
           ROUND(CAST(n - cx AS DOUBLE) / (t - i), 4) AS rate_after,
           ROUND(2 * ll, 4) AS deviance_stat
    FROM best WHERE rk = 1
    """,
)
def ts_poisson_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single Poisson changepoint by maximum likelihood (the AMOC scan
    behind PELT/binary segmentation, Poisson cost): for every split k
    the log-likelihood gain n₁ln(λ̂₁)+n₂ln(λ̂₂)−n·ln(λ̂) comes straight
    off the PREFIX SUM of daily counts — the whole candidate scan is
    one cumulative window plus an argmax, no per-split re-aggregation
    — and 2·gain is the deviance statistic (~χ²₁ plus a multiple-look
    penalty in practice). Complements ``ts_changepoint``'s mean-shift
    CUSUM with the count-data likelihood, and
    ``events_poisson_dispersion`` tells you whether the Poisson cost
    is even admissible. Ties in the argmax break on day — exact
    integer prefix sums make the whole scan engine-identical.

    Scale: one aggregate to O(days), one window pass, one top-1."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w_ord = Window.orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = daily.select(
        "day",
        F.row_number().over(w_ord).alias("i"),
        F.sum("x").over(w_cum).alias("cx"),
        F.sum("x").over(w_all).cast("long").alias("n"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("t"),
    )
    i, cx, n, t = F.col("i"), F.col("cx"), F.col("n"), F.col("t")
    ll = F.when(
        (i < t) & (cx > 0) & (cx < n),
        cx * F.log(cx.cast("double") / i)
        + (n - cx) * F.log((n - cx).cast("double") / (t - i))
        - n * F.log(n.cast("double") / t),
    )
    llr = seq.select("day", "i", "cx", "n", "t", ll.alias("ll")).filter(
        F.col("ll").isNotNull()
    )
    best = llr.select(
        "*", F.row_number().over(Window.orderBy(F.desc("ll"), F.asc("day"))).alias("rk")
    ).filter(F.col("rk") == 1)
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        i.cast("long").alias("split_index"),
        t.alias("n_days"),
        F.round(cx.cast("double") / i, 4).alias("rate_before"),
        F.round((n - cx).cast("double") / (t - i), 4).alias("rate_after"),
        F.round(2 * F.col("ll"), 4).alias("deviance_stat"),
    )


@register(
    "spc_p_chart",
    """
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS d
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(d) AS BIGINT) AS dd
        FROM daily
    ), chart AS (
        SELECT d.day, d.n, d.d,
               CAST(d.d AS DOUBLE) / d.n AS p,
               CAST(t.dd AS DOUBLE) / t.nn AS pbar,
               3 * SQRT(CAST(t.dd AS DOUBLE) / t.nn
                        * (1 - CAST(t.dd AS DOUBLE) / t.nn) / d.n)
                   AS halfwidth
        FROM daily d CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(pbar), 6) AS center_line,
           CAST(SUM(CASE WHEN p > pbar + halfwidth THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_ucl,
           CAST(SUM(CASE WHEN p < pbar - halfwidth THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below_lcl,
           COALESCE(STRFTIME(MIN(CASE WHEN p > pbar + halfwidth
                                      OR p < pbar - halfwidth
                                 THEN day END), '%Y-%m-%d'), 'none')
               AS first_violation_day,
           ROUND(MAX(p), 6) AS max_daily_p,
           ROUND(MIN(p), 6) AS min_daily_p
    FROM chart
    """,
)
def spc_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart for ATTRIBUTE data (Shewhart; Montgomery ch. 7): the
    daily purchase PROPORTION against variable-width 3σ binomial
    limits p̄ ± 3√(p̄(1−p̄)/nᵢ) — each day's own sample size sets its
    limits, which is what separates a p-chart from slapping the
    continuous XmR (``spc_xmr_chart``) on a ratio. Completes the SPC
    deck: XmR (continuous), CUSUM (small persistent shifts),
    Page–Hinkley (self-tuning drift), p-chart (proportions).
    Violations count and the first out-of-control day are published;
    all inputs are exact integer counts, the limits closed-form.

    Scale: one aggregate to O(days); row-local limit algebra."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("d"),
    )
    tot = daily.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("d").cast("long").alias("dd"),
    )
    pbar = F.col("dd").cast("double") / F.col("nn")
    chart = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("d").cast("double") / F.col("n")).alias("p"),
        pbar.alias("pbar"),
        (3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))).alias("halfwidth"),
    )
    above = F.col("p") > F.col("pbar") + F.col("halfwidth")
    below = F.col("p") < F.col("pbar") - F.col("halfwidth")
    return chart.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max("pbar"), 6).alias("center_line"),
        F.sum(F.when(above, 1).otherwise(0)).cast("long").alias("n_above_ucl"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias("n_below_lcl"),
        F.coalesce(
            F.date_format(
                F.min(F.when(above | below, F.col("day"))), "yyyy-MM-dd"
            ),
            F.lit("none"),
        ).alias("first_violation_day"),
        F.round(F.max("p"), 6).alias("max_daily_p"),
        F.round(F.min("p"), 6).alias("min_daily_p"),
    )


@register(
    "ts_pettitt",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1
    ), rnk AS (
        SELECT day,
               RANK() OVER (ORDER BY rev)
               + (COUNT(*) OVER (PARTITION BY rev) - 1) / 2.0 AS r,
               ROW_NUMBER() OVER (ORDER BY day) AS t,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    ), u AS (
        SELECT day, t, n,
               2 * SUM(r) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) - t * (n + 1.0) AS ut
        FROM rnk
    ), best AS (
        SELECT day, t, n, ut,
               ROW_NUMBER() OVER (ORDER BY ABS(ut) DESC, day) AS rk
        FROM u WHERE t < n
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS change_day,
           CAST(t AS BIGINT) AS split_index, n AS n_days,
           ROUND(ABS(ut), 2) AS k_stat,
           ROUND(LEAST(1.0, 2 * EXP(-6.0 * ut * ut
                 / (CAST(n AS DOUBLE) * n * n
                    + CAST(n AS DOUBLE) * n))), 6) AS p_approx
    FROM best WHERE rk = 1
    """,
)
def ts_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric changepoint test (Pettitt '79) on daily
    revenue: the Mann–Whitney-style statistic Uₜ = Σ_{i≤t}Σ_{j>t}
    sgn(xⱼ−xᵢ) collapses — via the rank identity Uₜ = 2Rₜ − t(n+1)
    with midranks — to ONE cumulative sum over the ranked series, so
    the O(n²) pairwise definition costs one window pass; K = max|Uₜ|,
    with Pettitt's p ≈ 2exp(−6K²/(n³+n²)). The distribution-free
    companion to ``ts_poisson_changepoint`` (no Poisson assumption,
    robust to outliers) and the changepoint twin of the MK trend
    family. Ranks are exact midranks over exact cents; argmax ties
    break on day.

    Scale: O(days) frame; two windows (rank, cumsum) + a top-1."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w_rank = Window.orderBy("rev")
    w_tie = Window.partitionBy("rev")
    w_day = Window.orderBy("day")
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rnk = daily.select(
        "day",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - 1) / F.lit(2.0)
        ).alias("r"),
        F.row_number().over(w_day).alias("t"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = rnk.select(
        "day",
        "t",
        "n",
        (
            2 * F.sum("r").over(w_cum) - F.col("t") * (F.col("n") + F.lit(1.0))
        ).alias("ut"),
    ).filter(F.col("t") < F.col("n"))
    best = u.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("ut")).desc(), F.asc("day")))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    n = F.col("n")
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        F.col("t").cast("long").alias("split_index"),
        n.alias("n_days"),
        F.round(F.abs(F.col("ut")), 2).alias("k_stat"),
        F.round(
            F.least(
                F.lit(1.0),
                2
                * F.exp(
                    -6.0
                    * F.col("ut")
                    * F.col("ut")
                    / (n.cast("double") * n * n + n.cast("double") * n)
                ),
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "ts_ses_alpha_sweep",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1
    ), seq AS (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM daily
    ), alphas AS (
        SELECT UNNEST([0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])
            AS alpha
    ), weights AS (
        SELECT a.alpha, j.j,
               a.alpha * POWER(1 - a.alpha, j.j) AS w
        FROM alphas a
        CROSS JOIN (SELECT UNNEST(RANGE(0, 40)) AS j) j
    ), fc AS (
        SELECT w.alpha, s.t,
               CAST(SUM(CAST(FLOOR(w.w * h.rev * 1e2) AS BIGINT))
                    AS BIGINT) AS fq,
               SUM(w.w) AS wsum
        FROM seq s
        JOIN weights w ON TRUE
        JOIN seq h ON h.t = s.t - 1 - w.j
        WHERE s.t > 40
        GROUP BY w.alpha, s.t
    ), err AS (
        SELECT f.alpha,
               CAST(COUNT(*) AS BIGINT) AS n_fc,
               CAST(SUM(CAST(FLOOR(
                   ABS(s.rev - (f.fq / 1e2) / f.wsum) / 1e2) AS BIGINT))
                    AS BIGINT) AS sae_d
        FROM fc f JOIN seq s ON s.t = f.t
        GROUP BY f.alpha
    )
    SELECT alpha, n_fc AS n_forecasts,
           CAST(sae_d AS BIGINT) AS sum_abs_err_dollars,
           ROUND(CAST(sae_d AS DOUBLE) / n_fc, 2) AS mae_dollars
    FROM err
    ORDER BY alpha
    """,
)
def ts_ses_alpha_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing model selection: one-step-ahead MAE
    of daily revenue for seven dyadic smoothing constants α ∈
    {1/8 … 7/8} — the design table behind "which α should ``ts_ewma``
    run", produced in ONE joined pass instead of seven sequential
    fits: each forecast is the truncated 40-term weighted history sum
    (weights renormalized over the window; dyadic α keeps every
    POWER(1−α, j) an exact binary fraction, the ``ts_croston``
    trick), terms floor-quantized at 1e-2 cents before integer
    folding, absolute errors floored to whole dollars. Low-α rows
    winning = momentum; high-α winning = level shifts dominate.

    Scale: the history join fans each day into 7α × 40 lags — bounded
    constant fan-out per row, shuffle ∝ days, no sequential
    recursion anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w_ord = Window.orderBy("day")
    seq = daily.select(
        "rev", F.row_number().over(w_ord).alias("t")
    ).localCheckpoint()
    alphas = spark.createDataFrame(
        [(0.125,), (0.25,), (0.375,), (0.5,), (0.625,), (0.75,), (0.875,)],
        ["alpha"],
    )
    js = spark.range(0, 40).select(F.col("id").cast("int").alias("j"))
    weights = alphas.crossJoin(js).select(
        "alpha",
        "j",
        (F.col("alpha") * F.pow(1 - F.col("alpha"), F.col("j"))).alias("w"),
    )
    s = seq.select(F.col("rev").alias("y"), F.col("t"))
    h = seq.select(F.col("rev").alias("hrev"), F.col("t").alias("ht"))
    fc = (
        s.filter(F.col("t") > 40)
        .crossJoin(F.broadcast(weights))
        .join(h, F.col("ht") == F.col("t") - 1 - F.col("j"))
        .groupBy("alpha", "t")
        .agg(
            F.sum(
                F.floor(F.col("w") * F.col("hrev") * 1e2).cast("long")
            )
            .cast("long")
            .alias("fq"),
            F.sum("w").alias("wsum"),
        )
    )
    err = (
        fc.join(s, "t")
        .groupBy("alpha")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fc"),
            F.sum(
                F.floor(
                    F.abs(
                        F.col("y") - (F.col("fq") / 1e2) / F.col("wsum")
                    )
                    / 1e2
                ).cast("long")
            )
            .cast("long")
            .alias("sae_d"),
        )
    )
    return err.select(
        "alpha",
        F.col("n_fc").alias("n_forecasts"),
        F.col("sae_d").alias("sum_abs_err_dollars"),
        F.round(F.col("sae_d").cast("double") / F.col("n_fc"), 2).alias(
            "mae_dollars"
        ),
    ).orderBy("alpha")


@register(
    "stats_cohen_h",
    """
    WITH arms AS (
        SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS arm,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ), s AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS x
        FROM arms GROUP BY arm
    ), pair AS (
        SELECT a.n AS n1, CAST(a.x AS DOUBLE) / a.n AS p1,
               b.n AS n2, CAST(b.x AS DOUBLE) / b.n AS p2
        FROM (SELECT * FROM s WHERE arm = 1) a
        CROSS JOIN (SELECT * FROM s WHERE arm = 0) b
    )
    SELECT n1 AS n_exposed, n2 AS n_unexposed,
           ROUND(p1, 6) AS p_exposed, ROUND(p2, 6) AS p_unexposed,
           ROUND(2 * ASIN(SQRT(p1)) - 2 * ASIN(SQRT(p2)), 6) AS cohen_h,
           CASE WHEN ABS(2 * ASIN(SQRT(p1)) - 2 * ASIN(SQRT(p2))) < 0.2
                THEN 'negligible'
                WHEN ABS(2 * ASIN(SQRT(p1)) - 2 * ASIN(SQRT(p2))) < 0.5
                THEN 'small'
                WHEN ABS(2 * ASIN(SQRT(p1)) - 2 * ASIN(SQRT(p2))) < 0.8
                THEN 'medium' ELSE 'large' END AS magnitude
    FROM pair
    """,
)
def stats_cohen_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's h effect size for two proportions (Cohen '88):
    h = 2·asin√p₁ − 2·asin√p₂ — the arcsine transform makes the
    difference's variance independent of where on [0,1] the
    proportions sit, so 0.10 vs 0.05 and 0.55 vs 0.50 (same naive
    gap) get the different effect sizes they deserve. The magnitude
    label applies Cohen's 0.2/0.5/0.8 conventions — the companion
    every significance number in this family
    (``stats_two_proportion_z``, ``stats_newcombe_ci``) should ship
    with, because n makes tiny effects 'significant' at fixture
    scale. Counts exact; one asin per arm.

    Scale: one conditional-count pass, scalar algebra."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    arms = li.select(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("arm"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    s = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("x"),
    )
    a = s.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"),
        (F.col("x").cast("double") / F.col("n")).alias("p1"),
    )
    b = s.filter(F.col("arm") == 0).select(
        F.col("n").alias("n2"),
        (F.col("x").cast("double") / F.col("n")).alias("p2"),
    )
    h = 2 * F.asin(F.sqrt(F.col("p1"))) - 2 * F.asin(F.sqrt(F.col("p2")))
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n1").alias("n_exposed"),
        F.col("n2").alias("n_unexposed"),
        F.round(F.col("p1"), 6).alias("p_exposed"),
        F.round(F.col("p2"), 6).alias("p_unexposed"),
        F.round(h, 6).alias("cohen_h"),
        F.when(F.abs(h) < 0.2, F.lit("negligible"))
        .when(F.abs(h) < 0.5, F.lit("small"))
        .when(F.abs(h) < 0.8, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )


@register(
    "join_allen_relations",
    """
    WITH e AS (
        SELECT user_id, EPOCH_US(ts) AS us, event_id FROM events
    ), flagged AS (
        SELECT user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
        SELECT user_id, sno, MIN(us) AS s, MAX(us) + 60000000 AS f
        FROM (
            SELECT user_id, us,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sno
            FROM flagged
        ) GROUP BY user_id, sno
    ), pairs AS (
        SELECT s AS s1, f AS f1,
               LEAD(s) OVER w2 AS s2, LEAD(f) OVER w2 AS f2
        FROM sess
        WINDOW w2 AS (PARTITION BY user_id ORDER BY s, f)
    ), rel AS (
        SELECT CASE
            WHEN s1 = s2 AND f1 = f2 THEN 'equals'
            WHEN f1 < s2 THEN 'before'
            WHEN f1 = s2 THEN 'meets'
            WHEN s1 = s2 AND f1 < f2 THEN 'starts'
            WHEN s1 = s2 AND f1 > f2 THEN 'started_by'
            WHEN s1 < s2 AND f1 = f2 THEN 'finished_by'
            WHEN s1 > s2 AND f1 = f2 THEN 'finishes'
            WHEN s1 < s2 AND f1 > f2 THEN 'contains'
            WHEN s1 > s2 AND f1 < f2 THEN 'during'
            WHEN s1 < s2 AND s2 < f1 AND f1 < f2 THEN 'overlaps'
            ELSE 'other' END AS relation
        FROM pairs WHERE s2 IS NOT NULL
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM rel GROUP BY relation
    ORDER BY n_pairs DESC, relation
    """,
)
def join_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (Allen '83) applied to CONSECUTIVE user
    sessions (each padded by a 60 s grace endpoint): every adjacent
    pair is classified into the relation taxonomy — before / meets /
    overlaps / starts / during / finishes / contains / equals — the
    formally complete vocabulary for temporal-join semantics that
    ``join_temporal_overlap_pairs`` (which only asks "overlap:
    yes/no") sits inside. With 30-minute-gap sessionization adjacent
    pairs are 'before' by construction, so any other bucket is a
    sessionizer-invariant VIOLATION — this is simultaneously a
    taxonomy demo and a correctness audit of the session builder (the
    tests pin before == all pairs). Endpoints are exact integer
    microseconds; pairing is a per-user LEAD, never a self-join.

    Scale: sessionize shuffles by user; classification is row-local."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", F.unix_micros(F.col("ts")).alias("us"), "event_id"
    )
    w_u = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w_u).isNull()
            | (F.col("us") - F.lag("us").over(w_u) >= 1800000000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        flagged.withColumn("sno", F.sum("new_session").over(w_run))
        .groupBy("user_id", "sno")
        .agg(
            F.min("us").alias("s"),
            (F.max("us") + 60000000).alias("f"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("s", "f")
    pairs = sess.select(
        F.col("s").alias("s1"),
        F.col("f").alias("f1"),
        F.lead("s").over(w2).alias("s2"),
        F.lead("f").over(w2).alias("f2"),
    ).filter(F.col("s2").isNotNull())
    s1, f1, s2, f2 = (F.col(c) for c in ("s1", "f1", "s2", "f2"))
    rel = pairs.select(
        F.when((s1 == s2) & (f1 == f2), "equals")
        .when(f1 < s2, "before")
        .when(f1 == s2, "meets")
        .when((s1 == s2) & (f1 < f2), "starts")
        .when((s1 == s2) & (f1 > f2), "started_by")
        .when((s1 < s2) & (f1 == f2), "finished_by")
        .when((s1 > s2) & (f1 == f2), "finishes")
        .when((s1 < s2) & (f1 > f2), "contains")
        .when((s1 > s2) & (f1 < f2), "during")
        .when((s1 < s2) & (s2 < f1) & (f1 < f2), "overlaps")
        .otherwise("other")
        .alias("relation")
    )
    return (
        rel.groupBy("relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("relation"))
    )


@register(
    "ts_permutation_entropy",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), tri AS (
        SELECT x AS a,
               LEAD(x, 1) OVER (ORDER BY day) AS b,
               LEAD(x, 2) OVER (ORDER BY day) AS c
        FROM daily
    ), pat AS (
        SELECT CASE
            WHEN a < b AND b < c THEN '012'
            WHEN a < c AND c <= b THEN '021'
            WHEN b <= a AND a < c THEN '102'
            WHEN c <= a AND a < b THEN '120'
            WHEN b < c AND c <= a THEN '201'
            ELSE '210' END AS p
        FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
    ), counts AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM pat GROUP BY p
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS m FROM counts),
    h AS (
        SELECT CAST(SUM(CAST(FLOOR(-n * LN(CAST(n AS DOUBLE) / m) * 1e9)
                             AS BIGINT)) AS BIGINT) AS hq,
               CAST(COUNT(*) AS BIGINT) AS n_patterns
        FROM counts CROSS JOIN tot
    )
    SELECT t.m AS n_windows, h.n_patterns,
           ROUND(h.hq / 1e9 / t.m, 6) AS perm_entropy_nats,
           ROUND(h.hq / 1e9 / t.m / LN(6.0), 6) AS perm_entropy_norm
    FROM h CROSS JOIN tot t
    """,
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy of order 3 (Bandt & Pompe '02): every
    3-day window of daily revenue is reduced to its ORDINAL pattern
    (which of the 6 orderings the triple realizes — ties resolved to
    the earlier index, the standard convention) and the Shannon
    entropy of the pattern distribution, normalized by ln 3! = ln 6,
    scores the series' complexity: 1 for white noise, low for
    monotone/periodic structure — robust to any monotone transform of
    the values, which no moment or spectral statistic
    (``ts_spectral_entropy``) can claim. Pattern classification is
    exact integer comparison; entropy terms quantize at 1e-9.

    Scale: two LEADs over the O(days) frame, 6 pattern cells."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("x")
    )
    w_ord = Window.orderBy("day")
    tri = daily.select(
        F.col("x").alias("a"),
        F.lead("x", 1).over(w_ord).alias("b"),
        F.lead("x", 2).over(w_ord).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    pat = tri.select(
        F.when((a < b) & (b < c), "012")
        .when((a < c) & (c <= b), "021")
        .when((b <= a) & (a < c), "102")
        .when((c <= a) & (a < b), "120")
        .when((b < c) & (c <= a), "201")
        .otherwise("210")
        .alias("p")
    )
    counts = pat.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("m"))
    h = counts.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                -F.col("n") * F.log(F.col("n").cast("double") / F.col("m")) * 1e9
            ).cast("long")
        )
        .cast("long")
        .alias("hq"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
    )
    return h.crossJoin(F.broadcast(tot)).select(
        F.col("m").alias("n_windows"),
        "n_patterns",
        F.round(F.col("hq") / 1e9 / F.col("m"), 6).alias(
            "perm_entropy_nats"
        ),
        F.round(
            F.col("hq") / 1e9 / F.col("m") / math.log(6.0), 6
        ).alias("perm_entropy_norm"),
    )


@register(
    "stats_odds_ratio_ci",
    """
    WITH v AS (
        SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS exposed,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS outcome
        FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ), cells AS (
        SELECT
            CAST(COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 1)
                 AS BIGINT) AS a,
            CAST(COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 0)
                 AS BIGINT) AS b,
            CAST(COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 1)
                 AS BIGINT) AS c,
            CAST(COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 0)
                 AS BIGINT) AS d
        FROM v
    )
    SELECT a, b, c, d,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
               AS odds_ratio,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c
                                   + 1.0 / d)), 6) AS ci_lower,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c
                                   + 1.0 / d)), 6) AS ci_upper,
           CASE WHEN 1.0 < EXP(LN(CAST(a AS DOUBLE) * d
                                  / (CAST(b AS DOUBLE) * c))
                     - 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
                  OR 1.0 > EXP(LN(CAST(a AS DOUBLE) * d
                                  / (CAST(b AS DOUBLE) * c))
                     + 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
                THEN 1 ELSE 0 END AS excludes_one
    FROM cells
    """,
)
def stats_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crude odds ratio with Woolf's logit confidence interval
    (Woolf '55): OR = ad/bc and ln OR ± 1.96√(1/a+1/b+1/c+1/d) for the
    discount≥5% × returned 2×2 — the UNSTRATIFIED companion to
    ``stats_mantel_haenszel`` (compare the two: a crude OR outside
    the MH interval is Simpson's paradox in one glance) and the
    effect-size partner of ``stats_fisher_exact``'s p-value. Counts
    exact; the CI is closed-form; excludes_one is the significance
    read.

    Scale: one conditional-count pass to 4 cells."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    v = li.select(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("exposed"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("outcome"),
    )
    cells = v.agg(
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 1), 1))
        .cast("long")
        .alias("a"),
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 0), 1))
        .cast("long")
        .alias("b"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 1), 1))
        .cast("long")
        .alias("c"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 0), 1))
        .cast("long")
        .alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    lor = F.log(a.cast("double") * d / (b.cast("double") * c))
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    lo = F.exp(lor - 1.96 * se)
    hi = F.exp(lor + 1.96 * se)
    return cells.select(
        a,
        b,
        c,
        d,
        F.round(a.cast("double") * d / (b.cast("double") * c), 6).alias(
            "odds_ratio"
        ),
        F.round(lo, 6).alias("ci_lower"),
        F.round(hi, 6).alias("ci_upper"),
        F.when((F.lit(1.0) < lo) | (F.lit(1.0) > hi), 1)
        .otherwise(0)
        .alias("excludes_one"),
    )


@register(
    "ts_fisher_g_test",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), idx AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t,
               AVG(cnt) OVER () AS mu,
               COUNT(*) OVER () AS n
        FROM daily
    ), p AS (
        SELECT per.p,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * COS(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS c_q,
               CAST(SUM(CAST(FLOOR((cnt - mu)
                   * SIN(2 * PI() * t / per.p) * 1e6) AS BIGINT)) AS BIGINT)
                   AS s_q,
               CAST(MAX(n) AS BIGINT) AS n
        FROM idx CROSS JOIN (SELECT UNNEST(RANGE(2, 17)) AS p) per
        GROUP BY per.p
    ), pw AS (
        SELECT p,
               CAST(FLOOR(((c_q / 1e6) * (c_q / 1e6)
                           + (s_q / 1e6) * (s_q / 1e6)) / n * 1e6)
                    AS BIGINT) AS pw_q
        FROM p
    ), folds AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(pw_q) AS BIGINT) AS tot_q,
               CAST(MAX(pw_q) AS BIGINT) AS max_q,
               MAX(CASE WHEN pw_q = (SELECT MAX(pw_q) FROM pw)
                        THEN p END) AS peak_p
        FROM pw
    )
    SELECT k AS n_frequencies, CAST(peak_p AS BIGINT) AS peak_period_days,
           ROUND(CAST(max_q AS DOUBLE) / tot_q, 6) AS fisher_g,
           ROUND(k * POWER(1 - CAST(max_q AS DOUBLE) / tot_q, k - 1), 9)
               AS p_value_approx
    FROM folds
    """,
)
def ts_fisher_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's g-test for periodogram peak significance (Fisher '29):
    g = max ordinate / Σ ordinates over the 2–16-day frequency grid,
    with the exact-null first term P ≈ k(1−g)^{k−1} — the test that
    separates "the weekly peak in ``ts_periodogram`` is real" from
    "some frequency always wins by chance" (the multiple-comparisons
    trap every spectral eyeball falls into). Trig folds quantize at
    1e-6 and each ordinate at 1e-6, so g is a ratio of exact integers;
    the argmax tie-breaks by period.

    Scale: O(days) frame × 15 frequency cells."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_ord = Window.orderBy("day")
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "cnt",
        (F.row_number().over(w_ord) - 1).alias("t"),
        F.avg("cnt").over(w_all).alias("mu"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    ps = spark.range(2, 17).select(F.col("id").cast("int").alias("p"))
    theta = 2 * math.pi * F.col("t") / F.col("p")
    p = (
        idx.crossJoin(F.broadcast(ps))
        .groupBy("p")
        .agg(
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.cos(theta) * 1e6)
                .cast("long")
            )
            .cast("long")
            .alias("c_q"),
            F.sum(
                F.floor((F.col("cnt") - F.col("mu")) * F.sin(theta) * 1e6)
                .cast("long")
            )
            .cast("long")
            .alias("s_q"),
            F.max("n").cast("long").alias("n"),
        )
    )
    pw = p.select(
        "p",
        F.floor(
            (
                (F.col("c_q") / 1e6) * (F.col("c_q") / 1e6)
                + (F.col("s_q") / 1e6) * (F.col("s_q") / 1e6)
            )
            / F.col("n")
            * 1e6
        )
        .cast("long")
        .alias("pw_q"),
    )
    mx = pw.agg(F.max("pw_q").alias("mxq"))
    folds = pw.crossJoin(F.broadcast(mx)).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("pw_q").cast("long").alias("tot_q"),
        F.max("pw_q").cast("long").alias("max_q"),
        F.max(F.when(F.col("pw_q") == F.col("mxq"), F.col("p"))).alias(
            "peak_p"
        ),
    )
    g = F.col("max_q").cast("double") / F.col("tot_q")
    k = F.col("k")
    return folds.select(
        k.alias("n_frequencies"),
        F.col("peak_p").cast("long").alias("peak_period_days"),
        F.round(g, 6).alias("fisher_g"),
        F.round(k * F.pow(1 - g, k - 1), 9).alias("p_value_approx"),
    )


@register(
    "agg_topsis_ranking",
    """
    WITH kpi AS (
        SELECT n.n_name AS alt,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    ), norms AS (
        SELECT SQRT(CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE))
                   AS nr,
               SQRT(CAST(SUM(n_orders * n_orders) AS DOUBLE)) AS no,
               SQRT(CAST(SUM(n_cust * n_cust) AS DOUBLE)) AS nc
        FROM kpi
    ), z AS (
        SELECT k.alt,
               CAST(k.rev AS DOUBLE) / m.nr AS z1,
               CAST(k.n_orders AS DOUBLE) / m.no AS z2,
               CAST(k.n_cust AS DOUBLE) / m.nc AS z3
        FROM kpi k CROSS JOIN norms m
    ), ideal AS (
        SELECT MAX(z1) AS b1, MAX(z2) AS b2, MAX(z3) AS b3,
               MIN(z1) AS w1, MIN(z2) AS w2, MIN(z3) AS w3
        FROM z
    ), scored AS (
        SELECT z.alt,
               SQRT((z.z1 - i.b1) * (z.z1 - i.b1)
                    + (z.z2 - i.b2) * (z.z2 - i.b2)
                    + (z.z3 - i.b3) * (z.z3 - i.b3)) AS d_plus,
               SQRT((z.z1 - i.w1) * (z.z1 - i.w1)
                    + (z.z2 - i.w2) * (z.z2 - i.w2)
                    + (z.z3 - i.w3) * (z.z3 - i.w3)) AS d_minus
        FROM z CROSS JOIN ideal i
    )
    SELECT alt AS nation,
           ROUND(d_minus / (d_plus + d_minus), 6) AS topsis_score,
           ROW_NUMBER() OVER (ORDER BY d_minus / (d_plus + d_minus) DESC,
                              alt) AS rnk
    FROM scored
    ORDER BY rnk
    LIMIT 10
    """,
)
def agg_topsis_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS multi-criteria ranking (Hwang & Yoon '81) of nations on
    three benefit criteria — revenue, order count, customer count —
    each vector-normalized, then ranked by relative closeness
    d⁻/(d⁺+d⁻) to the ideal vs anti-ideal point: the standard MCDM
    answer to "which market is best OVERALL" that a single-KPI sort
    (``pareto_abc``) cannot give, and unlike a weighted sum it is
    scale-free by construction. Norms come from exact integer squares
    (revenue² in 128-bit); distances are fixed three-term expressions
    so no fold-order enters; top-10 published with deterministic
    tie-break.

    Scale: one aggregate to 25 nation rows; everything after is
    25-row algebra."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    kpi = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_name").alias("alt"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("long")
            .alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_cust"),
        )
    )
    norms = kpi.agg(
        F.sqrt(
            F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev")).cast(
                "double"
            )
        ).alias("nr"),
        F.sqrt(
            F.sum(F.col("n_orders") * F.col("n_orders")).cast("double")
        ).alias("no"),
        F.sqrt(
            F.sum(F.col("n_cust") * F.col("n_cust")).cast("double")
        ).alias("nc"),
    )
    z = kpi.crossJoin(F.broadcast(norms)).select(
        "alt",
        (F.col("rev").cast("double") / F.col("nr")).alias("z1"),
        (F.col("n_orders").cast("double") / F.col("no")).alias("z2"),
        (F.col("n_cust").cast("double") / F.col("nc")).alias("z3"),
    )
    ideal = z.agg(
        F.max("z1").alias("b1"),
        F.max("z2").alias("b2"),
        F.max("z3").alias("b3"),
        F.min("z1").alias("w1"),
        F.min("z2").alias("w2"),
        F.min("z3").alias("w3"),
    )
    zi = z.crossJoin(F.broadcast(ideal))
    d_plus = F.sqrt(
        (F.col("z1") - F.col("b1")) * (F.col("z1") - F.col("b1"))
        + (F.col("z2") - F.col("b2")) * (F.col("z2") - F.col("b2"))
        + (F.col("z3") - F.col("b3")) * (F.col("z3") - F.col("b3"))
    )
    d_minus = F.sqrt(
        (F.col("z1") - F.col("w1")) * (F.col("z1") - F.col("w1"))
        + (F.col("z2") - F.col("w2")) * (F.col("z2") - F.col("w2"))
        + (F.col("z3") - F.col("w3")) * (F.col("z3") - F.col("w3"))
    )
    scored = zi.select(
        "alt", d_plus.alias("d_plus"), d_minus.alias("d_minus")
    )
    score = F.col("d_minus") / (F.col("d_plus") + F.col("d_minus"))
    return (
        scored.select(
            F.col("alt").alias("nation"),
            F.round(score, 6).alias("topsis_score"),
            F.row_number()
            .over(Window.orderBy(score.desc(), F.asc("alt")))
            .cast("long")
            .alias("rnk"),
        )
        .orderBy("rnk")
        .limit(10)
    )


@register(
    "events_bass_diffusion",
    """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
    ), daily AS (
        SELECT DATE_DIFF('day', DATE '2020-01-01', d0) AS wk,
               CAST(COUNT(*) AS BIGINT) AS adopters
        FROM firsts GROUP BY 1
    ), seq AS (
        SELECT wk, adopters,
               COALESCE(SUM(adopters) OVER (ORDER BY wk ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
        FROM daily
    ), mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(adopters) AS BIGINT) AS sy,
               CAST(SUM(cum_prev) AS BIGINT) AS s1,
               CAST(SUM(CAST(cum_prev AS HUGEINT) * cum_prev) AS HUGEINT)
                   AS s2,
               CAST(SUM(CAST(cum_prev AS HUGEINT) * cum_prev * cum_prev)
                    AS HUGEINT) AS s3,
               CAST(SUM(CAST(cum_prev AS HUGEINT) * cum_prev * cum_prev
                        * cum_prev) AS HUGEINT) AS s4,
               CAST(SUM(CAST(cum_prev AS HUGEINT) * adopters) AS HUGEINT)
                   AS sxy,
               CAST(SUM(CAST(cum_prev AS HUGEINT) * cum_prev * adopters)
                    AS HUGEINT) AS sx2y
        FROM seq
    ), cen AS (
        SELECT n,
               CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS c11,
               CAST(s3 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / n AS c12,
               CAST(s4 AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / n AS c22,
               CAST(sxy AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS c1y,
               CAST(sx2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y,
               CAST(sy AS DOUBLE) / n AS my,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n AS m2
        FROM mo
    ), fit AS (
        SELECT n,
               (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b,
               (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS c,
               my - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * m1
                  - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * m2
                   AS a
        FROM cen
    )
    SELECT n AS n_days,
           ROUND(a, 4) AS coef_a, ROUND(b, 6) AS coef_b,
           ROUND(c, 9) AS coef_c,
           ROUND((-b - SQRT(b * b - 4 * a * c)) / (2 * c), 1)
               AS market_size_m,
           ROUND(a / ((-b - SQRT(b * b - 4 * a * c)) / (2 * c)), 6)
               AS innovation_p,
           ROUND(-c * ((-b - SQRT(b * b - 4 * a * c)) / (2 * c)), 6)
               AS imitation_q
    FROM fit
    """,
)
def events_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model (Bass '69) fit to DAILY first-PURCHASE
    adoption (every fixture user is ACTIVE from day one, so activity
    has no diffusion curve — conversion does) by the discrete OLS
    form n(t) = a + b·N(t−1) + c·N(t−1)² — the
    marketing-science standard for "how big will this get and is
    growth innovation- or imitation-driven": the quadratic roots give
    market size m = (−b−√(b²−4ac))/2c, innovation p = a/m and
    imitation q = −c·m (word-of-mouth dominates when q ≫ p). The
    2-predictor normal equations are the explicit closed form (the
    ``stats_sobel_mediation`` machinery); all seven raw moments are
    exact integers with the N³/N⁴ powers in 128-bit.

    Scale: one per-user first-event aggregate, one O(weeks) frame."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("d0"))
    )
    daily = firsts.groupBy(
        F.expr("datediff(d0, DATE '2020-01-01')").alias("wk")
    ).agg(F.count(F.lit(1)).cast("long").alias("adopters"))
    w_prev = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, -1)
    seq = daily.select(
        "wk",
        "adopters",
        F.coalesce(F.sum("adopters").over(w_prev), F.lit(0)).alias(
            "cum_prev"
        ),
    )
    cp, ad = F.col("cum_prev"), F.col("adopters")
    mo = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(ad).cast("long").alias("sy"),
        F.sum(cp).cast("long").alias("s1"),
        F.sum(cp.cast("decimal(38,0)") * cp).alias("s2"),
        F.sum(cp.cast("decimal(38,0)") * cp * cp).alias("s3"),
        F.sum(cp.cast("decimal(38,0)") * cp * cp * cp).alias("s4"),
        F.sum(cp.cast("decimal(38,0)") * ad).alias("sxy"),
        F.sum(cp.cast("decimal(38,0)") * cp * ad).alias("sx2y"),
    )
    n = F.col("n")
    c11 = F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    c12 = F.col("s3").cast("double") - F.col("s1").cast("double") * F.col("s2").cast("double") / n
    c22 = F.col("s4").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n
    c1y = F.col("sxy").cast("double") - F.col("s1").cast("double") * F.col("sy") / n
    c2y = F.col("sx2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n
    cen = mo.select(
        n,
        c11.alias("c11"),
        c12.alias("c12"),
        c22.alias("c22"),
        c1y.alias("c1y"),
        c2y.alias("c2y"),
        (F.col("sy").cast("double") / n).alias("my"),
        (F.col("s1").cast("double") / n).alias("m1"),
        (F.col("s2").cast("double") / n).alias("m2"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    c = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    a = F.col("my") - b * F.col("m1") - c * F.col("m2")
    fit = cen.select(n, a.alias("a"), b.alias("b"), c.alias("c"))
    m = (
        -F.col("b") - F.sqrt(F.col("b") * F.col("b") - 4 * F.col("a") * F.col("c"))
    ) / (2 * F.col("c"))
    return fit.select(
        n.alias("n_days"),
        F.round(F.col("a"), 4).alias("coef_a"),
        F.round(F.col("b"), 6).alias("coef_b"),
        F.round(F.col("c"), 9).alias("coef_c"),
        F.round(m, 1).alias("market_size_m"),
        F.round(F.col("a") / m, 6).alias("innovation_p"),
        F.round(-F.col("c") * m, 6).alias("imitation_q"),
    )


@register(
    "ts_runs_test",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev) AS HUGEINT) AS s
        FROM daily
    ), sgn AS (
        SELECT day,
               CASE WHEN CAST(rev AS HUGEINT) * tot.n > tot.s
                    THEN 1 ELSE 0 END AS hi
        FROM daily, tot
        WHERE CAST(rev AS HUGEINT) * tot.n <> tot.s
    ), runs AS (
        SELECT hi, LAG(hi) OVER (ORDER BY day) AS ph FROM sgn
    ), agg AS (
        SELECT CAST(SUM(hi) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(hi) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN ph IS NOT NULL AND hi <> ph
                                 THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM runs
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 4) AS expected_runs,
           ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z_score
    FROM agg
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of daily revenue around
    its mean: code each day above/below the exact-cents mean (days
    exactly equal are dropped, the classical convention; the compare is
    rev·n vs Σrev in 128-bit integers — no division, no float), count
    sign runs R, and standardize against E[R] = 2n₁n₂/n + 1,
    Var = 2n₁n₂(2n₁n₂−n)/(n²(n−1)). Too FEW runs = trend/clustering,
    too MANY = oscillation — the nonparametric randomness gate the
    trend family (``ts_mom_growth``, ``ts_segmented_trend``) assumes.
    Distinct from ``agg_runs_test``, which counts runs of UP/DOWN
    MOVES (difference signs) with no null standardization — that one
    tests serial dependence of changes, this one tests level
    clustering about the mean with the exact z.

    Scale: one map-side-combined daily rollup from the fact table; the
    run-count lag and the sign pass run on the saturating calendar
    frame (date domain, ≤ |days| rows at any fact scale — measured in
    WINDOW_AUDIT.json)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("decimal(38,0)").alias("s"),
    )
    lhs = F.col("rev").cast("decimal(38,0)") * F.col("n")
    sgn = (
        daily.crossJoin(F.broadcast(tot))
        .filter(lhs != F.col("s"))
        .select(
            "day", F.when(lhs > F.col("s"), 1).otherwise(0).alias("hi")
        )
    )
    w_day = Window.orderBy("day")
    runs = sgn.select("hi", F.lag("hi").over(w_day).alias("ph"))
    agg = runs.agg(
        F.sum("hi").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("hi")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("ph").isNotNull() & (F.col("hi") != F.col("ph")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    nn = n1 + n2
    exp_r = 1.0 + 2.0 * n1 * n2 / nn
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (nn.cast("double") * nn * (nn - 1))
    )
    return agg.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        F.round(exp_r, 4).alias("expected_runs"),
        F.round((r - exp_r) / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "ts_bartels_rank",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1
    ), rnk AS (
        SELECT day,
               RANK() OVER (ORDER BY rev)
               + (COUNT(*) OVER (PARTITION BY rev) - 1) / 2.0 AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    ), d AS (
        SELECT r, LEAD(r) OVER (ORDER BY day) AS rn, n FROM rnk
    ), agg AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN rn IS NOT NULL
                    THEN CAST(2 * r - 2 * rn AS BIGINT)
                         * CAST(2 * r - 2 * rn AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS num4,
               CAST(SUM(CAST(2 * r - (n + 1) AS BIGINT)
                        * CAST(2 * r - (n + 1) AS BIGINT)) AS HUGEINT)
                   AS den4
        FROM d
    )
    SELECT n AS n_days,
           ROUND(CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE), 6)
               AS rvn_ratio,
           ROUND((CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) - 2.0)
                 / SQRT(4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)
                        / (5.0 * n * (n + 1) * (n - 1) * (n - 1))), 6)
               AS z_score
    FROM agg
    """,
)
def ts_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank version of the von Neumann ratio (Bartels '82) on
    daily revenue: RVN = Σ(R_t−R_{t+1})² / Σ(R_t−R̄)² over MIDRANKS in
    day order — the rank-robust randomness test that keeps power under
    heavy tails where ``ts_runs_test`` throws away magnitude and a raw
    von Neumann ratio chases outliers. E[RVN] = 2; z uses the exact
    null variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²). Midranks are exact
    half-integers, so BOTH quadratic forms fold as integers (2R is an
    integer: 2·rank + ties − 1) — num4/den4 are 4× the true sums and
    the ratio cancels the scale exactly.

    Scale: daily rollup ∝ facts with map-side combine; every window
    runs on the saturating calendar frame (WINDOW_AUDIT.json)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w_rank = Window.orderBy("rev")
    w_tie = Window.partitionBy("rev")
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rnk = daily.select(
        "day",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - 1) / F.lit(2.0)
        ).alias("r"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    d = rnk.select(
        "r", F.lead("r").over(Window.orderBy("day")).alias("rn"), "n"
    )
    two_d = (2 * F.col("r") - 2 * F.col("rn")).cast("long")
    two_c = (2 * F.col("r") - (F.col("n") + 1)).cast("long")
    agg = d.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.when(F.col("rn").isNotNull(), two_d * two_d).otherwise(
                F.lit(0)
            ).cast("decimal(38,0)")
        ).alias("num4"),
        F.sum((two_c * two_c).cast("decimal(38,0)")).alias("den4"),
    )
    n = F.col("n")
    rvn = F.col("num4").cast("double") / F.col("den4").cast("double")
    var = (
        4.0
        * (n - 2)
        * (5.0 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1) * (n - 1) * (n - 1))
    )
    return agg.select(
        n.alias("n_days"),
        F.round(rvn, 6).alias("rvn_ratio"),
        F.round((rvn - 2.0) / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "ts_spectral_coherence",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS x,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ), idx AS (
        SELECT x, y, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t
        FROM daily
    ), seg AS (
        SELECT s.k AS seg, i.t - s.k * 7 AS u, i.x, i.y
        FROM idx i
        JOIN (SELECT UNNEST(RANGE(0, 200)) AS k) s
          ON i.t >= s.k * 7 AND i.t < s.k * 7 + 14
    ), segmu AS (
        SELECT seg, AVG(x) AS mx, AVG(y) AS my
        FROM seg GROUP BY seg HAVING COUNT(*) = 14
    ), terms AS (
        SELECT per.p, s.seg,
               CAST(SUM(CAST(FLOOR((s.x - g.mx)
                   * COS(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS cx,
               CAST(SUM(CAST(FLOOR((s.x - g.mx)
                   * SIN(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS sx,
               CAST(SUM(CAST(FLOOR((s.y - g.my)
                   * COS(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS cy,
               CAST(SUM(CAST(FLOOR((s.y - g.my)
                   * SIN(2 * PI() * s.u / per.p) * 1e6) AS BIGINT))
                   AS BIGINT) AS sy
        FROM seg s JOIN segmu g ON g.seg = s.seg
        CROSS JOIN (SELECT UNNEST([7, 14]) AS p) per
        GROUP BY per.p, s.seg
    ), spec AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(CAST(FLOOR(((cx / 1e6) * (cx / 1e6)
                   + (sx / 1e6) * (sx / 1e6)) * 1e4) AS BIGINT))
                   AS HUGEINT) AS pxx,
               CAST(SUM(CAST(FLOOR(((cy / 1e6) * (cy / 1e6)
                   + (sy / 1e6) * (sy / 1e6)) * 1e4) AS BIGINT))
                   AS HUGEINT) AS pyy,
               CAST(SUM(CAST(FLOOR(((cx / 1e6) * (cy / 1e6)
                   + (sx / 1e6) * (sy / 1e6)) * 1e4) AS BIGINT))
                   AS HUGEINT) AS cre,
               CAST(SUM(CAST(FLOOR(((sx / 1e6) * (cy / 1e6)
                   - (cx / 1e6) * (sy / 1e6)) * 1e4) AS BIGINT))
                   AS HUGEINT) AS cim
        FROM terms GROUP BY p
    )
    SELECT p AS period_days, n_segments,
           ROUND((CAST(cre AS DOUBLE) / 1e4 * (CAST(cre AS DOUBLE) / 1e4)
                  + CAST(cim AS DOUBLE) / 1e4 * (CAST(cim AS DOUBLE) / 1e4))
                 / (CAST(pxx AS DOUBLE) / 1e4 * (CAST(pyy AS DOUBLE) / 1e4)),
                 6) AS coherence2,
           ROUND(ATAN2(CAST(cim AS DOUBLE) / 1e4,
                       CAST(cre AS DOUBLE) / 1e4), 6) AS phase_rad
    FROM spec ORDER BY period_days
    """,
)
def ts_spectral_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magnitude-squared coherence between the purchase and view daily
    series at the 7- and 14-day periods — the FREQUENCY-domain coupling
    measure: coherence² = |S̄_xy|²/(S̄_xx·S̄_yy) ∈ [0,1] says how much of
    the weekly purchase rhythm is linearly locked to the view rhythm,
    and the cross-spectrum phase says WHO LEADS (positive phase = views
    lead purchases at that cycle). Time-domain ``ts_cross_correlation``
    answers "at what lag"; coherence answers "at which cycle, how
    tightly" — and unlike a single periodogram ratio it is meaningful
    only because the spectra are WELCH-AVERAGED over the same 14-day
    half-overlapping segments as ``ts_welch_periodogram`` (unsmoothed
    coherence is identically 1). Per-segment projections quantize at
    1e-6, per-period spectral folds at 1e-4 — every cross-row sum is an
    integer fold.

    Scale: one daily rollup with map-side combine; segmentation and all
    spectral algebra run on the saturating calendar frame (≤ |days|·2
    rows through the segment fan-out at any fact scale)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_if(F.col("event_type") == "purchase")
        .cast("long")
        .alias("x"),
        F.count_if(F.col("event_type") == "view").cast("long").alias("y"),
    )
    idx = daily.select(
        "x",
        "y",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
    )
    ks = spark.range(0, 200).select(F.col("id").alias("k"))
    seg = idx.join(
        F.broadcast(ks),
        (F.col("t") >= F.col("k") * 7) & (F.col("t") < F.col("k") * 7 + 14),
    ).select(
        F.col("k").alias("seg"),
        (F.col("t") - F.col("k") * 7).alias("u"),
        "x",
        "y",
    )
    segmu = (
        seg.groupBy("seg")
        .agg(
            F.avg("x").alias("mx"),
            F.avg("y").alias("my"),
            F.count(F.lit(1)).alias("m"),
        )
        .filter(F.col("m") == 14)
        .drop("m")
    )
    ps = spark.range(1).select(
        F.explode(F.array(F.lit(7), F.lit(14))).alias("p")
    )
    base = seg.join(segmu, "seg").crossJoin(F.broadcast(ps))
    ang = 2 * F.lit(math.pi) * F.col("u") / F.col("p")
    qc = lambda c: F.sum(F.floor(c * 1e6).cast("long")).cast("long")  # noqa: E731
    terms = base.groupBy("p", "seg").agg(
        qc((F.col("x") - F.col("mx")) * F.cos(ang)).alias("cx"),
        qc((F.col("x") - F.col("mx")) * F.sin(ang)).alias("sx"),
        qc((F.col("y") - F.col("my")) * F.cos(ang)).alias("cy"),
        qc((F.col("y") - F.col("my")) * F.sin(ang)).alias("sy"),
    )
    d6 = lambda c: F.col(c) / 1e6  # noqa: E731
    q4 = lambda expr: F.sum(  # noqa: E731
        F.floor(expr * 1e4).cast("long").cast("decimal(38,0)")
    )
    spec = terms.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        q4(d6("cx") * d6("cx") + d6("sx") * d6("sx")).alias("pxx"),
        q4(d6("cy") * d6("cy") + d6("sy") * d6("sy")).alias("pyy"),
        q4(d6("cx") * d6("cy") + d6("sx") * d6("sy")).alias("cre"),
        q4(d6("sx") * d6("cy") - d6("cx") * d6("sy")).alias("cim"),
    )
    cre = F.col("cre").cast("double") / 1e4
    cim = F.col("cim").cast("double") / 1e4
    pxx = F.col("pxx").cast("double") / 1e4
    pyy = F.col("pyy").cast("double") / 1e4
    return spec.select(
        F.col("p").alias("period_days"),
        "n_segments",
        F.round((cre * cre + cim * cim) / (pxx * pyy), 6).alias(
            "coherence2"
        ),
        F.round(F.atan2(cim, cre), 6).alias("phase_rad"),
    ).orderBy("period_days")


@register(
    "ts_lomb_scargle",
    """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE date_part('day', o_orderdate) % 5 <> 0
        GROUP BY 1
    ), base AS (
        SELECT MIN(day) AS d0,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s1,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        FROM daily
    ), pts AS (
        SELECT CAST(DATE_DIFF('day', b.d0, d.day) AS BIGINT) AS t,
               CAST(d.cents AS DOUBLE) - CAST(b.s1 AS DOUBLE) / b.n AS y,
               b.n,
               (CAST(b.s2 AS DOUBLE)
                - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
               / (b.n - 1) AS var
        FROM daily d, base b
    ), tau AS (
        SELECT per.p,
               ATAN2(CAST(SUM(CAST(FLOOR(SIN(4 * PI() * t / per.p) * 1e9)
                                   AS BIGINT)) AS BIGINT) / 1e9,
                     CAST(SUM(CAST(FLOOR(COS(4 * PI() * t / per.p) * 1e9)
                                   AS BIGINT)) AS BIGINT) / 1e9)
                   * per.p / (4 * PI()) AS tau
        FROM pts CROSS JOIN (SELECT UNNEST([5, 7, 14, 30]) AS p) per
        GROUP BY per.p
    ), proj AS (
        SELECT u.p, MAX(n) AS n, MAX(var) AS var,
               CAST(SUM(CAST(FLOOR(y * COS(2 * PI() * (t - u.tau) / u.p)
                                   * 1e2) AS BIGINT)) AS BIGINT) AS ycq,
               CAST(SUM(CAST(FLOOR(COS(2 * PI() * (t - u.tau) / u.p)
                                   * COS(2 * PI() * (t - u.tau) / u.p)
                                   * 1e9) AS BIGINT)) AS BIGINT) AS ccq,
               CAST(SUM(CAST(FLOOR(y * SIN(2 * PI() * (t - u.tau) / u.p)
                                   * 1e2) AS BIGINT)) AS BIGINT) AS ysq,
               CAST(SUM(CAST(FLOOR(SIN(2 * PI() * (t - u.tau) / u.p)
                                   * SIN(2 * PI() * (t - u.tau) / u.p)
                                   * 1e9) AS BIGINT)) AS BIGINT) AS ssq
        FROM pts CROSS JOIN tau u
        GROUP BY u.p
    )
    SELECT p AS period_days, n AS n_days,
           ROUND(0.5 * (POW(ycq / 1e2, 2.0) / (ccq / 1e9)
                        + POW(ysq / 1e2, 2.0) / (ssq / 1e9)) / var, 4)
               AS ls_power
    FROM proj ORDER BY period_days
    """,
)
def ts_lomb_scargle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lomb–Scargle normalized periodogram of the daily revenue series at
    candidate periods 5/7/14/30 days — the periodogram that stays valid
    under UNEVEN sampling (here every 5th calendar day is deliberately
    dropped, the deterministic stand-in for the gaps every real event
    stream has; ``ts_periodogram``'s plain Fourier projection silently
    assumes an unbroken spine). Per frequency ω=2π/p, the phase offset τ
    solves tan(2ωτ) = Σsin2ωt/Σcos2ωt, making the cos/sin projections
    orthogonal; P(ω) = ½[(Σy'cosω(t−τ))²/Σcos² + (Σy'sinω(t−τ))²/Σsin²]
    normalized by the sample variance (so P ~ Exp(1) under white noise —
    P > ln n flags a real period). All trig projection terms are
    floor-quantized (1e-2 for value-scale, 1e-9 for unit-scale) and
    integer-summed, the same discipline as the even-grid periodogram;
    moments are exact 128-bit integers.

    Scale: one pruned daily rollup, a |days|×4 fan-out aggregated twice
    (tau pass, projection pass) with map-side combine; never touches the
    raw fact table after the rollup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.dayofmonth("o_orderdate") % 5 != 0
    )
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    base = daily.agg(
        F.min("day").alias("d0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "s2"
        ),
    )
    n = F.col("n")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    pts = daily.crossJoin(F.broadcast(base)).select(
        F.datediff("day", "d0").cast("long").alias("t"),
        (F.col("cents").cast("double") - s1d / n).alias("y"),
        n.alias("n"),
        ((s2d - s1d * s1d / n) / (n - 1)).alias("var"),
    )
    pers = spark.createDataFrame([(5,), (7,), (14,)] + [(30,)], "p: int")
    t, p = F.col("t"), F.col("p")
    tau = (
        pts.crossJoin(F.broadcast(pers))
        .groupBy("p")
        .agg(
            (
                F.atan2(
                    F.sum(
                        F.floor(F.sin(4 * math.pi * t / p) * 1e9).cast("long")
                    ).cast("long")
                    / 1e9,
                    F.sum(
                        F.floor(F.cos(4 * math.pi * t / p) * 1e9).cast("long")
                    ).cast("long")
                    / 1e9,
                )
                * p
                / (4 * math.pi)
            ).alias("tau")
        )
    )
    th = 2 * math.pi * (t - F.col("tau")) / p
    proj = (
        pts.crossJoin(F.broadcast(pers))
        .join(F.broadcast(tau), "p")
        .groupBy("p")
        .agg(
            F.max("n").alias("n"),
            F.max("var").alias("var"),
            F.sum(F.floor(F.col("y") * F.cos(th) * 1e2).cast("long"))
            .cast("long")
            .alias("ycq"),
            F.sum(F.floor(F.cos(th) * F.cos(th) * 1e9).cast("long"))
            .cast("long")
            .alias("ccq"),
            F.sum(F.floor(F.col("y") * F.sin(th) * 1e2).cast("long"))
            .cast("long")
            .alias("ysq"),
            F.sum(F.floor(F.sin(th) * F.sin(th) * 1e9).cast("long"))
            .cast("long")
            .alias("ssq"),
        )
    )
    power = (
        0.5
        * (
            F.pow(F.col("ycq") / 1e2, 2.0) / (F.col("ccq") / 1e9)
            + F.pow(F.col("ysq") / 1e2, 2.0) / (F.col("ssq") / 1e9)
        )
        / F.col("var")
    )
    return proj.select(
        F.col("p").alias("period_days"),
        F.col("n").alias("n_days"),
        F.round(power, 4).alias("ls_power"),
    ).orderBy("period_days")


_HW_ORACLE = """
    WITH RECURSIVE daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), xs AS (
        SELECT LIST(cents ORDER BY day) AS xa, CAST(COUNT(*) AS BIGINT) AS n
        FROM daily
    ), init AS (
        SELECT xa, n,
               CAST(FLOOR((xa[1]+xa[2]+xa[3]+xa[4]+xa[5]+xa[6]+xa[7]) / 7.0)
                    AS BIGINT) AS l0,
               CAST(FLOOR(((xa[8]+xa[9]+xa[10]+xa[11]+xa[12]+xa[13]+xa[14])
                           - (xa[1]+xa[2]+xa[3]+xa[4]+xa[5]+xa[6]+xa[7]))
                          / 49.0) AS BIGINT) AS b0
        FROM xs
    ), rec AS (
        SELECT CAST(7 AS BIGINT) AS i, l0 AS l, b0 AS b,
               list_transform(range(7), x -> xa[CAST(x AS INT) + 1] - l0)
                   AS s,
               xa, n
        FROM init
        UNION ALL
        SELECT i + 1,
               CAST(FLOOR((3*(xa[CAST(i AS INT) + 1]
                              - s[CAST((i % 7) AS INT) + 1])
                           + 7*(l + b)) / 10.0) AS BIGINT),
               CAST(FLOOR((1*(CAST(FLOOR((3*(xa[CAST(i AS INT) + 1]
                                  - s[CAST((i % 7) AS INT) + 1])
                                  + 7*(l + b)) / 10.0) AS BIGINT) - l)
                           + 19*b) / 20.0) AS BIGINT),
               list_concat(list_concat(
                   s[1:CAST((i % 7) AS INT)],
                   [CAST(FLOOR((2*(xa[CAST(i AS INT) + 1]
                        - CAST(FLOOR((3*(xa[CAST(i AS INT) + 1]
                               - s[CAST((i % 7) AS INT) + 1])
                               + 7*(l + b)) / 10.0) AS BIGINT))
                        + 8*s[CAST((i % 7) AS INT) + 1]) / 10.0)
                         AS BIGINT)]),
                   s[CAST((i % 7) AS INT) + 2:7]),
               xa, n
        FROM rec WHERE i < n
    ), fin AS (
        SELECT l, b, s, n FROM rec WHERE i = n
    )
    SELECT CAST(h.h AS BIGINT) AS horizon_days,
           ROUND((l + h.h * b + s[CAST(((n + h.h - 1) % 7) AS INT) + 1])
                 / 100.0, 2) AS forecast,
           ROUND(l / 100.0, 2) AS level,
           ROUND(b / 100.0, 4) AS trend
    FROM fin CROSS JOIN (SELECT UNNEST(range(1, 8)) AS h) h
    ORDER BY horizon_days
"""


@register("ts_holt_winters", _HW_ORACLE)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (triple exponential smoothing) on the daily
    revenue series — level + trend + weekly seasonality, the forecaster
    ``ts_double_smoothing`` (no seasonality) and ``ts_seasonality``
    (no trend carry) each cover half of. Fixed rational smoothing weights
    α=3/10, β=1/20, γ=2/10 make every update an INTEGER recurrence in
    cents: l←⌊(3(x−s)+7(l+b))/10⌋, b←⌊(l'−l+19b)/20⌋,
    s←⌊(2(x−l')+8s)/10⌋, initialized from the first two weeks. Both
    engines run the IDENTICAL quantized recursion — DuckDB as a
    recursive CTE carrying the 7-slot season list, Spark as an
    Arrow-batched ``applyInPandas`` over the (bounded) daily frame — so
    the 7-day-ahead forecast hash-matches exactly. Emits h=1..7
    forecasts plus the final level/trend state.

    Scale: the smoother is inherently sequential (each day's state feeds
    the next), so the recursion runs on the |days| spine — metadata-sized
    at any corpus scale (3.7k rows per decade); only the daily rollup
    touches the fact table, with map-side combine. The integer state
    stays < 2^53, so float-division floors are exact on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )

    def _hw(pdf):
        import pandas as pd

        from hive_processor_spark.functions.seqrec import hw_forecast

        x = [int(v) for v in pdf.sort_values("day")["cents"]]
        return pd.DataFrame(
            hw_forecast(x),
            columns=["horizon_days", "fc_cents", "l_cents", "b_cents"],
        )

    state = daily.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda pdf: _hw(pdf),
        "horizon_days long, fc_cents long, l_cents long, b_cents long",
    )
    return state.select(
        "horizon_days",
        F.round(F.col("fc_cents") / 100.0, 2).alias("forecast"),
        F.round(F.col("l_cents") / 100.0, 2).alias("level"),
        F.round(F.col("b_cents") / 100.0, 4).alias("trend"),
    ).orderBy("horizon_days")


_DTW_ORACLE = """
    WITH RECURSIVE wk AS (
        SELECT date_part('year', o_orderdate) AS y,
               LEAST(CAST(FLOOR((date_part('doy', o_orderdate) - 1) / 7.0)
                          AS INT), 51) AS w,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE date_part('year', o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2
    ), cost AS (
        SELECT a.w + 1 AS i, b.w + 1 AS j, ABS(a.cents - b.cents) AS c
        FROM (SELECT w, cents FROM wk WHERE y = 1996) a,
             (SELECT w, cents FROM wk WHERE y = 1997) b
    ), dp AS (
        SELECT 0 AS k, 0 AS j,
               list_concat([CAST(0 AS BIGINT)],
                           list_transform(range(52),
                                          x -> CAST(4e15 AS BIGINT))) AS prev,
               [CAST(4e15 AS BIGINT)] AS cur,
               (SELECT LIST(c ORDER BY i, j) FROM cost) AS ca
        UNION ALL
        SELECT k + 1,
               CASE WHEN j = 52 THEN 1 ELSE j + 1 END,
               CASE WHEN j = 52 THEN cur ELSE prev END,
               list_concat(
                   CASE WHEN j = 52 THEN [CAST(4e15 AS BIGINT)]
                        ELSE cur END,
                   [ca[k + 1] + LEAST(
                       (CASE WHEN j = 52 THEN cur ELSE prev END)
                           [(CASE WHEN j = 52 THEN 1 ELSE j + 1 END) + 1],
                       (CASE WHEN j = 52 THEN cur ELSE prev END)
                           [(CASE WHEN j = 52 THEN 1 ELSE j + 1 END)],
                       (CASE WHEN j = 52 THEN [CAST(4e15 AS BIGINT)]
                             ELSE cur END)
                           [(CASE WHEN j = 52 THEN 1 ELSE j + 1 END)])]),
               ca
        FROM dp WHERE k < 52 * 52
    ), lock AS (
        SELECT CAST(SUM(c) AS BIGINT) AS lcents FROM cost WHERE i = j
    ), chk AS (
        -- degenerate-input guard (round-9, ADVICE r8): the DP grid is
        -- hardwired to 52x52, so emit ONLY when both years carry all 52
        -- weekly buckets (sf0.001 has gaps; both engines go silent there)
        SELECT COUNT(DISTINCT CASE WHEN y = 1996 THEN w END) AS na,
               COUNT(DISTINCT CASE WHEN y = 1997 THEN w END) AS nb
        FROM wk
    )
    SELECT CAST(52 AS BIGINT) AS n_weeks,
           ROUND(cur[53] / 100.0, 2) AS dtw_distance,
           ROUND(lcents / 100.0, 2) AS lockstep_distance,
           ROUND(CAST(cur[53] AS DOUBLE) / lcents, 4) AS stretch_gain
    FROM dp, lock, chk WHERE k = 52 * 52 AND na = 52 AND nb = 52
"""


@register("ts_dtw", _DTW_ORACLE)
def ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the 1996 and 1997 weekly
    revenue profiles (52 buckets each, day-of-year//7 with week 52 folded
    into 51) — the elastic curve distance that aligns a demand peak
    landing a week later without the full penalty the lockstep L1 charges
    (also emitted; dtw ≤ lockstep always, and ``stretch_gain`` = dtw/
    lockstep says how much of the year-over-year difference is mere
    timing). Costs |aᵢ−bⱼ| are exact integer cents, so the O(n·m) DP is
    integer-exact; both engines run the identical recursion — DuckDB as
    a recursive CTE marching the DP frontier cell-by-cell with the cost
    grid carried as a flat list in the recursion state (a per-step JOIN
    re-scan is ~10× slower — measured), Spark as ``applyInPandas`` over
    the 104-row weekly frame.

    Scale: the quadratic DP runs on the WEEKLY profile (52×52 = 2.7k
    cells regardless of corpus size); only the weekly rollup touches the
    fact table. For long-series DTW at scale the standard move is a
    Sakoe–Chiba band, which this cell-marching shape supports by
    skipping out-of-band cells."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    wk = orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.least(
            F.floor((F.dayofyear("o_orderdate") - 1) / 7.0), F.lit(51.0)
        )
        .cast("int")
        .alias("w"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )

    def _dtw(pdf):
        import pandas as pd

        from hive_processor_spark.functions.seqrec import dtw_cost

        a = [
            int(v)
            for v in pdf[pdf.y == 1996].sort_values("w")["cents"]
        ]
        b = [
            int(v)
            for v in pdf[pdf.y == 1997].sort_values("w")["cents"]
        ]
        cols = ["n_weeks", "dtw_cents", "lock_cents"]
        if len(a) != 52 or len(b) != 52:
            # degenerate-input guard (round-9, ADVICE r8): mirror the
            # oracle — no row unless both years cover all 52 weeks
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        lock = sum(abs(x - y) for x, y in zip(a, b))
        return pd.DataFrame(
            [(len(a), dtw_cost(a, b), lock)],
            columns=cols,
        )

    res = wk.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda pdf: _dtw(pdf),
        "n_weeks long, dtw_cents long, lock_cents long",
    )
    return res.select(
        "n_weeks",
        F.round(F.col("dtw_cents") / 100.0, 2).alias("dtw_distance"),
        F.round(F.col("lock_cents") / 100.0, 2).alias("lockstep_distance"),
        F.round(
            F.col("dtw_cents").cast("double") / F.col("lock_cents"), 4
        ).alias("stretch_gain"),
    )


def _dm_sql() -> str:
    from hive_processor_spark.functions.normdist import sql_norm_cdf

    phi = sql_norm_cdf("ABS(dm_h)")
    gsum = " + ".join(
        f"2.0 * g{k}" for k in range(1, 7)
    )
    glist = ",\n               ".join(
        f"""CAST(SUM(CAST(FLOOR((a.dv - s.dbar) * (b.dv - s.dbar) * 1e2)
                   AS HUGEINT)) FILTER (WHERE b.t - a.t = {k})
                   AS DOUBLE) / 1e2 / s.n AS g{k}"""
        for k in range(0, 7)
    )
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), e AS (
        SELECT day, cents,
               LAG(cents, 1) OVER (ORDER BY day) AS f1,
               LAG(cents, 7) OVER (ORDER BY day) AS f7
        FROM daily
    ), d AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
               (ABS(cents - f1) - ABS(cents - f7)) / 100.0 AS dv
        FROM e WHERE f7 IS NOT NULL
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(dv * 1e2) AS HUGEINT)) AS DOUBLE)
                   / 1e2 / COUNT(*) AS dbar
        FROM d
    ), gam AS (
        SELECT MAX(s.n) AS n, MAX(s.dbar) AS dbar,
               {glist}
        FROM d a JOIN d b ON b.t >= a.t AND b.t <= a.t + 6, s
        GROUP BY s.n, s.dbar
    ), stat AS (
        SELECT n, dbar,
               dbar / SQRT((g0 + {gsum}) / n) AS dm,
               dbar / SQRT((g0 + {gsum}) / n)
                   * SQRT((n + 1.0 - 2.0 * 7 + 7.0 * 6 / n) / n) AS dm_h
        FROM gam
    )
    SELECT n AS n_days,
           ROUND(dbar, 4) AS mean_loss_diff,
           ROUND(dm, 4) AS dm_stat,
           ROUND(dm_h, 4) AS dm_harvey,
           ROUND(2.0 * (1.0 - {phi}), 6) AS p_two_sided
    FROM stat
    """


@register("ts_diebold_mariano", _dm_sql())
def ts_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold–Mariano test (DM '95, Harvey-corrected) comparing two
    forecasters of daily revenue on absolute-error loss: naive lag-1 vs
    seasonal-naive lag-7 — is the accuracy difference REAL or within
    noise? The loss differential d_t = |e₁|−|e₂| is an exact integer in
    cents; DM = d̄/√(HAC var) with the h=7 truncated-kernel long-run
    variance (γ₀ + 2Σγ₁..₆, the standard h−1 lags for 7-step-comparable
    forecasts), and Harvey's small-sample factor
    √((n+1−2h+h(h−1)/n)/n). The test ``ts_forecast_mase`` motivates but
    cannot answer (MASE ranks; DM says whether the gap is significant).
    Autocovariances are POSITIONAL over the loss series (the spine has
    missing calendar days, so a calendar-day band would misassign lags
    — caught by the reference test), via a bounded ±6-position band
    self-join; every cross-day fold is floor-quantized at 1e-2 dollars
    into a 128-bit accumulator (an int64 fold overflows at the 10x
    clone probe — caught there).

    Scale: one daily rollup touches the fact table; the band join and
    folds run on the |days| spine — metadata-sized at any corpus."""
    from hive_processor_spark.functions.normdist import norm_cdf

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    e = daily.select(
        "day",
        "cents",
        F.lag("cents", 1).over(w).alias("f1"),
        F.lag("cents", 7).over(w).alias("f7"),
    )
    d = e.filter(F.col("f7").isNotNull()).select(
        F.row_number().over(w).alias("t"),
        (
            (
                F.abs(F.col("cents") - F.col("f1"))
                - F.abs(F.col("cents") - F.col("f7"))
            )
            / 100.0
        ).alias("dv"),
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.floor(F.col("dv") * 1e2).cast("decimal(38,0)"))
            .cast("double")
            / 1e2
            / F.count(F.lit(1))
        ).alias("dbar"),
    )
    a = d.alias("a")
    b = d.alias("b")
    band = a.join(
        F.broadcast(b),
        (F.col("b.t") >= F.col("a.t"))
        & (F.col("b.t") <= F.col("a.t") + 6),
    ).crossJoin(F.broadcast(s))
    dev_prod = (F.col("a.dv") - F.col("dbar")) * (
        F.col("b.dv") - F.col("dbar")
    )
    lagk = F.col("b.t") - F.col("a.t")
    gam = band.groupBy("n", "dbar").agg(
        *[
            (
                F.sum(
                    F.when(
                        lagk == k,
                        F.floor(dev_prod * 1e2).cast("decimal(38,0)"),
                    )
                ).cast("double")
                / 1e2
                / F.col("n")
            ).alias(f"g{k}")
            for k in range(0, 7)
        ]
    )
    lrv = F.col("g0") + sum(
        [2.0 * F.col(f"g{k}") for k in range(1, 7)], F.lit(0.0)
    )
    dm = F.col("dbar") / F.sqrt(lrv / F.col("n"))
    n = F.col("n").cast("double")
    dm_h = dm * F.sqrt((n + 1.0 - 2.0 * 7 + 7.0 * 6 / n) / n)
    return gam.select(
        F.col("n").alias("n_days"),
        F.round("dbar", 4).alias("mean_loss_diff"),
        F.round(dm, 4).alias("dm_stat"),
        F.round(dm_h, 4).alias("dm_harvey"),
        F.round(2.0 * (1.0 - norm_cdf(F.abs(dm_h))), 6).alias(
            "p_two_sided"
        ),
    )


_THETA_ORACLE = """
    WITH RECURSIVE daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, y
        FROM daily
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS HUGEINT) AS st,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty,
               CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt
        FROM idx
    ), fit AS (
        SELECT n,
               CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b
        FROM mom
    ), fit2 AS (
        SELECT f.n, f.b,
               (CAST(m.sy AS DOUBLE) - f.b * CAST(m.st AS DOUBLE)) / f.n
                   AS a
        FROM fit f, mom m
    ), th AS (
        SELECT LIST(CAST(FLOOR(2.0 * i.y - (f.a + f.b * i.t)) AS BIGINT)
                    ORDER BY i.t) AS xa,
               MAX(f.n) AS n, MAX(f.a) AS a, MAX(f.b) AS b
        FROM idx i, fit2 f
    ), rec AS (
        SELECT CAST(1 AS BIGINT) AS i, xa[1] AS l, xa, n, a, b FROM th
        UNION ALL
        SELECT i + 1,
               CAST(FLOOR((3.0 * xa[CAST(i AS INT) + 1] + 7.0 * l) / 10.0)
                    AS BIGINT),
               xa, n, a, b
        FROM rec WHERE i < n
    ), fin AS (
        SELECT l, n, a, b FROM rec WHERE i = n
    )
    SELECT CAST(h.h AS BIGINT) AS horizon_days,
           ROUND((0.5 * (a + b * (n + h.h)) + 0.5 * l) / 100.0, 2)
               AS forecast,
           ROUND(l / 100.0, 2) AS ses_level,
           ROUND(b / 100.0, 6) AS trend_slope
    FROM fin CROSS JOIN (SELECT UNNEST(range(1, 8)) AS h) h
    ORDER BY horizon_days
"""


@register("ts_theta_method", _THETA_ORACLE)
def ts_theta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos '00 — the
    M3-competition winner) of daily revenue: average of the θ=0 line
    (OLS linear trend, carrying long-run drift) and an SES fit of the
    θ=2 line 2y − trend (carrying short-run level), h=1..7 ahead. The
    OLS moments are exact 128-bit integers (time index × cents); the
    θ=2 series is floor-snapped to integer cents so the SES recursion
    l ← ⌊(3x + 7l)/10⌋ (α=3/10) is the same pure-integer recurrence as
    ``ts_holt_winters`` — DuckDB runs it as a recursive CTE carrying the
    snapped series, Spark as ``applyInPandas`` over the bounded daily
    spine, and the forecasts hash-match exactly.

    Scale: one daily rollup touches the fact table; the recursion runs
    on the |days| spine (inherently sequential, metadata-sized)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("y")
    )

    def _theta(pdf):
        import math as m

        import pandas as pd

        from hive_processor_spark.functions.seqrec import ses_int, theta_ols

        y = [int(v) for v in pdf.sort_values("day")["y"]]
        n = len(y)
        a, b = theta_ols(y)
        xa = [m.floor(2.0 * v - (a + b * (i + 1))) for i, v in enumerate(y)]
        l = ses_int(xa)
        rows = []
        for h in range(1, 8):
            fc = 0.5 * (a + b * (n + h)) + 0.5 * l
            rows.append((h, fc, float(l), b))
        return pd.DataFrame(
            rows, columns=["horizon_days", "fc", "l", "b"]
        )

    state = daily.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda pdf: _theta(pdf),
        "horizon_days long, fc double, l double, b double",
    )
    return state.select(
        "horizon_days",
        F.round(F.col("fc") / 100.0, 2).alias("forecast"),
        F.round(F.col("l") / 100.0, 2).alias("ses_level"),
        F.round(F.col("b") / 100.0, 6).alias("trend_slope"),
    ).orderBy("horizon_days")


@register(
    "ts_forecast_reconcile",
    """
    WITH nat AS (
        SELECT n.n_name AS nation, date_part('year', o.o_orderdate) AS yr,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE date_part('year', o.o_orderdate) IN (1995, 1996, 1997)
        GROUP BY 1, 2
    ), w AS (
        SELECT nation,
               CAST(SUM(CASE WHEN yr = 1995 THEN cents ELSE 0 END)
                    AS BIGINT) AS y95,
               CAST(SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END)
                    AS BIGINT) AS y96,
               CAST(SUM(CASE WHEN yr = 1997 THEN cents ELSE 0 END)
                    AS BIGINT) AS y97
        FROM nat GROUP BY nation
    ), tot AS (
        SELECT CAST(SUM(y95) AS BIGINT) AS t95,
               CAST(SUM(y96) AS BIGINT) AS t96
        FROM w
    )
    SELECT w.nation,
           ROUND(w.y97 / 100.0, 2) AS actual_1997,
           ROUND(w.y96 / 100.0, 2) AS fc_bottom_up,
           ROUND(CAST(t.t96 AS DOUBLE)
                 * (0.5 * (CAST(w.y95 AS DOUBLE) / t.t95
                           + CAST(w.y96 AS DOUBLE) / t.t96)) / 100.0, 2)
               AS fc_top_down,
           ROUND(ABS(w.y96 - w.y97) / CAST(w.y97 AS DOUBLE), 4)
               AS ape_bottom_up,
           ROUND(ABS(CAST(t.t96 AS DOUBLE)
                     * (0.5 * (CAST(w.y95 AS DOUBLE) / t.t95
                               + CAST(w.y96 AS DOUBLE) / t.t96))
                     - w.y97) / CAST(w.y97 AS DOUBLE), 4) AS ape_top_down
    FROM w, tot t ORDER BY w.nation
    """,
)
def ts_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation on the nation→total revenue
    hierarchy, 1997 forecast from 1995–96 history: BOTTOM-UP takes each
    nation's own last-year level (coherent by construction, noisy at the
    leaves); TOP-DOWN forecasts the total and splits it by long-run
    shares (½·(share₉₅+share₉₆) — stable leaves, but leaf-level signal
    is discarded). Emits both forecasts beside the 1997 actual with
    per-nation absolute percentage errors — the diagnostic table that
    decides the reconciliation strategy (MinT-style trace minimization
    is the weighted generalization; these two are its endpoints). All
    yearly masses are exact integer cents; shares and APEs are
    fixed-form per-row doubles.

    Scale: one grouped aggregate under broadcast dimension joins, a
    1-row total broadcast, 25-row algebra."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996, 1997)
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            *[
                F.sum(
                    F.when(
                        F.year("o_orderdate") == y,
                        F.floor(F.col("o_totalprice") * 100.0).cast("long"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"y{str(y)[2:]}")
                for y in (1995, 1996, 1997)
            ]
        )
    )
    tot = nat.agg(
        F.sum("y95").cast("long").alias("t95"),
        F.sum("y96").cast("long").alias("t96"),
    )
    j = nat.crossJoin(F.broadcast(tot))
    share = 0.5 * (
        F.col("y95").cast("double") / F.col("t95")
        + F.col("y96").cast("double") / F.col("t96")
    )
    fc_td = F.col("t96").cast("double") * share
    return j.select(
        "nation",
        F.round(F.col("y97") / 100.0, 2).alias("actual_1997"),
        F.round(F.col("y96") / 100.0, 2).alias("fc_bottom_up"),
        F.round(fc_td / 100.0, 2).alias("fc_top_down"),
        F.round(
            F.abs(F.col("y96") - F.col("y97"))
            / F.col("y97").cast("double"),
            4,
        ).alias("ape_bottom_up"),
        F.round(
            F.abs(fc_td - F.col("y97")) / F.col("y97").cast("double"), 4
        ).alias("ape_top_down"),
    ).orderBy("nation")


@register(
    "ts_cv_backtest",
    """
    WITH mon AS (
        SELECT date_part('year', o_orderdate) * 12
               + date_part('month', o_orderdate) AS m,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT CAST(t.m - 1997 * 12 AS BIGINT) AS cutoff_month_1997,
           ROUND(t.cents / 100.0, 2) AS actual,
           ROUND(lm.cents / 100.0, 2) AS fc_last_month,
           ROUND(sn.cents / 100.0, 2) AS fc_seasonal_naive,
           ROUND(ABS(lm.cents - t.cents) / CAST(t.cents AS DOUBLE), 4)
               AS ape_last_month,
           ROUND(ABS(sn.cents - t.cents) / CAST(t.cents AS DOUBLE), 4)
               AS ape_seasonal_naive
    FROM mon t
    JOIN mon lm ON lm.m = t.m - 1
    JOIN mon sn ON sn.m = t.m - 12
    WHERE t.m BETWEEN 1997 * 12 + 1 AND 1997 * 12 + 12
    ORDER BY cutoff_month_1997
    """,
)
def ts_cv_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) backtest over the twelve 1997
    monthly cutoffs: at each origin, forecast the month with the two
    standard baselines — last-month naive and same-month-last-year
    seasonal naive — and score the absolute percentage error against
    the realized revenue. This is the EVALUATION PROTOCOL for time
    series (a single train/test split leaks the regime it happened to
    land on; K-fold shuffles time away — rolling origin is the only
    valid CV), the per-cutoff table that ``ts_forecast_mase`` summarizes
    and ``ts_diebold_mariano`` tests. Month keys are exact integer
    year·12+month, masses exact cents; the lag joins are equi-joins on
    the monthly spine.

    Scale: one monthly rollup touches the fact table (map-side
    combined); the backtest joins run on the |months| spine."""
    orders = load_table(spark, sf_dir, "orders")
    mon = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    t = mon.alias("t")
    lm = mon.alias("lm")
    sn = mon.alias("sn")
    j = (
        t.filter(
            (F.col("t.m") >= 1997 * 12 + 1) & (F.col("t.m") <= 1997 * 12 + 12)
        )
        .join(F.broadcast(lm), F.col("lm.m") == F.col("t.m") - 1)
        .join(F.broadcast(sn), F.col("sn.m") == F.col("t.m") - 12)
    )
    act = F.col("t.cents")
    return j.select(
        (F.col("t.m") - 1997 * 12).cast("long").alias("cutoff_month_1997"),
        F.round(act / 100.0, 2).alias("actual"),
        F.round(F.col("lm.cents") / 100.0, 2).alias("fc_last_month"),
        F.round(F.col("sn.cents") / 100.0, 2).alias("fc_seasonal_naive"),
        F.round(
            F.abs(F.col("lm.cents") - act) / act.cast("double"), 4
        ).alias("ape_last_month"),
        F.round(
            F.abs(F.col("sn.cents") - act) / act.cast("double"), 4
        ).alias("ape_seasonal_naive"),
    ).orderBy("cutoff_month_1997")
