"""Window functions (SURVEY.md §2.2-E).

Every window orders by a key chain that is unique within its partition
(events.ts is ns-unique per user; elsewhere a pk tiebreaker is appended), so
results are deterministic. Where ties are the *point* (rank vs dense_rank,
percent_rank), the order key is deliberately coarsened (floor of acctbal) so
peers exist — peer rows share the rank value, keeping output deterministic.

Windowed sums use the floor-quantized exact accumulator from
functions/exact.py: frame aggregation order is engine-internal (sliding
accumulate vs segment trees), so double sums would drift.

Scale posture: a window = one shuffle on partitionBy keys + an in-partition
sort; the partition key must be high-cardinality relative to executor count
(user_id, nationkey). No driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table

_Q = 10000.0  # value quantization factor for exact windowed sums


def _qsum(col: str, w) -> F.Column:
    return F.sum(F.floor(F.col(col) * F.lit(_Q)).cast("decimal(28,0)")).over(w).cast(
        "double"
    ) / F.lit(_Q)


def _sql_qsum(expr: str, over: str) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 10000.0) AS DECIMAL(28,0))) OVER {over}"
        f" AS DOUBLE) / 10000.0)"
    )


@register(
    "win_row_number",
    """
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select("o_orderkey", F.row_number().over(w).alias("rn"))


@register(
    "win_rank_dense",
    """
    SELECT c_custkey,
           CAST(RANK() OVER w AS INT) AS rk,
           CAST(DENSE_RANK() OVER w AS INT) AS drk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY FLOOR(c_acctbal / 100.0) DESC)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order key coarsened to create ties — peers share rank values, so the
    rank/dense_rank gap is actually exercised."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc(F.floor(F.col("c_acctbal") / 100.0))
    )
    return cust.select(
        "c_custkey",
        F.rank().over(w).cast("int").alias("rk"),
        F.dense_rank().over(w).cast("int").alias("drk"),
    )


@register(
    "win_ntile",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select("o_orderkey", F.ntile(4).over(w).alias("quartile"))


@register(
    "win_percent",
    """
    -- FLOOR-quantize: pr/cd are exact rationals (k/n) that can land on
    -- round-half ties (hit at sf0.1: 333/640), where Spark rounds half-up
    -- and DuckDB half-even
    SELECT c_custkey,
           FLOOR(PERCENT_RANK() OVER w * 1e6) / 1e6 AS pr,
           FLOOR(CUME_DIST() OVER w * 1e6) / 1e6 AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY FLOOR(c_acctbal / 100.0))
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.floor(F.col("c_acctbal") / 100.0))
    return cust.select(
        "c_custkey",
        (F.floor(F.percent_rank().over(w) * 1e6) / 1e6).alias("pr"),
        (F.floor(F.cume_dist().over(w) * 1e6) / 1e6).alias("cd"),
    )


@register(
    "win_lead_lag",
    """
    SELECT event_id,
           LAG(value, 1, -1.0) OVER w AS prev_v,
           LEAD(value, 1, -1.0) OVER w AS next_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id",
        F.lag("value", 1, -1.0).over(w).alias("prev_v"),
        F.lead("value", 1, -1.0).over(w).alias("next_v"),
    )


@register(
    "win_running",
    f"""
    SELECT event_id,
           {_sql_qsum('value', '(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_v
    FROM events
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select("event_id", _qsum("value", w).alias("running_v"))


@register(
    "win_sliding_rows",
    f"""
    SELECT event_id,
           {_sql_qsum('value', '(PARTITION BY user_id ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)')} AS sum3_v,
           (FLOOR({_sql_qsum('value', '(PARTITION BY user_id ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)')}
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000.0) / 10000.0) AS avg3_v
    FROM events
    """,
)
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-2, 0)
    s = _qsum("value", w)
    avg = F.floor(s / F.count(F.lit(1)).over(w) * F.lit(_Q)) / F.lit(_Q)
    return ev.select("event_id", s.alias("sum3_v"), avg.alias("avg3_v"))


@register(
    "win_range_frame",
    f"""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_range,
           {_sql_qsum('o_totalprice', 'w')} AS sum_in_range
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)
                 RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key (price in integer cents; a
    $1000.00 trailing band). The frame is defined by value distance, so peer
    rows get identical aggregates — deterministic even where prices tie.
    Integer cents because both engines define integral RANGE offsets
    identically (and PySpark's rangeBetween only accepts them)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("long")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(cents)
        .rangeBetween(-100000, 0)
    )
    return orders.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
        _qsum("o_totalprice", w).alias("sum_in_range"),
    )


@register(
    "win_first_last",
    """
    SELECT event_id,
           FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_v
    FROM events
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_first = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        F.first("value").over(w_first).alias("first_v"),
        F.last("value").over(w_last).alias("last_v"),
    )


@register(
    "win_topk_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        FROM customer
    ) t
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation (QUALIFY shape): window rank + filter —
    the distributed form of per-group top-k (no per-group collect)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_nth_value",
    """
    SELECT event_id,
           NTH_VALUE(event_id, 3) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_event
    FROM events
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with an explicit cumulative frame (the default frame stops
    at CURRENT ROW in both engines, but pinning it removes the ambiguity)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", F.nth_value("event_id", 3).over(w).alias("third_event")
    )


@register(
    "win_time_range",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
               AS qsum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, count and (quantized) sum of
    events in the trailing hour of each event — the rolling-window feature
    every behavioral pipeline computes. The frame bound is integer epoch-µs
    on both engines (an hour minus 1 µs, closed on both ends — identical to
    ``RANGE INTERVAL 1 HOUR PRECEDING`` at µs resolution), and the summed
    value is floor-quantized so the windowed sum is an exact integer — the
    hash gate holds at any parallelism. One shuffle on user_id; the sort is
    per-partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3599999999, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.floor(F.col("value") * 100.0).cast("long"))
        .over(w)
        .cast("long")
        .alias("qsum_last_hour"),
    )


@register(
    "win_ratio_to_report",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROUND(CAST(CAST(FLOOR(c_acctbal * 10000.0) AS DECIMAL(28,0)) AS DOUBLE)
                 / CAST(SUM(CAST(FLOOR(c_acctbal * 10000.0) AS DECIMAL(28,0)))
                        OVER (PARTITION BY c_nationkey) AS DOUBLE), 6)
               AS acct_share
    FROM customer
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of its nation's total account
    balance — the percent-of-total window every BI layer ships. One shuffle
    on the partition key; the denominator is a windowed sum of
    floor-quantized decimals, so numerator and denominator are both exact
    and the share is bit-stable at any parallelism (negative balances
    included — floor quantization is direction-consistent on both engines).
    """
    cust = load_table(spark, sf_dir, "customer")
    q = F.floor(F.col("c_acctbal") * 10000.0).cast("decimal(28,0)")
    w = Window.partitionBy("c_nationkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.round(q.cast("double") / F.sum(q).over(w).cast("double"), 6).alias(
            "acct_share"
        ),
    )


@register(
    "win_loo_target_encode",
    """
    WITH q AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT) AS xq,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT))
                   OVER (PARTITION BY o_orderpriority) AS sq,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(CAST(sq - xq AS DOUBLE) / 10000.0 / CAST(n - 1 AS DOUBLE), 6)
               AS loo_mean_price
    FROM q
    ORDER BY o_orderkey
    """,
)
def win_loo_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each order's category (priority)
    encoded as the mean total price of the OTHER orders in that category —
    the leakage-safe categorical encoding trick, spelled as windowed
    (sum − self)/(n − 1). Both the group sum and the subtracted self are
    exact quantized integers, so the encoding is bit-stable; the EXCLUDE
    CURRENT ROW frame Spark lacks is emulated exactly. One shuffle on the
    category; per-row work is scalar."""
    orders = load_table(spark, sf_dir, "orders")
    xq = F.floor(F.col("o_totalprice") * 10000.0).cast("long")
    w = Window.partitionBy("o_orderpriority")
    q = orders.select(
        "o_orderkey",
        "o_orderpriority",
        xq.alias("xq"),
        F.sum(xq).over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return q.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            (F.col("sq") - F.col("xq")).cast("double")
            / 10000.0
            / (F.col("n") - 1).cast("double"),
            6,
        ).alias("loo_mean_price"),
    ).orderBy("o_orderkey")


@register(
    "win_forward_fill",
    """
    WITH s AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE CAST(FLOOR(value * 100.0) AS BIGINT) END AS v
        FROM events
    )
    SELECT event_id, user_id,
           CAST(LAST_VALUE(v IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS filled_value
    FROM s
    ORDER BY user_id, ts, event_id
    """,
)
def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (LOCF): error rows lose their reading and
    inherit the user's most recent valid value — the gap-filling pass
    every sensor/metrics series needs before feature building. LAST_VALUE
    IGNORE NULLS over a totally-ordered running frame; heads of series
    stay NULL identically on both engines. One user-keyed shuffle;
    cent-quantized values keep the fill exact."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(
        F.col("event_type") != "error",
        F.floor(F.col("value") * 100.0).cast("long"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.last("v", ignorenulls=True).over(w).cast("double") / 100.0).alias(
                "filled_value"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@register(
    "win_rank_movers",
    """
    WITH rev AS (
        SELECT p_brand,
               YEAR(o_orderdate) AS yr,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0)
                        AS DECIMAL(28,0))) AS revq
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE YEAR(o_orderdate) IN (1997, 1998)
        GROUP BY p_brand, yr
    ), ranked AS (
        SELECT p_brand, yr,
               CAST(ROW_NUMBER() OVER (PARTITION BY yr
                                       ORDER BY revq DESC, p_brand) AS INTEGER)
                   AS rk
        FROM rev
    )
    SELECT a.p_brand,
           a.rk AS rank_1997,
           b.rk AS rank_1998,
           CAST(a.rk - b.rk AS INTEGER) AS places_moved
    FROM ranked a JOIN ranked b
      ON a.p_brand = b.p_brand AND a.yr = 1997 AND b.yr = 1998
    ORDER BY ABS(a.rk - b.rk) DESC, a.p_brand
    LIMIT 10
    """,
)
def win_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movers-and-shakers: brand revenue rank in 1997 vs 1998 and places
    moved, biggest movers first — the period-over-period ranking report.
    Two per-year ranks from one aggregated frame (windows over 25 rows per
    year), self-joined on brand; rank keys are exact quantized decimals so
    rank flips cannot come from float noise."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(F.year("o_orderdate").isin(1997, 1998))
        .groupBy("p_brand", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 10000.0
                ).cast("decimal(28,0)")
            ).alias("revq")
        )
    )
    w = Window.partitionBy("yr").orderBy(F.desc("revq"), F.asc("p_brand"))
    ranked = rev.select("p_brand", "yr", F.row_number().over(w).alias("rk"))
    a = ranked.filter(F.col("yr") == 1997).select(
        "p_brand", F.col("rk").alias("rank_1997")
    )
    b = ranked.filter(F.col("yr") == 1998).select(
        F.col("p_brand").alias("pb2"), F.col("rk").alias("rank_1998")
    )
    return (
        a.join(b, a.p_brand == b.pb2)
        .select(
            "p_brand",
            "rank_1997",
            "rank_1998",
            (F.col("rank_1997") - F.col("rank_1998")).alias("places_moved"),
        )
        .orderBy(F.abs(F.col("places_moved")).desc(), "p_brand")
        .limit(10)
    )


@register(
    "win_decile_migration",
    """
    WITH rev AS (
        SELECT o_custkey, YEAR(o_orderdate) AS yr,
               SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS revq
        FROM orders
        WHERE YEAR(o_orderdate) IN (1997, 1998)
        GROUP BY o_custkey, yr
    ), dec AS (
        SELECT o_custkey, yr,
               CAST(NTILE(5) OVER (PARTITION BY yr ORDER BY revq, o_custkey)
                    AS INTEGER) AS band
        FROM rev
    )
    SELECT a.band AS band_1997, b.band AS band_1998,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM dec a JOIN dec b
      ON a.o_custkey = b.o_custkey AND a.yr = 1997 AND b.yr = 1998
    GROUP BY band_1997, band_1998
    ORDER BY band_1997, band_1998
    """,
)
def win_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quintile migration matrix: customers banded by revenue within 1997
    and within 1998, cross-tabulated — the mobility analysis behind
    "are low-value customers moving up?". NTILE over a provably-unique
    order per year; the matrix is an exact count crosstab. Two windows
    over per-(year, customer) rollups, one self-join on the customer."""
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.filter(F.year("o_orderdate").isin(1997, 1998))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).alias(
                "revq"
            )
        )
    )
    w = Window.partitionBy("yr").orderBy("revq", "o_custkey")
    dec = rev.select("o_custkey", "yr", F.ntile(5).over(w).alias("band"))
    a = dec.filter(F.col("yr") == 1997).select(
        "o_custkey", F.col("band").alias("band_1997")
    )
    b = dec.filter(F.col("yr") == 1998).select(
        F.col("o_custkey").alias("ck2"), F.col("band").alias("band_1998")
    )
    return (
        a.join(b, a.o_custkey == b.ck2)
        .groupBy("band_1997", "band_1998")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("band_1997", "band_1998")
    )


@register(
    "win_rolling_slope",
    """
    WITH daily AS (
        SELECT CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    AS BIGINT) AS yc
        FROM orders GROUP BY 1
    ), w AS (
        SELECT d, yc,
               COUNT(*) OVER fr AS n,
               SUM(d) OVER fr AS sx,
               SUM(yc) OVER fr AS sy,
               SUM(d * yc) OVER fr AS sxy,
               SUM(d * d) OVER fr AS sxx
        FROM daily
        WINDOW fr AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d AS epoch_day,
           ROUND(CAST(yc AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / 100.0, 6) AS slope_per_day
    FROM w WHERE n = 7 ORDER BY epoch_day LIMIT 50
    """,
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS trend slope of daily revenue — regression-as-a-
    window: the frame keeps the five sufficient sums (n, Σx, Σy, Σxy,
    Σx²) and the slope is post-frame scalar algebra, so a full rolling
    regression costs exactly one window pass instead of per-day refits.
    Every frame sum is *integer* (epoch-day × revenue-cents as bigint) —
    order- and slide-optimization-independent in both engines, no
    floating accumulation inside the frame. At 100 TB the daily rollup is
    the only data-sized stage; the window runs over ~2400 aggregated
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("decimal(28,0)"))
        .cast("bigint")
        .alias("yc")
    )
    fr = Window.orderBy("d").rowsBetween(-6, 0)
    w = daily.select(
        "d",
        "yc",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("d").over(fr).alias("sx"),
        F.sum("yc").over(fr).alias("sy"),
        F.sum(F.col("d") * F.col("yc")).over(fr).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).over(fr).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    dd = lambda c: c.cast("double")  # noqa: E731
    return (
        w.filter(n == 7)
        .select(
            F.col("d").alias("epoch_day"),
            F.round(dd(F.col("yc")) / 100.0, 2).alias("revenue"),
            F.round(
                (dd(n) * sxy - dd(sx) * sy) / (dd(n) * sxx - dd(sx) * sx) / 100.0,
                6,
            ).alias("slope_per_day"),
        )
        .orderBy("epoch_day")
        .limit(50)
    )


@register(
    "win_alert_hysteresis",
    """
    WITH daily AS (
        SELECT CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 100.0 AS rev
        FROM orders GROUP BY 1
    ), stats AS (
        SELECT CAST(SUM(CAST(FLOOR(rev * 100.0) AS DECIMAL(28,0))) AS DOUBLE)
                   / 100.0 / COUNT(*) AS mu
        FROM daily
    ), marked AS (
        SELECT d, rev,
               CASE WHEN rev > 1.2 * mu THEN 1
                    WHEN rev < 0.9 * mu THEN 0 END AS boundary
        FROM daily, stats
    ), filled AS (
        SELECT d, rev,
               COALESCE(LAST_VALUE(boundary IGNORE NULLS)
                        OVER (ORDER BY d ROWS UNBOUNDED PRECEDING), 0)
                   AS alert_on
        FROM marked
    )
    SELECT CAST(COUNT(*) FILTER (WHERE alert_on = 1) AS BIGINT)
               AS days_in_alert,
           CAST(COUNT(*) AS BIGINT) AS days_total,
           CAST(SUM(CASE WHEN alert_on = 1 AND COALESCE(prev, 0) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS alert_episodes
    FROM (
        SELECT alert_on,
               LAG(alert_on) OVER (ORDER BY d) AS prev
        FROM filled
    ) t
    """,
)
def win_alert_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold (hysteresis) alerting over the daily revenue series:
    the alert turns ON crossing 120% of mean and only turns OFF dropping
    below 90% — the debounce every production monitor needs so a metric
    oscillating around one threshold doesn't page forever. The state
    machine is NOT a recursion: mark up/down boundary crossings, then the
    alert state at any day is the last non-null boundary — a forward-fill
    window (`win_forward_fill`'s idiom). Episodes are OFF→ON transitions
    counted with one lag. All data-sized work is the daily rollup; the
    window runs over ~2400 aggregated rows."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("bigint").alias("d")
    ).agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("decimal(28,0)"))
            .cast("double")
            / 100.0
        ).alias("rev")
    )
    stats = daily.agg(
        (
            F.sum(F.floor(F.col("rev") * 100.0).cast("decimal(28,0)")).cast(
                "double"
            )
            / 100.0
            / F.count(F.lit(1))
        ).alias("mu")
    )
    marked = daily.crossJoin(F.broadcast(stats)).select(
        "d",
        "rev",
        F.when(F.col("rev") > 1.2 * F.col("mu"), 1)
        .when(F.col("rev") < 0.9 * F.col("mu"), 0)
        .alias("boundary"),
    )
    fill = (
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = marked.select(
        "d",
        F.coalesce(
            F.last("boundary", ignorenulls=True).over(fill), F.lit(0)
        ).alias("alert_on"),
    )
    t = filled.select(
        "alert_on", F.lag("alert_on").over(Window.orderBy("d")).alias("prev")
    )
    return t.agg(
        F.count_if(F.col("alert_on") == 1).cast("bigint").alias("days_in_alert"),
        F.count(F.lit(1)).cast("bigint").alias("days_total"),
        F.sum(
            F.when(
                (F.col("alert_on") == 1) & (F.coalesce(F.col("prev"), F.lit(0)) == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alert_episodes"),
    )


@register(
    "win_gaps_islands",
    """
    WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    m AS (
        SELECT user_id, d,
               (d - DATE '2024-01-01')
                   - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM du
    )
    SELECT user_id,
           STRFTIME(MIN(d), '%Y-%m-%d') AS start_day,
           STRFTIME(MAX(d), '%Y-%m-%d') AS end_day,
           CAST(COUNT(*) AS BIGINT) AS days
    FROM m
    GROUP BY user_id, grp
    ORDER BY user_id, start_day
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per user,
    via the classic ``day_number - row_number()`` constant-within-island
    key. The (user, day) de-dup bounds window input by DAU; the window
    partitions on user_id (high cardinality), so this is one shuffle and
    an in-partition sort at any corpus size — the streak/uptime/coverage
    primitive. The '2024-01-01' anchor only offsets the island key, so
    correctness is date-range independent."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    dayn = F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
    w = Window.partitionBy("user_id").orderBy("d")
    m = du.select(
        "user_id", "d", (dayn - F.row_number().over(w)).alias("grp")
    )
    return (
        m.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("days"),
        )
        .drop("grp")
        .orderBy("user_id", "start_day")
    )


@register(
    "win_exchange_reuse",
    """
    WITH w AS (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS seq,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    OVER (PARTITION BY o_custkey) AS BIGINT) AS tot_cents,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS run_cents,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(FLOOR(o_totalprice * 100.0)
                                          AS BIGINT) DESC,
                                     o_orderkey) AS size_rank
        FROM orders
    )
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(seq AS INT) AS seq,
           ROUND(run_cents / 100.0, 2) AS running_spend,
           ROUND(CAST(run_cents AS DOUBLE) / tot_cents, 6) AS spend_frac,
           CAST(size_rank AS INT) AS size_rank
    FROM w WHERE seq <= 3 ORDER BY o_custkey, seq
    """,
)
def win_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four window computations — order sequence number, customer total,
    running total, and size rank — all declared over the SAME partition
    key (o_custkey) so Catalyst plans exactly ONE hash exchange and
    chains the Window operators behind it (different ORDER BYs only add
    in-partition sorts, never a reshuffle). This is the window-batching
    idiom that matters at 100 TB: five metrics for the price of one
    shuffle, vs the naive five-queries-five-shuffles shape.
    test_plans asserts the single-Exchange property. All money values
    are integer cents; ranks break ties on the unique orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("long")
    part = Window.partitionBy("o_custkey")
    seq_w = part.orderBy("o_orderdate", "o_orderkey")
    run_w = seq_w.rowsBetween(Window.unboundedPreceding, 0)
    rank_w = part.orderBy(cents.desc(), "o_orderkey")
    w = orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(seq_w).alias("seq"),
        F.sum(cents).over(part).cast("bigint").alias("tot_cents"),
        F.sum(cents).over(run_w).cast("bigint").alias("run_cents"),
        F.rank().over(rank_w).alias("size_rank"),
    )
    return (
        w.filter(F.col("seq") <= 3)
        .select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("seq").cast("int").alias("seq"),
            F.round(F.col("run_cents") / 100.0, 2).alias("running_spend"),
            F.round(
                F.col("run_cents").cast("double") / F.col("tot_cents"), 6
            ).alias("spend_frac"),
            F.col("size_rank").cast("int").alias("size_rank"),
        )
        .orderBy("o_custkey", "seq")
    )


@register(
    "win_cume_dist",
    """
    WITH r AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(FLOOR(o_totalprice * 100.0)
                                               AS BIGINT)) AS cd,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY CAST(FLOOR(o_totalprice * 100.0)
                                                  AS BIGINT)) AS pr
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(CASE WHEN cd >= 0.5 THEN cents END) / 100.0, 2)
               AS median_by_cume,
           ROUND(MAX(cd - pr), 6) AS max_gap,
           CAST(COUNT(*) FILTER (WHERE cd >= 0.95) AS BIGINT) AS n_top5pct
    FROM r GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST vs PERCENT_RANK — the two normalized-rank windows,
    exercised together per priority class on integer cents (ties are
    real, which is the point: cume_dist counts peers INCLUSIVELY,
    percent_rank exclusively, and their max gap measures tie mass).
    Derived outputs keep the result frame compact: the cume_dist-median
    (smallest value reaching 0.5), the largest tie gap, and the top-5%
    population. Completes the window-family surface beside ntile /
    percent_rank / row_number.

    Scale: one partitioned rank window (in-partition sort after one
    shuffle), then a per-class rollup."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy("cents")
    r = orders.select(
        "o_orderpriority", cents.alias("cents")
    ).select(
        "o_orderpriority",
        "cents",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.min(F.when(F.col("cd") >= 0.5, F.col("cents"))) / 100.0, 2
            ).alias("median_by_cume"),
            F.round(F.max(F.col("cd") - F.col("pr")), 6).alias("max_gap"),
            F.count_if(F.col("cd") >= 0.95).cast("bigint").alias("n_top5pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "win_distinct_sliding",
    """
    WITH ud AS (
        SELECT DISTINCT user_id,
               DATE_DIFF('day', DATE '2020-01-01',
                         CAST(DATE_TRUNC('day', ts) AS DATE)) AS d
        FROM events
    ), cal AS (
        SELECT UNNEST(RANGE((SELECT MIN(d) FROM ud),
                            (SELECT MAX(d) FROM ud) + 1)) AS d
    )
    SELECT STRFTIME(DATE '2020-01-01' + c.d * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS distinct_7d
    FROM cal c LEFT JOIN ud u ON u.d BETWEEN c.d - 6 AND c.d
    GROUP BY c.d
    ORDER BY c.d
    """,
)
def win_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a sliding window — the aggregate Spark's
    window functions REFUSE outright (DISTINCT is unsupported in
    windowed aggregates): trailing-7-day distinct active users per
    calendar day. Instead of re-scanning a 7-day neighborhood per day,
    each (user, day) visit contributes +1 over exactly the day
    interval [max(day, prev_visit+7), day+6] on which it is that
    user's NEWEST visit older than the window start (prev_visit from
    one lag per user), so the answer is an interval sweep: ±1 deltas,
    one running sum over the calendar — O(visits) total work, the same
    endpoint-sweep shape as ``ops_littles_law``. The oracle computes
    the same series by brute force (calendar × visits range join +
    COUNT(DISTINCT)), so the hash gate proves an ALGORITHMIC identity,
    not a translation.

    Scale: shuffle ∝ distinct (user, day) pairs; the only ordered pass
    is the O(days) calendar sweep — a per-day re-count would be 7× the
    I/O and a distinct-within-window shuffle per day."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("2020-01-01").cast("date"),
        ).alias("d"),
    ).distinct()
    w_u = Window.partitionBy("user_id").orderBy("d")
    iv = ud.select(
        F.greatest(
            F.col("d"),
            F.coalesce(F.lag("d").over(w_u) + 7, F.col("d")),
        ).alias("lo"),
        (F.col("d") + 6).alias("hi"),
    ).filter(F.col("lo") <= F.col("hi"))
    deltas = iv.select(F.col("lo").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select((F.col("hi") + 1).alias("d"), F.lit(-1).alias("delta"))
    )
    bounds = ud.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    cal = bounds.select(
        F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("d")
    )
    dsum = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cal.join(dsum, "d", "left")
        .select("d", F.coalesce(F.col("net"), F.lit(0)).alias("net"))
        .select(
            "d",
            F.sum("net").over(w_run).cast("long").alias("distinct_7d"),
        )
        .select(
            F.date_format(
                F.date_add(F.lit("2020-01-01").cast("date"), F.col("d")),
                "yyyy-MM-dd",
            ).alias("day"),
            "distinct_7d",
            F.col("d"),
        )
        .orderBy("d")
        .drop("d")
    )


@register(
    "win_ytd_qtd",
    """
    WITH monthly AS (
        SELECT date_part('year', o_orderdate) AS yr,
               date_part('month', o_orderdate) AS mo,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1, 2
    ), w AS (
        SELECT yr, mo, rev_c,
               CAST((mo - 1) // 3 + 1 AS BIGINT) AS qtr,
               SUM(rev_c) OVER (PARTITION BY yr ORDER BY mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ytd_c,
               SUM(rev_c) OVER (PARTITION BY yr, (mo - 1) // 3
                   ORDER BY mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS qtd_c,
               LAG(rev_c, 12) OVER (ORDER BY yr, mo) AS prior_yr_c
        FROM monthly
    )
    SELECT CAST(yr AS BIGINT) AS yr, CAST(mo AS BIGINT) AS mo, qtr,
           ROUND(rev_c / 100.0, 2) AS month_rev,
           ROUND(qtd_c / 100.0, 2) AS qtd_rev,
           ROUND(ytd_c / 100.0, 2) AS ytd_rev,
           ROUND(CASE WHEN prior_yr_c IS NOT NULL
                 THEN 100.0 * (rev_c - prior_yr_c) / prior_yr_c END, 4)
               AS yoy_pct
    FROM w
    ORDER BY yr, mo
    """,
)
def win_ytd_qtd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI calendar-hierarchy running totals every reporting layer
    ships: month revenue with quarter-to-date, year-to-date and
    year-over-year growth on one monthly frame — ``win_running``'s
    cumulative sum specialized to the fiscal hierarchy, where the
    frame RESETS at each year/quarter boundary via the window
    PARTITION instead of running forever, and YoY is a 12-row lag on
    the month axis (null for the first year — published as a typed
    null, not a sentinel). Revenue folds in exact cents, so every
    running total and the growth ratio are parallelism-stable.

    Scale: one partial→final aggregate to O(months); all windows run
    on that ≤84-row frame, partitioned by year/quarter."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    qkey = F.floor((F.col("mo") - 1) / 3)
    w_ytd = Window.partitionBy("yr").orderBy("mo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_qtd = Window.partitionBy(F.col("yr"), qkey).orderBy("mo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lag = Window.orderBy("yr", "mo")
    w = monthly.select(
        "yr",
        "mo",
        "rev_c",
        (qkey + 1).cast("long").alias("qtr"),
        F.sum("rev_c").over(w_ytd).alias("ytd_c"),
        F.sum("rev_c").over(w_qtd).alias("qtd_c"),
        F.lag("rev_c", 12).over(w_lag).alias("prior_yr_c"),
    )
    return w.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("mo").cast("long").alias("mo"),
        "qtr",
        F.round(F.col("rev_c") / 100.0, 2).alias("month_rev"),
        F.round(F.col("qtd_c") / 100.0, 2).alias("qtd_rev"),
        F.round(F.col("ytd_c") / 100.0, 2).alias("ytd_rev"),
        F.round(
            F.when(
                F.col("prior_yr_c").isNotNull(),
                100.0
                * (F.col("rev_c") - F.col("prior_yr_c"))
                / F.col("prior_yr_c"),
            ),
            4,
        ).alias("yoy_pct"),
    ).orderBy("yr", "mo")


@register(
    "win_exclude_current",
    """
    WITH ev AS (
        SELECT user_id, event_id, ts,
               CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
        FROM events WHERE user_id <= 40
    ), fr AS (
        SELECT user_id, event_id, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS s,
               CAST(COUNT(*) OVER w AS BIGINT) AS c
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                     EXCLUDE CURRENT ROW)
    )
    SELECT user_id, event_id,
           ROUND(cents / 100.0, 2) AS v,
           CASE WHEN c > 0
                THEN ROUND(CAST(s AS DOUBLE) / c / 100.0, 4) END AS loo_avg
    FROM fr ORDER BY user_id, event_id
    """,
)
def win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 frame exclusion (``EXCLUDE CURRENT ROW``) — the
    leave-one-out neighborhood mean every peer-comparison feature needs
    (is this event's value unusual *relative to its neighbors*, with the
    row itself not contaminating its own baseline). DuckDB runs the
    exclusion natively; Spark's window frames have no EXCLUDE clause, so
    the operator composes it from the inclusive frame: LOO sum = frame
    sum − current row, LOO count = frame count − 1 — an exact identity
    on the integer-cents accumulator, so the hash gate proves the
    emulation equals the native clause bit-for-bit. Single-event users
    publish NULL (no peers), same on both engines.

    Scale: one window = one shuffle on user_id + in-partition sort;
    the LOO algebra is codegen arithmetic on the inclusive frame — no
    second pass, no self-join."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 40)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 3)
    fr = ev.select(
        "user_id",
        "event_id",
        "cents",
        (F.sum("cents").over(w) - F.col("cents")).cast("long").alias("s"),
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias("c"),
    )
    return fr.select(
        "user_id",
        "event_id",
        F.round(F.col("cents") / 100.0, 2).alias("v"),
        F.when(
            F.col("c") > 0,
            F.round(F.col("s").cast("double") / F.col("c") / 100.0, 4),
        ).alias("loo_avg"),
    ).orderBy("user_id", "event_id")


@register(
    "win_frame_groups",
    """
    WITH g AS (
        SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS dollar,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
                   AS scents
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY dollar) AS BIGINT) AS rk
        FROM g
    )
    SELECT a.event_type, a.dollar, a.n,
           CAST(SUM(b.n) AS BIGINT) AS frame_rows,
           ROUND(CAST(SUM(b.scents) AS BIGINT) / 100.0, 2) AS frame_sum
    FROM r a JOIN r b ON b.event_type = a.event_type
                     AND ABS(b.rk - a.rk) <= 1
    GROUP BY a.event_type, a.dollar, a.n
    ORDER BY a.event_type, a.dollar
    """,
)
def win_frame_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 GROUPS frame mode (``GROUPS BETWEEN 1 PRECEDING AND 1
    FOLLOWING``) — peer-group-granular sliding aggregation, the frame
    semantics neither Spark NOR DuckDB implements natively. Both sides
    therefore derive it from the definition, by different algorithms:
    Spark collapses to one row per (partition, order-value) peer group,
    dense-ranks the groups, and runs a RANGE ±1 frame over the rank (a
    rank-contiguous range IS a GROUPS frame, and on the collapsed frame
    the window stays one shuffle + sort); the oracle instead self-joins
    peer groups on |rank difference| ≤ 1 and re-aggregates. Identical
    integer-cents results from two algorithms = the hash gate pins the
    GROUPS semantics themselves, not a translation.

    Scale: the collapse is a partial→final aggregate (shuffle ∝ distinct
    (type, dollar) groups, never events); the rank window and ±1 range
    frame run on the group-sized frame."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("dollar")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100.0).cast("long"))
        .cast("long")
        .alias("scents"),
    )
    w_rk = Window.partitionBy("event_type").orderBy("dollar")
    r = g.select(
        "event_type", "dollar", "n", "scents",
        F.row_number().over(w_rk).cast("long").alias("rk"),
    )
    w_fr = (
        Window.partitionBy("event_type").orderBy("rk").rangeBetween(-1, 1)
    )
    return (
        r.select(
            "event_type",
            "dollar",
            "n",
            F.sum("n").over(w_fr).cast("long").alias("frame_rows"),
            F.round(
                F.sum("scents").over(w_fr).cast("long") / 100.0, 2
            ).alias("frame_sum"),
        )
        .orderBy("event_type", "dollar")
    )


@register(
    "win_backward_fill",
    """
    WITH ev AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type <> 'error'
                    THEN CAST(FLOOR(value * 100.0) AS BIGINT) END AS vc
        FROM events WHERE user_id <= 40
    )
    SELECT user_id, event_id,
           ROUND(vc / 100.0, 2) AS v,
           ROUND(FIRST_VALUE(vc IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 / 100.0, 2) AS filled
    FROM ev ORDER BY user_id, event_id
    """,
)
def win_backward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-fill imputation (NOCB — next observation carried
    backward), the mirror of ``win_forward_fill``: error rows inherit
    the user's NEXT valid reading via ``FIRST_VALUE ... IGNORE NULLS``
    over the following frame. The pair (LOCF, NOCB) brackets every gap,
    which is what interpolation/auditing passes actually consume; tails
    of each series stay NULL identically on both engines. Exercises the
    IGNORE NULLS clause on a forward-looking frame — a distinct code
    path from the running-frame LAST_VALUE in forward fill.

    Scale: one user-keyed shuffle + in-partition sort, frame evaluation
    is a backward sweep — same single-window posture as forward fill."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 40)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(
                F.col("event_type") != "error",
                F.floor(F.col("value") * 100.0).cast("long"),
            ).alias("vc"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("vc") / 100.0, 2).alias("v"),
        F.round(
            F.first("vc", ignorenulls=True).over(w) / 100.0, 2
        ).alias("filled"),
    ).orderBy("user_id", "event_id")
