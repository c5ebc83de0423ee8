"""Join operators (SURVEY.md §2.2-C): all 13 forms.

Physical strategy is Catalyst's call (broadcast vs shuffle-hash vs
sort-merge vs BNL, with AQE runtime demotion and skew-split);
``join_broadcast`` pins the broadcast path explicitly via hint — the pattern
every dimension-table join here uses, since region/nation/supplier/customer
dims stay broadcast-able long after lineitem hits 100 TB. The childless
orders in the fixtures (257 at sf0.01) make the outer/semi/anti results
non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.exact import dsum, sql_dsum
from hive_processor_spark.operators.asof import asof_join
from hive_processor_spark.sources.tables import load_table


@register(
    "join_inner",
    """
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@register(
    "join_left",
    """
    SELECT o_orderkey, l_linenumber, l_quantity
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "join_right",
    """
    SELECT o_orderkey, l_linenumber, l_quantity
    FROM lineitem RIGHT JOIN orders ON o_orderkey = l_orderkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return li.join(orders, orders.o_orderkey == li.l_orderkey, "right").select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "join_full",
    """
    SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
    FULL JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-only rows: childless 'F' orders; right-only rows: lineitems of
    non-'F' orders — both sides of the full join are exercised."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "full").select(
        "o_orderkey", "l_orderkey", "l_linenumber"
    )


@register(
    "join_semi",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 49.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hi = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49.0)
    return orders.join(hi, orders.o_orderkey == hi.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti",
    """
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


@register(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "join_theta",
    """
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, a.s_nationkey
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality join (supplier pairs within a nation). The equi part
    hash-partitions; the inequality evaluates as a post-join residual."""
    a = load_table(spark, sf_dir, "supplier").alias("a")
    b = load_table(spark, sf_dir, "supplier").alias("b")
    cond = (F.col("a.s_nationkey") == F.col("b.s_nationkey")) & (
        F.col("a.s_suppkey") < F.col("b.s_suppkey")
    )
    return a.join(b, cond).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("a.s_nationkey").alias("s_nationkey"),
    )


@register(
    "join_range",
    """
    SELECT c_custkey, s_suppkey
    FROM customer JOIN supplier
      ON c_acctbal BETWEEN s_acctbal - 5.0 AND s_acctbal + 5.0
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval-predicate join (no equi key). Planned as broadcast
    nested-loop with the small side broadcast; at 100 TB per side you'd
    band-bucket both inputs (floor(acctbal/width)) to recover an equi key
    and check the predicate as a residual — same plan shape as join_theta."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cond = F.col("c_acctbal").between(
        F.col("s_acctbal") - 5.0, F.col("s_acctbal") + 5.0
    )
    return cust.join(F.broadcast(supp), cond).select("c_custkey", "s_suppkey")


@register(
    "join_asof",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, c.event_id AS asof_click_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase ↔ latest prior click of the same user, via the
    union+window as-of operator (operators/asof.py)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    )
    out = asof_join(
        purchases, clicks, keys=["user_id"], ts="ts", payload=["click_id"]
    )
    return out.select("event_id", "user_id", F.col("asof_click_id"))


@register(
    "join_multiway",
    f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table chain + aggregate + top-k. The customer dim
    filter is broadcast into the orders scan; lineitem joins shuffle-side."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-01-01"))
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "join_broadcast",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint for the dimension join — the physical plan is
    asserted in tests (BroadcastHashJoin, no shuffle of the fact side)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_self",
    """
    SELECT a.event_id AS signup_id, b.event_id AS later_purchase_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_type = 'signup'
     AND b.event_type = 'purchase' AND b.ts > a.ts
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    cond = (F.col("a.user_id") == F.col("b.user_id")) & (
        F.col("b.ts") > F.col("a.ts")
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("signup_id"),
        F.col("b.event_id").alias("later_purchase_id"),
        F.col("a.user_id").alias("user_id"),
    )


@register(
    "join_salted",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join by key salting: the probe side adds a salt in
    [0, 16), the (small, skewed-key) build side is replicated once per salt
    value, and the join runs on ``(key, salt)`` — a hot key's rows now land
    on 16 reducers instead of one. Result is identical to the plain join by
    construction (the oracle runs the unsalted equivalent).

    At 100 TB this is the manual fallback when AQE's skew-join split cannot
    help (e.g. the skew is in a broadcast-ineligible build side); the salt
    fan-out trades `salt×` replication of the small side for even reducer
    occupancy on the large side.
    """
    n_salt = 16
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.xxhash64("c_custkey"), F.lit(n_salt)).cast("int")
    )
    nation = load_table(spark, sf_dir, "nation").crossJoin(
        spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        cust.join(
            nation,
            (cust.c_nationkey == nation.n_nationkey) & (cust.salt == nation.salt),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_star_schema",
    f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def join_star_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: a 6-table star — fact chain (orders ⋈ lineitem)
    with four dimensions folded in. Join strategy is the 100 TB story:
    region→nation is collapsed to a broadcast filter BEFORE touching the
    facts (Catalyst pushes r_name='ASIA' through the join so only ~1/5 of
    nations survive), supplier and customer ship as broadcasts into the
    fact scans, and the only repartition-scale shuffle left is
    lineitem ⋈ orders on orderkey — the floor for this query. The
    local-supplier predicate (c_nationkey = s_nationkey) rides the
    broadcast joins for free."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "join_null_safe",
    """
    WITH o AS (
        SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio
        FROM orders
    ), buckets AS (
        SELECT * FROM (VALUES (CAST(NULL AS VARCHAR), 'unspecified'),
                              ('1-URGENT', 'urgent')) t(prio, label)
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM o JOIN buckets ON o.prio IS NOT DISTINCT FROM buckets.prio
    GROUP BY label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of vanishing — the semantics a dimension with
    an explicit 'unknown' bucket needs. Catalyst plans `<=>` as a hash
    join (EqualNullSafe is a valid equi-join key), so this costs the same
    as a plain equi-join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio"),
    )
    buckets = spark.createDataFrame(
        [(None, "unspecified"), ("1-URGENT", "urgent")], "prio string, label string"
    )
    return (
        orders.join(F.broadcast(buckets), orders.prio.eqNullSafe(buckets.prio))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "join_time_proximity",
    """
    SELECT a.event_id AS ev_a, b.event_id AS ev_b,
           CAST(ABS(EPOCH_US(a.ts) - EPOCH_US(b.ts)) // 1000 AS BIGINT) AS gap_ms
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(EPOCH_US(a.ts) - EPOCH_US(b.ts)) <= 1800000000
    """,
)
def join_time_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: pairs of same-user events within 30 minutes of
    each other. The oracle states it as a theta join; the Spark plan is
    the scalable BANDED form — bucket event time into 30-minute cells,
    replicate one side to its cell and both neighbors, equi-join on
    (user, cell), then apply the exact µs predicate. Every qualifying
    pair lands in exactly one (replica, original) cell match, the
    equi-join shuffles instead of nested-looping, and the replication
    factor is a constant 3 — the same banding that made the shingle and
    simhash joins scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    width = 1800 * 1000 * 1000  # 30 min in µs
    a = (
        ev.select(
            F.col("event_id").alias("ev_a"),
            F.col("user_id").alias("ua"),
            F.col("us").alias("us_a"),
            F.explode(
                F.array(
                    (F.col("us") / width).cast("long") - 1,
                    (F.col("us") / width).cast("long"),
                    (F.col("us") / width).cast("long") + 1,
                )
            ).alias("cell"),
        )
    )
    b = ev.select(
        F.col("event_id").alias("ev_b"),
        F.col("user_id").alias("ub"),
        F.col("us").alias("us_b"),
        (F.col("us") / width).cast("long").alias("cell_b"),
    )
    return (
        a.join(b, (F.col("ua") == F.col("ub")) & (F.col("cell") == F.col("cell_b")))
        .filter(
            (F.col("ev_a") < F.col("ev_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= width)
        )
        .select(
            "ev_a",
            "ev_b",
            (F.abs(F.col("us_a") - F.col("us_b")) / 1000).cast("long").alias("gap_ms"),
        )
    )


@register(
    "join_custdist",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def join_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution, with the
    defining trick — the priority predicate lives in the LEFT JOIN's ON
    clause, so customers whose orders are all filtered still appear with
    count 0 (a WHERE would silently drop them). Two hash aggregates; the
    second groups on a tiny domain, so the heavy shuffle is only the
    first."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "join_promo_revenue",
    f"""
    SELECT ROUND(
        100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN
                     CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                          AS DECIMAL(28,0)) ELSE 0 END) AS DOUBLE) / 10000.0)
              / (CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                          AS DECIMAL(28,0))) AS DOUBLE) / 10000.0),
        4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def join_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of discounted revenue from promo parts in a
    time slice — conditional aggregation over a broadcast dim join, both
    sums quantized so the ratio is bit-stable. The date filter pushes to
    the lineitem scan; part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / dsum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "join_priority_classes",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def join_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag on this fixture): line counts
    split by order-priority class after a fact-fact equi-join with a
    pushed-down date slice — conditional counts evaluate map-side inside
    one hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_asof_tolerance",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
                THEN c.event_id END AS asof_click_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas ``merge_asof``'s
    ``tolerance=``): each purchase takes the latest prior click of the same
    user only if it happened within the last hour — older matches are
    nulled, not carried. The attribution-window semantics every click→
    conversion pipeline needs: without the bound, a user's click from last
    month "explains" today's purchase.

    Implementation rides the same single-shuffle union+window as-of
    operator (operators/asof.py) with the right timestamp carried as an
    extra payload column; the tolerance is then one codegen filter — no
    second join, no extra shuffle over plain as-of."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases, clicks, keys=["user_id"], ts="ts", payload=["click_id", "click_ts"]
    )
    fresh = (
        F.col("asof_click_ts").isNotNull()
        & (F.unix_timestamp("ts") - F.unix_timestamp("asof_click_ts") <= 3600)
    )
    return out.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("asof_click_id")).alias("asof_click_id"),
    )


@register(
    "join_hash_hinted",
    """
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 450000.0
    ORDER BY o_orderkey
    """,
)
def join_hash_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy steering: the SHUFFLE_HASH hint forces a shuffled hash
    join where the planner would default to sort-merge — the right call
    when one side is modest (skip both sorts) but too big to broadcast.
    Same rows as the unhinted join by definition; the plan shape is
    asserted in tests/test_plans.py. At 100 TB this hint is the knob for
    mid-size dimension joins in the broadcast/SMJ gap."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000.0
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy("o_orderkey")
    )


@register(
    "join_sla_breach",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 END) AS BIGINT) AS n_breaches,
           ROUND(CAST(COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS breach_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_sla_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA breach rate per priority: line items shipped more than
    60 days after order placement — the operations metric behind every
    fulfillment dashboard. One fact-fact equi-join on the order key (at
    scale: co-partitioned/bucketed on l_orderkey=o_orderkey so the join is
    exchange-light), then exact conditional counts; the date comparison is
    calendar-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    breach = F.count(
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            1,
        )
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            breach.cast("long").alias("n_breaches"),
            F.round(breach.cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "breach_rate"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_duplicate_payments",
    """
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
               o_orderdate
        FROM orders
    ), flagged AS (
        SELECT o_orderkey, o_custkey, cents, o_orderdate,
               LAG(o_orderdate) OVER (PARTITION BY o_custkey, cents
                                      ORDER BY o_orderdate, o_orderkey)
                   AS prev_date
        FROM o
    )
    SELECT o_orderkey, o_custkey,
           CAST(cents AS DOUBLE) / 100.0 AS amount,
           CAST(DATE_DIFF('day', prev_date, o_orderdate) AS BIGINT)
               AS days_since_prev
    FROM flagged
    WHERE prev_date IS NOT NULL
      AND o_orderdate <= prev_date + INTERVAL 3 DAY
    ORDER BY o_orderkey
    """,
)
def join_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection: orders by the same customer for the
    identical amount within 3 days of the previous one — the fraud/
    double-charge sweep every billing system runs. Spelled as a window
    (LAG over (customer, cents)) rather than a self-join, so the fact
    table shuffles once on the composite key and each group's scan is
    linear — no quadratic pair explosion even for customers with many
    same-amount orders. Cent quantization makes amount equality exact."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
        "o_orderdate",
    )
    w = Window.partitionBy("o_custkey", "cents").orderBy(
        "o_orderdate", "o_orderkey"
    )
    flagged = o.select(
        "*", F.lag("o_orderdate").over(w).alias("prev_date")
    ).filter(
        F.col("prev_date").isNotNull()
        & (F.col("o_orderdate") <= F.col("prev_date") + F.expr("INTERVAL 3 DAYS"))
    )
    return flagged.select(
        "o_orderkey",
        "o_custkey",
        (F.col("cents").cast("double") / 100.0).alias("amount"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
        )
        .cast("long")
        .alias("days_since_prev"),
    ).orderBy("o_orderkey")


@register(
    "join_fulfillment_latency",
    """
    WITH first_ship AS (
        SELECT l_orderkey, MIN(l_shipdate) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ), lat AS (
        SELECT o_orderpriority,
               DATE_DIFF('day', o_orderdate, first_ship) AS days
        FROM orders JOIN first_ship ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(days) AS DOUBLE) / COUNT(*), 6) AS mean_days,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM lat
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment latency per priority — the fulfillment
    cycle-time metric. The per-order MIN(shipdate) is a partial→final
    aggregate on the fact table; the join back to orders is key-to-key
    (at scale: bucketed co-location). Day differences are exact calendar
    integers; only the mean divides."""
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = orders.join(
        first_ship, orders.o_orderkey == first_ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("days").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_days"
            ),
            F.min("days").cast("long").alias("min_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_reconcile",
    """
    WITH a AS (
        SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS v
        FROM orders WHERE o_orderkey % 31 <> 0
    ), b AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 97 = 0
                    THEN CAST(FLOOR(o_totalprice) AS BIGINT) * 100
                    ELSE CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) END AS v
        FROM orders WHERE o_orderkey % 37 <> 0
    )
    SELECT CAST(COUNT(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                            AND a.v = b.v THEN 1 END) AS BIGINT) AS matched,
           CAST(COUNT(CASE WHEN b.k IS NULL THEN 1 END) AS BIGINT) AS only_a,
           CAST(COUNT(CASE WHEN a.k IS NULL THEN 1 END) AS BIGINT) AS only_b,
           CAST(COUNT(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                            AND a.v <> b.v THEN 1 END) AS BIGINT) AS value_diff
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
)
def join_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source reconciliation: FULL OUTER join of two snapshots of the
    same table (each with synthetic drop-outs, one with a value
    perturbation) classifying every key as matched / only-left /
    only-right / value-mismatch — THE validation query of every migration
    and every dual-write rollout. One shuffle join on the key; the
    classification is a single conditional-count pass over the joined
    stream. Cent quantization makes value equality exact."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("long")
    a = orders.filter(F.col("o_orderkey") % 31 != 0).select(
        F.col("o_orderkey").alias("ka"), cents.alias("va")
    )
    b = orders.filter(F.col("o_orderkey") % 37 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.floor(F.col("o_totalprice")).cast("long") * 100,
        )
        .otherwise(cents)
        .alias("vb"),
    )
    j = a.join(b, a.ka == b.kb, "full_outer")
    both = F.col("ka").isNotNull() & F.col("kb").isNotNull()
    return j.agg(
        F.count(F.when(both & (F.col("va") == F.col("vb")), 1))
        .cast("long")
        .alias("matched"),
        F.count(F.when(F.col("kb").isNull(), 1)).cast("long").alias("only_a"),
        F.count(F.when(F.col("ka").isNull(), 1)).cast("long").alias("only_b"),
        F.count(F.when(both & (F.col("va") != F.col("vb")), 1))
        .cast("long")
        .alias("value_diff"),
    )


@register(
    "join_asof_nearest",
    """
    WITH p AS (
        SELECT event_id AS p_id, user_id, EPOCH_US(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS c_id, user_id, EPOCH_US(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ), cand AS (
        SELECT p.p_id, c.c_id,
               ABS(p.p_us - c.c_us) AS dist_us,
               ROW_NUMBER() OVER (PARTITION BY p.p_id
                                  ORDER BY ABS(p.p_us - c.c_us), c.c_id) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.c_us BETWEEN p.p_us - 86400000000 AND p.p_us + 86400000000
    )
    SELECT p_id, c_id AS nearest_click, CAST(dist_us AS BIGINT) AS dist_us
    FROM cand WHERE rn = 1
    ORDER BY p_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join (both directions): each purchase pairs
    with the user's temporally CLOSEST click within ±24 h — completing the
    as-of family (backward `join_asof`, tolerance-bounded
    `join_asof_tolerance`, and now nearest-in-either-direction, the
    sensor-alignment semantics). The band bounds the candidate join; the
    winner window breaks |Δt| ties on click id so the match is
    deterministic. Integer epoch-µs distances only."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
    )
    day_us = 86400000000
    cand = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_us") >= F.col("p_us") - day_us)
        & (F.col("c_us") <= F.col("p_us") + day_us),
    ).select(
        "p_id", "c_id", F.abs(F.col("p_us") - F.col("c_us")).alias("dist_us")
    )
    w = Window.partitionBy("p_id").orderBy("dist_us", "c_id")
    return (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("p_id", F.col("c_id").alias("nearest_click"), F.col("dist_us").cast("long"))
        .orderBy("p_id")
    )


@register(
    "join_allocation",
    """
    WITH q AS (
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_quantity * 100.0) AS BIGINT) AS qq,
               SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT))
                   OVER (PARTITION BY l_orderkey) AS tot_q
        FROM lineitem
    )
    SELECT q.l_orderkey, q.l_linenumber,
           FLOOR(o_totalprice * (CAST(qq AS DOUBLE) / CAST(tot_q AS DOUBLE))
                 * 10000.0) / 10000.0 AS allocated_price
    FROM q JOIN orders ON q.l_orderkey = o_orderkey
    ORDER BY q.l_orderkey, q.l_linenumber
    """,
)
def join_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional allocation: spread each order's header total across
    its lines by quantity share — the finance allocation every
    header/detail schema eventually needs (freight, discounts, overhead).
    The share denominator is a windowed sum of quantized integers
    (exact), the allocation one identically-parenthesized double
    multiply floor-quantized off rounding ties (half-up vs half-even
    divergence is exactly what ROUND on a tie invites); per-order windows shuffle once on the order key and the
    header join is key-to-key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    qq = F.floor(F.col("l_quantity") * 100.0).cast("long")
    w = Window.partitionBy("l_orderkey")
    q = li.select(
        "l_orderkey",
        "l_linenumber",
        qq.alias("qq"),
        F.sum(qq).over(w).alias("tot_q"),
    )
    return (
        q.join(orders, q.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.floor(
                    F.col("o_totalprice")
                    * (F.col("qq").cast("double") / F.col("tot_q").cast("double"))
                    * 10000.0
                )
                / 10000.0
            ).alias("allocated_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )

_BLOOM_BITS = 1 << 16  # 8 KiB bitmap: ~0.4% fp rate at 3k keys / 3 hashes
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (1, 2, 3)


@register(
    "join_bloom_prefilter",
    f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice', 2)} AS total_price
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, built entirely from codegen
    expressions: hash the build side's keys into an 8 KiB bitmap
    (3 × xxhash64 positions OR-ed into 64-bit words), broadcast the ONE-ROW
    bitmap to the probe side, drop every fact row whose 3 probe bits are
    not all set, and only then run the exact (shuffled) semi-join to kill
    the ~0.4% false positives. The final answer is provably the plain
    semi-join's (the bloom can only pass extra rows, never drop true ones
    — one-sided error), which is what the oracle checks.

    Why it matters at 100 TB: when the dim side is too big to broadcast,
    the shuffle ships the FULL fact table; an 8 KiB bitmap (vs the key
    set itself) prefilters the fact rows before the exchange, shrinking
    the shuffle to ~selectivity × fact. This is the rewrite Spark's own
    runtime row-level filtering performs — spelled out as an explicit,
    engine-visible plan so the mechanics are testable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    keys = cust.select("c_custkey")

    # Build: key -> 3 bit positions -> per-word OR -> dense 1024-long array.
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("c_custkey", F.lit(s)), F.lit(_BLOOM_BITS))
                    for s in _BLOOM_SEEDS
                ]
            )
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")).alias(
            "word"
        )
    )
    dense = (
        spark.range(_BLOOM_WORDS)
        .select(F.col("id").cast("int").alias("w"))
        .join(F.broadcast(words), "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("bigint")).alias("word"))
    )
    bloom = dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("w", "word"))), lambda x: x.word
        ).alias("bloom")
    )

    # Probe: all 3 bits set -> candidate; exact semi-join cleans up after.
    def bit_hit(seed: int):
        return F.expr(
            f"(element_at(bloom, CAST(pmod(xxhash64(o_custkey, {seed}),"
            f" {_BLOOM_BITS}) / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pmod(xxhash64(o_custkey, {seed}), {_BLOOM_BITS}) % 64 AS INT)))"
            " != 0"
        )

    candidates = (
        orders.crossJoin(F.broadcast(bloom))
        .filter(bit_hit(1) & bit_hit(2) & bit_hit(3))
        .drop("bloom")
    )
    # hint on the BUILD (right) side: a left-semi join can only build right
    exact = candidates.join(
        keys.hint("shuffle_hash"), candidates.o_custkey == keys.c_custkey,
        "left_semi",
    )
    return (
        exact.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )

@register(
    "join_temporal_dim",
    """
    WITH scd AS (
        SELECT user_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS valid_from,
               LEAD(CAST(FLOOR(EPOCH(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               (FLOOR(value * 100.0) / 100.0) AS version_value
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS click_ts
        FROM events WHERE event_type = 'click'
    ), matched AS (
        SELECT c.user_id, c.click_ts, s.version_value
        FROM clicks c JOIN scd s
          ON s.user_id = c.user_id
         AND c.click_ts >= s.valid_from
         AND (s.valid_to IS NULL OR c.click_ts < s.valid_to)
    )
    SELECT CAST((SELECT COUNT(*) FROM clicks) AS BIGINT) AS n_clicks,
           CAST((SELECT COUNT(*) FROM matched) AS BIGINT) AS n_matched,
           CAST((SELECT COUNT(*) FROM clicks) -
                (SELECT COUNT(*) FROM matched) AS BIGINT) AS n_before_first,
           CAST((SELECT SUM(CAST(FLOOR(version_value * 100.0) AS DECIMAL(28,0)))
                 FROM matched) AS DOUBLE) / 100.0 AS sum_version_value
    """,
)
def join_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (AS OF event time) dimension join: every click row joins
    the SCD-2 purchase-version interval that was valid when the click
    happened — the lakehouse pattern for joining facts to slowly changing
    dimensions without leaking future attribute values into the past
    (the batch twin of a point-in-time feature-store lookup).

    Shape: the version table comes from one LEAD window
    (``cdc_scd2_build``'s construction); the interval match is an
    equi-join ON THE NATURAL KEY with a residual range predicate, so the
    shuffle is user-keyed (never quadratic — each click scans only its
    own user's few versions). Clicks before a user's first version are
    counted, not dropped, closing the audit identity
    n_clicks = n_matched + n_before_first."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("valid_from"),
            "event_id",
            "ts",
            (F.floor(F.col("value") * 100.0) / 100.0).alias("version_value"),
        )
        .select(
            "user_id",
            "valid_from",
            F.lead("valid_from").over(w).alias("valid_to"),
            "version_value",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_timestamp("ts").alias("click_ts")
    )
    matched = clicks.join(
        scd,
        (F.col("c_user") == scd.user_id)
        & (F.col("click_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("click_ts") < F.col("valid_to"))),
    )
    n_clicks = clicks.agg(F.count(F.lit(1)).alias("n_clicks"))
    agg = matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        (
            F.sum(
                F.floor(F.col("version_value") * 100.0).cast("decimal(28,0)")
            ).cast("double")
            / 100.0
        ).alias("sum_version_value"),
    )
    return (
        n_clicks.crossJoin(agg)
        .select(
            "n_clicks",
            "n_matched",
            (F.col("n_clicks") - F.col("n_matched")).alias("n_before_first"),
            "sum_version_value",
        )
    )


@register(
    "join_range_binned",
    """
    WITH pairs AS (
        SELECT a.p_partkey AS pa, b.p_partkey AS pb,
               CAST(FLOOR(a.p_retailprice) AS BIGINT) AS bucket,
               ABS(a.p_retailprice - b.p_retailprice) AS gap
        FROM part a JOIN part b
          ON a.p_partkey < b.p_partkey
         AND ABS(a.p_retailprice - b.p_retailprice) <= 0.5
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(FLOOR(gap * 10000.0) AS DECIMAL(28,0))) AS DOUBLE)
               / 10000.0 AS sum_gap
    FROM pairs
    GROUP BY bucket ORDER BY n_pairs DESC, bucket LIMIT 20
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) self-join via the binning idiom: pairs of parts whose
    retail prices are within ±0.50 of each other. The naive plan is an
    O(n²) inequality join; binning each row to ``floor(price)`` and
    expanding the probe side to its 3 adjacent bins turns it into an
    EQUI-join (shuffle co-partitioned on bucket) with a cheap exact
    residual filter — the canonical rewrite that makes band joins viable
    at 100 TB (3× probe fanout instead of n² comparisons). The DuckDB
    oracle runs the naive inequality join, proving the rewrite exact.
    Per-bucket pair counts + quantized gap sums."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("pa"),
        F.col("p_retailprice").alias("price_a"),
        F.floor("p_retailprice").cast("bigint").alias("bucket"),
    )
    b = part.select(
        F.col("p_partkey").alias("pb"),
        F.col("p_retailprice").alias("price_b"),
        F.explode(
            F.array(
                F.floor("p_retailprice").cast("bigint") - 1,
                F.floor("p_retailprice").cast("bigint"),
                F.floor("p_retailprice").cast("bigint") + 1,
            )
        ).alias("bucket"),
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            (F.col("pa") < F.col("pb"))
            & (F.abs(F.col("price_a") - F.col("price_b")) <= 0.5)
        )
        .select(
            "bucket", F.abs(F.col("price_a") - F.col("price_b")).alias("gap")
        )
    )
    return (
        pairs.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (
                F.sum(F.floor(F.col("gap") * 10000.0).cast("decimal(28,0)")).cast(
                    "double"
                )
                / 10000.0
            ).alias("sum_gap"),
        )
        .orderBy(F.col("n_pairs").desc(), "bucket")
        .limit(20)
    )


@register(
    "join_not_in_null_aware",
    """
    WITH p_cust AS (
        SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END
                   AS k
        FROM orders WHERE o_orderstatus = 'P'
    )
    SELECT
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_custkey NOT IN (SELECT k FROM p_cust WHERE k IS NOT NULL))
             AS BIGINT) AS not_in_clean,
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_custkey NOT IN (SELECT k FROM p_cust))
             AS BIGINT) AS not_in_with_null,
        CAST((SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM p_cust p
                                WHERE p.k = c.c_custkey))
             AS BIGINT) AS not_exists
    """,
)
def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS null semantics, side by side: with even one
    NULL in the subquery list, SQL's three-valued logic makes every
    ``x NOT IN (...)`` UNKNOWN — zero rows survive — while NOT EXISTS is
    null-immune. The classic silent-wrong-answer trap in anti-join
    rewrites; Spark compiles the NULL-bearing variant to a null-aware
    anti join (NAAJ) rather than a plain LeftAnti precisely because of
    this. One row, three counts: clean NOT IN, NULL-poisoned NOT IN
    (provably 0 here — the synthesized list contains NULLs), and
    NOT EXISTS. Both engines agree on all three, proving the engine's
    anti-join family implements the standard's semantics."""
    from hive_processor_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH p_cust AS (
            SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END
                       AS k
            FROM orders WHERE o_orderstatus = 'P'
        )
        SELECT
            CAST((SELECT COUNT(*) FROM customer
                  WHERE c_custkey NOT IN
                        (SELECT k FROM p_cust WHERE k IS NOT NULL))
                 AS BIGINT) AS not_in_clean,
            CAST((SELECT COUNT(*) FROM customer
                  WHERE c_custkey NOT IN (SELECT k FROM p_cust))
                 AS BIGINT) AS not_in_with_null,
            CAST((SELECT COUNT(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM p_cust p
                                    WHERE p.k = c.c_custkey))
                 AS BIGINT) AS not_exists
        """
    )


@register(
    "join_temporal_overlap_pairs",
    """
    WITH iv AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS s,
               o_orderdate + INTERVAL 7 DAY AS e
        FROM orders
    ), pairs AS (
        SELECT a.o_custkey,
               a.o_orderkey AS key_a, b.o_orderkey AS key_b
        FROM iv a JOIN iv b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND a.s < b.e AND b.s < a.e
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS overlapping_pairs,
           CAST(MIN(key_a) AS BIGINT) AS first_key
    FROM pairs
    GROUP BY o_custkey
    ORDER BY overlapping_pairs DESC, custkey LIMIT 20
    """,
)
def join_temporal_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key interval-overlap self-join: pairs of a customer's orders
    whose 7-day fulfillment windows overlap — the workload-collision /
    double-booking primitive (meeting conflicts, session overlap,
    concurrent SLAs all share this shape). The join key is the CUSTOMER,
    so Spark co-partitions both sides on custkey and the quadratic
    interval predicate only runs within each key's small group — never
    across the table. Top-20 customers by overlap count. At 100 TB the
    per-key group size bounds the fan-out exactly like the dedup family's
    shingle cap; a hot key would be salted the same way."""
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    a = iv.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("key_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = iv.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("o_orderkey").alias("key_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    pairs = a.join(
        b,
        (F.col("o_custkey") == F.col("ck_b"))
        & (F.col("key_a") < F.col("key_b"))
        & (F.col("sa") < F.col("eb"))
        & (F.col("sb") < F.col("ea")),
    )
    return (
        pairs.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("overlapping_pairs"),
            F.min("key_a").cast("bigint").alias("first_key"),
        )
        .orderBy(F.col("overlapping_pairs").desc(), "custkey")
        .limit(20)
    )


@register(
    "join_skyline",
    """
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           ROUND(p_retailprice, 2) AS price,
           CAST(p_size AS INT) AS size
    FROM part b
    WHERE NOT EXISTS (
        SELECT 1 FROM part a
        WHERE a.p_retailprice <= b.p_retailprice
          AND a.p_size >= b.p_size
          AND (a.p_retailprice < b.p_retailprice OR a.p_size > b.p_size)
    )
    ORDER BY price, p_partkey
    """,
)
def join_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts: every part for which no other
    part is simultaneously cheaper-or-equal AND larger-or-equal with at
    least one strict — the multi-criteria shortlist operator ("best
    price/size trade-offs"). The DuckDB oracle states the textbook O(n²)
    NOT EXISTS; the Spark plan is the O(n log n) SWEEP instead: group
    rows by price, compute each price-group's max size, running-max that
    over price order, and a row is dominated iff a strictly-cheaper
    group reaches its size (m1 ≥ size) or any cheaper-or-equal point
    strictly exceeds it (m2 > size). No self-join, no pair blowup: one
    groupBy(price) shuffle + one window over the GROUPED frame (distinct
    prices, orders of magnitude smaller than rows) + a broadcast-back.
    At 100 TB the window runs range-partitioned on price; the shape is
    unchanged — this is the skyline plan you want when the anti-join
    would be quadratic."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g2 = g.select(
        "p_retailprice",
        "gmax",
        F.max("gmax").over(w).alias("m1"),
    ).select(
        "p_retailprice",
        F.coalesce(F.col("m1"), F.lit(-(2**31))).alias("m1"),
        F.greatest(F.coalesce(F.col("m1"), F.lit(-(2**31))), F.col("gmax")).alias(
            "m2"
        ),
    )
    return (
        part.join(F.broadcast(g2), "p_retailprice")
        .filter(
            ~((F.col("m1") >= F.col("p_size")) | (F.col("m2") > F.col("p_size")))
        )
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").cast("int").alias("size"),
        )
        .orderBy("price", "p_partkey")
    )


@register(
    "join_drill_across",
    """
    WITH fo AS (
        SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1
    ), fe AS (
        SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM events GROUP BY 1
    )
    SELECT COALESCE(fo.month, fe.month) AS month,
           COALESCE(fo.n_orders, 0) AS n_orders,
           ROUND(COALESCE(fo.rev_cents, 0) / 100.0, 2) AS revenue,
           COALESCE(fe.n_events, 0) AS n_events,
           COALESCE(fe.active_users, 0) AS active_users,
           CAST(CASE WHEN fo.month IS NOT NULL AND fe.month IS NOT NULL
                     THEN 'both'
                     WHEN fo.month IS NOT NULL THEN 'orders_only'
                     ELSE 'events_only' END AS VARCHAR) AS coverage
    FROM fo FULL OUTER JOIN fe ON fe.month = fo.month
    ORDER BY month
    """,
)
def join_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-across two fact tables on a conformed time dimension: the
    Kimball pattern — aggregate EACH fact star to the shared grain
    (month) SEPARATELY, then full-outer-join the rollups and flag
    coverage gaps — never join raw fact tables (the fan-out would
    double-count both). Orders revenue meets event activity at the
    month grain here; coverage flags expose the periods where only one
    process ran. Both rollups are exact-integer aggregations shuffling
    ∝ months; the final join touches two tiny frames. At 100 TB the
    fact scans never co-shuffle — this plan is why conformed-dimension
    drill-across scales where fact-to-fact joins do not."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    fo = orders.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    fe = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM").alias("emonth")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("active_users"),
    )
    j = fo.join(fe, fo["month"] == fe["emonth"], "full_outer")
    return j.select(
        F.coalesce(F.col("month"), F.col("emonth")).alias("month"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias(
            "n_orders"
        ),
        F.round(
            F.coalesce(F.col("rev_cents"), F.lit(0)) / 100.0, 2
        ).alias("revenue"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias(
            "n_events"
        ),
        F.coalesce(F.col("active_users"), F.lit(0)).cast("bigint").alias(
            "active_users"
        ),
        F.when(
            F.col("month").isNotNull() & F.col("emonth").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("month").isNotNull(), F.lit("orders_only"))
        .otherwise(F.lit("events_only"))
        .alias("coverage"),
    ).orderBy("month")


@register(
    "join_bitmap_membership",
    """
    WITH pn AS (
        SELECT l.l_partkey AS pk, c.c_nationkey AS nk
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), bm AS (
        SELECT pk,
               CAST(SUM(DISTINCT CAST(1 AS BIGINT) << nk) AS BIGINT)
                   AS nation_bits,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM pn GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(*) FILTER (WHERE (nation_bits & (1 << 3)) <> 0
                                   AND (nation_bits & (1 << 7)) <> 0)
                AS BIGINT) AS parts_nations_3_and_7,
           CAST(COUNT(*) FILTER (WHERE (nation_bits
                                        & ((1 << 3) | (1 << 7))) <> 0)
                AS BIGINT) AS parts_nations_3_or_7,
           CAST(MAX(n_nations) AS BIGINT) AS max_nation_reach,
           ROUND(AVG(CAST(n_nations AS DOUBLE)), 4) AS avg_nation_reach
    FROM bm
    """,
)
def join_bitmap_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index membership semantics: compress each part's
    purchasing-nation SET into a single 25-bit integer (bit k set ⇔
    nation k ordered the part), then answer intersection/union
    membership queries — "ordered by BOTH nations 3 and 7" — with one
    AND/OR per row instead of repeated semi-joins. This is the bitmap
    index idiom OLAP engines build for low-cardinality set predicates:
    after the one-time bitmask build, every additional membership
    predicate is free bitwise math on a compact column. Distinct
    (part, nation) pairs come from one join+distinct; the bitmask is
    SUM(DISTINCT 1<<nk) — exact integers throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pn = (
        li.join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), cust["c_custkey"] == orders["o_custkey"])
        .select(F.col("l_partkey").alias("pk"), F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    bm = pn.groupBy("pk").agg(
        F.sum_distinct(F.expr("shiftleft(CAST(1 AS BIGINT), nk)"))
        .cast("bigint")
        .alias("nation_bits"),
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
    )
    b3 = F.lit(1 << 3).cast("bigint")
    b7 = F.lit(1 << 7).cast("bigint")
    return bm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.count_if(
            (F.col("nation_bits").bitwiseAND(b3) != 0)
            & (F.col("nation_bits").bitwiseAND(b7) != 0)
        )
        .cast("bigint")
        .alias("parts_nations_3_and_7"),
        F.count_if(F.col("nation_bits").bitwiseAND(b3.bitwiseOR(b7)) != 0)
        .cast("bigint")
        .alias("parts_nations_3_or_7"),
        F.max("n_nations").cast("bigint").alias("max_nation_reach"),
        F.round(F.avg(F.col("n_nations").cast("double")), 4).alias(
            "avg_nation_reach"
        ),
    )
