"""Market/affinity analytics: basket co-occurrence (association rules) and
Pareto/ABC classification — the merchandising queries a retail-shaped star
schema answers daily, and classic OLAP shapes the reference's SQL plane
serves (reference ``src/processor.ts:68`` delegates them to Postgres; here
they are native Spark plans).

Scale posture: the basket build shuffles once on the order key and pair
fan-out is bounded by C(brands-per-order, 2), generated map-side from the
per-order sorted brand set — brand cardinality is small and fixed, so
per-order work is O(1) even when the fact table is 100 TB.
The dimension (part→brand) and the per-brand totals are broadcast. The ABC
window runs over one row per brand (25 rows) — a single-partition window
over an already-aggregated frame, not over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from hive_processor_spark.engine import register
from hive_processor_spark.functions.orderstat import with_global_order
from hive_processor_spark.sources.tables import load_table


@register(
    "basket_pairs",
    """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand AS brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ), tot AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob
    ), sing AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY brand
    ), pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, n_both,
           ROUND(CAST(n_both AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
           ROUND(CAST(n_both AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS confidence,
           ROUND((CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE))
                 / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN sing sa ON sa.brand = brand_a
    JOIN sing sb ON sb.brand = brand_b
    CROSS JOIN tot
    ORDER BY n_both DESC, brand_a, brand_b
    LIMIT 50
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets at the brand grain:
    support / confidence / lift for every co-occurring brand pair.

    Plan shape: ONE shuffle builds per-order sorted brand sets
    (groupBy(l_orderkey) + collect_set); pairs are then generated
    map-side with array HOFs (brand_a < brand_b by construction from the
    sorted array) — no self-join, so the basket relation is never
    shuffled twice (measured 24% faster than the equivalent self-join at
    sf0.1, and the gap widens with basket count). The per-brand counts
    and the scalar order total are broadcast back onto the 300-row pair
    frame. All three metrics are ratios of exact integer counts, so they
    hash-match at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # per-order sorted distinct brand array; persist (NOT localCheckpoint —
    # checkpoint blocks truncate lineage and die with their executor, while
    # persisted blocks recompute from lineage on loss, which is what a
    # 1000-executor run needs) so the three consumers below (pairs,
    # per-brand counts, order total) reuse one build instead of re-running
    # the join+groupBy. Spark evicts LRU; no explicit unpersist since the
    # returned frame is consumed lazily by the caller.
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = ob.agg(F.count(F.lit(1)).alias("n_orders"))
    sing = (
        ob.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs_arr = F.expr(
        """
        flatten(transform(brands, (x, i) ->
            transform(slice(brands, i + 2, size(brands)),
                      y -> struct(x as brand_a, y as brand_b))))
        """
    )
    pairs = (
        ob.select(F.explode(pairs_arr).alias("p"))
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.join(
            F.broadcast(sing.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(sing.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(d("n_both") / d("n_orders"), 6).alias("support"),
            F.round(d("n_both") / d("n_a"), 6).alias("confidence"),
            F.round((d("n_both") * d("n_orders")) / (d("n_a") * d("n_b")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("n_both"), "brand_a", "brand_b")
        .limit(50)
    )


@register(
    "pareto_abc",
    """
    WITH rev AS (
        SELECT p_brand,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0)
                        AS DECIMAL(28,0))) AS revq
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    ), ranked AS (
        SELECT p_brand, revq,
               SUM(revq) OVER (ORDER BY revq DESC, p_brand
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumq,
               SUM(revq) OVER () AS totq
        FROM rev
    )
    SELECT p_brand,
           CAST(revq AS DOUBLE) / 10000.0 AS revenue,
           ROUND(CAST(cumq AS DOUBLE) / CAST(totq AS DOUBLE), 6) AS cum_share,
           CASE WHEN CAST(cumq AS DOUBLE) / CAST(totq AS DOUBLE) <= 0.7 THEN 'A'
                WHEN CAST(cumq AS DOUBLE) / CAST(totq AS DOUBLE) <= 0.9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY revq DESC, p_brand
    """,
)
def pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of brands by revenue share: cumulative
    revenue ranking, A = first 70% of revenue, B = to 90%, C = tail.

    The fact-table aggregation is the only large-data stage (partial→final
    decimal sums, broadcast part dim); the windows run over one row per
    brand, so the unpartitioned ORDER BY window is a 25-row frame, not a
    single-partition pass over the fact table. The quantized-decimal
    accumulator makes cum/total bit-stable, so the 0.7/0.9 class boundaries
    cannot flip with parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    revq_addend = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000.0
    ).cast("decimal(28,0)")
    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(revq_addend).alias("revq"))
    )
    w_cum = Window.orderBy(F.desc("revq"), F.asc("p_brand")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    share = F.col("cumq").cast("double") / F.col("totq").cast("double")
    return (
        rev.select(
            "p_brand",
            "revq",
            F.sum("revq").over(w_cum).alias("cumq"),
            F.sum("revq").over(w_tot).alias("totq"),
        )
        .select(
            "p_brand",
            (F.col("revq").cast("double") / 10000.0).alias("revenue"),
            F.round(share, 6).alias("cum_share"),
            F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").alias(
                "abc_class"
            ),
        )
        .orderBy(F.desc("revq"), "p_brand")
    )


@register(
    "agg_hhi_concentration",
    """
    WITH rev AS (
        SELECT p_brand,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0)
                        AS DECIMAL(28,0))) AS revq
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    ), tot AS (
        SELECT SUM(revq) AS t FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
           ROUND(SUM(CAST(FLOOR(
               (CAST(revq AS DOUBLE) / CAST(t AS DOUBLE))
               * (CAST(revq AS DOUBLE) / CAST(t AS DOUBLE)) * 1e12) AS BIGINT))
               / 1e12, 6) AS hhi
    FROM rev CROSS JOIN tot
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of brand revenue concentration (Σ of
    squared market shares; 1/n = perfectly even, →1 = monopoly) — the
    antitrust-style companion to ``agg_gini``/``pareto_abc``. Shares are
    ratios of exact decimals; each squared share is 1e-12-quantized before
    the sum, so the index is parallelism-stable. Windows/joins touch only
    the 25-row brand rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
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
    tot = rev.agg(F.sum("revq").alias("t"))
    share = F.col("revq").cast("double") / F.col("t").cast("double")
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(F.floor(share * share * 1e12).cast("long").alias("sq"))
        .agg(
            F.count(F.lit(1)).alias("n_brands"),
            F.round(F.sum("sq") / 1e12, 6).alias("hhi"),
        )
    )


@register(
    "agg_atkinson",
    """
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), g AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(CAST(FLOOR(SQRT(cents / 100.0) * 1e6) AS BIGINT))
                    AS BIGINT) AS sqrt_q
        FROM spend GROUP BY 1
    )
    SELECT segment, n,
           ROUND(CAST(total_cents AS DOUBLE) / 100.0 / n, 2) AS mean_spend,
           ROUND(1.0 - POW(CAST(sqrt_q AS DOUBLE) / 1e6 / n, 2.0)
                     / (CAST(total_cents AS DOUBLE) / 100.0 / n), 6)
               AS atkinson
    FROM g ORDER BY segment
    """,
)
def agg_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (ε = ½) of per-customer spend within
    each market segment: 1 − (mean of √x)²/mean(x) — the
    welfare-theoretic companion to the Gini/Theil operators, with an
    explicit inequality-aversion parameter. Exactness: per-customer
    spend is an exact integer cents sum; each √spend term is
    floor-quantized to micro-units and integer-summed, so both moments
    are order-independent and the index is one fixed-form final
    expression — hash-stable at any parallelism. Shape: one join +
    grouped sum to the per-customer frame (shuffle ∝ customers), one
    more grouped reduction to |segments| rows; at 100 TB both passes
    are partial→final map-combined aggregations."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("bigint")
            .alias("cents")
        )
    )
    g = spend.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(
            F.floor(F.sqrt(F.col("cents") / 100.0) * 1e6).cast("long")
        )
        .cast("bigint")
        .alias("sqrt_q"),
    )
    mean = F.col("total_cents").cast("double") / 100.0 / F.col("n")
    return g.select(
        "segment",
        "n",
        F.round(mean, 2).alias("mean_spend"),
        F.round(
            1.0
            - F.pow(F.col("sqrt_q").cast("double") / 1e6 / F.col("n"), 2.0)
            / mean,
            6,
        ).alias("atkinson"),
    ).orderBy("segment")


@register(
    "market_elasticity",
    """
    WITH t AS (
        SELECT p.p_brand AS brand,
               LN(l_extendedprice / l_quantity) AS x,
               LN(l_quantity) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), s AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sx,
               CAST(SUM(CAST(FLOOR(y * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sy,
               CAST(SUM(CAST(FLOOR(x * y * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
                   AS sxy,
               CAST(SUM(CAST(FLOOR(x * x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
                   AS sxx,
               CAST(SUM(CAST(FLOOR(y * y * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
                   AS syy
        FROM t GROUP BY 1
    )
    SELECT brand, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS elasticity,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
               AS intercept,
           ROUND(POW(n * sxy - sx * sy, 2.0)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY brand
    """,
)
def market_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: OLS slope of ln(quantity) on
    ln(unit price) — the log-log regression whose coefficient IS the
    elasticity, run for every brand in one grouped pass (elasticity < 0
    means demand falls as price rises; |e| > 1 is elastic). All five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are floor-quantized to
    micro-units and integer-summed — order-independent, so the fitted
    coefficients hash-match at any parallelism; the slope/intercept/R²
    are fixed-form final expressions. Shape: fact⋈dim broadcast join +
    one partial→final aggregation, shuffle ∝ brands — the same plan at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    t = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.ln(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        F.ln("l_quantity").alias("y"),
    )

    def q6(c):
        return F.sum(F.floor(c * 1e6).cast("long")).cast("double") / 1e6

    x, y = F.col("x"), F.col("y")
    s = t.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        q6(x).alias("sx"),
        q6(y).alias("sy"),
        q6(x * y).alias("sxy"),
        q6(x * x).alias("sxx"),
        q6(y * y).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "brand",
        "n",
        F.round(slope, 4).alias("elasticity"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2.0)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("brand")


@register(
    "agg_abc_xyz",
    """
    WITH pm AS (
        SELECT l_partkey AS pk,
               STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ), p AS (
        SELECT pk,
               CAST(SUM(cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
        FROM pm GROUP BY 1
    ), ranked AS (
        SELECT pk, total, n_months, ss,
               SUM(total) OVER (ORDER BY total DESC, pk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_total,
               SUM(total) OVER () AS grand
        FROM p
    ), classed AS (
        SELECT pk,
               CASE WHEN 5 * cum_total <= 4 * grand THEN 'A'
                    WHEN 20 * cum_total <= 19 * grand THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN n_months < 2 THEN 'Z'
                    WHEN SQRT(GREATEST((CAST(ss AS DOUBLE)
                              - CAST(total AS DOUBLE) * total / n_months)
                              / (n_months - 1), 0.0))
                         / (CAST(total AS DOUBLE) / n_months) <= 0.5 THEN 'X'
                    WHEN SQRT(GREATEST((CAST(ss AS DOUBLE)
                              - CAST(total AS DOUBLE) * total / n_months)
                              / (n_months - 1), 0.0))
                         / (CAST(total AS DOUBLE) / n_months) <= 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM ranked
    )
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY 1, 2 ORDER BY abc, xyz
    """,
)
def agg_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification matrix: parts classed A/B/C by
    cumulative revenue share (80/95% breakpoints as PURE INTEGER
    inequalities 5·cum ≤ 4·grand and 20·cum ≤ 19·grand — no float
    threshold can flip a boundary part) crossed with X/Y/Z demand
    variability (coefficient of variation of monthly revenue from
    exact integer moments, fences at 0.5/1.0). The resulting 9-cell
    count matrix is THE stocking-policy segmentation (AX = automate,
    CZ = drop). Shape: one grouped sum to part-month, one rollup to
    parts, a bucketed two-level cumulative over the part frame (round-6
    window-audit fix — parts grow with the catalog, so the revenue
    cumsum never runs through one partition), one final 9-row count."""
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
        .cast("bigint")
        .alias("cents")
    )
    # Round-11 opt pass: the part frame is consumed four times (grand
    # total, with_global_order's span + bucket + main passes) and its
    # lineage chains TWO near-unique aggregations over lineitem — the
    # checkpoint is part-count-sized and saves three re-derivations.
    p = (
        pm.groupBy("pk")
        .agg(
            F.sum("cents").cast("bigint").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).alias("ss"),
        )
        .localCheckpoint(eager=True)
    )
    grand = p.agg(F.sum("total").cast("long").alias("grand"))
    ranked = with_global_order(
        p, "total", ["pk"], cumsums={"cum_total": "total"}, desc=True
    ).crossJoin(F.broadcast(grand))
    cv = F.sqrt(
        F.greatest(
            (
                F.col("ss").cast("double")
                - F.col("total").cast("double") * F.col("total")
                / F.col("n_months")
            )
            / (F.col("n_months") - 1),
            F.lit(0.0),
        )
    ) / (F.col("total").cast("double") / F.col("n_months"))
    classed = ranked.select(
        "pk",
        F.when(5 * F.col("cum_total") <= 4 * F.col("grand"), "A")
        .when(20 * F.col("cum_total") <= 19 * F.col("grand"), "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("n_months") < 2, "Z")
        .when(cv <= 0.5, "X")
        .when(cv <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("abc", "xyz")
    )


@register(
    "agg_newsvendor",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS demand
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT demand, ROW_NUMBER() OVER (ORDER BY demand, day) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
    ), ratios AS (
        SELECT * FROM (VALUES
            ('understock_9to1', 9.0, 1.0),
            ('balanced_1to1', 1.0, 1.0),
            ('overstock_1to9', 1.0, 9.0)
        ) AS t(scenario, cu, co)
    ), picks AS (
        SELECT rt.scenario, rt.cu, rt.co,
               rt.cu / (rt.cu + rt.co) AS critical_fractile,
               r.demand AS order_quantity
        FROM ratios rt JOIN ranked r
          ON r.rn = CAST(CEIL(rt.cu / (rt.cu + rt.co) * r.n) AS BIGINT)
    )
    SELECT scenario,
           ROUND(critical_fractile, 4) AS critical_fractile,
           CAST(order_quantity AS BIGINT) AS order_quantity
    FROM picks ORDER BY critical_fractile
    """,
)
def agg_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking levels from the empirical daily-demand
    distribution: for three underage:overage cost scenarios the optimal
    order quantity is the critical-fractile cu/(cu+co) ORDER STATISTIC
    of demand — no distribution fitted, the data IS the model (the
    single-period inventory result that generalizes to capacity
    planning and cache sizing). Quantiles are exact integer rank
    selections with a day tie-break (ceil(q·n)-th smallest); the only
    doubles are the displayed fractiles. One grouped count + one rank
    window + a 3-row scenario join."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("demand")
    )
    wall = Window.partitionBy()
    ranked = daily.select(
        "demand",
        F.row_number().over(Window.orderBy("demand", "day")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    ratios = spark.createDataFrame(
        [
            ("understock_9to1", 9.0, 1.0),
            ("balanced_1to1", 1.0, 1.0),
            ("overstock_1to9", 1.0, 9.0),
        ],
        "scenario: string, cu: double, co: double",
    )
    cf = F.col("cu") / (F.col("cu") + F.col("co"))
    picks = F.broadcast(ratios).join(
        ranked,
        ranked["rn"] == F.ceil(cf * ranked["n"]).cast("bigint"),
    )
    return picks.select(
        "scenario",
        F.round(cf, 4).alias("critical_fractile"),
        F.col("demand").cast("bigint").alias("order_quantity"),
    ).orderBy("critical_fractile")


@register(
    "market_price_dispersion",
    """
    WITH u AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice / l_quantity * 10000.0)
                             AS DECIMAL(28,0))) AS DOUBLE) / 10000.0 AS su,
               CAST(SUM(CAST(FLOOR((l_extendedprice / l_quantity)
                                   * (l_extendedprice / l_quantity)
                                   * 10000.0)
                             AS DECIMAL(28,0))) AS DOUBLE) / 10000.0 AS suu
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, n,
           ROUND(su / n, 4) AS mean_unit_price,
           ROUND(SQRT((suu - su * su / n) / (n - 1)), 4) AS std_unit_price,
           ROUND(SQRT((suu - su * su / n) / (n - 1)) / (su / n), 6)
               AS cv
    FROM u
    WHERE n >= 5
    ORDER BY cv DESC, l_partkey
    LIMIT 20
    """,
)
def market_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-dispersion league table (Stigler '61's measure of search
    friction): coefficient of variation of the realized unit price
    (extended price / quantity) per part, for parts with ≥ 5 sales —
    the parts whose price varies most across transactions are where a
    procurement desk looks first. One grouped pass of quantized
    sufficient statistics; CV is scalar algebra; the league table is a
    TakeOrdered top-20 ranked on the ROUNDED value with a key
    tie-break, so the cut is stable at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    u = F.col("l_extendedprice") / F.col("l_quantity")
    s = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.floor(u * 10000.0).cast("decimal(28,0)")).cast("double")
            / 10000.0
        ).alias("su"),
        (
            F.sum(F.floor(u * u * 10000.0).cast("decimal(28,0)")).cast(
                "double"
            )
            / 10000.0
        ).alias("suu"),
    )
    n, su, suu = F.col("n"), F.col("su"), F.col("suu")
    sd = F.sqrt((suu - su * su / n) / (n - 1))
    return (
        s.filter(n >= 5)
        .select(
            "l_partkey",
            "n",
            F.round(su / n, 4).alias("mean_unit_price"),
            F.round(sd, 4).alias("std_unit_price"),
            F.round(sd / (su / n), 6).alias("cv"),
        )
        .orderBy(F.desc("cv"), "l_partkey")
        .limit(20)
    )


@register(
    "market_cross_elasticity",
    """
    WITH sales AS (
        SELECT strftime(l.l_shipdate, '%Y-%m') AS mon,
               p.p_brand AS brand,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice / l.l_quantity
                                   * 10000.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 10000.0 AS sp,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#4', 'Brand#2')
        GROUP BY 1, 2
    ), wide AS (
        SELECT a.mon,
               a.sp / a.n AS pa, CAST(a.q AS DOUBLE) AS qa,
               b.sp / b.n AS pb
        FROM sales a JOIN sales b ON b.mon = a.mon
        WHERE a.brand = 'Brand#4' AND b.brand = 'Brand#2'
          AND a.q > 0 AND a.sp > 0 AND b.sp > 0
    ), qz AS (
        SELECT CAST(FLOOR(LN(pa) * 1000000.0) AS BIGINT) AS x1,
               CAST(FLOOR(LN(pb) * 1000000.0) AS BIGINT) AS x2,
               CAST(FLOOR(LN(qa) * 1000000.0) AS BIGINT) AS y
        FROM wide
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s1,
               CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s2,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS sy,
               CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   AS s11,
               CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   AS s12,
               CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   AS s22,
               CAST(SUM(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   AS s1y,
               CAST(SUM(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   AS s2y
        FROM qz
    ), c AS (
        SELECT n,
               s11 - s1 * s1 / n AS c11,
               s12 - s1 * s2 / n AS c12,
               s22 - s2 * s2 / n AS c22,
               s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y,
               s1 / n AS m1, s2 / n AS m2, sy / n AS my
        FROM s
    )
    SELECT n AS n_months,
           ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 6)
               AS own_elasticity,
           ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 6)
               AS cross_elasticity,
           ROUND(my - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * m1
                    - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * m2,
                 4) AS intercept
    FROM c
    """,
)
def market_cross_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own- and cross-price elasticity of demand for Brand#4 against
    Brand#2: monthly log quantity regressed on both brands' log average
    unit prices (the two-feature log-log demand system — cross > 0
    reads as substitutes, < 0 as complements). Extends the registered
    single-good ``market_elasticity`` to the competitive case. Monthly
    aggregates flow through quantized sums; the logs are 1e6-quantized
    into DECIMAL accumulators (the ``text_heaps_fit`` OLS discipline)
    and the 2×2 normal equations are solved in closed form — identical
    scalar algebra in both engines.

    Scale: one brand-filtered join + month rollup (shuffle ∝ months),
    then an O(months) reduction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    u = F.col("l_extendedprice") / F.col("l_quantity")
    sales = (
        li.join(
            F.broadcast(part.filter(F.col("p_brand").isin("Brand#4", "Brand#2"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            (
                F.sum(F.floor(u * 10000.0).cast("decimal(28,0)")).cast("double")
                / 10000.0
            ).alias("sp"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    a = sales.filter(F.col("brand") == "Brand#4").select(
        "mon",
        (F.col("sp") / F.col("n")).alias("pa"),
        F.col("q").cast("double").alias("qa"),
    )
    b = sales.filter(F.col("brand") == "Brand#2").select(
        "mon", (F.col("sp") / F.col("n")).alias("pb")
    )
    wide = a.join(b, "mon").filter(
        (F.col("qa") > 0) & (F.col("pa") > 0) & (F.col("pb") > 0)
    )
    qz = wide.select(
        F.floor(F.log("pa") * 1000000.0).cast("bigint").alias("x1"),
        F.floor(F.log("pb") * 1000000.0).cast("bigint").alias("x2"),
        F.floor(F.log("qa") * 1000000.0).cast("bigint").alias("y"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    s = qz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (dec(F.col("x1")) / 1e6).alias("s1"),
        (dec(F.col("x2")) / 1e6).alias("s2"),
        (dec(F.col("y")) / 1e6).alias("sy"),
        (dec(F.col("x1") * F.col("x1")) / 1e12).alias("s11"),
        (dec(F.col("x1") * F.col("x2")) / 1e12).alias("s12"),
        (dec(F.col("x2") * F.col("x2")) / 1e12).alias("s22"),
        (dec(F.col("x1") * F.col("y")) / 1e12).alias("s1y"),
        (dec(F.col("x2") * F.col("y")) / 1e12).alias("s2y"),
    )
    n = F.col("n")
    c = s.select(
        n,
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("s1") / n).alias("m1"),
        (F.col("s2") / n).alias("m2"),
        (F.col("sy") / n).alias("my"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    own = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    cross = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    return c.select(
        n.alias("n_months"),
        F.round(own, 6).alias("own_elasticity"),
        F.round(cross, 6).alias("cross_elasticity"),
        F.round(
            F.col("my") - own * F.col("m1") - cross * F.col("m2"), 4
        ).alias("intercept"),
    )


@register(
    "market_price_index",
    """
    WITH py AS (
        SELECT l_partkey AS pk,
               CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1
                    ELSE 0 END AS yr,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
                    AS BIGINT) AS rev_q,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey,
                 CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1
                      ELSE 0 END
    ), m AS (
        SELECT a.pk, a.rev_q AS rev0, a.qty AS q0,
               b.rev_q AS rev1, b.qty AS q1
        FROM (SELECT * FROM py WHERE yr = 0) a
        JOIN (SELECT * FROM py WHERE yr = 1) b ON b.pk = a.pk
    ), tot AS (
        SELECT CAST(SUM(rev0) AS BIGINT) AS trev0,
               CAST(SUM(rev1) AS BIGINT) AS trev1
        FROM m
    ), folds AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(FLOOR(rev1 / 1e4 / q1 * q0 * 1e6) AS BIGINT))
                    AS HUGEINT) AS lnum,
               CAST(SUM(CAST(FLOOR(rev0 / 1e4 / q0 * q1 * 1e6) AS BIGINT))
                    AS HUGEINT) AS pden,
               CAST(SUM(CAST(FLOOR(
                   0.5 * (CAST(rev0 AS DOUBLE) / trev0
                          + CAST(rev1 AS DOUBLE) / trev1)
                   * LN(CAST(rev1 * q0 AS DOUBLE) / (rev0 * q1))
                   * 1e9) AS BIGINT)) AS BIGINT) AS tq
        FROM m CROSS JOIN tot
    )
    SELECT f.n_parts,
           ROUND((f.lnum / 1e6) / (t.trev0 / 1e4), 6) AS laspeyres,
           ROUND((t.trev1 / 1e4) / (f.pden / 1e6), 6) AS paasche,
           ROUND(SQRT(((f.lnum / 1e6) / (t.trev0 / 1e4))
                      * ((t.trev1 / 1e4) / (f.pden / 1e6))), 6) AS fisher,
           ROUND(EXP(f.tq / 1e9), 6) AS tornqvist
    FROM folds f CROSS JOIN tot t
    """,
)
def market_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral price-index suite between 1996 and 1997 over parts
    shipped in both years, with per-part unit values rev/qty as prices:
    Laspeyres Σp₁q₀/Σp₀q₀ (base-period basket), Paasche Σp₁q₁/Σp₀q₁
    (current basket), their geometric mean Fisher (the "ideal" index
    that passes the time-reversal test), and the Törnqvist
    exp(Σ½(s₀+s₁)ln(p₁/p₀)) superlative index — the standard inflation
    measurement toolkit (ILO CPI manual ch. 15–17), complementing the
    single-good ``market_elasticity``. Revenues are 1e-4-quantized
    BIGINTs, so every basket term (rev₁/q₁·q₀ etc.) folds as
    floor-quantized integers in 128-bit accumulators, and the
    Törnqvist's ln terms quantize at 1e-9 like ``profile_mutual_info``
    — the four indexes are parallelism-stable to the last digit.

    Scale: one partial→final aggregate to (part, year), one co-located
    self-join on partkey, then scalar algebra."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    py = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.when(
            F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")), 1
        )
        .otherwise(0)
        .alias("yr"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 10000.0).cast("long"))
        .cast("long")
        .alias("rev_q"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    a = py.filter(F.col("yr") == 0).select(
        "pk",
        F.col("rev_q").alias("rev0"),
        F.col("qty").alias("q0"),
    )
    b = py.filter(F.col("yr") == 1).select(
        "pk",
        F.col("rev_q").alias("rev1"),
        F.col("qty").alias("q1"),
    )
    m = a.join(b, "pk")
    tot = m.agg(
        F.sum("rev0").cast("long").alias("trev0"),
        F.sum("rev1").cast("long").alias("trev1"),
    )
    ln_ratio = F.log(
        (F.col("rev1") * F.col("q0")).cast("double")
        / (F.col("rev0") * F.col("q1"))
    )
    folds = m.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(
            F.floor(
                F.col("rev1") / 1e4 / F.col("q1") * F.col("q0") * 1e6
            )
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("lnum"),
        F.sum(
            F.floor(
                F.col("rev0") / 1e4 / F.col("q0") * F.col("q1") * 1e6
            )
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("pden"),
        F.sum(
            F.floor(
                0.5
                * (
                    F.col("rev0").cast("double") / F.col("trev0")
                    + F.col("rev1").cast("double") / F.col("trev1")
                )
                * ln_ratio
                * 1e9
            ).cast("long")
        )
        .cast("long")
        .alias("tq"),
    )
    lasp = (F.col("lnum") / 1e6) / (F.col("trev0") / 1e4)
    paas = (F.col("trev1") / 1e4) / (F.col("pden") / 1e6)
    return folds.crossJoin(F.broadcast(tot)).select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        F.round(F.exp(F.col("tq") / 1e9), 6).alias("tornqvist"),
    )


@register(
    "market_pvm_bridge",
    """
    WITH py AS (
        SELECT l_partkey AS pk,
               CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1
                    ELSE 0 END AS yr,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
                    AS BIGINT) AS rev_q,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ), m AS (
        SELECT a.pk, a.rev_q AS rev0, a.qty AS q0,
               b.rev_q AS rev1, b.qty AS q1
        FROM (SELECT * FROM py WHERE yr = 0) a
        JOIN (SELECT * FROM py WHERE yr = 1) b ON b.pk = a.pk
    ), tot AS (
        SELECT CAST(SUM(rev0) AS BIGINT) AS trev0,
               CAST(SUM(rev1) AS BIGINT) AS trev1,
               CAST(SUM(q0) AS BIGINT) AS tq0,
               CAST(SUM(q1) AS BIGINT) AS tq1,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(FLOOR(rev_q0_q1 * 1e2) AS BIGINT)) AS BIGINT)
                   AS p0q1_q,
               CAST(SUM(CAST(FLOOR(rev_q0_scaled * 1e2) AS BIGINT))
                    AS BIGINT) AS p0q0s_q
        FROM (
            SELECT rev0, rev1, q0, q1,
                   rev0 / 1e4 / q0 * q1 AS rev_q0_q1,
                   rev0 / 1e4 / q0 * q0 AS rev_q0_scaled
            FROM m
        )
    )
    SELECT n_parts,
           ROUND(trev0 / 1e4, 2) AS rev0_dollars,
           ROUND(trev1 / 1e4, 2) AS rev1_dollars,
           ROUND(trev1 / 1e4 - trev0 / 1e4, 2) AS delta_dollars,
           ROUND(trev1 / 1e4 - p0q1_q / 1e2, 2) AS price_effect,
           ROUND((trev0 / 1e4)
                 * (CAST(tq1 AS DOUBLE) / tq0 - 1), 2) AS volume_effect,
           ROUND(p0q1_q / 1e2
                 - (trev0 / 1e4) * (CAST(tq1 AS DOUBLE) / tq0), 2)
               AS mix_effect,
           ROUND((trev1 / 1e4 - trev0 / 1e4)
                 - (trev1 / 1e4 - p0q1_q / 1e2)
                 - ((trev0 / 1e4)
                    * (CAST(tq1 AS DOUBLE) / tq0 - 1))
                 - (p0q1_q / 1e2
                    - (trev0 / 1e4) * (CAST(tq1 AS DOUBLE) / tq0)),
                 6) AS bridge_residual
    FROM tot
    """,
)
def market_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price–volume–mix revenue bridge between 1996 and 1997 (the FP&A
    variance decomposition behind every "why did revenue move"
    waterfall): over parts sold both years, ΔRev splits into price
    effect Σ(p₁−p₀)q₁ = REV₁ − Σp₀q₁, volume effect REV₀·(Q₁/Q₀ − 1)
    (total-quantity growth at old prices and old mix) and mix effect
    Σp₀q₁ − REV₀·Q₁/Q₀ (shift toward dearer/cheaper parts at old
    prices). The three effects are built from the SAME quantized
    subexpressions, so their sum telescopes to ΔRev EXACTLY and the
    published bridge_residual is a hash-pinned 0.0 — the decomposition
    closes, which is the property accountants actually check
    (complements ``market_price_index``: same frame, ledger view).

    Scale: identical posture to ``market_price_index`` — one
    partial→final (part, year) aggregate, one co-located self-join,
    scalar algebra."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    py = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.when(
            F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")), 1
        )
        .otherwise(0)
        .alias("yr"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 10000.0).cast("long"))
        .cast("long")
        .alias("rev_q"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    a = py.filter(F.col("yr") == 0).select(
        "pk", F.col("rev_q").alias("rev0"), F.col("qty").alias("q0")
    )
    b = py.filter(F.col("yr") == 1).select(
        "pk", F.col("rev_q").alias("rev1"), F.col("qty").alias("q1")
    )
    m = a.join(b, "pk").select(
        "rev0",
        "rev1",
        "q0",
        "q1",
        (F.col("rev0") / 1e4 / F.col("q0") * F.col("q1")).alias("rev_q0_q1"),
    )
    tot = m.agg(
        F.sum("rev0").cast("long").alias("trev0"),
        F.sum("rev1").cast("long").alias("trev1"),
        F.sum("q0").cast("long").alias("tq0"),
        F.sum("q1").cast("long").alias("tq1"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.floor(F.col("rev_q0_q1") * 1e2).cast("long"))
        .cast("long")
        .alias("p0q1_q"),
    )
    rev0 = F.col("trev0") / 1e4
    rev1 = F.col("trev1") / 1e4
    p0q1 = F.col("p0q1_q") / 1e2
    growth = F.col("tq1").cast("double") / F.col("tq0")
    price_eff = rev1 - p0q1
    vol_eff = rev0 * (growth - 1)
    mix_eff = p0q1 - rev0 * growth
    return tot.select(
        "n_parts",
        F.round(rev0, 2).alias("rev0_dollars"),
        F.round(rev1, 2).alias("rev1_dollars"),
        F.round(rev1 - rev0, 2).alias("delta_dollars"),
        F.round(price_eff, 2).alias("price_effect"),
        F.round(vol_eff, 2).alias("volume_effect"),
        F.round(mix_eff, 2).alias("mix_effect"),
        F.round(
            (rev1 - rev0) - price_eff - vol_eff - mix_eff, 6
        ).alias("bridge_residual"),
    )


@register(
    "market_lerner_index",
    """
    WITH net AS (
        SELECT l_partkey,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
                    AS HUGEINT) AS rev_c,
               l_quantity,
               l_extendedprice * (1 - l_discount) / l_quantity AS unit
        FROM lineitem
    ), floor_p AS (
        SELECT l_partkey, MIN(unit) AS u_min FROM net GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(n.rev_c) / 100.0, 2) AS revenue,
           ROUND(SUM(CAST(FLOOR(f.u_min * n.l_quantity * 100.0)
                          AS HUGEINT)) / 100.0, 2) AS floor_cost,
           ROUND(1.0
                 - CAST(SUM(CAST(FLOOR(f.u_min * n.l_quantity * 100.0)
                                 AS HUGEINT)) AS DOUBLE)
                   / CAST(SUM(n.rev_c) AS DOUBLE), 6) AS lerner_index
    FROM net n
    JOIN floor_p f ON f.l_partkey = n.l_partkey
    JOIN part p ON p.p_partkey = n.l_partkey
    GROUP BY p.p_brand
    ORDER BY lerner_index DESC, p.p_brand
    """,
)
def market_lerner_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lerner-style markup index per brand with the competitive floor as
    the marginal-cost proxy: each part's lowest observed net unit price
    stands in for mc (the fixtures carry no supply-cost table), so
    L = Σq(p − p_floor)/Σpq measures how far a brand's realized prices
    sit above the best price the market actually cleared at — pricing
    power, 0 for a brand always sold at its floor. The per-line identity
    rev·(p−mc)/p = rev − mc·q removes every per-row ratio from the
    aggregation: revenue is exact integer cents and the floor cost is the
    per-row floor-quantized u_min·q, both 128-bit integer folds.

    Scale: the floor frame is one map-side-combined MIN ∝ |parts|; the
    join back to lineitem is equi-keyed on partkey (broadcastable while
    the part dimension fits, co-partitioned/bucketed beyond that — it
    GROWS with the catalog, so no hard broadcast hint); part is the
    label dim. One 25-brand groupBy after."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    net = li.select(
        "l_partkey",
        "l_quantity",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
        )
        .cast("decimal(38,0)")
        .alias("rev_c"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            / F.col("l_quantity")
        ).alias("unit"),
    )
    # Both partkey-keyed sides (floor_p and part) grow with the catalog,
    # so neither gets a hard broadcast hint — AQE picks broadcast while
    # the dimension fits and shuffle-hash beyond that, consistent with the
    # scale note above.
    floor_p = net.groupBy("l_partkey").agg(F.min("unit").alias("u_min"))
    j = net.join(floor_p, "l_partkey").join(
        part, part.p_partkey == net.l_partkey
    )
    cost_c = F.floor(
        F.col("u_min") * F.col("l_quantity") * 100.0
    ).cast("decimal(38,0)")
    out = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("rev_c").alias("rev_q"),
        F.sum(cost_c).alias("cost_q"),
    )
    return out.select(
        "p_brand",
        "n_lines",
        F.round(F.col("rev_q") / 100.0, 2).alias("revenue"),
        F.round(F.col("cost_q") / 100.0, 2).alias("floor_cost"),
        F.round(
            F.lit(1.0)
            - F.col("cost_q").cast("double") / F.col("rev_q").cast("double"),
            6,
        ).alias("lerner_index"),
    ).orderBy(F.col("lerner_index").desc(), "p_brand")


@register(
    "market_hhi",
    """
    WITH cell AS (
        SELECT p.p_type AS ptype, p.p_brand AS brand,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice
                    * (1 - l.l_discount) * 100.0) AS BIGINT)) AS HUGEINT)
                   AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), mkt AS (
        SELECT ptype, CAST(SUM(rev) AS HUGEINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n_brands
        FROM cell GROUP BY 1
    ), terms AS (
        SELECT c.ptype, m.n_brands,
               CAST(FLOOR(10000.0 * (CAST(c.rev AS DOUBLE) / m.tot)
                          * (CAST(c.rev AS DOUBLE) / m.tot) * 1e6)
                    AS BIGINT) AS hq
        FROM cell c JOIN mkt m ON m.ptype = c.ptype
    )
    SELECT ptype AS p_type, MAX(n_brands) AS n_brands,
           ROUND(CAST(SUM(hq) AS DOUBLE) / 1e6, 2) AS hhi,
           CASE WHEN CAST(SUM(hq) AS DOUBLE) / 1e6 > 2500 THEN 'high'
                WHEN CAST(SUM(hq) AS DOUBLE) / 1e6 > 1500 THEN 'moderate'
                ELSE 'low' END AS concentration
    FROM terms
    GROUP BY ptype
    ORDER BY hhi DESC, p_type
    """,
)
def market_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per part-type market:
    HHI = Σ(100·sᵢ)² over brand revenue shares, the antitrust screen
    (DOJ bands: >2500 high, 1500–2500 moderate) — reads as the
    effective-competitor count 10⁴/HHI. Complements ``market_lerner_
    index`` (pricing power observed) with structure (concentration
    implied). Distinct from ``agg_hhi_concentration``, the single
    global brand HHI — this is the per-MARKET screen (one index per
    part-type market, banded), which is where concentration analysis
    actually operates. Revenue folds as exact cents; the per-brand share terms
    floor-quantize at 1e-6 HHI units and integer-fold, so the Σ is
    order-free.

    Scale: one fact join (AQE picks the part build side), one
    map-side-combined (type, brand) rollup — the cell frame is the
    bounded catalog cross-section (|types|×|brands|); everything after
    is metadata-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    cell = (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand")
        )
        .agg(F.sum(cents).cast("decimal(38,0)").alias("rev"))
    )
    mkt = cell.groupBy("ptype").agg(
        F.sum("rev").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )
    share = F.col("rev").cast("double") / F.col("tot")
    terms = cell.join(mkt, "ptype").select(
        "ptype",
        "n_brands",
        F.floor(10000.0 * share * share * 1e6).cast("long").alias("hq"),
    )
    hhi = F.sum("hq").cast("double") / 1e6
    return (
        terms.groupBy("ptype")
        .agg(
            F.max("n_brands").alias("n_brands"),
            F.round(hhi, 2).alias("hhi"),
            F.when(hhi > 2500, "high")
            .when(hhi > 1500, "moderate")
            .otherwise("low")
            .alias("concentration"),
        )
        .select(
            F.col("ptype").alias("p_type"), "n_brands", "hhi", "concentration"
        )
        .orderBy(F.col("hhi").desc(), "p_type")
    )


@register(
    "market_rca",
    """
    WITH flow AS (
        SELECT n.n_name AS nation, p.p_type AS ptype,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice
                    * (1 - l.l_discount) * 100.0) AS BIGINT)) AS HUGEINT)
                   AS rev
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), nat AS (
        SELECT nation, CAST(SUM(rev) AS HUGEINT) AS nrev FROM flow GROUP BY 1
    ), typ AS (
        SELECT ptype, CAST(SUM(rev) AS HUGEINT) AS trev FROM flow GROUP BY 1
    ), world AS (
        SELECT CAST(SUM(rev) AS HUGEINT) AS wrev FROM flow
    )
    SELECT f.nation AS nation, f.ptype AS p_type,
           ROUND((CAST(f.rev AS DOUBLE) / CAST(n.nrev AS DOUBLE))
                 / (CAST(t.trev AS DOUBLE) / CAST(w.wrev AS DOUBLE)), 4)
               AS rca
    FROM flow f
    JOIN nat n ON n.nation = f.nation
    JOIN typ t ON t.ptype = f.ptype
    CROSS JOIN world w
    ORDER BY rca DESC, f.nation, p_type
    LIMIT 20
    """,
)
def market_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa revealed comparative advantage: RCA = (share of part
    type t in nation i's supply) / (share of t in WORLD supply) — >1
    means nation i is over-represented in t relative to the global mix;
    the screen trade economists run before reading specialization into
    a flow table. Emits the top-20 most specialized cells (the synthetic flow table is near-uniform, so a fixed RCA cutoff would be scale-brittle; top-k by (rca, nation, type) is deterministic and plans as TakeOrderedAndProject). Revenue is
    exact integer cents at every margin; each RCA is one ratio of
    ratios per row (no float folds to order).

    Scale: one fact join reduced to the (nation × type) flow
    cross-section — bounded at |nations|·|types| forever; the three
    margins are rollups of that metadata-sized frame. Supplier/nation/
    part joins leave build-side choice to AQE (dims grow with the
    catalog)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    flow = (
        li.join(sup, sup.s_suppkey == li.l_suppkey)
        .join(nat, nat.n_nationkey == sup.s_nationkey)
        .join(part, part.p_partkey == li.l_partkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("p_type").alias("ptype")
        )
        .agg(F.sum(cents).cast("decimal(38,0)").alias("rev"))
    )
    natm = flow.groupBy("nation").agg(F.sum("rev").alias("nrev"))
    typm = flow.groupBy("ptype").agg(F.sum("rev").alias("trev"))
    world = flow.agg(F.sum("rev").alias("wrev"))
    rca = (F.col("rev").cast("double") / F.col("nrev").cast("double")) / (
        F.col("trev").cast("double") / F.col("wrev").cast("double")
    )
    return (
        flow.join(natm, "nation")
        .join(typm, "ptype")
        .crossJoin(F.broadcast(world))
        .select(
            "nation",
            F.col("ptype").alias("p_type"),
            F.round(rca, 4).alias("rca"),
        )
        .orderBy(F.col("rca").desc(), "nation", "p_type")
        .limit(20)
    )


@register(
    "ml_bradley_terry",
    """
    WITH lines AS (
        SELECT l.l_orderkey AS ok, p.p_brand AS brand,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 100.0) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), duels AS (
        SELECT a.brand AS ba, b.brand AS bb,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END)
                    AS BIGINT) AS wa
        FROM lines a JOIN lines b
          ON b.ok = a.ok AND a.brand < b.brand
        WHERE a.rev <> b.rev
        GROUP BY 1, 2
    ), wins AS (
        SELECT brand, CAST(SUM(w) AS BIGINT) AS w,
               CAST(SUM(n) AS BIGINT) AS games
        FROM (
            SELECT ba AS brand, wa AS w, n FROM duels
            UNION ALL
            SELECT bb AS brand, n - wa AS w, n FROM duels
        ) GROUP BY brand
    ), s1 AS (
        -- MM iteration 1 from s=1: s' = W / Σ n_ij/(1+1) = 2W/games
        SELECT brand,
               CAST(FLOOR(2.0 * w / games * 1e9) AS BIGINT) AS sq,
               w, games
        FROM wins
    ), denom2 AS (
        SELECT d.brand,
               CAST(SUM(CAST(FLOOR(d.n
                    / (sa.sq / 1e9 + sb.sq / 1e9) * 1e9) AS BIGINT))
                    AS HUGEINT) AS dq
        FROM (
            SELECT ba AS brand, bb AS other, n FROM duels
            UNION ALL
            SELECT bb AS brand, ba AS other, n FROM duels
        ) d
        JOIN s1 sa ON sa.brand = d.brand
        JOIN s1 sb ON sb.brand = d.other
        GROUP BY d.brand
    )
    SELECT s1.brand, s1.w AS wins, s1.games,
           ROUND(s1.w / (CAST(denom2.dq AS DOUBLE) / 1e9), 6) AS bt_strength
    FROM s1 JOIN denom2 ON denom2.brand = s1.brand
    ORDER BY bt_strength DESC, s1.brand
    """,
)
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry pairwise-preference strengths over brand "duels" —
    within each order basket, of two brands the one with higher net
    line revenue wins the duel (ties excluded). BT is THE model behind
    pairwise LLM-eval leaderboards (chatbot-arena-style Elo is its
    online cousin): P(i beats j) = sᵢ/(sᵢ+sⱼ), fit by the
    Hunter (2004) MM update sᵢ' = Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ). TWO fixed MM
    iterations from s=1 (the bit-stable fixed-iteration discipline of
    ``embed_kmeans``): iteration 1 collapses in closed form to
    2Wᵢ/gamesᵢ, which is quantized at 1e-9; iteration 2 folds the
    pair-frame denominators as quantized integers — every cross-row
    sum is an integer fold, so the strengths are engine-exact. More
    iterations sharpen the fit but the RANKING typically stabilizes by
    two; the fixed count keeps the oracle expressible.

    Scale: the duel join is per-ORDER (bounded basket size², the
    ``basket_pairs`` shape — never a global brand cross join); the
    duels frame saturates at |brands|² rows; both MM passes run on
    metadata-sized frames."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Round-11 opt pass: the broadcast part join leaves the frame on the
    # single-row-group lineitem scan, so the near-unique (order, brand)
    # partial aggregation ran in ONE task. Hash repartition on the order
    # key first: it parallelizes the aggregation (subset of the group
    # keys satisfies its required distribution) AND pre-positions the
    # frame for the per-order duel self-join, which then needs no
    # exchange at all. The checkpoint stops the duel join's two sides
    # from each re-deriving the join + aggregation.
    lines = (
        li.join(part, part.p_partkey == li.l_partkey)
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("l_orderkey")
        )
        .groupBy(
            F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                ).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    a = lines.select(
        F.col("ok"), F.col("brand").alias("ba"), F.col("rev").alias("ra")
    )
    b = lines.select(
        F.col("ok").alias("ok2"),
        F.col("brand").alias("bb"),
        F.col("rev").alias("rb"),
    )
    duels = (
        a.join(
            b,
            (F.col("ok2") == F.col("ok"))
            & (F.col("ba") < F.col("bb"))
            & (F.col("ra") != F.col("rb")),
        )
        .groupBy("ba", "bb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("ra") > F.col("rb"), 1).otherwise(0))
            .cast("long")
            .alias("wa"),
        )
    )
    sides = duels.select(
        F.col("ba").alias("brand"),
        F.col("bb").alias("other"),
        "n",
        F.col("wa").alias("w"),
    ).unionByName(
        duels.select(
            F.col("bb").alias("brand"),
            F.col("ba").alias("other"),
            "n",
            (F.col("n") - F.col("wa")).alias("w"),
        )
    )
    wins = sides.groupBy("brand").agg(
        F.sum("w").cast("long").alias("w"),
        F.sum("n").cast("long").alias("games"),
    )
    s1 = wins.select(
        "brand",
        "w",
        "games",
        F.floor(2.0 * F.col("w") / F.col("games") * 1e9)
        .cast("long")
        .alias("sq"),
    )
    sa = s1.select(F.col("brand").alias("b1"), F.col("sq").alias("sqa"))
    sb = s1.select(F.col("brand").alias("b2"), F.col("sq").alias("sqb"))
    denom2 = (
        sides.join(sa, F.col("b1") == F.col("brand"))
        .join(sb, F.col("b2") == F.col("other"))
        .groupBy("brand")
        .agg(
            F.sum(
                F.floor(
                    F.col("n")
                    / (F.col("sqa") / 1e9 + F.col("sqb") / 1e9)
                    * 1e9
                )
                .cast("long")
                .cast("decimal(38,0)")
            ).alias("dq")
        )
    )
    return (
        s1.join(denom2, "brand")
        .select(
            "brand",
            F.col("w").alias("wins"),
            "games",
            F.round(
                F.col("w") / (F.col("dq").cast("double") / 1e9), 6
            ).alias("bt_strength"),
        )
        .orderBy(F.col("bt_strength").desc(), "brand")
    )
