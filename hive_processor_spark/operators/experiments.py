"""Experimentation analytics: A/B assignment checks, variance-reduced
estimators, and nonparametric trend inference — the "did the treatment
move the metric" family a product analytics engine serves constantly
(dispatched through the registry surface the reference exposes via
``Processor.call``, reference ``src/processor.ts:57-89``; the reference
delegates all such SQL to Postgres, here they are native Spark plans).

Every estimator here reduces to one per-unit aggregation (shuffle keyed on
the experimental unit — user or month) followed by a tiny global/per-arm
reduction, so the 100 TB shape is partial→final aggregation with at most a
broadcast of O(1) global statistics back onto the per-unit frame. No
iteration, no driver-side math.

Determinism discipline (engine docstring + functions/exact.py): every
data-dependent double sum is floor-quantized into a DECIMAL accumulator, so
arm means / covariances / test statistics are bit-identical at any
parallelism and hash-match DuckDB. Squares are spelled ``x * x`` (never
``pow``) because IEEE multiplication is correctly rounded in every engine
while ``pow(x, 2)`` is only ≤1-ulp in some libms. Arm assignment is a pure
arithmetic hash — ``(user_id * 2654435761) mod 2^32 mod 2`` (Knuth
multiplicative) — identical int64 math in both engines, no engine RNG
anywhere (ids beyond ~3.4e9 would need a pre-mod to stay inside int64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.orderstat import ntile_expr, with_global_order
from hive_processor_spark.functions.exact import dsum, sql_dsum
from hive_processor_spark.sources.tables import load_table

_ARM_SQL = "((user_id * 2654435761) % 4294967296) % 2"

#: Pre/post experiment boundary inside the fixture's event window.
_CUT = "2024-01-15"


def _arm() -> Column:
    return ((F.col("user_id") * 2654435761) % 4294967296 % 2).cast("int")


@register(
    "ab_srm_check",
    f"""
    WITH a AS (
        SELECT CAST({_ARM_SQL} AS INT) AS arm,
               COUNT(DISTINCT user_id) AS users
        FROM events GROUP BY 1
    ), w AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN users END) AS BIGINT) AS control,
               CAST(SUM(CASE WHEN arm = 1 THEN users END) AS BIGINT) AS treatment,
               CAST(SUM(users) AS DOUBLE) AS n
        FROM a
    )
    SELECT control, treatment,
           ROUND((control - n / 2) * (control - n / 2) / (n / 2)
                 + (treatment - n / 2) * (treatment - n / 2) / (n / 2), 6)
               AS chi2,
           ((control - n / 2) * (control - n / 2) / (n / 2)
            + (treatment - n / 2) * (treatment - n / 2) / (n / 2)) > 3.841
               AS srm
    FROM w
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: hash users into two arms and
    chi-square-test the split against the designed 50/50 — the first check
    every experiment readout runs, because a biased assignment invalidates
    everything downstream. One distinct-count aggregation (shuffle keyed on
    user) collapsing to a 1-row chi-square; at 100 TB the distinct-count is
    the only real stage and it partial-aggregates map-side."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.groupBy(_arm().alias("arm")).agg(
        F.countDistinct("user_id").alias("users")
    )
    w = a.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, F.col("users"))).cast("bigint").alias("control"),
        F.sum(F.when(F.col("arm") == 1, F.col("users"))).cast("bigint").alias("treatment"),
        F.sum("users").cast("double").alias("n"),
    )
    dc = F.col("control") - F.col("n") / 2
    dt = F.col("treatment") - F.col("n") / 2
    chi = dc * dc / (F.col("n") / 2) + dt * dt / (F.col("n") / 2)
    return w.select(
        "control",
        "treatment",
        F.round(chi, 6).alias("chi2"),
        (chi > 3.841).alias("srm"),
    )


_PRE_CASE = f"CASE WHEN ts < TIMESTAMP '{_CUT}' THEN value ELSE 0 END"
_POST_CASE = f"CASE WHEN ts >= TIMESTAMP '{_CUT}' THEN value ELSE 0 END"

_SQL_PREPOST = f"""
        SELECT user_id, CAST({_ARM_SQL} AS INT) AS arm,
               {sql_dsum(_PRE_CASE, 4)} AS x,
               {sql_dsum(_POST_CASE, 4)} AS y
        FROM events GROUP BY user_id
"""

_ADJ = "(y - theta * (x - xbar))"


@register(
    "ab_cuped_adjust",
    f"""
    WITH u AS ({_SQL_PREPOST}
    ), g AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_dsum('x', 4)} AS sx, {sql_dsum('y', 4)} AS sy,
               {sql_dsum('x * x', 2)} AS sxx, {sql_dsum('x * y', 2)} AS sxy
        FROM u
    ), t AS (
        SELECT sx / n AS xbar,
               (sxy - sx * sy / n) / NULLIF(sxx - sx * sx / n, 0) AS theta
        FROM g
    )
    SELECT u.arm,
           CAST(COUNT(*) AS BIGINT) AS users,
           ROUND({sql_dsum('y', 4)} / COUNT(*), 6) AS mean_raw,
           ROUND({sql_dsum(_ADJ, 4)} / COUNT(*), 6) AS mean_cuped,
           ROUND(({sql_dsum('y * y', 2)}
                  - {sql_dsum('y', 4)} * {sql_dsum('y', 4)} / COUNT(*))
                 / (COUNT(*) - 1), 4) AS var_raw,
           ROUND(({sql_dsum(_ADJ + ' * ' + _ADJ, 2)}
                  - {sql_dsum(_ADJ, 4)} * {sql_dsum(_ADJ, 4)} / COUNT(*))
                 / (COUNT(*) - 1), 4) AS var_cuped
    FROM u, t
    GROUP BY u.arm, t.theta, t.xbar
    ORDER BY u.arm
    """,
)
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): per-user post-period
    metric ``y`` adjusted by the pre-period covariate ``x`` with
    ``theta = cov(x,y)/var(x)`` — the standard way to shrink experiment
    confidence intervals without more traffic. Per-arm raw vs adjusted
    means and variances. Plan: one user-keyed aggregation, a 1-row global
    moment pass, theta broadcast back via cross join, then a 2-row per-arm
    reduction — at 100 TB only the first stage touches the data. All
    moments are floor-quantized sums, so theta (and hence every adjusted
    value) is the same IEEE double in both engines."""
    ev = load_table(spark, sf_dir, "events")
    pre = F.col("ts") < F.lit(_CUT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        dsum(F.when(pre, F.col("value")).otherwise(0.0), 4).alias("x"),
        dsum(F.when(~pre, F.col("value")).otherwise(0.0), 4).alias("y"),
    ).withColumn("arm", _arm())
    g = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", 4).alias("sx"),
        dsum("y", 4).alias("sy"),
        dsum(F.col("x") * F.col("x"), 2).alias("sxx"),
        dsum(F.col("x") * F.col("y"), 2).alias("sxy"),
    ).select(
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / F.nullif(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"), F.lit(0.0)
            )
        ).alias("theta"),
    )
    adj = F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))
    cnt = F.count(F.lit(1))
    sy, sadj = dsum("y", 4), dsum(adj, 4)
    return (
        u.crossJoin(F.broadcast(g))
        .groupBy("arm")
        .agg(
            cnt.cast("bigint").alias("users"),
            F.round(sy / cnt, 6).alias("mean_raw"),
            F.round(sadj / cnt, 6).alias("mean_cuped"),
            F.round(
                (dsum(F.col("y") * F.col("y"), 2) - sy * sy / cnt) / (cnt - 1), 4
            ).alias("var_raw"),
            F.round(
                (dsum(adj * adj, 2) - sadj * sadj / cnt) / (cnt - 1), 4
            ).alias("var_cuped"),
        )
        .orderBy("arm")
    )


@register(
    "ab_delta_method_ratio",
    f"""
    WITH u AS (
        SELECT user_id, CAST({_ARM_SQL} AS INT) AS arm,
               {sql_dsum('value', 4)} AS y,
               CAST(COUNT(*) AS DOUBLE) AS k
        FROM events GROUP BY user_id
    ), m AS (
        SELECT arm,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_dsum('y', 4)} AS sy, {sql_dsum('k', 0)} AS sk,
               {sql_dsum('y * y', 2)} AS syy,
               {sql_dsum('y * k', 2)} AS syk,
               {sql_dsum('k * k', 0)} AS skk
        FROM u GROUP BY arm
    )
    SELECT arm,
           CAST(n AS BIGINT) AS users,
           ROUND(sy / sk, 6) AS ratio,
           ROUND(SQRT(GREATEST(
               ((syy - sy * sy / n)
                - 2 * (sy / sk) * (syk - sy * sk / n)
                + (sy / sk) * (sy / sk) * (skk - sk * sk / n))
               / (n - 1) / n / ((sk / n) * (sk / n)), 0)), 6) AS se
    FROM m ORDER BY arm
    """,
)
def ab_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric standard error via the delta method (value per event,
    per arm): users are the randomization unit, so naive per-event SEs are
    wrong — Var(ȳ/k̄) ≈ (s_y² − 2R s_yk + R² s_k²)/(n k̄²) is the textbook
    correction every experimentation platform applies. One user-keyed
    aggregation then a per-arm moment reduction; all five moments are
    floor-quantized so R and the SE are bit-stable. GREATEST(·,0) guards
    the tiny negative exact algebra can produce when variance is ~0."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            dsum("value", 4).alias("y"),
            F.count(F.lit(1)).cast("double").alias("k"),
        )
        .withColumn("arm", _arm())
    )
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("y", 4).alias("sy"),
        dsum("k", 0).alias("sk"),
        dsum(F.col("y") * F.col("y"), 2).alias("syy"),
        dsum(F.col("y") * F.col("k"), 2).alias("syk"),
        dsum(F.col("k") * F.col("k"), 0).alias("skk"),
    )
    n, sy, sk = F.col("n"), F.col("sy"), F.col("sk")
    ratio = sy / sk
    num = (
        (F.col("syy") - sy * sy / n)
        - 2 * ratio * (F.col("syk") - sy * sk / n)
        + ratio * ratio * (F.col("skk") - sk * sk / n)
    )
    se = F.sqrt(
        F.greatest(num / (n - 1) / n / ((sk / n) * (sk / n)), F.lit(0.0))
    )
    return m.select(
        "arm",
        n.cast("bigint").alias("users"),
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
    ).orderBy("arm")


@register(
    "ab_diff_in_diff",
    f"""
    WITH c AS (
        SELECT CAST({_ARM_SQL} AS INT) AS arm,
               (ts >= TIMESTAMP '{_CUT}') AS post,
               {sql_dsum('value', 4)} AS sv,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT ROUND(SUM(CASE WHEN arm = 0 AND NOT post THEN sv END)
                     / SUM(CASE WHEN arm = 0 AND NOT post THEN n END), 6)
                   AS control_pre,
               ROUND(SUM(CASE WHEN arm = 0 AND post THEN sv END)
                     / SUM(CASE WHEN arm = 0 AND post THEN n END), 6)
                   AS control_post,
               ROUND(SUM(CASE WHEN arm = 1 AND NOT post THEN sv END)
                     / SUM(CASE WHEN arm = 1 AND NOT post THEN n END), 6)
                   AS treat_pre,
               ROUND(SUM(CASE WHEN arm = 1 AND post THEN sv END)
                     / SUM(CASE WHEN arm = 1 AND post THEN n END), 6)
                   AS treat_post
        FROM c
    )
    SELECT control_pre, control_post, treat_pre, treat_post,
           ROUND((treat_post - treat_pre) - (control_post - control_pre), 6)
               AS did
    FROM m
    """,
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 difference-in-differences: per-event mean value in each
    (arm × pre/post) cell, DiD = (T_post − T_pre) − (C_post − C_pre) —
    the estimator of record when assignment isn't random but trends are
    parallel. One 4-group quantized aggregation, then a 1-row pivot via
    conditional sums; cell means are ratios of exact sums, so the DiD is
    bit-stable. The heavy stage is a single partial→final pass at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        _arm().alias("arm"),
        (F.col("ts") >= F.lit(_CUT).cast("timestamp")).alias("post"),
    ).agg(dsum("value", 4).alias("sv"), F.count(F.lit(1)).alias("n"))

    def cell(arm: int, post: bool) -> Column:
        cond = (F.col("arm") == arm) & (F.col("post") == F.lit(post))
        return F.round(
            F.sum(F.when(cond, F.col("sv"))) / F.sum(F.when(cond, F.col("n"))), 6
        )

    m = c.groupBy().agg(
        cell(0, False).alias("control_pre"),
        cell(0, True).alias("control_post"),
        cell(1, False).alias("treat_pre"),
        cell(1, True).alias("treat_post"),
    )
    return m.select(
        "*",
        F.round(
            (F.col("treat_post") - F.col("treat_pre"))
            - (F.col("control_post") - F.col("control_pre")),
            6,
        ).alias("did"),
    )


_SQL_MONTHLY = f"""
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS m,
               {sql_dsum('o_totalprice', 2)} AS rev
        FROM orders GROUP BY 1
"""

_MK_Z = """CASE WHEN s_stat > 0 THEN (s_stat - 1) / SQRT(var_s)
                WHEN s_stat < 0 THEN (s_stat + 1) / SQRT(var_s)
                ELSE 0.0 END"""


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int").alias("m")
    ).agg(dsum("o_totalprice", 2).alias("rev"))


@register(
    "agg_mann_kendall",
    f"""
    WITH s AS ({_SQL_MONTHLY}
    ), p AS (
        SELECT CASE WHEN b.rev > a.rev THEN 1
                    WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
        FROM s a JOIN s b ON b.m > a.m
    ), agg AS (
        SELECT CAST((SELECT COUNT(*) FROM s) AS DOUBLE) AS n,
               CAST(SUM(sgn) AS BIGINT) AS s_stat
        FROM p
    ), v AS (
        SELECT n, s_stat, n * (n - 1) * (2 * n + 5) / 18.0 AS var_s FROM agg
    )
    SELECT CAST(n AS INT) AS n_periods, s_stat,
           ROUND(var_s, 6) AS var_s,
           ROUND({_MK_Z}, 6) AS z,
           CASE WHEN ({_MK_Z}) > 1.96 THEN 'increasing'
                WHEN ({_MK_Z}) < -1.96 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM v
    """,
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on the monthly revenue series: S = sum over
    i<j of sign(x_j − x_i), variance via the no-ties closed form,
    continuity-corrected z — the nonparametric "is this KPI actually
    trending" test (monotone, no normality assumption). The pair join runs
    over the ~80-row *aggregated* series, so at 100 TB the only data-sized
    stage is the monthly rollup; the O(months²) part is constant-sized.
    Signs are exact ints over quantized sums."""
    s = _monthly_revenue(spark, sf_dir)
    a, b = s.alias("a"), s.alias("b")
    p = a.join(b, F.col("b.m") > F.col("a.m")).select(
        F.when(F.col("b.rev") > F.col("a.rev"), 1)
        .when(F.col("b.rev") < F.col("a.rev"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    agg = p.agg(F.sum("sgn").cast("bigint").alias("s_stat")).crossJoin(
        s.agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    n, s_stat = F.col("n"), F.col("s_stat")
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    v = agg.select("n", "s_stat", var_s.alias("var_s"))
    z = (
        F.when(s_stat > 0, (s_stat - 1) / F.sqrt(F.col("var_s")))
        .when(s_stat < 0, (s_stat + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return v.select(
        n.cast("int").alias("n_periods"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


@register(
    "agg_theil_sen",
    f"""
    WITH s AS ({_SQL_MONTHLY}
    ), p AS (
        SELECT (b.rev - a.rev) / (b.m - a.m) AS slope
        FROM s a JOIN s b ON b.m > a.m
    ), r AS (
        SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
               COUNT(*) OVER () AS cnt
        FROM p
    )
    SELECT CAST(MAX(cnt) AS BIGINT) AS n_pairs,
           ROUND(AVG(slope), 6) AS slope_per_month
    FROM r
    WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
    """,
)
def agg_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope on the monthly revenue series: the
    median of all pairwise slopes — up to ~29% outlier contamination
    doesn't move it, unlike OLS. Median by explicit middle-element
    selection (row_number over the slope order, average the one or two
    middle *values*) so both engines pick identical elements — no reliance
    on engine-specific median interpolation. The O(months²) pair frame is
    ~3k rows built from the aggregated series; the monthly rollup is the
    only data-sized stage at 100 TB."""
    s = _monthly_revenue(spark, sf_dir)
    a, b = s.alias("a"), s.alias("b")
    p = a.join(b, F.col("b.m") > F.col("a.m")).select(
        ((F.col("b.rev") - F.col("a.rev")) / (F.col("b.m") - F.col("a.m"))).alias(
            "slope"
        )
    )
    r = p.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    mid = r.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    return mid.agg(
        F.max("cnt").cast("bigint").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("slope_per_month"),
    )


@register(
    "agg_hodges_lehmann",
    f"""
    WITH s AS ({_SQL_MONTHLY}
    ), w AS (
        SELECT (a.rev + b.rev) / 2 AS walsh
        FROM s a JOIN s b ON b.m >= a.m
    ), r AS (
        SELECT walsh, ROW_NUMBER() OVER (ORDER BY walsh) AS rn,
               COUNT(*) OVER () AS cnt
        FROM w
    )
    SELECT CAST(MAX(cnt) AS BIGINT) AS n_walsh,
           ROUND(AVG(walsh), 4) AS hl_location
    FROM r
    WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
    """,
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann robust location estimate of monthly revenue: the
    median of all Walsh averages (xᵢ+xⱼ)/2 for i ≤ j — the location
    estimator paired with the Wilcoxon test, ~29% breakdown vs the mean's
    0%. Median again by explicit middle-element selection (same discipline
    as `agg_theil_sen`), so both engines pick identical order statistics.
    The O(months²) Walsh frame is ~3k rows built from the aggregated
    series; the monthly rollup is the only data-sized stage at 100 TB."""
    s = _monthly_revenue(spark, sf_dir)
    a, b = s.alias("a"), s.alias("b")
    w = a.join(b, F.col("b.m") >= F.col("a.m")).select(
        ((F.col("a.rev") + F.col("b.rev")) / 2).alias("walsh")
    )
    r = w.select(
        "walsh",
        F.row_number().over(Window.orderBy("walsh")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    mid = r.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    return mid.agg(
        F.max("cnt").cast("bigint").alias("n_walsh"),
        F.round(F.avg("walsh"), 4).alias("hl_location"),
    )


@register(
    "ml_ipw_ate",
    """
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error')
                              >= 14 THEN 1 ELSE 0 END AS INT) AS t,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100.0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    strat AS (
        SELECT t, y, LEAST(n_events // 20, 4) AS s FROM u
    ),
    g AS (
        SELECT s,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE t = 1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE t = 0) AS BIGINT) AS n0,
               CAST(SUM(y) FILTER (WHERE t = 1) AS BIGINT) AS y1,
               CAST(SUM(y) FILTER (WHERE t = 0) AS BIGINT) AS y0
        FROM strat GROUP BY s
        HAVING COUNT(*) FILTER (WHERE t = 1) > 0
           AND COUNT(*) FILTER (WHERE t = 0) > 0
    ),
    terms AS (
        SELECT n, n1, n0, y1, y0,
               CAST(FLOOR((CAST(y1 AS DOUBLE) * n / n1
                           - CAST(y0 AS DOUBLE) * n / n0) * 10.0)
                    AS BIGINT) AS tq
        FROM g
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_users,
           ROUND((CAST(SUM(y1) AS DOUBLE) / SUM(n1)
                  - CAST(SUM(y0) AS DOUBLE) / SUM(n0)) / 100.0, 4)
               AS naive_diff,
           ROUND(CAST(SUM(tq) AS DOUBLE) / 10.0 / SUM(n) / 100.0, 4)
               AS ipw_ate
    FROM terms
    """,
)
def ml_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    observational-causal sibling of the A/B family (``ab_cuped_adjust``,
    ``ab_diff_in_diff``): treatment = "error-prone user" (>= 14 error
    events — a behavior, not an assignment), outcome =
    purchase spend, confounder = activity level (event-count strata, the
    thing that drives both signing up and spending). Within-stratum
    propensity e_s = n1_s/n_s makes the Horvitz-Thompson estimate
    sum_s(y1_s/e_s - y0_s/(1-e_s))/N, computed as exact integer stratum
    aggregates with each stratum's double term floor-quantized before
    the cross-stratum sum (the ``ts_ljung_box`` discipline — no
    order-dependent double accumulation). Strata missing either arm are
    dropped (positivity violation), matching the estimator's support
    requirement. Shape: two grouped passes over the per-user frame; the
    naive difference is reported beside the adjusted one to expose the
    confounding gap."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.when(
            F.count_if(F.col("event_type") == "error") >= 14, 1
        )
        .otherwise(0)
        .cast("int")
        .alias("t"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100.0).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    )
    strat = u.select(
        "t", "y", F.least(F.floor(F.col("n_events") / 20), F.lit(4)).alias("s")
    )

    def fsum(col, t):
        return F.sum(F.when(F.col("t") == t, col))

    g = (
        strat.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fsum(F.lit(1), 1).alias("n1"),
            fsum(F.lit(1), 0).alias("n0"),
            fsum(F.col("y"), 1).alias("y1"),
            fsum(F.col("y"), 0).alias("y0"),
        )
        .filter((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    term = (
        F.col("y1").cast("double") * F.col("n") / F.col("n1")
        - F.col("y0").cast("double") * F.col("n") / F.col("n0")
    )
    terms = g.select(
        "n", "n1", "n0", "y1", "y0",
        F.floor(term * 10.0).cast("long").alias("tq"),
    )
    return terms.agg(
        F.sum("n").cast("bigint").alias("n_users"),
        F.round(
            (
                F.sum("y1").cast("double") / F.sum("n1")
                - F.sum("y0").cast("double") / F.sum("n0")
            )
            / 100.0,
            4,
        ).alias("naive_diff"),
        F.round(
            F.sum("tq").cast("double") / 10.0 / F.sum("n") / 100.0, 4
        ).alias("ipw_ate"),
    )


@register(
    "ab_power_analysis",
    """
    WITH m1 AS (
        SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM customer GROUP BY 1
    ), dev AS (
        SELECT c.c_mktsegment AS segment, m1.n, m1.cents,
               c_acctbal - CAST(m1.cents AS DOUBLE) / 100.0 / m1.n AS d
        FROM customer c JOIN m1 ON m1.segment = c.c_mktsegment
    ), s AS (
        SELECT segment, MAX(n) AS n, MAX(cents) AS cents,
               CAST(SUM(CAST(FLOOR(d * d * 100.0) AS BIGINT)) AS DOUBLE)
                   / 100.0 / (MAX(n) - 1) AS var
        FROM dev GROUP BY 1
    )
    SELECT segment, CAST(n AS BIGINT) AS n_current,
           ROUND(CAST(cents AS DOUBLE) / 100.0 / n, 2) AS mean,
           ROUND(SQRT(var), 2) AS sd,
           ROUND(ABS(CAST(cents AS DOUBLE) / 100.0 / n) * 0.01, 4) AS mde_abs,
           CAST(CEIL(2.0 * POW(1.959964 + 0.841621, 2.0) * var
                     / POW(ABS(CAST(cents AS DOUBLE) / 100.0 / n) * 0.01, 2.0))
                AS BIGINT) AS n_required_per_arm,
           ROUND(CAST(CEIL(2.0 * POW(1.959964 + 0.841621, 2.0) * var
                     / POW(ABS(CAST(cents AS DOUBLE) / 100.0 / n) * 0.01,
                           2.0)) AS DOUBLE) / n, 2) AS multiple_of_current
    FROM s ORDER BY segment
    """,
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test power analysis per market segment: the per-arm sample
    size needed to detect a 1% relative shift in mean balance at
    α = 0.05 (two-sided) with 80% power — n = 2(z_{α/2}+z_β)²σ²/Δ² —
    plus how many multiples of the current population that is. The
    experiment-design operator every platform runs BEFORE assignment;
    z constants are fixed literals (1.959964, 0.841621), σ² comes from
    the two-pass exact pipeline (integer cents mean, quantized squared
    deviations), and the sizing formula is one fixed-form expression —
    hash-stable anywhere. Shape: two partial→final passes + 5-row
    algebra."""
    cust = load_table(spark, sf_dir, "customer")
    m1 = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("c_acctbal") * 100.0).cast("long"))
        .cast("bigint")
        .alias("cents"),
    )
    mean = F.col("cents").cast("double") / 100.0 / F.col("n")
    dev = cust.join(
        F.broadcast(m1), cust["c_mktsegment"] == m1["segment"]
    ).select("segment", "n", "cents", (F.col("c_acctbal") - mean).alias("d"))
    s = dev.groupBy("segment").agg(
        F.max("n").alias("n"),
        F.max("cents").alias("cents"),
        (
            F.sum(F.floor(F.col("d") * F.col("d") * 100.0).cast("long")).cast(
                "double"
            )
            / 100.0
            / (F.max("n") - 1)
        ).alias("var"),
    )
    mde = F.abs(mean) * 0.01
    zsum2 = F.pow(F.lit(1.959964) + F.lit(0.841621), 2.0)
    n_req = F.ceil(2.0 * zsum2 * F.col("var") / F.pow(mde, 2.0)).cast(
        "bigint"
    )
    return s.select(
        "segment",
        F.col("n").cast("bigint").alias("n_current"),
        F.round(mean, 2).alias("mean"),
        F.round(F.sqrt("var"), 2).alias("sd"),
        F.round(mde, 4).alias("mde_abs"),
        n_req.alias("n_required_per_arm"),
        F.round(n_req.cast("double") / F.col("n"), 2).alias(
            "multiple_of_current"
        ),
    ).orderBy("segment")


@register(
    "ab_sequential_looks",
    """
    WITH tagged AS (
        SELECT CAST(EXTRACT(DAY FROM ts) AS INT) AS d,
               CAST(user_id % 2 AS INT) AS arm,
               CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
        FROM events
    ), pre AS (
        SELECT d, arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS HUGEINT) AS ss
        FROM tagged GROUP BY 1, 2
    ), looks AS (SELECT UNNEST([6, 12, 18, 24, 30]) AS boundary_day),
    cum AS (
        SELECT l.boundary_day, p.arm,
               CAST(SUM(p.n) AS BIGINT) AS n,
               CAST(SUM(p.s) AS BIGINT) AS s,
               CAST(SUM(p.ss) AS HUGEINT) AS ss
        FROM pre p JOIN looks l ON p.d <= l.boundary_day
        GROUP BY 1, 2
    ), wide AS (
        SELECT boundary_day,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM cum GROUP BY 1
    ), stat AS (
        SELECT boundary_day, n0, n1,
               (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) / 100.0
                   AS diff,
               ((CAST(ss0 AS DOUBLE)
                 - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0
                + (CAST(ss1 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1) / 1e4
                   AS var_diff
        FROM wide
    ), z AS (
        SELECT boundary_day, n0, n1, diff,
               diff / SQRT(var_diff) AS zstat,
               CASE boundary_day WHEN 6 THEN 4.8769 WHEN 12 THEN 3.3569
                    WHEN 18 THEN 2.6803 WHEN 24 THEN 2.2898
                    ELSE 2.0310 END AS obf_bound
        FROM stat
    )
    SELECT boundary_day, n0 + n1 AS n_events,
           ROUND(diff, 4) AS mean_diff,
           ROUND(zstat, 4) AS z,
           obf_bound,
           CAST(CASE WHEN ABS(zstat) > obf_bound THEN 1 ELSE 0 END AS INT)
               AS crossed
    FROM z ORDER BY boundary_day
    """,
)
def ab_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien–Fleming boundaries:
    the two-arm mean-difference z-statistic evaluated at five calendar
    looks (days 6/12/18/24/30) against the published two-sided α=0.05
    OBF critical values (4.88, 3.36, 2.68, 2.29, 2.03) — the peeking
    discipline that lets an experiment stop early without inflating
    false positives. One grouped pass compresses events to per-(day,
    arm) sufficient statistics (exact cents and squared-cents sums);
    the five looks are a 5-row join-fan-out over THAT frame, so the
    cumulative stats at every look come from one shuffle of ≤60 rows.
    Variances use Welch's unpooled form from exact integer sums; z and
    the boundary comparison are fixed-form — stable anywhere."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.dayofmonth("ts").cast("int").alias("d"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    pre = tagged.groupBy("d", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    )
    looks = spark.createDataFrame(
        [(6,), (12,), (18,), (24,), (30,)], "boundary_day: int"
    )
    cum = (
        pre.join(F.broadcast(looks), pre["d"] <= looks["boundary_day"])
        .groupBy("boundary_day", "arm")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("bigint").alias("s"),
            F.sum("ss").alias("ss"),
        )
    )

    def arm(col, a):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = cum.groupBy("boundary_day").agg(
        arm("n", 0).alias("n0"),
        arm("n", 1).alias("n1"),
        arm("s", 0).alias("s0"),
        arm("s", 1).alias("s1"),
        arm("ss", 0).alias("ss0"),
        arm("ss", 1).alias("ss1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1 = F.col("s0"), F.col("s1")
    diff = (s1.cast("double") / n1 - s0.cast("double") / n0) / 100.0
    var_diff = (
        (F.col("ss0").cast("double") - s0.cast("double") * s0 / n0)
        / (n0 - 1)
        / n0
        + (F.col("ss1").cast("double") - s1.cast("double") * s1 / n1)
        / (n1 - 1)
        / n1
    ) / 1e4
    zstat = diff / F.sqrt(var_diff)
    obf = (
        F.when(F.col("boundary_day") == 6, 4.8769)
        .when(F.col("boundary_day") == 12, 3.3569)
        .when(F.col("boundary_day") == 18, 2.6803)
        .when(F.col("boundary_day") == 24, 2.2898)
        .otherwise(2.0310)
    )
    return wide.select(
        "boundary_day",
        (n0 + n1).alias("n_events"),
        F.round(diff, 4).alias("mean_diff"),
        F.round(zstat, 4).alias("z"),
        obf.alias("obf_bound"),
        F.when(F.abs(zstat) > obf, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("crossed"),
    ).orderBy("boundary_day")


@register(
    "ab_propensity_match",
    """
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE EXTRACT(DAY FROM ts) <= 7)
                    AS BIGINT) AS pre_n,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error'
                     AND EXTRACT(DAY FROM ts) <= 7) AS BIGINT) AS pre_err,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                              AND EXTRACT(DAY FROM ts) > 7
                             THEN CAST(FLOOR(value * 100.0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS out_cents
        FROM events GROUP BY 1
    ), tagged AS (
        SELECT user_id, pre_n, out_cents,
               CAST(pre_err >= 5 AS INT) AS treated,
               NTILE(4) OVER (ORDER BY pre_n, user_id) AS blk
        FROM u
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY blk, treated
                                  ORDER BY pre_n, user_id) AS rn
        FROM tagged
    ), pairs AS (
        SELECT t.blk, t.user_id AS treated_user, c.user_id AS control_user,
               t.out_cents AS t_out, c.out_cents AS c_out
        FROM ranked t JOIN ranked c
          ON c.blk = t.blk AND c.rn = t.rn
         AND t.treated = 1 AND c.treated = 0
    )
    SELECT CAST(blk AS INT) AS block,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(t_out) AS DOUBLE) / COUNT(*) / 100.0, 2)
               AS treated_mean,
           ROUND(CAST(SUM(c_out) AS DOUBLE) / COUNT(*) / 100.0, 2)
               AS control_mean,
           ROUND(CAST(SUM(t_out - c_out) AS DOUBLE) / COUNT(*) / 100.0, 4)
               AS att
    FROM pairs GROUP BY 1 ORDER BY block
    """,
)
def ab_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked 1:1 matching estimate of a treatment effect: treatment =
    heavy first-week error exposure (≥5 errors), outcome = post-week
    purchase spend, matching on pre-week activity via quartile BLOCKS +
    within-block rank pairing (treated rank i ↔ control rank i on the
    same sorted covariate) — the deterministic, shuffle-friendly stand-in
    for greedy nearest-neighbor propensity matching (greedy matching is
    sequential; rank matching inside covariate blocks is its
    order-free equivalent, and is how matching scales on a cluster).
    All ranks and counts are exact integers with user_id tie-breaks —
    the matched set is bit-identical at any parallelism. Per-block ATT
    plus the pair counts expose covariate balance directly. One grouped
    pass over events, windows over the 150-row user frame."""
    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    u = ev.groupBy("user_id").agg(
        F.count_if(day <= 7).cast("bigint").alias("pre_n"),
        F.count_if((F.col("event_type") == "error") & (day <= 7))
        .cast("bigint")
        .alias("pre_err"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (day > 7),
                F.floor(F.col("value") * 100.0).cast("long"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("out_cents"),
    )
    # round-6 window-audit fix: distributed NTILE blocks (bucketed
    # two-level rank + tile arithmetic) — the covariate quartiling never
    # ranks the user frame through one partition
    n_all = u.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    tagged = (
        with_global_order(u, "pre_n", ["user_id"], rank="r")
        .crossJoin(F.broadcast(n_all))
        .select(
            "user_id",
            "pre_n",
            "out_cents",
            (F.col("pre_err") >= 5).cast("int").alias("treated"),
            ntile_expr(F.col("r"), F.col("n_all"), 4).alias("blk"),
        )
    )
    ranked = tagged.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("blk", "treated").orderBy("pre_n", "user_id")
        ),
    )
    t = ranked.filter(F.col("treated") == 1).select(
        F.col("blk").alias("tblk"),
        F.col("rn").alias("trn"),
        F.col("out_cents").alias("t_out"),
    )
    c = ranked.filter(F.col("treated") == 0).select(
        F.col("blk").alias("cblk"),
        F.col("rn").alias("crn"),
        F.col("out_cents").alias("c_out"),
    )
    pairs = t.join(
        c, (F.col("cblk") == F.col("tblk")) & (F.col("crn") == F.col("trn"))
    )
    return (
        pairs.groupBy(F.col("tblk").cast("int").alias("block"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("t_out").cast("double") / F.count(F.lit(1)) / 100.0, 2
            ).alias("treated_mean"),
            F.round(
                F.sum("c_out").cast("double") / F.count(F.lit(1)) / 100.0, 2
            ).alias("control_mean"),
            F.round(
                F.sum(F.col("t_out") - F.col("c_out")).cast("double")
                / F.count(F.lit(1))
                / 100.0,
                4,
            ).alias("att"),
        )
        .orderBy("block")
    )


def _bayes_beta_sql() -> str:
    from hive_processor_spark.functions.mathtab import LNFACT_Q

    arr = "[" + ", ".join(str(v) for v in LNFACT_Q) + "]"
    return f"""
    WITH lf AS (SELECT {arr} AS t),
    u AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                              AND EXTRACT(DAY FROM ts) > 15
                              AND value >= 190.0
                             THEN 1 ELSE 0 END) AS INT) AS converted
        FROM events GROUP BY 1
    ), arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS s
        FROM u GROUP BY 1
    ), wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN s END) + 1 AS aa,
               MAX(CASE WHEN arm = 0 THEN n - s END) + 1 AS ba,
               MAX(CASE WHEN arm = 1 THEN s END) + 1 AS ab,
               MAX(CASE WHEN arm = 1 THEN n - s END) + 1 AS bb,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1
        FROM arms
    ), terms AS (
        -- P(pB > pA) = sum_i exp(lnB(aa+i, ba+bb) - ln(bb+i)
        --                        - lnB(1+i, bb) - lnB(aa, ba))
        -- with lnB(x, y) = lf(x-1) + lf(y-1) - lf(x+y-1)  (integer args)
        SELECT w.*, i.i,
               CAST(FLOOR(EXP((
                     (lf.t[w.aa + i.i] + lf.t[w.ba + w.bb]
                      - lf.t[w.aa + i.i + w.ba + w.bb])
                   - LN(CAST(w.bb + i.i AS DOUBLE)) * 1e9
                   - (lf.t[i.i + 1] + lf.t[w.bb]
                      - lf.t[i.i + w.bb + 1])
                   - (lf.t[w.aa] + lf.t[w.ba] - lf.t[w.aa + w.ba])
                 ) / 1e9) * 1e12) AS BIGINT) AS term_q
        FROM wide w CROSS JOIN lf
        CROSS JOIN (SELECT UNNEST(RANGE(0, 200)) AS i) i
        WHERE i.i < w.ab
    )
    SELECT CAST(MAX(n0) AS BIGINT) AS n_a, CAST(MAX(s0) AS BIGINT) AS conv_a,
           CAST(MAX(n1) AS BIGINT) AS n_b, CAST(MAX(s1) AS BIGINT) AS conv_b,
           ROUND(CAST(MAX(s0) AS DOUBLE) / MAX(n0), 6) AS rate_a,
           ROUND(CAST(MAX(s1) AS DOUBLE) / MAX(n1), 6) AS rate_b,
           ROUND(LEAST(CAST(SUM(term_q) AS DOUBLE) / 1e12, 1.0), 6)
               AS p_b_beats_a
    FROM terms
    """


@register("ab_bayesian_beta", _bayes_beta_sql())
def ab_bayesian_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B conversion analysis: with Beta(1,1) priors and
    user-level conversion (a high-value second-half purchase), compute the EXACT
    posterior probability P(p_B > p_A) via the closed-form finite sum
    Σᵢ exp(lnB(a_A+i, b_A+b_B) − ln(b_B+i) − lnB(1+i, b_B) −
    lnB(a_A, b_A)) — no Monte Carlo, no approximation. All Beta-function
    arguments are integers, so every lnB term resolves from the shared
    precomputed log-factorial table (functions/mathtab.py) identically
    on both engines; each term is floor-quantized at 1e-12 and
    integer-summed. Shape: one grouped pass to user-level conversions,
    a 2-row arm rollup, and a bounded i-explode (< conversions_B terms)
    on a single row. The decision-ready Bayesian output every
    experimentation platform quotes."""
    from hive_processor_spark.functions.mathtab import LNFACT_Q, lnfact_frame

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.dayofmonth("ts") > 15)
                & (F.col("value") >= 190.0),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"), "converted"
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("s"),
    )

    def pick(arm, col):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = arms.agg(
        (pick(0, "s") + 1).alias("aa"),
        (pick(0, "n") - pick(0, "s") + 1).alias("ba"),
        (pick(1, "s") + 1).alias("ab"),
        (pick(1, "n") - pick(1, "s") + 1).alias("bb"),
        pick(0, "n").alias("n0"),
        pick(1, "n").alias("n1"),
        pick(0, "s").alias("s0"),
        pick(1, "s").alias("s1"),
    )
    js = wide.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("ab") - 1)).alias("i")
    ).crossJoin(F.broadcast(lnfact_frame(spark)))

    def lfq(idx):
        return F.element_at(F.col("lft"), (idx + 1).cast("int"))

    aa, ba, ab, bb, i = (F.col(c) for c in ("aa", "ba", "ab", "bb", "i"))
    ln_num = (
        (lfq(aa + i - 1) + lfq(ba + bb - 1) - lfq(aa + i + ba + bb - 1))
        - F.ln((bb + i).cast("double")) * 1e9
        - (lfq(i) + lfq(bb - 1) - lfq(i + bb))
        - (lfq(aa - 1) + lfq(ba - 1) - lfq(aa + ba - 1))
    ).cast("double") / 1e9
    terms = js.select(
        "n0",
        "n1",
        "s0",
        "s1",
        F.floor(F.exp(ln_num) * 1e12).cast("long").alias("term_q"),
    )
    return terms.agg(
        F.max("n0").cast("bigint").alias("n_a"),
        F.max("s0").cast("bigint").alias("conv_a"),
        F.max("n1").cast("bigint").alias("n_b"),
        F.max("s1").cast("bigint").alias("conv_b"),
        F.round(F.max("s0").cast("double") / F.max("n0"), 6).alias("rate_a"),
        F.round(F.max("s1").cast("double") / F.max("n1"), 6).alias("rate_b"),
        F.round(
            F.least(F.sum("term_q").cast("double") / 1e12, F.lit(1.0)), 6
        ).alias("p_b_beats_a"),
    )


@register(
    "ab_event_study",
    """
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error'
                     AND EXTRACT(DAY FROM ts) <= 7) >= 5 AS INT) AS treated
        FROM events GROUP BY 1
    ), wk AS (
        SELECT e.user_id, u.treated,
               CAST(FLOOR((EXTRACT(DAY FROM e.ts) - 1) / 7.0) AS INT) AS week,
               CAST(FLOOR(e.value * 100.0) AS BIGINT) AS cents
        FROM events e JOIN u ON u.user_id = e.user_id
        WHERE EXTRACT(DAY FROM e.ts) <= 28
    ), uw AS (
        SELECT user_id, treated, week,
               CAST(SUM(cents) AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS n
        FROM wk GROUP BY 1, 2, 3
    ), g AS (
        SELECT week, treated,
               CAST(COUNT(*) AS BIGINT) AS users,
               CAST(SUM(c) AS BIGINT) AS cents, CAST(SUM(n) AS BIGINT) AS n
        FROM uw GROUP BY 1, 2
    ), wide AS (
        SELECT week,
               MAX(CASE WHEN treated = 1 THEN CAST(cents AS DOUBLE) / n END)
                   AS t_mean,
               MAX(CASE WHEN treated = 0 THEN CAST(cents AS DOUBLE) / n END)
                   AS c_mean,
               MAX(CASE WHEN treated = 1 THEN users END) AS t_users,
               MAX(CASE WHEN treated = 0 THEN users END) AS c_users
        FROM g GROUP BY 1
    ), base AS (
        SELECT t_mean - c_mean AS gap0 FROM wide WHERE week = 0
    )
    SELECT week, CAST(t_users AS BIGINT) AS treated_users,
           CAST(c_users AS BIGINT) AS control_users,
           ROUND(t_mean / 100.0, 4) AS treated_mean,
           ROUND(c_mean / 100.0, 4) AS control_mean,
           ROUND((t_mean - c_mean) / 100.0, 4) AS gap,
           ROUND((t_mean - c_mean - base.gap0) / 100.0, 4) AS effect_vs_week0
    FROM wide CROSS JOIN base ORDER BY week
    """,
)
def ab_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study analysis: weekly treated-vs-control mean-value gaps
    normalized to the pre-period (week 0) gap — the dynamic
    difference-in-differences display that shows both the parallel-trend
    check (pre-period effect ≈ 0 by construction) and how the effect
    evolves after exposure (treatment = heavy week-0 error exposure).
    Means come from exact integer cents sums at the (user, week) then
    (week, arm) grains; the week-0 baseline joins back as a 1-row
    broadcast — all deterministic. Two grouped passes over events,
    then 8-row algebra; the canonical panel shape at any scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    u = ev.groupBy("user_id").agg(
        (
            F.count_if((F.col("event_type") == "error") & (day <= 7)) >= 5
        )
        .cast("int")
        .alias("treated")
    )
    wk = (
        ev.filter(day <= 28)
        .join(u, "user_id")
        .select(
            "user_id",
            "treated",
            F.floor((day - 1) / 7.0).cast("int").alias("week"),
            F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    uw = wk.groupBy("user_id", "treated", "week").agg(
        F.sum("cents").cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    g = uw.groupBy("week", "treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("users"),
        F.sum("c").cast("bigint").alias("cents"),
        F.sum("n").cast("bigint").alias("n"),
    )

    def pick(arm, expr):
        return F.max(F.when(F.col("treated") == arm, expr))

    mean = F.col("cents").cast("double") / F.col("n")
    wide = g.groupBy("week").agg(
        pick(1, mean).alias("t_mean"),
        pick(0, mean).alias("c_mean"),
        pick(1, F.col("users")).alias("t_users"),
        pick(0, F.col("users")).alias("c_users"),
    )
    base = wide.filter(F.col("week") == 0).select(
        (F.col("t_mean") - F.col("c_mean")).alias("gap0")
    )
    return (
        wide.crossJoin(F.broadcast(base))
        .select(
            "week",
            F.col("t_users").cast("bigint").alias("treated_users"),
            F.col("c_users").cast("bigint").alias("control_users"),
            F.round(F.col("t_mean") / 100.0, 4).alias("treated_mean"),
            F.round(F.col("c_mean") / 100.0, 4).alias("control_mean"),
            F.round((F.col("t_mean") - F.col("c_mean")) / 100.0, 4).alias(
                "gap"
            ),
            F.round(
                (F.col("t_mean") - F.col("c_mean") - F.col("gap0")) / 100.0,
                4,
            ).alias("effect_vs_week0"),
        )
        .orderBy("week")
    )


@register(
    "ab_uplift_qini",
    f"""
    WITH users AS (
        SELECT user_id,
               CAST({_ARM_SQL} AS INT) AS arm,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
                   AS score_c,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_purch
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT arm, (n_purch > 0) AS converted,
               NTILE(10) OVER (ORDER BY score_c DESC, user_id) AS decile
        FROM users
    ), d AS (
        SELECT decile,
               CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_t,
               CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_c,
               CAST(COUNT(*) FILTER (WHERE arm = 1 AND converted)
                    AS BIGINT) AS conv_t,
               CAST(COUNT(*) FILTER (WHERE arm = 0 AND converted)
                    AS BIGINT) AS conv_c
        FROM ranked GROUP BY decile
    ), c AS (
        SELECT decile, n_t, n_c, conv_t, conv_c,
               SUM(n_t) OVER w AS ct_n, SUM(n_c) OVER w AS cc_n,
               SUM(conv_t) OVER w AS ct_conv, SUM(conv_c) OVER w AS cc_conv
        FROM d WINDOW w AS (ORDER BY decile
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(decile AS INT) AS decile, n_t, n_c, conv_t, conv_c,
           ROUND(CAST(ct_conv AS DOUBLE) / ct_n
                 - CAST(cc_conv AS DOUBLE) / cc_n, 6) AS cum_uplift,
           ROUND(ct_conv - cc_conv * (CAST(ct_n AS DOUBLE) / cc_n), 4)
               AS qini
    FROM c ORDER BY decile
    """,
)
def ab_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift decile table + Qini curve (Radcliffe '07): users ranked by
    spend score, and per cumulative decile the treatment−control
    conversion-rate gap (cum_uplift) and the Qini statistic
    (incremental conversions vs a scaled control) — the targeting
    diagnostic that tells you WHOM to treat, which the registered
    average-effect estimators (CUPED, IPW, diff-in-diff) cannot. Arm
    assignment reuses the deterministic Knuth-hash split every ab_*
    operator shares; all counts are exact integers, NTILE is
    deterministic on the (score, user) chain.

    Scale: one user rollup, distributed NTILE (round-6 window-audit
    fix — bucketed two-level rank + tile arithmetic), a 10-row
    cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("score_c"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("bigint")
        .alias("n_purch"),
    ).select(
        "user_id", _arm().alias("arm"), "score_c", (F.col("n_purch") > 0).alias("converted")
    )
    n_all = users.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    ranked = (
        with_global_order(users, "score_c", ["user_id"], rank="r", desc=True)
        .crossJoin(F.broadcast(n_all))
        .select(
            "arm",
            "converted",
            ntile_expr(F.col("r"), F.col("n_all"), 10).alias("decile"),
        )
    )
    d = ranked.groupBy("decile").agg(
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n_t"),
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n_c"),
        F.count_if((F.col("arm") == 1) & F.col("converted"))
        .cast("bigint")
        .alias("conv_t"),
        F.count_if((F.col("arm") == 0) & F.col("converted"))
        .cast("bigint")
        .alias("conv_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "*",
        F.sum("n_t").over(w).alias("ct_n"),
        F.sum("n_c").over(w).alias("cc_n"),
        F.sum("conv_t").over(w).alias("ct_conv"),
        F.sum("conv_c").over(w).alias("cc_conv"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.round(
            F.col("ct_conv").cast("double") / F.col("ct_n")
            - F.col("cc_conv").cast("double") / F.col("cc_n"),
            6,
        ).alias("cum_uplift"),
        F.round(
            F.col("ct_conv")
            - F.col("cc_conv")
            * (F.col("ct_n").cast("double") / F.col("cc_n")),
            4,
        ).alias("qini"),
    ).orderBy("decile")


@register(
    "ab_equivalence_tost",
    f"""
    WITH u AS (
        SELECT CAST({_ARM_SQL} AS INT) AS arm,
               CAST(SUM(CAST(FLOOR(value * 1e4) AS BIGINT)) AS BIGINT) AS yq
        FROM events GROUP BY user_id
    ), g AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yq) AS BIGINT) AS sy,
               CAST(SUM(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy
        FROM u GROUP BY arm
    ), sc AS (
        SELECT a.n AS n0, b.n AS n1,
               CAST(a.sy AS DOUBLE) / a.n / 1e4 AS m0,
               CAST(b.sy AS DOUBLE) / b.n / 1e4 AS m1,
               (CAST(a.syy AS DOUBLE) / 1e8
                - (CAST(a.sy AS DOUBLE) / 1e4)
                  * (CAST(a.sy AS DOUBLE) / 1e4) / a.n) / (a.n - 1) AS v0,
               (CAST(b.syy AS DOUBLE) / 1e8
                - (CAST(b.sy AS DOUBLE) / 1e4)
                  * (CAST(b.sy AS DOUBLE) / 1e4) / b.n) / (b.n - 1) AS v1
        FROM (SELECT * FROM g WHERE arm = 0) a
        CROSS JOIN (SELECT * FROM g WHERE arm = 1) b
    ), t AS (
        SELECT n0, n1, m0, m1, v0, v1,
               m1 - m0 AS diff,
               0.05 * ((m0 + m1) / 2) AS margin,
               SQRT(v0 / n0 + v1 / n1) AS se,
               (v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
               / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                  + (v1 / n1) * (v1 / n1) / (n1 - 1)) AS df
        FROM sc
    )
    SELECT n0, n1,
           ROUND(diff, 4) AS diff,
           ROUND(margin, 4) AS margin,
           ROUND((diff + margin) / se, 4) AS t_lower,
           ROUND((margin - diff) / se, 4) AS t_upper,
           ROUND(df, 2) AS df,
           CASE WHEN (diff + margin) / se > 1.645
                 AND (margin - diff) / se > 1.645
                THEN 1 ELSE 0 END AS equivalent
    FROM t
    """,
)
def ab_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann '87): instead of failing to
    reject "no difference" (which proves nothing), REJECT both
    one-sided hypotheses |μ₁−μ₀| ≥ δ at δ = 5% of the pooled mean —
    the procedure a do-no-harm launch review actually needs, and the
    mirror image of ``ab_power_analysis``'s superiority framing. Arms
    use the same Knuth-hash assignment as the rest of the ab_ family;
    per-user value sums quantize at 1e-4 so the Welch components
    (means, variances in 128-bit, Satterthwaite df) are exact-integer
    algebra; both TOST t-ratios are compared to the z≈1.645 critical
    value (df is in the thousands — documented normal approximation).

    Scale: one per-user aggregate (shuffle ∝ users), one 2-row
    reduce, scalar algebra."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1e4).cast("long"))
        .cast("long")
        .alias("yq"),
    ).select(
        F.expr(_ARM_SQL.replace("user_id", "user_id")).cast("int").alias("arm"),
        "yq",
    )
    g = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("yq").cast("decimal(38,0)") * F.col("yq")).alias("syy"),
    )
    a = g.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("sy").alias("sy0"), F.col("syy").alias("syy0")
    )
    b = g.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("sy").alias("sy1"), F.col("syy").alias("syy1")
    )
    sc = a.crossJoin(F.broadcast(b)).select(
        "n0",
        "n1",
        (F.col("sy0").cast("double") / F.col("n0") / 1e4).alias("m0"),
        (F.col("sy1").cast("double") / F.col("n1") / 1e4).alias("m1"),
        (
            (
                F.col("syy0").cast("double") / 1e8
                - (F.col("sy0").cast("double") / 1e4)
                * (F.col("sy0").cast("double") / 1e4)
                / F.col("n0")
            )
            / (F.col("n0") - 1)
        ).alias("v0"),
        (
            (
                F.col("syy1").cast("double") / 1e8
                - (F.col("sy1").cast("double") / 1e4)
                * (F.col("sy1").cast("double") / 1e4)
                / F.col("n1")
            )
            / (F.col("n1") - 1)
        ).alias("v1"),
    )
    diff = F.col("m1") - F.col("m0")
    margin = 0.05 * ((F.col("m0") + F.col("m1")) / 2)
    se = F.sqrt(F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1"))
    vn0 = F.col("v0") / F.col("n0")
    vn1 = F.col("v1") / F.col("n1")
    df = (vn0 + vn1) * (vn0 + vn1) / (
        vn0 * vn0 / (F.col("n0") - 1) + vn1 * vn1 / (F.col("n1") - 1)
    )
    return sc.select(
        "n0",
        "n1",
        F.round(diff, 4).alias("diff"),
        F.round(margin, 4).alias("margin"),
        F.round((diff + margin) / se, 4).alias("t_lower"),
        F.round((margin - diff) / se, 4).alias("t_upper"),
        F.round(df, 2).alias("df"),
        F.when(
            ((diff + margin) / se > 1.645) & ((margin - diff) / se > 1.645),
            1,
        )
        .otherwise(0)
        .alias("equivalent"),
    )


@register(
    "ab_sprt_boundary",
    f"""
    WITH base AS (
        SELECT FLOOR(
            CAST(COUNT(CASE WHEN event_type = 'purchase'
                            AND CAST({_ARM_SQL} AS INT) = 0
                       THEN 1 END) AS DOUBLE)
            / COUNT(CASE WHEN CAST({_ARM_SQL} AS INT) = 0 THEN 1 END)
            * 1e4) / 1e4 AS p0
        FROM events
    ), daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_t,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS x_t
        FROM events WHERE CAST({_ARM_SQL} AS INT) = 1
        GROUP BY 1
    ), llr AS (
        SELECT day,
               SUM(CAST(FLOOR((x_t * LN(1.2)
                    + (n_t - x_t) * LN((1 - 1.2 * p0) / (1 - p0)))
                    * 1e9) AS BIGINT))
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_q
        FROM daily CROSS JOIN base
    ), crossed AS (
        SELECT MIN(CASE WHEN ABS(cum_q / 1e9) > LN(19.0)
                        THEN day END) AS cross_day,
               MAX(CASE WHEN day = (SELECT MAX(day) FROM llr)
                        THEN cum_q END) AS final_q,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM llr
    )
    SELECT b.p0, ROUND(1.2 * b.p0, 6) AS p1, c.n_days,
           ROUND(c.final_q / 1e9, 4) AS final_llr,
           ROUND(LN(19.0), 4) AS upper_bound,
           COALESCE(STRFTIME(c.cross_day, '%Y-%m-%d'), 'none')
               AS first_cross_day,
           CASE WHEN c.final_q / 1e9 > LN(19.0) THEN 'accept_h1'
                WHEN c.final_q / 1e9 < -LN(19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM crossed c CROSS JOIN base b
    """,
)
def ab_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test (Wald '45) on the
    treatment arm's daily purchase rate against H0: p = p0 (the
    CONTROL arm's rate, 1e-4-quantized) vs H1: p = 1.2·p0: the
    cumulative log-likelihood ratio Σ[x·ln(p1/p0) +
    (n−x)·ln((1−p1)/(1−p0))] walks between the ±ln((1−β)/α) = ±ln 19
    boundaries (α = β = 0.05), and the FIRST crossing day is when a
    true sequential test would have stopped — always-valid monitoring
    in one pass, complementing ``ab_sequential_looks``' group-
    sequential spending and ``ab_srm_check``'s guardrail. Daily terms
    are floor-quantized at 1e-9, so the whole LLR trajectory is an
    exact integer cumulative sum.

    Scale: two aggregates over the fact table (base rate, daily
    counts); the trajectory window runs over O(days)."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.expr(_ARM_SQL).cast("int")
    base = ev.agg(
        (
            F.floor(
                F.count(
                    F.when(
                        (F.col("event_type") == "purchase") & (arm == 0), 1
                    )
                ).cast("double")
                / F.count(F.when(arm == 0, 1))
                * 1e4
            )
            / 1e4
        ).alias("p0")
    )
    daily = (
        ev.filter(arm == 1)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_t"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("x_t"),
        )
    )
    term = F.floor(
        (
            F.col("x_t") * F.log(F.lit(1.2))
            + (F.col("n_t") - F.col("x_t"))
            * F.log((1 - 1.2 * F.col("p0")) / (1 - F.col("p0")))
        )
        * 1e9
    ).cast("long")
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    llr = daily.crossJoin(F.broadcast(base)).select(
        "day", F.sum(term).over(w_run).alias("cum_q")
    )
    last_day = llr.agg(F.max("day").alias("ld"))
    crossed = llr.crossJoin(F.broadcast(last_day)).agg(
        F.min(
            F.when(
                F.abs(F.col("cum_q") / 1e9) > float(np_log19()), F.col("day")
            )
        ).alias("cross_day"),
        F.max(
            F.when(F.col("day") == F.col("ld"), F.col("cum_q"))
        ).alias("final_q"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    final = F.col("final_q") / 1e9
    return crossed.crossJoin(F.broadcast(base)).select(
        "p0",
        F.round(1.2 * F.col("p0"), 6).alias("p1"),
        "n_days",
        F.round(final, 4).alias("final_llr"),
        F.round(F.log(F.lit(19.0)), 4).alias("upper_bound"),
        F.coalesce(
            F.date_format(F.col("cross_day"), "yyyy-MM-dd"), F.lit("none")
        ).alias("first_cross_day"),
        F.when(final > float(np_log19()), F.lit("accept_h1"))
        .when(final < -float(np_log19()), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def np_log19() -> float:
    """ln(19) — the Wald boundary for alpha = beta = 0.05."""
    import math

    return math.log(19.0)


@register(
    "ab_covariate_balance",
    f"""
    WITH u AS (
        SELECT CAST({_ARM_SQL} AS INT) AS arm,
               CAST(SUM(CAST(FLOOR(value * 1e4) AS BIGINT)) AS BIGINT)
                   AS total_value_q,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id
    ), long AS (
        SELECT arm, 'total_value' AS covariate,
               CAST(total_value_q AS DOUBLE) / 1e4 AS x
        FROM u
        UNION ALL
        SELECT arm, 'n_events', CAST(n_events AS DOUBLE) FROM u
        UNION ALL
        SELECT arm, 'n_event_types', CAST(n_types AS DOUBLE) FROM u
    ), mo AS (
        SELECT covariate, arm, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x', 4)} AS sx,
               {sql_dsum('x * x', 2)} AS sxx
        FROM long GROUP BY covariate, arm
    ), sides AS (
        SELECT a.covariate,
               a.sx / a.n AS m0, b.sx / b.n AS m1,
               (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) AS v0,
               (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) AS v1
        FROM (SELECT * FROM mo WHERE arm = 0) a
        JOIN (SELECT * FROM mo WHERE arm = 1) b ON b.covariate = a.covariate
    )
    SELECT covariate,
           ROUND(m0, 4) AS mean_control,
           ROUND(m1, 4) AS mean_treatment,
           ROUND(CASE WHEN v0 + v1 > 0
                 THEN (m1 - m0) / SQRT((v0 + v1) / 2)
                 ELSE 0.0 END, 4) AS smd,
           CASE WHEN v0 + v1 = 0 OR
                     ABS((m1 - m0) / SQRT((v0 + v1) / 2)) < 0.1
                THEN 1 ELSE 0 END AS balanced
    FROM sides
    ORDER BY covariate
    """,
)
def ab_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance table (Austin '09's |SMD| < 0.1 convention)
    for the standing hash randomization: per pre-treatment covariate
    (per-user total value, event count, distinct event types) the
    standardized mean difference (m₁−m₀)/√((v₀+v₁)/2) between arms —
    the table EVERY experiment readout should print before its effect
    estimate (and the diagnostic ``ab_propensity_match`` optimizes;
    ``ab_srm_check`` covers counts, this covers composition). On this
    fixture the composition covariates balance while per-user VOLUME
    carries a mild ≈0.1 SMD — exactly the kind of finding the table
    exists to surface before anyone trusts a raw difference. Sums go through the dsum quantized fold, so the table is
    parallelism-stable.

    Scale: one per-user aggregate, then 3 covariates × 2 arms of
    scalar moments."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1e4).cast("long"))
        .cast("long")
        .alias("tvq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    ).select(
        F.expr(_ARM_SQL).cast("int").alias("arm"),
        (F.col("tvq").cast("double") / 1e4).alias("total_value"),
        F.col("n_events").cast("double").alias("n_events"),
        F.col("n_types").cast("double").alias("n_event_types"),
    )
    long = None
    for cov in ("total_value", "n_events", "n_event_types"):
        part = u.select(
            "arm", F.lit(cov).alias("covariate"), F.col(cov).alias("x")
        )
        long = part if long is None else long.unionAll(part)
    mo = long.groupBy("covariate", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("x"), 4).alias("sx"),
        dsum(F.col("x") * F.col("x"), 2).alias("sxx"),
    )
    a = mo.filter(F.col("arm") == 0).select(
        "covariate",
        (F.col("sx") / F.col("n")).alias("m0"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v0"),
    )
    b = mo.filter(F.col("arm") == 1).select(
        "covariate",
        (F.col("sx") / F.col("n")).alias("m1"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v1"),
    )
    vsum = F.col("v0") + F.col("v1")
    smd_raw = (F.col("m1") - F.col("m0")) / F.sqrt(vsum / 2)
    smd = F.when(vsum > 0, smd_raw).otherwise(F.lit(0.0))
    return (
        a.join(b, "covariate")
        .select(
            "covariate",
            F.round(F.col("m0"), 4).alias("mean_control"),
            F.round(F.col("m1"), 4).alias("mean_treatment"),
            F.round(smd, 4).alias("smd"),
            F.when((vsum == 0) | (F.abs(smd_raw) < 0.1), 1)
            .otherwise(0)
            .alias("balanced"),
        )
        .orderBy("covariate")
    )


@register(
    "ab_proportion_power",
    f"""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(conv) AS BIGINT) AS n_conv
        FROM (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        )
    ), lifts AS (
        SELECT UNNEST([0.05, 0.10, 0.20]) AS rel_lift
    ), calc AS (
        SELECT l.rel_lift, b.n_users, b.n_conv,
               CAST(b.n_conv AS DOUBLE) / b.n_users AS p1,
               LEAST(CAST(b.n_conv AS DOUBLE) / b.n_users
                     * (1 + l.rel_lift), 0.999) AS p2
        FROM lifts l CROSS JOIN base b
    )
    SELECT rel_lift, ROUND(p1, 6) AS base_rate,
           ROUND(p2, 6) AS target_rate,
           CAST(CEIL(
               POWER(1.959964 * SQRT(2 * ((p1 + p2) / 2)
                                     * (1 - (p1 + p2) / 2))
                     + 0.841621 * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm,
           ROUND(CEIL(
               POWER(1.959964 * SQRT(2 * ((p1 + p2) / 2)
                                     * (1 - (p1 + p2) / 2))
                     + 0.841621 * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / ((p2 - p1) * (p2 - p1))) * 2.0 / n_users, 2)
               AS multiples_of_population,
           ROUND((1.959964 + 0.841621)
                 * SQRT(2 * p1 * (1 - p1) / (n_users / 2.0)) / p1, 6)
               AS mde_rel_at_current_n
    FROM calc
    ORDER BY rel_lift
    """,
)
def ab_proportion_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power design table (Fleiss eq. 3.14 shape): for
    relative conversion lifts of 5/10/20% over the OBSERVED per-user
    purchase rate, the per-arm n at α = 0.05 / 80% power — n =
    (z_{α/2}√(2p̄q̄) + z_β√(p₁q₁+p₂q₂))²/Δ² — plus two numbers every
    experiment review actually argues about: how many multiples of
    the current population that is, and the inverse question, the
    minimum detectable RELATIVE effect if you just split today's
    users (MDE = (z_α+z_β)√(2p̄q̄/(n/2))/p̄). Completes
    ``ab_power_analysis`` (continuous means) with the binary-outcome
    version the funnel metrics need; the target rate clamps at 0.999
    (this fixture's per-user conversion is already high, so large
    relative lifts saturate — the table shows exactly that); z
    constants are the same fixed literals.

    Scale: one per-user aggregate, then a 3-row design grid."""
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("conv").cast("long").alias("n_conv"),
        )
    )
    lifts = spark.createDataFrame([(0.05,), (0.10,), (0.20,)], ["rel_lift"])
    calc = lifts.crossJoin(F.broadcast(base)).select(
        "rel_lift",
        "n_users",
        "n_conv",
        (F.col("n_conv").cast("double") / F.col("n_users")).alias("p1"),
        F.least(
            F.col("n_conv").cast("double")
            / F.col("n_users")
            * (1 + F.col("rel_lift")),
            F.lit(0.999),
        ).alias("p2"),
    )
    p1, p2 = F.col("p1"), F.col("p2")
    pbar = (p1 + p2) / 2
    n_arm = F.ceil(
        F.pow(
            1.959964 * F.sqrt(2 * pbar * (1 - pbar))
            + 0.841621 * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
            F.lit(2.0),
        )
        / ((p2 - p1) * (p2 - p1))
    )
    mde = (
        (1.959964 + 0.841621)
        * F.sqrt(2 * p1 * (1 - p1) / (F.col("n_users") / F.lit(2.0)))
        / p1
    )
    return calc.select(
        "rel_lift",
        F.round(p1, 6).alias("base_rate"),
        F.round(p2, 6).alias("target_rate"),
        n_arm.cast("long").alias("n_per_arm"),
        F.round(n_arm * 2.0 / F.col("n_users"), 2).alias(
            "multiples_of_population"
        ),
        F.round(mde, 6).alias("mde_rel_at_current_n"),
    ).orderBy("rel_lift")
