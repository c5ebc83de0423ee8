"""Scan-path operators (SURVEY.md §2.2-A, non-roundtrip half).

These look trivial at sf0.01 but encode the 100 TB posture: projection and
filter are expressed declaratively so Catalyst pushes them into the Parquet
scan (column pruning + row-group predicate pushdown — `ReadSchema` /
`PushedFilters` in explain; asserted in tests/test_plans.py). A scan that
reads all 11 lineitem columns for a 3-column projection would be wrong at
scale, not just slow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table, register_views


@register("scan_full", "SELECT * FROM region ORDER BY r_regionkey")
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").orderBy("r_regionkey")


@register(
    "scan_projection",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "scan_filter_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 3.0 AND l_returnflag = 'R'
    """,
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result is identical to a plain WHERE; the point is *where* the
    predicate runs — tests assert it reaches the Parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") < 3.0) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


_CATALOG_SQL = """
SELECT n.n_name, r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


@register("catalog_view_sql", _CATALOG_SQL)
def catalog_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temp-view + SQL entry point: the same SQL text runs on the Spark
    catalog and on the DuckDB oracle (the reference's analog is handlers
    issuing SQL strings to Postgres, reference src/processor.ts:26)."""
    register_views(spark, sf_dir)
    return spark.sql(_CATALOG_SQL)


_SQL_SURFACE = {
    # Scalar subquery → Catalyst rewrites to a broadcast of the 1-row agg.
    # The threshold goes through the exact-sum discipline (functions/exact.py):
    # this SQL text runs verbatim on BOTH engines, and a plain AVG(double)
    # would sum in engine-specific order — a boundary row could then flip
    # between Spark and the oracle. FLOOR-quantize + DECIMAL sum is
    # bit-identical everywhere.
    "sql_subquery_scalar": """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS DECIMAL(28,0))) AS DOUBLE)
               / 10000.0 / COUNT(*) * 1.8
        FROM orders)
    """,
    # IN-subquery → left semi join.
    "sql_subquery_in": """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    # Correlated EXISTS → decorrelated into a semi join (no per-row rescan).
    "sql_exists_correlated": """
    SELECT c_custkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
    """,
    # Inline VALUES dim — the "small lookup table typed into the query"
    # surface. Both engines parse the same text; the join side is a 5-row
    # constant relation (Spark: LocalRelation, broadcast for free), and the
    # revenue sums go through the exact-sum discipline so the weighted
    # metric hash-matches at any parallelism.
    "sql_values_inline": """
    SELECT w.weight, o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 10000.0) AS DECIMAL(28,0)))
                AS DOUBLE) / 10000.0 AS revenue,
           ROUND(w.weight
                 * (CAST(SUM(CAST(FLOOR(o.o_totalprice * 10000.0) AS DECIMAL(28,0)))
                         AS DOUBLE) / 10000.0), 4) AS weighted_revenue
    FROM orders o
    JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
                 ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(prio, weight)
      ON o.o_orderpriority = w.prio
    GROUP BY w.weight, o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    # Named WINDOW clause reused by several window functions — the SQL
    # surface that keeps one frame definition authoritative (Spark does
    # not allow refining a named window inline, so the framed sum gets its
    # own named window). Same text on both engines; Spark plans ONE
    # Window operator for all four functions because the specs share the
    # (partition, order) pair.
    "sql_named_window": """
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(RANK() OVER w AS INTEGER) AS rk,
           LAG(o_orderkey) OVER w AS prev_key,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS DECIMAL(28,0)))
                    OVER w2 AS DOUBLE) / 10000.0 AS running_total
    FROM orders
    WHERE o_custkey <= 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, rn
    """,
    # Non-recursive CTE, referenced once more downstream.
    "sql_cte": """
    WITH big AS (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    )
    SELECT n, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM big GROUP BY n
    """,
}


def _sql_surface_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


for _name, _sql in _SQL_SURFACE.items():
    # One SQL text, two engines: Catalyst decorrelates/rewrites these into
    # the same join shapes §2.2-C tests directly; registering them through
    # spark.sql pins the SQL-entry surface a reference user actually types.
    _sql_surface_query.__doc__ = None
    register(_name, _sql)(_sql_surface_query(_sql))


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
             SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2
         ) t
    WHERE c.c_custkey < 50
"""


@register("sql_lateral", _LATERAL_SQL)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join — top-2 orders per customer as a
    per-row dependent subquery, the same SQL text on both engines. Spark
    plans the correlated LIMIT as a ranked window under the hood (no
    per-row rescan), which is exactly the decorrelation a 100 TB run
    needs."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_DISJUNCTIVE_SQL = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
                    AS DECIMAL(28,0))) AS STRING) AS qrevenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
"""


@register("join_disjunctive", _DISJUNCTIVE_SQL)
def join_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an equi-join whose residual predicate is an
    OR-of-ANDs across both sides. The optimizer test is predicate
    decomposition: the join key stays an equi-join (hash/broadcast, no
    cartesian), the common `p_brand IN (...)` implied filter is inferred
    and pushed to the part scan, and only the residual disjunction runs
    post-join. Same SQL text on both engines; revenue exact-quantized."""
    register_views(spark, sf_dir)
    return spark.sql(_DISJUNCTIVE_SQL)


@register(
    "sql_recursive",
    """
    WITH RECURSIVE chain AS (
        SELECT n_nationkey AS root, n_nationkey AS node, n_name AS name,
               0 AS depth
        FROM nation WHERE n_nationkey < 5
        UNION ALL
        SELECT c.root, n.n_nationkey, n.n_name, c.depth + 1
        FROM nation n JOIN chain c ON n.n_nationkey = c.node + 5
    )
    SELECT root, node, name, depth FROM chain ORDER BY root, depth
    """,
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): walk 5 synthetic parent chains through the
    nation table (parent = key - 5), re-joining the base table at every
    step — the hierarchy/transitive-closure surface (org charts, BOM
    explosions, graph reachability). Spark executes each recursion level
    as a fresh join stage; depth is bounded by
    ``spark.sql.cteRecursionLevelLimit`` — at scale prefer the
    pointer-jumping O(log n) formulation used by ``dedup_cluster`` when
    depth is data-dependent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT n_nationkey AS root, n_nationkey AS node, n_name AS name,
                   0 AS depth
            FROM nation WHERE n_nationkey < 5
            UNION ALL
            SELECT c.root, n.n_nationkey, n.n_name, c.depth + 1
            FROM nation n JOIN chain c ON n.n_nationkey = c.node + 5
        )
        SELECT root, node, name, depth FROM chain ORDER BY root, depth
        """
    )


@register(
    "sql_parameterized",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 350000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the statement
    text carries ``:min_price`` / ``:status`` placeholders and values bind
    at execution — the injection-safe serving surface a query service
    exposes (the reference dispatches handler args the same way,
    ``pkt.args`` spreading, src/processor.ts:71-75). The oracle runs the
    equivalent with literals inlined; Catalyst folds the bound constants
    so the physical plan — including the pushed filter — is identical to
    the literal form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 350000.0, "status": "F"},
    )

@register(
    "sql_groupby_all",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+/DuckDB dialect sugar): every
    non-aggregate select item becomes a grouping key — the exact same SQL
    text runs on both engines and must produce the same plan shape as the
    explicit column list (a plain partial→final hash aggregate)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@register(
    "sql_distinct_on",
    """
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON emulation: DuckDB/Postgres's ``DISTINCT ON (key) ...
    ORDER BY key, rank_cols`` keeps the first row per key; Spark has no
    DISTINCT ON, so the engine-native form is the ranked-window idiom
    (row_number over (partition by key order by rank_cols) = 1) — the
    rewrite every Postgres→Spark migration performs. Fully deterministic
    because the order key chain (price DESC, orderkey) is unique per
    customer."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "sql_qualify",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey <= 2000
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                               ORDER BY l_extendedprice DESC, l_linenumber) <= 2
    """,
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY emulation: DuckDB/Snowflake's window-filter clause keeps
    rows by a window predicate after windows evaluate; Spark (OSS) has no
    QUALIFY, so the engine form is the explicit subquery-then-filter —
    semantically identical, and Catalyst compiles the rank-filter to the
    same WindowGroupLimit pushdown a native QUALIFY would use (top-2
    lineitems per order never materialize the full window)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


_PIVOT_SQL_SPARK = """
    SELECT * FROM (
        SELECT o_orderpriority, o_orderstatus, o_totalprice
        FROM orders
    )
    PIVOT (
        CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
             AS DOUBLE) / 100.0 AS total
        FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
    )
    ORDER BY o_orderpriority
"""


@register(
    "sql_pivot_syntax",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100.0
               AS f_total,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0
               AS o_total,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) / 100.0
               AS p_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (Spark SQL surface) — status columns out
    of status rows with an exact-quantized total per cell. The oracle
    spells the engine-neutral equivalent (FILTER conditional aggregation)
    because pivot dialects differ; semantically a pivot IS a conditional
    aggregate, and Spark compiles it to exactly that single hash
    aggregate (no per-column scan)."""
    register_views(spark, sf_dir)
    # a single-aggregate PIVOT names its columns by the IN alias alone
    return spark.sql(_PIVOT_SQL_SPARK).select(
        "o_orderpriority",
        F.col("f").alias("f_total"),
        F.col("o").alias("o_total"),
        F.col("p").alias("p_total"),
    )


@register(
    "sql_any_all_quantifiers",
    """
    SELECT
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier))
             AS BIGINT) AS richer_than_all_suppliers,
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_acctbal > ANY (SELECT s_acctbal FROM supplier))
             AS BIGINT) AS richer_than_some_supplier,
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_nationkey = ANY (SELECT s_nationkey FROM supplier))
             AS BIGINT) AS shares_nation_with_supplier
    """,
)
def sql_any_all_quantifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY/ALL quantified comparisons and their engine rewrites: DuckDB
    evaluates the quantifiers natively; Spark SQL has no > ALL/> ANY
    syntax, so the engine applies the standard scalar rewrite — > ALL ≡
    > MAX(...), > ANY ≡ > MIN(...), = ANY ≡ IN — which is exactly what a
    planner does internally (valid here because the subquery side is
    non-empty and null-free; `join_not_in_null_aware` documents what
    NULLs would do). The rewrite turns a quantified comparison into one
    broadcast scalar + a conditional count: one pass at any scale."""
    from hive_processor_spark.sources.tables import load_table as _lt

    cust = _lt(spark, sf_dir, "customer")
    supp = _lt(spark, sf_dir, "supplier")
    bounds = supp.agg(
        F.max("s_acctbal").alias("mx"), F.min("s_acctbal").alias("mn")
    )
    nations = supp.select("s_nationkey").distinct()
    richer = cust.crossJoin(F.broadcast(bounds)).agg(
        F.count_if(F.col("c_acctbal") > F.col("mx"))
        .cast("bigint")
        .alias("richer_than_all_suppliers"),
        F.count_if(F.col("c_acctbal") > F.col("mn"))
        .cast("bigint")
        .alias("richer_than_some_supplier"),
    )
    shares = (
        cust.join(
            F.broadcast(nations),
            cust["c_nationkey"] == nations["s_nationkey"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shares_nation_with_supplier"))
    )
    return richer.crossJoin(shares)


_UNPIVOT_SQL_SPARK = """
    SELECT o_orderpriority, status, total FROM (
        SELECT o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100.0
                   AS F,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0
                   AS O,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) / 100.0
                   AS P
        FROM orders GROUP BY o_orderpriority
    ) wide
    UNPIVOT (total FOR status IN (F, O, P))
    ORDER BY o_orderpriority, status
"""


@register(
    "sql_unpivot_syntax",
    """
    SELECT o_orderpriority,
           o_orderstatus AS status,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    WHERE o_orderstatus IN ('F', 'O', 'P')
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, status
    """,
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``UNPIVOT`` clause (Spark 3.4+ surface, the inverse of
    ``sql_pivot_syntax``): status columns melted back into rows. The
    oracle spells the dialect-neutral equivalent — the long-form grouped
    aggregate — because a round-tripped pivot⁻¹ IS that aggregate; the
    parity also proves Spark's default NULL-dropping unpivot matches the
    present-combinations-only semantics of GROUP BY. Same single hash
    aggregate underneath; the melt is a zero-shuffle projection."""
    register_views(spark, sf_dir)
    return spark.sql(_UNPIVOT_SQL_SPARK)


_ORDER_BY_ALL_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register("sql_order_by_all", _ORDER_BY_ALL_SQL)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ALL`` (Spark 3.4+/DuckDB dialect sugar, the companion
    of ``sql_groupby_all``): sort by every select item left-to-right.
    The (priority, status) key pair is unique after the aggregate, so
    ALL yields a total order and the hash gate pins that both engines
    expand the sugar to the same column list in the same direction.

    Scale: identical plan to the explicit ORDER BY — one partial→final
    aggregate plus a range-partitioned sort of the group-sized frame."""
    register_views(spark, sf_dir)
    return spark.sql(_ORDER_BY_ALL_SQL)


@register(
    "sql_variables",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    WHERE o_totalprice >= 450000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (SQL:2016 / Spark 4 ``DECLARE VARIABLE`` +
    ``SET VAR``): the price floor and status are declared as typed
    session state, reassigned with SET VAR, and referenced by name
    inside the query — the scripting surface that replaces string
    interpolation for runbook-style SQL. DECLARE OR REPLACE keeps the
    operator idempotent per session; the oracle runs the equivalent
    with the final variable values inlined, so the gate pins that
    variable resolution injects exactly the assigned values.

    Scale: variables fold to literals at analysis time — the plan is
    identical to the inlined query (same pushdown, same pruning)."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 400000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE status_wanted STRING DEFAULT 'F'")
    spark.sql("SET VAR price_floor = 450000.0")
    spark.sql("SET VAR status_wanted = 'O'")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(28,0)))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        WHERE o_totalprice >= price_floor AND o_orderstatus = status_wanted
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "sql_identifier_clause",
    """
    SELECT o_orderpriority AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY grp
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IDENTIFIER(:param)`` dynamic identifiers (Spark 3.4+): table,
    grouping column, and aggregated column arrive as PARAMETERS, not
    spliced strings — the injection-safe templating surface for
    metric-store queries that pivot over table/column names. The oracle
    is the statically-written equivalent, so the gate pins that
    identifier resolution is pure name indirection with no semantic
    drift.

    Scale: identifiers resolve at parse time; the plan is byte-identical
    to the static query."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MAX(IDENTIFIER(:val_col)), 2) AS max_price
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        ORDER BY grp
        """,
        args={
            "tbl": "orders",
            "grp_col": "o_orderpriority",
            "val_col": "o_totalprice",
        },
    )
