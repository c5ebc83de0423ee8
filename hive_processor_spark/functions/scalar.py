"""Scalar function families (SURVEY.md §2.2-H) — one registered query per
family, all built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on this path).

Oracle discipline (§2.3.6): stick to the Spark∩DuckDB-agreeing subset —
``element_at``/1-indexed lists, no bare ``log``, no ``dayofweek``, explicit
casts where DuckDB's return types are wider (BIGINT ``year()``/``length()``,
DOUBLE ``ceil()``), floor-quantization instead of tie-ambiguous rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


@register(
    "fn_string",
    """
    SELECT p_partkey,
           p_name || '|' || p_brand AS tagged,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           SUBSTRING(p_name, 1, 4) AS name4,
           TRIM('  ' || p_name || ' ') AS trimmed,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REPLACE(p_name, ' ', '_') AS snake,
           LPAD(p_brand, 10, '*') AS padded,
           REVERSE(p_name) AS rev_name,
           STRING_SPLIT(p_name, ' ')[1] AS first_word
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(F.col("p_name"), F.lit("|"), F.col("p_brand")).alias("tagged"),
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad("p_brand", 10, "*").alias("padded"),
        F.reverse("p_name").alias("rev_name"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
    )


@register(
    "fn_regex",
    """
    SELECT c_custkey,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
           REGEXP_REPLACE(c_name, '[0-9]+', '#') AS masked,
           REGEXP_EXTRACT(c_name, '^([A-Za-z]+)', 1) AS word
    FROM customer
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patterns stay in the Java∩RE2 subset (classes, groups, quantifiers —
    no backrefs/lookaround), where both engines agree."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked"),
        F.regexp_extract("c_name", "^([A-Za-z]+)", 1).alias("word"),
    )


@register(
    "fn_date",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAY(o_orderdate) AS INT) AS dy,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
           STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avoids dayofweek/weekofyear (engine numbering differs, §2.3.6)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_99"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "fn_timestamp",
    """
    SELECT event_id,
           CAST(HOUR(ts) AS INT) AS hr,
           CAST(MINUTE(ts) AS INT) AS mi,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_s,
           STRFTIME(TO_TIMESTAMP(CAST(FLOOR(EPOCH(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_s,
           STRFTIME(MAKE_TIMESTAMP(2024, 2, 1, 12, 30, 0), '%Y-%m-%d %H:%M:%S') AS fixed_ts
    FROM events
    """,
)
def fn_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session TZ is UTC (engine conf) — DuckDB timestamps are naive, so
    parity only holds in UTC. Epochs floor to whole seconds (ns vs µs
    precision difference is below the emitted grain)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format(
            F.timestamp_seconds(F.unix_timestamp("ts")), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_s"),
        F.date_format(
            F.make_timestamp(
                F.lit(2024), F.lit(2), F.lit(1), F.lit(12), F.lit(30), F.lit(0)
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("fixed_ts"),
    )


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           (FLOOR(ABS(l_extendedprice - 30000.0) * 100.0) / 100.0) AS abs_spread,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           ROUND(SQRT(l_quantity), 4) AS qty_sqrt,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           (FLOOR(POWER(l_quantity, 2.0) * 100.0) / 100.0) AS qty_sq,
           l_orderkey % 97 AS bucket,
           CAST(SIGN(l_extendedprice - 30000.0) AS INT) AS side
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ln``/``log10`` by unambiguous name (bare ``log`` is ln in Spark,
    log10 in DuckDB — §2.3.6); transcendentals rounded (libm last-ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.abs(F.col("l_extendedprice") - 30000.0) * 100.0) / 100.0).alias(
            "abs_spread"
        ),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        (F.floor(F.pow("l_quantity", 2.0) * 100.0) / 100.0).alias("qty_sq"),
        (F.col("l_orderkey") % 97).alias("bucket"),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("int").alias("side"),
    )


@register(
    "fn_cond",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg,
           GREATEST(c_acctbal, 0.0) AS bal_pos,
           LEAST(c_acctbal, 1000.0) AS bal_cap,
           CASE WHEN c_acctbal < 0.0 THEN 'neg' ELSE 'pos' END AS bal_side
    FROM customer
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(none)")).alias(
            "seg"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_pos"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap"),
        F.when(F.col("c_acctbal") < 0.0, "neg").otherwise("pos").alias("bal_side"),
    )


@register(
    "fn_hash",
    """
    SELECT n_nationkey, MD5(n_name) AS name_md5, SHA256(n_name) AS name_sha256
    FROM nation
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2("n_name", 256).alias("name_sha256"),
    )


_VSUM = (
    "CAST(LIST_AGGREGATE(LIST_TRANSFORM({v}, x -> "
    "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)), 'sum') AS DOUBLE) / 1000000.0"
)


@register(
    "fn_array",
    f"""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[2] AS DOUBLE), 4) AS e2,
           {_VSUM.format(v='embedding')} AS vsum,
           {_VSUM.format(v='embedding[1:8]')} AS head_sum,
           ROUND(CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE), 4) AS vmin,
           ROUND(CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE), 4) AS vmax
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over 64-dim float vectors via higher-order functions —
    stays in codegen, no UDF. Element sums are floor-quantized to integer
    units so fold order can't matter."""
    emb = load_table(spark, sf_dir, "embeddings")

    def vsum(col: F.Column) -> F.Column:
        q = F.transform(
            col, lambda x: F.floor(x.cast("double") * F.lit(1e6)).cast("long")
        )
        return (
            F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).cast("double")
            / F.lit(1e6)
        )

    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 2).cast("double"), 4).alias("e2"),
        vsum(F.col("embedding")).alias("vsum"),
        vsum(F.slice("embedding", 1, 8)).alias("head_sum"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vmax"),
    )


@register(
    "fn_array_explode",
    """
    SELECT doc_id,
           CAST(UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS INT) AS pos,
           UNNEST(STRING_SPLIT(text, ' ')) AS word,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'data') AS has_data
    FROM documents
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (1-based ordinal to match the DuckDB zip-unnest oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return (
        docs.select(
            "doc_id",
            F.posexplode(words).alias("pos0", "word"),
            F.array_contains(words, "data").alias("has_data"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            "word",
            "has_data",
        )
    )


@register(
    "fn_map",
    """
    SELECT n_name,
           MAP_EXTRACT(MAP {'nat': n_nationkey, 'reg': n_regionkey}, 'nat')[1] AS nat_v,
           MAP_EXTRACT(MAP {'nat': n_nationkey, 'reg': n_regionkey}, 'reg')[1] AS reg_v
    FROM nation
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nat"), F.col("n_nationkey"), F.lit("reg"), F.col("n_regionkey")
    )
    return nation.select(
        "n_name",
        F.element_at(m, "nat").alias("nat_v"),
        F.element_at(m, "reg").alias("reg_v"),
    )


@register(
    "fn_struct",
    """
    SELECT s_suppkey,
           STRUCT_PACK(nm := s_name, bal := s_acctbal).nm AS nm,
           STRUCT_PACK(nm := s_name, bal := s_acctbal).bal AS bal
    FROM supplier
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    st = F.struct(F.col("s_name").alias("nm"), F.col("s_acctbal").alias("bal"))
    return supp.select(
        "s_suppkey",
        st.getField("nm").alias("nm"),
        st.getField("bal").alias("bal"),
    )


@register(
    "fn_json",
    """
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@register(
    "fn_json_parse",
    """
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k
    FROM events
    """,
)
def fn_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k")
    )


@register(
    "fn_bitwise",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 4096 AS b_or,
           XOR(o_orderkey, 1365) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — two's-complement semantics agree across engines for
    non-negative keys; shifts stay within 64-bit range by construction."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
    )


@register(
    "fn_trig",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SIN(l_discount), 6) AS s,
           ROUND(COS(l_discount), 6) AS c,
           ROUND(TAN(l_discount), 6) AS t,
           ROUND(ATAN2(l_discount, l_tax + 0.01), 6) AS a2,
           ROUND(DEGREES(l_discount), 6) AS deg,
           ROUND(RADIANS(l_quantity), 6) AS rad
    FROM lineitem
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family — libm on both engines; 6-dp rounding absorbs
    any last-ULP divergence (same discipline as exp/ln in fn_math)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("s"),
        F.round(F.cos("l_discount"), 6).alias("c"),
        F.round(F.tan("l_discount"), 6).alias("t"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01), 6).alias("a2"),
        F.round(F.degrees("l_discount"), 6).alias("deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
    )


@register(
    "fn_string_format",
    """
    SELECT n_nationkey,
           LPAD(n_name, 20, '.') AS padded,
           RPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_padded,
           CONCAT_WS('-', n_name, CAST(n_regionkey AS VARCHAR)) AS joined,
           TRANSLATE(n_name, 'AEIOU', 'aeiou') AS vowels_lower,
           REVERSE(n_name) AS reversed,
           REPEAT(LEFT(n_name, 2), 3) AS stutter
    FROM nation
    """,
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family: pad / multi-arg join / character
    translation / reverse / repeat — the second tier of string functions
    after the core fn_string set, all codegen expressions."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.lpad("n_name", 20, ".").alias("padded"),
        F.rpad(F.col("n_nationkey").cast("string"), 4, "0").alias("key_padded"),
        F.concat_ws(
            "-", F.col("n_name"), F.col("n_regionkey").cast("string")
        ).alias("joined"),
        F.translate("n_name", "AEIOU", "aeiou").alias("vowels_lower"),
        F.reverse("n_name").alias("reversed"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("stutter"),
    )


@register(
    "fn_try_cast",
    """
    SELECT doc_id,
           TRY_CAST(SUBSTRING(text, 1, 3) AS INTEGER) AS head_int,
           TRY_CAST(lang AS INTEGER) AS lang_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_int,
           TRY_CAST(SUBSTRING(text, 1, 10) AS DATE) IS NOT NULL AS head_is_date
    FROM documents
    WHERE doc_id < 100
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (TRY_CAST): malformed input becomes NULL instead
    of failing the job — the ingestion posture a 100 TB pipeline needs,
    where one bad row must not kill a stage. Both engines share TRY_CAST
    semantics for string→int and string→date."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.expr("TRY_CAST(SUBSTRING(text, 1, 3) AS INT)").alias("head_int"),
        F.expr("TRY_CAST(lang AS INT)").alias("lang_int"),
        F.expr("TRY_CAST(CAST(n_chars AS STRING) AS INT)").alias("chars_int"),
        F.expr("TRY_CAST(SUBSTRING(text, 1, 10) AS DATE)").isNotNull().alias(
            "head_is_date"
        ),
    )


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k,
           CAST(props->>'$.k' AS INT) % 10 AS k_mod
    FROM events
    ORDER BY event_id
    LIMIT 2000
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: ``parse_json`` once into a binary variant,
    then typed ``variant_get`` extractions — the semi-structured fast path
    that replaces per-access string re-parsing (`get_json_object`) with a
    parse-once columnar encoding; at 100 TB the difference is one JSON
    parse per row instead of one per extraction. Oracle mirrors with
    DuckDB's JSON operators."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            (F.try_variant_get(v, "$.k", "int") % 10).alias("k_mod"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@register(
    "fn_collation",
    """
    WITH mixed AS (
        SELECT c_mktsegment AS seg FROM customer
        UNION ALL
        SELECT UPPER(SUBSTR(c_mktsegment, 1, 1)) || LOWER(SUBSTR(c_mktsegment, 2))
        FROM customer
    )
    SELECT LOWER(seg) AS seg_ci, CAST(COUNT(*) AS BIGINT) AS n
    FROM mixed
    GROUP BY LOWER(seg)
    ORDER BY seg_ci
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4): mixed-case keys grouped under
    UTF8_LCASE collation — the engine-native path for case-insensitive
    semantics that previously forced LOWER() wrappers everywhere (and lost
    index/stats usefulness). Oracle normalizes with LOWER, which for the
    ASCII fixture keys is the same equivalence relation."""
    cust = load_table(spark, sf_dir, "customer")
    mixed = cust.select(F.col("c_mktsegment").alias("seg")).unionAll(
        cust.select(F.initcap(F.lower("c_mktsegment")).alias("seg"))
    )
    return (
        mixed.groupBy(F.collate("seg", "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.lower("seg")).alias("seg_ci"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("seg_ci", "n")
        .orderBy("seg_ci")
    )


@register(
    "fn_hof",
    """
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents
    )
    SELECT doc_id,
           LIST_CONTAINS(w, 'spark') AS has_spark,
           CAST(LEN(LIST_FILTER(w, x -> LEN(x) > 4)) AS INT) AS n_long,
           LEN(LIST_FILTER(w, x -> LEN(x) = 0)) = 0 AS all_nonempty,
           CAST(LIST_AGGREGATE(LIST_TRANSFORM(w, x -> LEN(x)), 'sum') AS BIGINT)
               AS total_chars
    FROM t
    ORDER BY doc_id
    """,
)
def fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a family: exists / filter / forall /
    transform+aggregate over the token array — the codegen'd lambda surface
    that keeps per-row array logic out of Python UDFs. Integer fold, so no
    quantization is needed for order independence."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    return (
        docs.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.exists("w", lambda x: x == "spark").alias("has_spark"),
            F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
            F.forall("w", lambda x: F.length(x) > 0).alias("all_nonempty"),
            F.aggregate(
                F.transform("w", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_try_arith",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / NULLIF(l_discount, 0.0), 4) AS price_per_disc,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'x' || CAST(l_quantity AS VARCHAR)
                         ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE) AS parsed_qty
    FROM lineitem
    WHERE l_orderkey < 400
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: ``try_divide`` yields NULL on zero divisors
    (instead of Inf or a job-killing ANSI error) and ``try_to_number``-style
    parsing yields NULL on malformed numerics — the per-row error policy
    that keeps a 100 TB job from dying on one bad record while staying
    ANSI-strict elsewhere. Oracle mirrors with NULLIF and TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    qty_str = F.when(
        F.col("l_linenumber") % 3 == 0,
        F.concat(F.lit("x"), F.col("l_quantity").cast("string")),
    ).otherwise(F.col("l_quantity").cast("string"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias(
                "price_per_disc"
            ),
            qty_str.try_cast("double").alias("parsed_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "fn_interval",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
           o_orderdate + INTERVAL 45 DAY AS plus_45d,
           CAST(LAST_DAY(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic family: month addition (with the
    end-of-month clamp both engines apply), day addition, month-end, and
    quarter truncation — the date-spine toolkit of every fiscal rollup.
    Pure codegen projections; the WHERE is a pushed-down key filter."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 5000)
        .select(
            "o_orderkey",
            F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3mo"),
            F.date_add(F.col("o_orderdate").cast("date"), 45)
            .cast("timestamp")
            .alias("plus_45d"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_binary",
    """
    SELECT n_nationkey,
           TO_BASE64(ENCODE(n_name)) AS b64,
           DECODE(FROM_BASE64(TO_BASE64(ENCODE(n_name)))) AS roundtrip,
           LOWER(TO_HEX(ENCODE(SUBSTR(n_name, 1, 4)))) AS hex4,
           CAST(OCTET_LENGTH(ENCODE(n_name)) AS INTEGER) AS n_bytes
    FROM nation
    ORDER BY n_nationkey
    """,
)
def fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary transport family: base64/hex encode-decode round-trips over
    utf-8 payload bytes — the envelope codecs of every wire format (the
    reference's own transport sniffs zlib/base64 envelopes, reference
    src/processor.ts:97-110). Pure codegen projections."""
    nation = load_table(spark, sf_dir, "nation")
    payload = F.encode(F.col("n_name"), "utf-8")
    return nation.select(
        "n_nationkey",
        F.base64(payload).alias("b64"),
        F.decode(F.unbase64(F.base64(payload)), "utf-8").alias("roundtrip"),
        F.lower(F.hex(F.encode(F.substring("n_name", 1, 4), "utf-8"))).alias(
            "hex4"
        ),
        F.octet_length("n_name").alias("n_bytes"),
    ).orderBy("n_nationkey")


@register(
    "fn_date_format",
    """
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
           STRFTIME(o_orderdate, '%d/%m/%Y') AS eu_day,
           STRFTIME(o_orderdate, '%Y-%m') AS year_month,
           CAST(STRFTIME(o_orderdate, '%j') AS INTEGER) AS day_of_year
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp→string formatting family (ISO day, locale-style day,
    year-month, zero-padded day-of-year) — the presentation codecs of
    every export job. Spark's java.time patterns and DuckDB's strftime
    spell the same outputs; the oracle proves the mapping. Codegen
    projections over a pushed key filter."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
            F.date_format("o_orderdate", "dd/MM/yyyy").alias("eu_day"),
            F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
            F.date_format("o_orderdate", "D").cast("int").alias("day_of_year"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_array_sets",
    """
    WITH t AS (
        SELECT n_nationkey, n_regionkey,
               [n_nationkey, n_regionkey, n_nationkey % 5] AS a,
               [n_regionkey, n_nationkey % 3, 7] AS b
        FROM nation
    )
    SELECT n_nationkey,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(a || b)), ',') AS u,
           ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(a, b)), ',') AS i,
           COALESCE(ARRAY_TO_STRING(
               LIST_SORT(LIST_DISTINCT(
                   LIST_FILTER(a, x -> NOT LIST_CONTAINS(b, x)))), ','), '')
               AS d,
           LIST_CONTAINS(a, n_regionkey) AS has_region
    FROM t
    ORDER BY n_nationkey
    """,
)
def fn_array_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra family: union, intersection, difference,
    membership — the collection operators behind tag/feature-set
    manipulation. The set algebra stays in codegen array builtins; each
    result is then serialized ``array_join(array_sort(...), ',')`` to a
    canonical scalar string per the §2.3 hashing discipline (the external
    canonicalizer sorts rows via pandas and cannot hash raw lists). No
    shuffle. (Spark's array_union/array_intersect/array_except
    de-duplicate; the oracle mirrors with LIST_DISTINCT.)"""
    nation = load_table(spark, sf_dir, "nation")
    a = F.array(
        F.col("n_nationkey"), F.col("n_regionkey"), F.col("n_nationkey") % 5
    )
    b = F.array(F.col("n_regionkey"), F.col("n_nationkey") % 3, F.lit(7))

    def joined(arr):
        return F.array_join(
            F.transform(F.array_sort(arr), lambda x: x.cast("string")), ","
        )

    return nation.select(
        "n_nationkey",
        joined(F.array_union(a, b)).alias("u"),
        joined(F.array_intersect(a, b)).alias("i"),
        joined(F.array_except(a, b)).alias("d"),
        F.array_contains(a, F.col("n_regionkey")).alias("has_region"),
    ).orderBy("n_nationkey")


@register(
    "fn_struct_mutate",
    """
    WITH t AS (
        SELECT n_nationkey,
               {'nation': n_name, 'region': n_regionkey,
                'tier': CASE WHEN n_regionkey < 2 THEN 'east' ELSE 'west' END}
                   AS enriched,
               {'nation': n_name, 'region': n_regionkey + 100} AS rekeyed
        FROM nation
    )
    SELECT n_nationkey,
           enriched.nation AS enriched_nation,
           enriched.region AS enriched_region,
           enriched.tier AS enriched_tier,
           rekeyed.nation AS rekeyed_nation,
           rekeyed.region AS rekeyed_region
    FROM t
    ORDER BY n_nationkey
    """,
)
def fn_struct_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct surgery: build a struct, add a derived field with
    ``withField``, rewrite one with another ``withField`` and drop the
    added one with ``dropFields`` — the nested-column evolution API a
    denormalized event schema needs (no full rebuild of the struct). The
    mutated structs are projected back to scalar fields for the output
    (§2.3 hashing discipline — the external canonicalizer cannot hash raw
    dicts); the withField/dropFields surgery stays in the plan, which is
    what the query exists to prove."""
    nation = load_table(spark, sf_dir, "nation")
    base = F.struct(
        F.col("n_name").alias("nation"), F.col("n_regionkey").alias("region")
    )
    enriched = base.withField(
        "tier", F.when(F.col("n_regionkey") < 2, "east").otherwise("west")
    )
    rekeyed = enriched.withField(
        "region", F.col("n_regionkey") + 100
    ).dropFields("tier")
    return (
        nation.select(
            "n_nationkey", enriched.alias("enriched"), rekeyed.alias("rekeyed")
        )
        .select(
            "n_nationkey",
            F.col("enriched.nation").alias("enriched_nation"),
            F.col("enriched.region").alias("enriched_region"),
            F.col("enriched.tier").alias("enriched_tier"),
            F.col("rekeyed.nation").alias("rekeyed_nation"),
            F.col("rekeyed.region").alias("rekeyed_region"),
        )
        .orderBy("n_nationkey")
    )

@register(
    "fn_surrogate_key",
    """
    SELECT n_nationkey,
           concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                  substr(h, 13, 4), '-', substr(h, 17, 4), '-',
                  substr(h, 21, 12)) AS sk
    FROM (
        SELECT n_nationkey,
               md5(concat_ws('|', 'nation', n_nationkey, n_name)) AS h
        FROM nation
    ) t
    ORDER BY n_nationkey
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUID-shaped surrogate keys: md5 over a namespaced
    natural-key string, formatted 8-4-4-4-12 — the reproducible
    alternative to ``uuid()``/``monotonically_increasing_id()`` (both
    nondeterministic across retries/re-plans, which poisons incremental
    joins at scale; a content-derived key is stable under replay,
    speculative re-execution, and backfills). Pure codegen string ops,
    no shuffle; identical text on both engines."""
    nation = load_table(spark, sf_dir, "nation")
    h = F.md5(F.concat_ws("|", F.lit("nation"), F.col("n_nationkey"), F.col("n_name")))
    sk = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return nation.select("n_nationkey", sk.alias("sk")).orderBy("n_nationkey")

@register(
    "fn_haversine",
    """
    WITH pts AS (
        SELECT s_suppkey,
               (CAST(s_suppkey * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0) AS lat,
               (CAST(s_suppkey * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0) AS lon
        FROM supplier
    )
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           ROUND(2.0 * 6371.0088 * ASIN(SQRT(
               POW(SIN(RADIANS(b.lat - a.lat) / 2.0), 2)
               + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                 * POW(SIN(RADIANS(b.lon - a.lon) / 2.0), 2))), 3) AS dist_km
    FROM pts a JOIN pts b ON b.s_suppkey = a.s_suppkey + 1
    ORDER BY supp_a
    """,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance between consecutive synthetic
    supplier coordinates — the geo-distance scalar family (radians, sin,
    cos, asin, sqrt composed identically on both engines, rounded to
    meters). Coordinates derive deterministically from the key so the
    fixture needs no geo columns; the join is a key-shifted equi-join.
    At scale geo joins bucket by geohash cell first (`join_spatial_grid`)
    and evaluate this formula only within candidate cells."""
    supp = load_table(spark, sf_dir, "supplier")
    pts = supp.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias(
            "lat"
        ),
        (
            (F.col("s_suppkey") * 104729 % 36000).cast("double") / 100.0 - 180.0
        ).alias("lon"),
    )
    a = pts.alias("a")
    b = pts.select(
        F.col("s_suppkey").alias("b_key"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
    )
    dlat = F.radians(F.col("b_lat") - F.col("lat")) / 2.0
    dlon = F.radians(F.col("b_lon") - F.col("lon")) / 2.0
    h = F.pow(F.sin(dlat), 2) + F.cos(F.radians(F.col("lat"))) * F.cos(
        F.radians(F.col("b_lat"))
    ) * F.pow(F.sin(dlon), 2)
    return (
        a.join(b, F.col("b_key") == F.col("s_suppkey") + 1)
        .select(
            F.col("s_suppkey").alias("supp_a"),
            F.col("b_key").alias("supp_b"),
            F.round(2.0 * 6371.0088 * F.asin(F.sqrt(h)), 3).alias("dist_km"),
        )
        .orderBy("supp_a")
    )


@register(
    "fn_humanize",
    """
    SELECT o_orderkey,
           CONCAT(CAST(CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS VARCHAR),
                  'K') AS price_kilo,
           CAST(CAST(CAST(FLOOR(o_totalprice / 100) AS DECIMAL(18,0)) / 10
                     AS DECIMAL(18,1)) AS VARCHAR) AS price_compact,
           LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded_key,
           CONCAT(CAST(CAST(FLOOR(o_totalprice * 100 /
                       (SELECT MAX(o_totalprice) FROM orders)) AS BIGINT)
                       AS VARCHAR), '%') AS pct_of_max
    FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
    """,
)
def fn_humanize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Humanized number formatting family: compact thousands ('123K'),
    one-decimal compact via exact floor arithmetic (no engine ROUND whose
    half-up/half-even tie rules diverge — SURVEY §2.3), zero-padded fixed
    keys, and percent-of-max labels — the presentation scalars every
    export/report job ends with. Pure codegen projections over a pushed
    key filter; the MAX subquery broadcasts one scalar."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("mx"))
    return (
        orders.filter(F.col("o_orderkey") <= 2000)
        .crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            F.concat(
                F.floor(F.col("o_totalprice") / 1000).cast("bigint").cast("string"),
                F.lit("K"),
            ).alias("price_kilo"),
            (
                F.floor(F.col("o_totalprice") / 100).cast("decimal(18,0)") / 10
            )
            .cast("decimal(18,1)")
            .cast("string")
            .alias("price_compact"),
            F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias(
                "padded_key"
            ),
            F.concat(
                F.floor(F.col("o_totalprice") * 100 / F.col("mx"))
                .cast("bigint")
                .cast("string"),
                F.lit("%"),
            ).alias("pct_of_max"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_luhn",
    """
    WITH acct AS (
        SELECT o_orderkey,
               LPAD(CAST((o_orderkey * 7919) % 1000000000000 AS VARCHAR),
                    12, '0') AS acct_no
        FROM orders WHERE o_orderkey <= 2000
    ),
    s AS (
        SELECT o_orderkey, acct_no,
               CAST(list_sum([
                   CASE WHEN (12 - i) % 2 = 1 THEN
                       CASE WHEN 2 * CAST(SUBSTR(acct_no, i, 1) AS INT) > 9
                            THEN 2 * CAST(SUBSTR(acct_no, i, 1) AS INT) - 9
                            ELSE 2 * CAST(SUBSTR(acct_no, i, 1) AS INT) END
                   ELSE CAST(SUBSTR(acct_no, i, 1) AS INT) END
                   FOR i IN RANGE(1, 13)]) AS BIGINT) AS luhn_sum
        FROM acct
    )
    SELECT o_orderkey, acct_no,
           CAST(luhn_sum % 10 AS INT) AS luhn_mod,
           luhn_sum % 10 = 0 AS is_valid
    FROM s
    ORDER BY o_orderkey
    """,
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 checksum validation (ISO/IEC 7812, the card/IMEI/account
    check digit) over synthetic 12-digit account numbers — the
    data-quality scrub every ingest of identifier-bearing columns runs.
    Digits are walked with one ``aggregate`` HOF (position parity from the
    right selects doubling; doubled digits >9 fold back by -9), entirely
    in codegen scalar ops — no UDF, no explode. Map-only at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    acct = orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.lpad(
            ((F.col("o_orderkey") * 7919) % 1000000000000).cast("string"),
            12,
            "0",
        ).alias("acct_no"),
    )
    luhn_sum = F.expr(
        "aggregate(sequence(1, 12), 0L, (acc, i) -> acc + "
        "CASE WHEN (12 - i) % 2 = 1 THEN "
        "  CASE WHEN 2 * CAST(substring(acct_no, i, 1) AS INT) > 9 "
        "       THEN 2 * CAST(substring(acct_no, i, 1) AS INT) - 9 "
        "       ELSE 2 * CAST(substring(acct_no, i, 1) AS INT) END "
        "ELSE CAST(substring(acct_no, i, 1) AS INT) END)"
    )
    return acct.select(
        "o_orderkey",
        "acct_no",
        (luhn_sum % 10).cast("int").alias("luhn_mod"),
        (luhn_sum % 10 == 0).alias("is_valid"),
    ).orderBy("o_orderkey")


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


@register(
    "fn_geohash",
    f"""
    WITH pts AS (
        SELECT s_suppkey,
               s_suppkey * 7919 % 18000 AS lat100,
               s_suppkey * 104729 % 36000 AS lon100
        FROM supplier
    ),
    scaled AS (
        SELECT s_suppkey, lat100, lon100,
               (lat100 * 1048576) // 18000 AS lat20,
               (lon100 * 1048576) // 36000 AS lon20
        FROM pts
    ),
    iv AS (
        SELECT s_suppkey, lat100, lon100,
               CAST(list_sum([
                   ((lon20 >> (19 - i)) & 1) * (1::BIGINT << (39 - 2*i))
                 + ((lat20 >> (19 - i)) & 1) * (1::BIGINT << (38 - 2*i))
                   FOR i IN RANGE(0, 20)]) AS BIGINT) AS v
        FROM scaled
    )
    SELECT s_suppkey,
           ROUND(CAST(lat100 AS DOUBLE) / 100.0 - 90.0, 2) AS lat,
           ROUND(CAST(lon100 AS DOUBLE) / 100.0 - 180.0, 2) AS lon,
           ARRAY_TO_STRING([SUBSTR('{_GEOHASH32}',
               CAST(((v >> (35 - 5*k)) & 31) AS INT) + 1, 1)
               FOR k IN RANGE(0, 8)], '') AS geohash8
    FROM iv
    ORDER BY s_suppkey
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-8 encoding (Niemeyer base-32 interleave) of synthetic
    supplier coordinates — the spatial bucketing key behind
    ``join_spatial_grid``-style geo joins and map-tile rollups. The
    encode is EXACT integer arithmetic end to end: coordinates are
    synthesized as integer hundredths (the ``fn_haversine`` fixture
    convention), scaled to 20-bit cell indices with integer division —
    identical to the textbook bisection's floor of the binary fraction —
    MSB-interleaved (even bits longitude, odd latitude) into a 40-bit
    cell id, and emitted as 8 base-32 chars. No floating point touches
    the hash, so prefixes nest perfectly: geohash4 of a point is
    char-prefix of geohash8, which is what makes prefix-range scans the
    spatial index. Map-only at any scale."""
    sup = load_table(spark, sf_dir, "supplier")
    pts = sup.select(
        "s_suppkey",
        (F.col("s_suppkey") * 7919 % 18000).alias("lat100"),
        (F.col("s_suppkey") * 104729 % 36000).alias("lon100"),
    ).select(
        "s_suppkey",
        "lat100",
        "lon100",
        F.expr("(lat100 * 1048576) DIV 18000").alias("lat20"),
        F.expr("(lon100 * 1048576) DIV 36000").alias("lon20"),
    )
    v = F.expr(
        "aggregate(sequence(0, 19), 0L, (acc, i) -> acc"
        " + shiftleft(shiftright(lon20, 19 - i) & 1, 39 - 2*i)"
        " + shiftleft(shiftright(lat20, 19 - i) & 1, 38 - 2*i))"
    )
    gh = F.expr(
        "aggregate(sequence(0, 7), '', (acc, k) -> concat(acc,"
        f" substring('{_GEOHASH32}',"
        " CAST((shiftright(v, 35 - 5*k) & 31) AS INT) + 1, 1)))"
    )
    return (
        pts.select(
            "s_suppkey",
            F.round(F.col("lat100").cast("double") / 100.0 - 90.0, 2).alias(
                "lat"
            ),
            F.round(F.col("lon100").cast("double") / 100.0 - 180.0, 2).alias(
                "lon"
            ),
            v.alias("v"),
        )
        .select("s_suppkey", "lat", "lon", gh.alias("geohash8"))
        .orderBy("s_suppkey")
    )


@register(
    "fn_ipv4_subnets",
    """
    WITH ips AS (
        SELECT event_id,
               CAST((event_id * 2654435761) % 4294967296 AS BIGINT) AS ip
        FROM events
    ), quads AS (
        SELECT event_id, ip,
               CAST(FLOOR(ip / 16777216) % 256 AS BIGINT) AS o1,
               CAST(FLOOR(ip / 65536) % 256 AS BIGINT) AS o2,
               CAST(FLOOR(ip / 256) % 256 AS BIGINT) AS o3,
               CAST(ip % 256 AS BIGINT) AS o4
        FROM ips
    ), g AS (
        SELECT o1, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT FLOOR(ip / 65536)) AS BIGINT)
                   AS distinct_slash16,
               MIN(ip) AS min_ip
        FROM quads GROUP BY 1
    )
    SELECT CONCAT(CAST(o1 AS VARCHAR), '.0.0.0/8') AS subnet,
           n, distinct_slash16,
           CONCAT(CAST(CAST(FLOOR(min_ip / 16777216) % 256 AS BIGINT)
                       AS VARCHAR), '.',
                  CAST(CAST(FLOOR(min_ip / 65536) % 256 AS BIGINT)
                       AS VARCHAR), '.',
                  CAST(CAST(FLOOR(min_ip / 256) % 256 AS BIGINT)
                       AS VARCHAR), '.',
                  CAST(CAST(min_ip % 256 AS BIGINT) AS VARCHAR))
               AS lowest_ip
    FROM g ORDER BY o1
    """,
)
def fn_ipv4_subnets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 rendering and subnet rollup from integer addresses (the
    fixture derives a deterministic synthetic 32-bit address per event
    via the Knuth hash — in production this is a real int-encoded client
    IP column): dotted-quad formatting by pure integer div/mod octet
    extraction, /8 aggregation with per-subnet counts and distinct-/16
    cardinality — the network-analytics slice of the scalar function
    surface (INET-style types without an INET extension on either
    engine). Everything is exact integer arithmetic + string concat, so
    the result is trivially hash-stable. Shape: map + one grouped count;
    shuffle ∝ 256 subnets."""
    ev = load_table(spark, sf_dir, "events")
    ips = ev.select(
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296))
        .cast("bigint")
        .alias("ip"),
    )
    ip = F.col("ip")
    g = ips.select(
        "ip",
        (F.floor(ip / 16777216) % 256).cast("bigint").alias("o1"),
        F.floor(ip / 65536).alias("s16"),
    ).groupBy("o1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("s16").cast("bigint").alias("distinct_slash16"),
        F.min("ip").alias("min_ip"),
    )
    m = F.col("min_ip")

    def octet(expr):
        return expr.cast("bigint").cast("string")

    return g.select(
        F.concat(F.col("o1").cast("string"), F.lit(".0.0.0/8")).alias(
            "subnet"
        ),
        "n",
        "distinct_slash16",
        F.concat_ws(
            ".",
            octet(F.floor(m / 16777216) % 256),
            octet(F.floor(m / 65536) % 256),
            octet(F.floor(m / 256) % 256),
            octet(m % 256),
        ).alias("lowest_ip"),
    ).orderBy("o1").drop("o1")


@register(
    "fn_time_bucket",
    """
    WITH b AS (
        SELECT CAST(FLOOR(epoch_us(ts) / 1e6 / 14400.0) AS BIGINT) AS bk,
               value, event_type
        FROM events
    )
    SELECT STRFTIME(TO_TIMESTAMP(bk * 14400), '%Y-%m-%d %H:%M:%S')
               AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchases,
           ROUND(CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS total_value
    FROM b GROUP BY bk ORDER BY bk
    """,
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-interval time bucketing (TimescaleDB ``time_bucket`` /
    hypertable-rollup semantics): 4-hour epoch-aligned buckets computed
    by pure integer floor-division of epoch seconds — not limited to
    calendar units like date_trunc, and origin-stable regardless of
    timezone or session settings. The bucket id is an exact integer on
    both engines (epoch-µs → seconds → ÷14400 floor), counts are exact,
    and the value sum is quantized cents — hash-stable anywhere. Shape:
    map + one grouped aggregation, shuffle ∝ buckets; this is the
    continuous-aggregate primitive a time-series store materializes
    incrementally, and the GROUP BY key a 100 TB stream rollup
    partitions on."""
    ev = load_table(spark, sf_dir, "events")
    bk = F.floor(F.unix_micros(F.col("ts")) / 1e6 / 14400.0).cast("bigint")
    b = ev.select(bk.alias("bk"), "value", "event_type")
    return (
        b.groupBy("bk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("bigint")
            .alias("purchases"),
            F.round(
                F.sum(F.floor(F.col("value") * 100.0).cast("long")).cast(
                    "double"
                )
                / 100.0,
                2,
            ).alias("total_value"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("bk") * 14400),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("bucket_start"),
            "n",
            "purchases",
            "total_value",
        )
        .orderBy("bucket_start")
    )


@register(
    "fn_fiscal_445",
    """
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
               DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS dno
        FROM orders
    ), f AS (
        SELECT day, cents, dno,
               CAST(FLOOR(dno / 364.0) AS BIGINT) AS fy,
               CAST(FLOOR((dno % 364) / 7.0) AS BIGINT) AS wk
        FROM d WHERE dno >= 0
    ), p AS (
        -- 4-4-5 pattern: weeks 0-3 -> P1, 4-7 -> P2, 8-12 -> P3, repeating
        SELECT day, cents, fy,
               CAST(FLOOR(wk / 13.0) AS BIGINT) AS fq,
               CAST(CASE WHEN wk % 13 < 4 THEN 1
                         WHEN wk % 13 < 8 THEN 2
                         ELSE 3 END AS INT) AS period_in_q
        FROM f
    )
    SELECT CAST(fy AS INT) AS fiscal_year,
           CAST(fq + 1 AS INT) AS fiscal_quarter,
           period_in_q,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(cents) / 100.0, 2) AS revenue
    FROM p
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def fn_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal-calendar rollup: map each order date to its fiscal
    year (364-day years from the 1995-01-01 epoch), 13-week quarter,
    and 4/4/5-week period — the retail/finance close calendar that
    calendar-month GROUP BYs cannot express, reduced to PURE INTEGER
    day-number arithmetic (datediff → floor-divisions), so the mapping
    is trivially identical on both engines and at any parallelism.
    The rollup itself is one grouped exact-cents sum. At 100 TB the
    fiscal keys are computed in codegen during the scan — zero extra
    passes; this is the calendar-dimension-free way to do fiscal
    reporting."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    dno = F.datediff(day, F.lit("1995-01-01").cast("date"))
    d = orders.select(
        F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
        dno.alias("dno"),
    ).filter(F.col("dno") >= 0)
    f = d.select(
        "cents",
        F.floor(F.col("dno") / 364.0).cast("bigint").alias("fy"),
        F.floor((F.col("dno") % 364) / 7.0).cast("bigint").alias("wk"),
    )
    p = f.select(
        "cents",
        "fy",
        F.floor(F.col("wk") / 13.0).cast("bigint").alias("fq"),
        F.when(F.col("wk") % 13 < 4, 1)
        .when(F.col("wk") % 13 < 8, 2)
        .otherwise(3)
        .cast("int")
        .alias("period_in_q"),
    )
    return (
        p.groupBy(
            F.col("fy").cast("int").alias("fiscal_year"),
            (F.col("fq") + 1).cast("int").alias("fiscal_quarter"),
            "period_in_q",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy("fiscal_year", "fiscal_quarter", "period_in_q")
    )


@register(
    "fn_modinv_obfuscate",
    """
    -- a = 387420489 (9^9), m = 2^31; a odd => invertible mod m;
    -- a_inv computed offline: a * a_inv ≡ 1 (mod 2^31)
    WITH params AS (
        SELECT CAST(387420489 AS BIGINT) AS a,
               CAST(505819385 AS BIGINT) AS a_inv,
               CAST(2147483648 AS BIGINT) AS m
    ), enc AS (
        SELECT c_custkey,
               (c_custkey * params.a) % params.m AS token
        FROM customer CROSS JOIN params
    ), dec AS (
        SELECT e.c_custkey, e.token,
               (e.token * params.a_inv) % params.m AS decoded
        FROM enc e CROSS JOIN params
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS distinct_tokens,
           CAST(COUNT(*) FILTER (WHERE decoded = c_custkey) AS BIGINT)
               AS roundtrip_ok,
           CAST(MIN(token) AS BIGINT) AS min_token,
           CAST(MAX(token) AS BIGINT) AS max_token
    FROM dec
    """,
)
def fn_modinv_obfuscate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reversible key pseudonymization by modular multiplication:
    token = key·a mod 2³¹ with odd multiplier a = 9⁹ (every odd a is a
    unit mod 2³¹), decoded by the precomputed modular inverse — the
    format-preserving obfuscation used when sharing joinable data
    without exposing sequential business keys (tokens scatter across
    the keyspace; sequence and volume inference break, equality joins
    survive). The operator proves the contract in-engine: token
    distinctness equals row count and EVERY row round-trips. Pure
    integer arithmetic — identical everywhere; map-only + one
    count-distinct at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    a, a_inv, m = 387420489, 505819385, 2147483648
    enc = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * F.lit(a)) % F.lit(m)).alias("token"),
    )
    dec = enc.select(
        "c_custkey",
        "token",
        ((F.col("token") * F.lit(a_inv)) % F.lit(m)).alias("decoded"),
    )
    return dec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("token").cast("bigint").alias("distinct_tokens"),
        F.count_if(F.col("decoded") == F.col("c_custkey"))
        .cast("bigint")
        .alias("roundtrip_ok"),
        F.min("token").cast("bigint").alias("min_token"),
        F.max("token").cast("bigint").alias("max_token"),
    )


@register(
    "fn_semver",
    """
    WITH v AS (
        SELECT p_brand,
               'v' || CAST(p_partkey % 5 AS VARCHAR) || '.'
                   || CAST(p_partkey % 20 AS VARCHAR) || '.'
                   || CAST(p_partkey % 50 AS VARCHAR) AS version
        FROM part
    ), parsed AS (
        SELECT p_brand, version,
               CAST(STR_SPLIT(SUBSTR(version, 2), '.')[1] AS BIGINT) AS major,
               CAST(STR_SPLIT(SUBSTR(version, 2), '.')[2] AS BIGINT) AS minor,
               CAST(STR_SPLIT(SUBSTR(version, 2), '.')[3] AS BIGINT) AS patch
        FROM v
    ), keyed AS (
        SELECT p_brand, version, major, minor, patch,
               major * 1000000 + minor * 1000 + patch AS ord_key
        FROM parsed
    ), latest AS (
        SELECT p_brand, version AS latest_version, major, minor, patch
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
                          ORDER BY ord_key DESC, version) AS rn
            FROM keyed
        ) t WHERE rn = 1
    )
    SELECT k.p_brand,
           CAST(COUNT(DISTINCT k.version) AS BIGINT) AS distinct_versions,
           MAX(l.latest_version) AS latest_version,
           CAST(MAX(l.major) AS INT) AS latest_major,
           CAST(COUNT(*) FILTER (WHERE k.major = 0) AS BIGINT)
               AS v0_parts
    FROM keyed k JOIN latest l ON l.p_brand = k.p_brand
    GROUP BY k.p_brand ORDER BY k.p_brand
    """,
)
def fn_semver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version parse/compare surface: render synthetic
    ``vMAJOR.MINOR.PATCH`` strings, parse them back by split, and order
    them CORRECTLY — numerically per component via an integer sort key,
    never lexicographically (the classic bug where 'v1.10.0' sorts
    before 'v1.9.0') — reporting each brand's latest version and the
    count still on major 0. All parsing is split/cast string work in
    codegen; ordering and the per-brand argmax (WindowGroupLimit) are
    exact integers. The dependency-resolution / artifact-registry
    primitive, shaped as one grouped window pass."""
    part = load_table(spark, sf_dir, "part")
    version = F.concat(
        F.lit("v"),
        (F.col("p_partkey") % 5).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 20).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 50).cast("string"),
    )
    v = part.select("p_brand", version.alias("version"))
    parts_arr = F.split(F.substring(F.col("version"), 2, 1000), r"\.")
    parsed = v.select(
        "p_brand",
        "version",
        F.element_at(parts_arr, 1).cast("bigint").alias("major"),
        F.element_at(parts_arr, 2).cast("bigint").alias("minor"),
        F.element_at(parts_arr, 3).cast("bigint").alias("patch"),
    )
    keyed = parsed.withColumn(
        "ord_key",
        F.col("major") * 1000000 + F.col("minor") * 1000 + F.col("patch"),
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("ord_key").desc(), F.col("version")
    )
    latest = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_brand").alias("lbrand"),
            F.col("version").alias("latest_version"),
            F.col("major").alias("lmajor"),
        )
    )
    return (
        keyed.join(latest, F.col("lbrand") == F.col("p_brand"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("version").cast("bigint").alias(
                "distinct_versions"
            ),
            F.max("latest_version").alias("latest_version"),
            F.max("lmajor").cast("int").alias("latest_major"),
            F.count_if(F.col("major") == 0).cast("bigint").alias("v0_parts"),
        )
        .orderBy("p_brand")
    )


@register(
    "fn_round_half_even",
    """
    WITH j AS (
        SELECT CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0)
                    AS BIGINT) AS j
        FROM lineitem
    ), modes AS (
        SELECT j,
               (j + 50) // 100 AS half_up,
               (j // 100)
               + CASE WHEN j % 100 > 50 THEN 1
                      WHEN j % 100 = 50 THEN (j // 100) % 2
                      ELSE 0 END AS half_even
        FROM j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE half_up <> half_even) AS BIGINT)
               AS n_differ,
           CAST(COUNT(*) FILTER (WHERE j % 100 = 50) AS BIGINT)
               AS n_exact_ties,
           ROUND(CAST(SUM(CAST(half_up AS DECIMAL(28,0))) AS DOUBLE)
                 / 100.0, 2) AS total_half_up,
           ROUND(CAST(SUM(CAST(half_even AS DECIMAL(28,0))) AS DOUBLE)
                 / 100.0, 2) AS total_half_even,
           ROUND(CAST(SUM(CAST(half_up - half_even AS DECIMAL(28,0)))
                      AS DOUBLE) / 100.0, 2) AS rounding_drift
    FROM modes
    """,
)
def fn_round_half_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-policy audit: discounted prices rounded to cents under
    half-up vs banker's (half-even), as PURE INTEGER logic on
    ten-thousandths — the policy decision every billing/ledger system
    must make explicit, and the reason this engine's hash gate bans
    engine-native ROUND on exact decimal ties (Spark's ``round`` is
    half-up, DuckDB's is half-away, IEEE's is half-even; on tie-dense
    money data they drift). Reports how many rows land on exact .005
    ties, how often the two policies disagree, and the cumulative
    ledger drift between them. The quantization floor(x·1e4) is the
    engines' shared deterministic step; everything after is integer.

    Scale: one scan, one map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    j = li.select(
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000.0
        )
        .cast("bigint")
        .alias("j")
    )
    half_up = F.expr("(j + 50) div 100")
    half_even = F.expr(
        "(j div 100) + CASE WHEN j % 100 > 50 THEN 1 "
        "WHEN j % 100 = 50 THEN (j div 100) % 2 ELSE 0 END"
    )
    modes = j.select("j", half_up.alias("hu"), half_even.alias("he"))
    return modes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.col("hu") != F.col("he")).cast("bigint").alias("n_differ"),
        F.count_if(F.col("j") % 100 == 50).cast("bigint").alias("n_exact_ties"),
        F.round(
            F.sum(F.col("hu").cast("decimal(28,0)")).cast("double") / 100.0, 2
        ).alias("total_half_up"),
        F.round(
            F.sum(F.col("he").cast("decimal(28,0)")).cast("double") / 100.0, 2
        ).alias("total_half_even"),
        F.round(
            F.sum((F.col("hu") - F.col("he")).cast("decimal(28,0)")).cast(
                "double"
            )
            / 100.0,
            2,
        ).alias("rounding_drift"),
    )
