"""UDF / UDAF / UDTF surface (SURVEY.md §2.2-J).

The reference's entire extension API is ``ModuleFunction(db, cache, done,
...args)`` — arbitrary user code handed the data planes (reference
``src/processor.ts:25-27``). Spark's equivalents, in preference order:
registered SQL expressions, Arrow-vectorized pandas UDFs, grouped
``applyInPandas``, Python UDTFs, and (last) row-at-a-time Python UDFs.

These exist to *prove the surface*; the performance guidance stands: none
of the engine's built-in operators use Python in the hot path, and the
pandas variants here move data via Arrow batches, not per-row pickling.

Determinism note for grouped pandas UDAFs: the row order within a group
(and partition assembly) is nondeterministic, so kernels must be
order-independent — integer-quantized sums here, mirroring
functions/exact.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table, register_views


def _disc_band(disc: float) -> str:
    if disc < 0.03:
        return "lo"
    if disc < 0.07:
        return "mid"
    return "hi"


@register(
    "udf_python",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount < 0.03 THEN 'lo'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'hi' END AS band
    FROM lineitem
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept off built-in operators)."""
    li = load_table(spark, sf_dir, "lineitem")
    band = udf(_disc_band, "string")  # built per-call: type parsing needs a session
    return li.select("l_orderkey", "l_linenumber", band("l_discount").alias("band"))


def _net_price_kernel(price: pd.Series, disc: pd.Series) -> pd.Series:
    return price * (1.0 - disc)


@register(
    "udf_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           (FLOOR(l_extendedprice * (1 - l_discount) * 100.0) / 100.0) AS net
    FROM lineitem
    """,
)
def udf_pandas_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF; quantization happens outside the UDF in
    JVM expressions (numpy would use a different rounding mode)."""
    li = load_table(spark, sf_dir, "lineitem")
    net_price = pandas_udf(_net_price_kernel, "double")
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(net * 100.0) / 100.0).alias("net"),
    )


def _weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    # Integer-unit sums → order-independent (group row order is arbitrary).
    num = np.floor(pdf["l_extendedprice"].values * pdf["l_quantity"].values * 100.0).astype(
        "int64"
    ).sum()
    den = np.floor(pdf["l_quantity"].values * 100.0).astype("int64").sum()
    wavg = float(np.floor(num / den * 10000.0) / 10000.0)
    return pd.DataFrame({"l_returnflag": [pdf["l_returnflag"].iloc[0]], "wavg_price": [wavg]})


@register(
    "udaf_grouped",
    """
    SELECT l_returnflag,
           FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 100.0) AS BIGINT)) AS DOUBLE)
                 / CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS DOUBLE)
                 * 10000.0) / 10000.0 AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (quantity-weighted average price) via
    applyInPandas — the UDAF shape for logic Spark aggregates can't express."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        _weighted_avg, schema="l_returnflag string, wavg_price double"
    )


class _SplitWords:
    # Skips empty tokens but keeps the original 1-based position; the oracle
    # applies the same `word <> ''` filter post-unnest so both sides agree by
    # construction even on consecutive/leading/trailing spaces.
    def eval(self, text: str):  # noqa: ANN001
        for i, w in enumerate(text.split(" ")):
            if w:
                yield i + 1, w


@register(
    "udtf_python",
    """
    SELECT doc_id, pos, word FROM (
        SELECT doc_id,
               CAST(UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS INT) AS pos,
               UNNEST(STRING_SPLIT(text, ' ')) AS word
        FROM documents
        WHERE doc_id < 100
    ) t WHERE word <> ''
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row → n rows) applied via LATERAL join."""
    register_views(spark, sf_dir)
    spark.udtf.register("split_words", udtf(_SplitWords, returnType="pos: int, word: string"))
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.word
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 100
        """
    )


@register(
    "udf_registered_sql",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000.0 THEN 'S'
                WHEN o_totalprice < 300000.0 THEN 'M'
                ELSE 'L' END AS size_band
    FROM orders
    """,
)
def udf_registered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered into the session catalog and called from SQL text —
    the direct heir of Processor.call + handler dispatch."""
    register_views(spark, sf_dir)

    def band(total: float) -> str:
        if total < 100000.0:
            return "S"
        if total < 300000.0:
            return "M"
        return "L"

    spark.udf.register("order_size_band", band, "string")
    return spark.sql(
        "SELECT o_orderkey, order_size_band(o_totalprice) AS size_band FROM orders"
    )


@register(
    "udf_pandas_iter",
    """
    SELECT doc_id,
           CAST(LENGTH(text) * 2 + 7 AS BIGINT) AS score
    FROM documents WHERE doc_id < 200
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — THE shape for ML inference over a
    100 TB corpus: the expensive resource (a model) loads ONCE per task
    before the batch loop, then every Arrow batch reuses it. The 'model'
    here is a deterministic stand-in (weights (2, 7)) so the oracle is
    exact; swapping in a real tokenizer/classifier changes one line, not
    the plan. Contrast with the plain Series→Series UDF, which has
    nowhere to hang per-task init."""
    @pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w, b = 2, 7  # "model load" — once per task, amortized over batches
        for texts in batches:
            yield texts.str.len() * w + b

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select("doc_id", score("text").alias("score"))


@register(
    "udaf_window_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) OVER
                (PARTITION BY l_orderkey) AS BIGINT) AS qtotal
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def udaf_window_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDAF applied OVER A WINDOW: every line of an
    order carries the order's quantized price total without collapsing
    rows — custom vectorized aggregation composing with the window
    machinery. Kernel is an integer sum, so group order cannot matter."""

    @pandas_udf("long")
    def qsum(price: pd.Series) -> int:
        return int(np.floor(price.to_numpy(np.float64) * 100.0).astype(np.int64).sum())

    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey", "l_linenumber", qsum("l_extendedprice").over(w).alias("qtotal")
    )


@register(
    "udf_arrow_map",
    """
    SELECT event_id,
           CAST(event_id * 3 + 1 AS BIGINT) AS mapped
    FROM events WHERE event_id < 500
    """,
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy end of the Python surface — batches
    arrive as pyarrow RecordBatches with no pandas conversion at all, the
    right lane for columnar-native kernels (tokenizers, codecs) that
    speak Arrow directly."""
    import pyarrow as pa

    def triple(batches):
        for batch in batches:
            ids = batch.column("event_id")
            out = pa.compute.add(pa.compute.multiply(ids, pa.scalar(3)), pa.scalar(1))
            yield pa.RecordBatch.from_arrays([ids, out], ["event_id", "mapped"])

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select("event_id").mapInArrow(triple, "event_id bigint, mapped bigint")


@register(
    "udf_cogrouped",
    """
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    u AS (SELECT user_id FROM p UNION SELECT user_id FROM c),
    fc AS (SELECT user_id, MIN(ts) AS first_click FROM c GROUP BY user_id),
    fp AS (
        SELECT p.user_id, MIN(p.ts) AS first_purch_after
        FROM p JOIN fc ON fc.user_id = p.user_id AND p.ts >= fc.first_click
        GROUP BY p.user_id
    )
    SELECT u.user_id,
           CAST(COALESCE((SELECT COUNT(*) FROM p WHERE p.user_id = u.user_id), 0)
                AS BIGINT) AS n_purchases,
           CAST(COALESCE((SELECT COUNT(*) FROM c WHERE c.user_id = u.user_id), 0)
                AS BIGINT) AS n_clicks,
           EPOCH_US(fp.first_purch_after) - EPOCH_US(fc.first_click)
               AS click_to_purchase_us
    FROM u
    LEFT JOIN fc ON fc.user_id = u.user_id
    LEFT JOIN fp ON fp.user_id = u.user_id
    ORDER BY u.user_id
    """,
)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: purchases and clicks cogrouped by user,
    each group pair merged in one Arrow-batched pandas function (counts +
    first-click→first-purchase latency in µs) — the two-sided custom-merge
    surface for logic a join can't express cleanly (per-key sequence
    alignment, custom as-of semantics, per-entity reconciliation). At
    100 TB both sides shuffle once on the key, groups stream through
    Python workers in Arrow batches.

    Perf note (round-6, closes round-4 advice #4's Arrow pass): the
    cogroup KEY is a coarse user bucket, not the raw user_id — Spark
    invokes the Python function once per key, so per-user keys meant
    15 000 interpreter round-trips at sf0.1 (13.7 s); 64 buckets amortize
    that to 64 vectorized pandas merges over ~230 users each
    (13.69 s → 1.76 s best-of-3, tools/timeq, raw log in the commit
    message). Same custom-merge surface,
    same output; at 100 TB pick the bucket count so a bucket's rows fit
    an Arrow batch comfortably (users/bucket is load-balanced by the
    modulo)."""
    ev = load_table(spark, sf_dir, "events")
    nb = 64
    purch = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % nb).alias("bkt"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % nb).alias("bkt"), "user_id", "ts"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every user in the bucket
        n_p = left.groupby("user_id").size() if len(left) else pd.Series(dtype="int64")
        if len(right):
            rg = right.groupby("user_id")["ts"]
            n_c = rg.size()
            fc = rg.min()
        else:
            n_c = pd.Series(dtype="int64")
            fc = pd.Series(dtype="datetime64[ns]")
        lat = pd.Series(dtype="int64")
        if len(left) and len(fc):
            l2 = left.merge(
                fc.rename("fc"), left_on="user_id", right_index=True
            )
            l2 = l2[l2["ts"] >= l2["fc"]]
            if len(l2):
                fp = l2.groupby("user_id")["ts"].min()
                lat = (
                    (fp - fc.loc[fp.index]) // pd.Timedelta(microseconds=1)
                ).astype("int64")
        users = n_p.index.union(n_c.index)
        return pd.DataFrame(
            {
                "user_id": users.to_numpy(),
                "n_purchases": n_p.reindex(users, fill_value=0).to_numpy(),
                "n_clicks": n_c.reindex(users, fill_value=0).to_numpy(),
                "click_to_purchase_us": pd.array(
                    lat.reindex(users), dtype="Int64"
                ),
            }
        )

    out = purch.groupBy("bkt").cogroup(clicks.groupBy("bkt")).applyInPandas(
        merge,
        "user_id bigint, n_purchases bigint, n_clicks bigint, "
        "click_to_purchase_us bigint",
    )
    return out.orderBy("user_id")


class _UserStats:
    """Partition-consuming UDTF: accumulates quantized value cents per
    user partition, emits one summary row at partition end."""

    def __init__(self) -> None:
        self._key = None
        self._n = 0
        self._cents = 0

    def eval(self, row):  # noqa: ANN001
        self._key = row["user_id"]
        self._n += 1
        self._cents += int(math.floor(row["value"] * 100.0))

    def terminate(self):
        if self._key is not None:
            yield self._key, self._n, float(self._cents) / 100.0


@register(
    "udtf_table_partition",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events
    WHERE user_id <= 200
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def udtf_table_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF with a TABLE argument and PARTITION BY — the
    "process each key's rows as a stream in Python" extension surface
    (windowless sessionization, custom CDC folds, model-per-key scoring).
    The engine shuffles by the partition key, feeds each partition's rows
    through ``eval`` and calls ``terminate`` once per key; the UDTF here
    folds a quantized per-user total so the oracle (a plain GROUP BY)
    hash-matches. At scale this is one shuffle with Python-worker
    streaming — the row-at-a-time cost is the price of the arbitrary-state
    contract; aggregations expressible as SQL should stay in
    ``agg_*``."""
    register_views(spark, sf_dir)
    spark.udtf.register(
        "user_stats",
        udtf(_UserStats, returnType="user_id: bigint, n: bigint, total_value: double"),
    )
    return spark.sql(
        """
        SELECT s.user_id, s.n, s.total_value
        FROM user_stats(
            TABLE(SELECT user_id, value FROM events WHERE user_id <= 200)
            PARTITION BY user_id
        ) s
        ORDER BY s.user_id
        """
    )


class _TopTokens:
    """Polymorphic UDTF: ``analyze()`` derives the output schema from the
    constant ``k`` argument — k (token, count) column pairs — so one
    registration serves any requested width (Spark 4 analyze-time
    schema, the extension point static returnType strings cannot
    express). Ties rank by (count desc, token asc): deterministic."""

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import LongType, StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        schema = StructType()
        for i in range(int(k.value)):
            schema = schema.add(f"tok{i}", StringType()).add(
                f"cnt{i}", LongType()
            )
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):
        from collections import Counter

        counts = Counter(t for t in (text or "").strip().split(" ") if t)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        row: list = []
        for i in range(k):
            if i < len(top):
                row += [top[i][0], top[i][1]]
            else:
                row += [None, None]
        yield tuple(row)


@register(
    "udtf_polymorphic",
    """
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS tok
        FROM documents WHERE doc_id < 50
    ), tc AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), rk AS (
        SELECT doc_id, tok, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, tok) AS r
        FROM tc
    )
    SELECT doc_id,
           MAX(CASE WHEN r = 1 THEN tok END) AS tok0,
           CAST(MAX(CASE WHEN r = 1 THEN c END) AS BIGINT) AS cnt0,
           MAX(CASE WHEN r = 2 THEN tok END) AS tok1,
           CAST(MAX(CASE WHEN r = 2 THEN c END) AS BIGINT) AS cnt1,
           MAX(CASE WHEN r = 3 THEN tok END) AS tok2,
           CAST(MAX(CASE WHEN r = 3 THEN c END) AS BIGINT) AS cnt2
    FROM rk GROUP BY doc_id ORDER BY doc_id
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze()``): the output schema
    is computed at ANALYSIS time from the constant ``k`` argument — here
    ``top_tokens(text, 3)`` yields three (token, count) column pairs per
    document, deterministic under ties. The oracle derives the identical
    wide row relationally (per-doc rank + conditional pivot), so the
    hash gate proves the Python tokenizer/ranker agrees with the SQL
    semantics it implements — the differential discipline applied to the
    newest extension surface.

    Scale: a UDTF is a per-row Arrow-batched Python call (the slow path,
    like ``udf_python`` — kept off hot paths by plan_lint); schema-from-
    analyze costs nothing at runtime."""
    from pyspark.sql.functions import udtf as _udtf

    register_views(spark, sf_dir)
    spark.udtf.register("top_tokens", _udtf(_TopTokens))
    return spark.sql(
        """
        SELECT d.doc_id, s.*
        FROM documents d, LATERAL top_tokens(d.text, 3) s
        WHERE d.doc_id < 50
        ORDER BY d.doc_id
        """
    )
