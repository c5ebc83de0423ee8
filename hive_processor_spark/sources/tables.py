"""Table loading: Parquet scans with the ns-timestamp ingestion rule.

The reference's storage plane is a delegated PostgreSQL client handed to
every handler (reference ``src/processor.ts:26,68``); our storage plane is
Parquet read through Spark's vectorized reader, which additionally buys
column pruning and predicate pushdown for free.

The one genuinely sharp edge is ``events.ts``, whose physical type has
varied across fixture generations:

* TIMESTAMP(NANOS), which Spark 4 refuses to read. With
  ``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as an
  epoch-nanosecond bigint; we convert with *integer* division (``ts div
  1000`` — a double division would lose precision above 2^53 ≈ 104 days of
  epoch-nanos) into a microsecond timestamp.
* TIMESTAMP(MICROS) with ``isAdjustedToUTC=false``, which arrives as
  ``timestamp_ntz``; the session timezone is pinned to UTC so a plain cast
  to ``timestamp`` is value-preserving.

Either way no query ever sees the raw physical type: downstream operators
always get a µs-precision TIMESTAMP in a UTC session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import TABLES, ensure_session_confs


#: (session id, sf_dir, name) -> normalized DataFrame. spark.read.parquet
#: pays file listing + footer schema resolution on EVERY call (~140 ms
#: measured warm at sf0.1) — a fixed tax on each of a query's 1-3 table
#: loads, per evaluation. The driver fixtures are immutable for the life
#: of a session (regeneration happens between rounds, i.e. between
#: processes), so the resolved logical plan is reusable; DataFrames are
#: immutable values. Only canonical fixture dirs are cached — scratch /
#: tmp dirs tests rewrite in place must re-resolve their file listing.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes ``events.ts`` to a µs timestamp."""
    # Re-pin the runtime confs BEFORE the cache lookup: once every table a
    # session touches is cached, nothing else would re-assert them, so any
    # mid-session conf drift (a test toggling timezone/ANSI) would silently
    # break oracle parity. ensure_session_confs is an idempotent set of
    # conf writes — negligible next to even a cached plan's execution.
    ensure_session_confs(spark)
    cacheable = sf_dir.startswith("/root/testdata/")
    # id(spark) alone can alias a stopped-but-referenced session; include
    # the JVM applicationId so DataFrames bound to a dead SparkContext are
    # never served from cache.
    key = (id(spark), spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    if cacheable:
        hit = _TABLE_CACHE.get(key)
        if hit is not None:
            return hit
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Fixture generations that store TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false arrive as NTZ; the session timezone is pinned
    # to UTC (engine._RUNTIME_CONFS), so casting to TIMESTAMP is
    # value-preserving and keeps every downstream epoch/extract/compare
    # expression on the single type the operators were written against.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    if cacheable:
        _TABLE_CACHE[key] = df
    return df


#: (session id, sf_dir) most recently registered — makes register_views a
#: no-op on repeat calls from the same long-lived session (the SQL-surface
#: queries call it per invocation; re-planning 10 view definitions each
#: time is waste a serving session would pay on every request).
_VIEWS_REGISTERED: dict[int, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (names match the DuckDB
    oracle's pre-registered views, FIXTURES.md §Oracle registration).
    Idempotent per (session, sf_dir); switching sf_dir re-registers."""
    key = id(spark)
    if _VIEWS_REGISTERED.get(key) == sf_dir:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_REGISTERED[key] = sf_dir
