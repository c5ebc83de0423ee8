"""Engine-core checks: loader normalization, registry hygiene, entry."""

from __future__ import annotations

from hive_processor_spark import oracles, queries
from hive_processor_spark.sources import load_table, register_views
from tests.conftest import SF_DIR, SF_SMALL


def test_events_ts_normalized_to_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    first = ev.orderBy("event_id").first()
    assert first.ts.year == 2024


def test_register_views_sql_roundtrip(spark):
    register_views(spark, SF_DIR)
    assert spark.sql("SELECT COUNT(*) AS n FROM region").head().n == 5


def test_oracle_keys_subset_of_queries():
    assert set(oracles()) <= set(queries())


def test_entry_runs_and_returns_rows(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_are_sf_parametric(spark):
    # A sample query must run at both scale factors without code changes.
    q = queries()["agg_groupby"]
    assert q(spark, SF_SMALL).count() == 6
    assert q(spark, SF_DIR).count() == 6


def test_cluster_conf_is_well_formed():
    from hive_processor_spark.engine import CLUSTER_CONF_100TB

    assert all(isinstance(v, str) for v in CLUSTER_CONF_100TB.values())
    # determinism guards must match the local session's values
    assert CLUSTER_CONF_100TB["spark.sql.session.timeZone"] == "UTC"
    assert CLUSTER_CONF_100TB["spark.sql.legacy.parquet.nanosAsLong"] == "true"
