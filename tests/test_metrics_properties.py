"""Invariant checks for the round-3 metrics/statistics family — guards
semantics from the direction the oracle diff can't (both engines wrong the
same way)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_processor_spark import queries
from hive_processor_spark.sources import load_table
from tests.conftest import SF_DIR

_QUERIES = queries()


def test_confusion_matrix_partitions_corpus(spark):
    r = _QUERIES["ml_confusion_matrix"](spark, SF_DIR).head()
    n = load_table(spark, SF_DIR, "events").count()
    assert r.tp + r.fp + r.fn + r.tn == n
    for m in (r.precision, r.recall, r.f1, r.accuracy):
        assert 0.0 <= m <= 1.0


def test_pr_curve_shape(spark):
    rows = _QUERIES["ml_pr_curve"](spark, SF_DIR).orderBy("threshold").collect()
    assert rows[0].recall == 1.0  # threshold 0 catches every positive
    recalls = [r.recall for r in rows]
    assert recalls == sorted(recalls, reverse=True)  # monotone in threshold
    assert all(0.0 <= r.precision <= 1.0 for r in rows if r.precision is not None)


def test_lift_deciles_account_for_all_conversions(spark):
    rows = _QUERIES["ml_lift_deciles"](spark, SF_DIR).collect()
    total_conv = sum(r.conv for r in rows)
    purchases = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total_conv == purchases
    assert max(r.cum_gain for r in rows) == 1.0


def test_ks_and_ndcg_bounded(spark):
    ks = _QUERIES["stats_ks_test"](spark, SF_DIR).head()
    assert 0.0 <= ks.ks_d <= 1.0
    nd = _QUERIES["ml_ndcg"](spark, SF_DIR).head()
    assert 0.0 < nd.avg_ndcg_at_10 <= 1.0


def test_retention_curve_day0_is_full(spark):
    rows = _QUERIES["events_retention_curve"](spark, SF_DIR).collect()
    day0 = [r for r in rows if r.day_offset == 0]
    assert day0 and all(r.retention == 1.0 for r in day0)
    assert all(0.0 <= r.retention <= 1.0 for r in rows)


def test_theil_and_psi_nonnegative(spark):
    t = _QUERIES["agg_theil_index"](spark, SF_DIR).collect()
    assert all(r.theil_t >= 0.0 for r in t)
    p = _QUERIES["ml_psi_stability"](spark, SF_DIR).head()
    # PSI is a sum of (pa-pb)*ln(pa/pb) terms, each >= 0 exactly; the
    # nano-quantized floor can only shave, so allow epsilon below zero.
    assert p.psi >= -1e-6


def test_dataset_diff_counts_consistent(spark):
    d = _QUERIES["pipeline_dataset_diff"](spark, SF_DIR).head()
    orders = load_table(spark, SF_DIR, "orders").count()
    assert d.n_removed + d.n_changed + d.n_unchanged == orders
    assert d.n_added > 0 and d.n_removed > 0 and d.n_changed > 0
