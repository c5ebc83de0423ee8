"""Semantic invariants for wave-132 (mean excess function)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_mean_excess_matches_python(spark):
    res = (
        _Q["agg_mean_excess"](spark, SF_DIR)
        .toPandas()
        .set_index("threshold_pctile")
    )
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    c = np.sort(
        (o["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    )
    n = len(c)
    for k in (5, 7, 9):
        u = int(c[math.ceil(k / 10 * n) - 1])
        exceed = c[c > u]
        me = (exceed - u).sum() / len(exceed)
        row = res.loc[k * 10]
        assert row["threshold_dollars"] == pytest.approx(u / 100, abs=0.01)
        assert row["n_exceed"] == len(exceed)
        assert row["mean_excess_dollars"] == pytest.approx(me / 100, abs=0.01)
        assert row["excess_to_threshold_ratio"] == pytest.approx(
            me / u, abs=1e-5
        )
    # monotone thresholds; exceedance counts shrink
    assert res["threshold_dollars"].is_monotonic_increasing
    assert res["n_exceed"].is_monotonic_decreasing
