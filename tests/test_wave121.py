"""Semantic invariants for wave-121 (robust quantile shape) —
independent python re-derivation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_robust_shape_matches_python(spark):
    res = _Q["agg_robust_shape"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    c = np.sort(
        (o["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    )
    n = len(c)
    o_ = {k: c[math.ceil(k / 8 * n) - 1] for k in range(1, 8)}
    e1, q1, e3, q2, e5, q3, e7 = (o_[k] for k in range(1, 8))
    assert res["n_obs"] == n
    assert res["median_dollars"] == pytest.approx(q2 / 100, abs=0.01)
    assert res["bowley_skewness"] == pytest.approx(
        (q3 + q1 - 2 * q2) / (q3 - q1), abs=1e-6
    )
    assert res["moors_kurtosis"] == pytest.approx(
        ((e3 - e1) + (e7 - e5)) / (q3 - q1), abs=1e-6
    )
    assert res["quartile_coeff_dispersion"] == pytest.approx(
        (q3 - q1) / (q3 + q1), abs=1e-6
    )
    # ranges of the bounded statistics
    assert -1.0 <= res["bowley_skewness"] <= 1.0
    assert res["moors_kurtosis"] > 0
    assert 0.0 <= res["quartile_coeff_dispersion"] <= 1.0
