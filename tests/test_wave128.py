"""Semantic invariants for wave-128 (Bass diffusion OLS fit)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bass_matches_numpy_ols(spark):
    res = _Q["events_bass_diffusion"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    pur = ev[ev["event_type"] == "purchase"]
    d0 = pur.groupby("user_id")["ts"].min().dt.normalize()
    day = (d0 - pd.Timestamp("2020-01-01")).dt.days
    daily = day.value_counts().sort_index()
    y = daily.to_numpy(float)
    cum_prev = np.concatenate([[0.0], np.cumsum(y)[:-1]])
    X = np.column_stack([np.ones_like(cum_prev), cum_prev, cum_prev**2])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    a, b, c = coef
    m = (-b - math.sqrt(b * b - 4 * a * c)) / (2 * c)
    assert res["n_days"] == len(daily)
    assert res["coef_a"] == pytest.approx(a, rel=1e-3)
    assert res["coef_b"] == pytest.approx(b, rel=1e-3)
    assert res["coef_c"] == pytest.approx(c, rel=1e-3)
    assert res["market_size_m"] == pytest.approx(m, rel=1e-3)
    assert res["innovation_p"] == pytest.approx(a / m, rel=1e-2)
    assert res["imitation_q"] == pytest.approx(-c * m, rel=1e-2)
    # the fitted market size should exceed observed cumulative adopters
    assert res["market_size_m"] >= y.sum() * 0.5
