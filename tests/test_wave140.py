"""Semantic invariants for wave-140 (Durbin-Watson test)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_durbin_watson_matches_numpy(spark):
    res = _Q["stats_durbin_watson"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = (
        o.assign(
            day=pd.to_datetime(o.o_orderdate).dt.date,
            cents=(o.o_totalprice * 100.0).map(math.floor).astype(object),
        )
        .groupby("day")["cents"]
        .sum()
        .sort_index()
    )
    x = np.array([int(v) for v in daily.values], dtype=object)
    n = len(x)
    s = int(sum(int(v) for v in x))
    u = np.array([float(n * int(v) - s) / float(s) for v in x])
    t = np.arange(1, n + 1, dtype=float)
    X = np.column_stack([np.ones(n), t])
    beta, *_ = np.linalg.lstsq(X, u, rcond=None)
    e = u - X @ beta
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e**2))
    assert res["n_obs"] == n
    assert res["n_pairs"] == n - 1
    assert res["dw_stat"] == pytest.approx(dw, abs=1e-3)
    assert 0.0 <= res["dw_stat"] <= 4.0
    assert res["rho_approx"] == pytest.approx(1.0 - dw / 2.0, abs=1e-3)
