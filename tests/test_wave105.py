"""Semantic invariants for wave-105 operators (Poisson changepoint,
p-chart) — independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _daily_counts():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    return ev.groupby(ev["ts"].dt.normalize()).size().sort_index()


def test_poisson_changepoint_matches_python(spark):
    res = _Q["ts_poisson_changepoint"](spark, SF_DIR).toPandas().iloc[0]
    daily = _daily_counts()
    x = daily.to_numpy().astype(float)
    t = len(x)
    n = x.sum()
    cx = np.cumsum(x)
    best_ll, best_i = -np.inf, None
    for i in range(1, t):
        c = cx[i - 1]
        if c <= 0 or c >= n:
            continue
        ll = (
            c * math.log(c / i)
            + (n - c) * math.log((n - c) / (t - i))
            - n * math.log(n / t)
        )
        if ll > best_ll:
            best_ll, best_i = ll, i
    assert res["n_days"] == t
    assert res["split_index"] == best_i
    assert res["change_day"] == daily.index[best_i - 1].strftime("%Y-%m-%d")
    assert res["rate_before"] == pytest.approx(cx[best_i - 1] / best_i, abs=1e-3)
    assert res["rate_after"] == pytest.approx(
        (n - cx[best_i - 1]) / (t - best_i), abs=1e-3
    )
    assert res["deviance_stat"] == pytest.approx(2 * best_ll, abs=1e-2)
    assert res["deviance_stat"] >= 0


def test_p_chart_matches_python(spark):
    res = _Q["spc_p_chart"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "event_type"])
    g = ev.groupby(ev["ts"].dt.normalize()).agg(
        n=("event_type", "size"),
        d=("event_type", lambda s: int((s == "purchase").sum())),
    )
    pbar = g["d"].sum() / g["n"].sum()
    p = g["d"] / g["n"]
    hw = 3 * np.sqrt(pbar * (1 - pbar) / g["n"])
    above = p > pbar + hw
    below = p < pbar - hw
    viol = g.index[above | below]
    assert res["n_days"] == len(g)
    assert res["center_line"] == pytest.approx(pbar, abs=1e-6)
    assert res["n_above_ucl"] == int(above.sum())
    assert res["n_below_lcl"] == int(below.sum())
    expect_first = viol.min().strftime("%Y-%m-%d") if len(viol) else "none"
    assert res["first_violation_day"] == expect_first
    assert res["max_daily_p"] == pytest.approx(p.max(), abs=1e-6)
    assert res["min_daily_p"] == pytest.approx(p.min(), abs=1e-6)
