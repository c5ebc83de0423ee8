"""Semantic invariants for wave 166 (Lomb-Scargle, Holt-Winters, DTW)
against independent numpy re-derivations from the raw parquet."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _daily_cents():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["c"] = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    return o


def test_lomb_scargle_matches_numpy(spark):
    res = (
        _Q["ts_lomb_scargle"](spark, SF_DIR)
        .toPandas()
        .set_index("period_days")
    )
    o = _daily_cents()
    d = pd.to_datetime(o.o_orderdate)
    o = o[d.dt.day % 5 != 0]
    g = o.groupby("o_orderdate").c.sum().sort_index()
    days = pd.to_datetime(pd.Series(g.index))
    t = (days - days.min()).dt.days.to_numpy().astype(float)
    y = g.to_numpy().astype(float)
    yc = y - y.mean()
    var = y.var(ddof=1)
    for p in (5, 7, 14, 30):
        w = 2 * math.pi / p
        tau = math.atan2(
            np.sin(2 * w * t).sum(), np.cos(2 * w * t).sum()
        ) / (2 * w)
        ct, st = np.cos(w * (t - tau)), np.sin(w * (t - tau))
        power = 0.5 * (
            (yc @ ct) ** 2 / (ct @ ct) + (yc @ st) ** 2 / (st @ st)
        ) / var
        assert res.loc[p].n_days == len(y)
        assert res.loc[p].ls_power == pytest.approx(power, rel=1e-3)


def test_holt_winters_matches_reference(spark):
    res = (
        _Q["ts_holt_winters"](spark, SF_DIR)
        .toPandas()
        .set_index("horizon_days")
    )
    o = _daily_cents()
    x = [int(v) for v in o.groupby("o_orderdate").c.sum().sort_index()]
    n = len(x)
    lvl = math.floor(sum(x[:7]) / 7.0)
    b = math.floor((sum(x[7:14]) - sum(x[:7])) / 49.0)
    s = [v - lvl for v in x[:7]]
    for i in range(8, n + 1):
        p = (i - 1) % 7
        ln = math.floor((3 * (x[i - 1] - s[p]) + 7 * (lvl + b)) / 10.0)
        bn = math.floor((1 * (ln - lvl) + 19 * b) / 20.0)
        s[p] = math.floor((2 * (x[i - 1] - ln) + 8 * s[p]) / 10.0)
        lvl, b = ln, bn
    for h in range(1, 8):
        fc = (lvl + h * b + s[(n + h - 1) % 7]) / 100.0
        assert res.loc[h].forecast == pytest.approx(fc, abs=0.011)
        assert res.loc[h].level == pytest.approx(lvl / 100.0, abs=0.011)
        assert res.loc[h].trend == pytest.approx(b / 100.0, abs=0.011)


def test_holt_winters_forecast_tracks_series_scale(spark):
    """Sanity: the h=1 forecast lands within 3x of the mean daily level
    (the smoother cannot run away from the series it smooths)."""
    res = _Q["ts_holt_winters"](spark, SF_DIR).toPandas()
    o = _daily_cents()
    mean_daily = o.groupby("o_orderdate").c.sum().mean() / 100.0
    assert 0.2 * mean_daily < res.forecast.iloc[0] < 3.0 * mean_daily


def test_dtw_matches_numpy(spark):
    res = _Q["ts_dtw"](spark, SF_DIR).toPandas().iloc[0]
    o = _daily_cents()
    d = pd.to_datetime(o.o_orderdate)
    o = o.assign(y=d.dt.year, w=np.minimum((d.dt.dayofyear - 1) // 7, 51))
    o = o[o.y.isin([1996, 1997])]
    g = o.groupby(["y", "w"]).c.sum()
    a = [int(g[1996, w]) for w in range(52)]
    b = [int(g[1997, w]) for w in range(52)]
    inf = 1 << 60
    prev = [0] + [inf] * 52
    for i in range(1, 53):
        cur = [inf]
        for j in range(1, 53):
            cur.append(
                abs(a[i - 1] - b[j - 1])
                + min(prev[j], prev[j - 1], cur[j - 1])
            )
        prev = cur
    lock = sum(abs(x - y) for x, y in zip(a, b))
    assert res.n_weeks == 52
    assert res.dtw_distance == pytest.approx(prev[52] / 100.0, abs=0.011)
    assert res.lockstep_distance == pytest.approx(lock / 100.0, abs=0.011)
    assert res.dtw_distance <= res.lockstep_distance
    assert res.stretch_gain == pytest.approx(prev[52] / lock, abs=1e-4)
