"""Semantic invariants for wave-92 operators (circular stats, Gumbel
maxima, seasonal Mann–Kendall) — independent python re-derivations
from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_circular_hours_matches_python(spark):
    res = _Q["stats_circular_hours"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    h = ev["ts"].dt.hour.to_numpy()
    n = len(h)
    theta = 2 * math.pi * h / 24.0
    c, s = np.cos(theta).sum(), np.sin(theta).sum()
    rbar = math.hypot(c, s) / n
    mean_hour = (math.atan2(s, c) / (2 * math.pi) * 24.0) % 24.0
    assert res["n_events"] == n
    assert res["mean_hour"] == pytest.approx(mean_hour, abs=1e-3)
    assert res["resultant_r"] == pytest.approx(rbar, abs=1e-5)
    assert res["rayleigh_z"] == pytest.approx(n * rbar * rbar, abs=1e-2)
    assert 0.0 <= res["resultant_r"] <= 1.0


def test_gumbel_maxima_matches_python(spark):
    res = _Q["stats_gumbel_maxima"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    daily = cents.groupby(o["o_orderdate"].dt.normalize()).sum()
    blocks = daily.groupby(
        [daily.index.year, daily.index.month]
    ).max().to_numpy() / 100.0
    b = len(blocks)
    m = blocks.mean()
    sd = blocks.std(ddof=1)
    sigma = sd * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * sigma
    assert res["n_blocks"] == b
    assert res["mean_block_max"] == pytest.approx(m, abs=0.02)
    assert res["gumbel_sigma"] == pytest.approx(sigma, abs=0.02)
    assert res["gumbel_mu"] == pytest.approx(mu, abs=0.02)
    for t, col in [(12, "return_level_12mo"), (60, "return_level_60mo")]:
        rl = mu - sigma * math.log(-math.log(1 - 1.0 / t))
        assert res[col] == pytest.approx(rl, abs=0.05)
    # longer return period => higher level
    assert res["return_level_60mo"] > res["return_level_12mo"]


def test_seasonal_mk_matches_python(spark):
    res = _Q["ts_seasonal_mann_kendall"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    monthly = cents.groupby(
        [o["o_orderdate"].dt.year, o["o_orderdate"].dt.month]
    ).sum()
    s = ties = 0
    var18 = 0
    seasons = set()
    for mo in sorted({k[1] for k in monthly.index}):
        vals = [v for (y, m), v in monthly.items() if m == mo]
        ys = [y for (y, m) in monthly.index if m == mo]
        order = np.argsort(ys)
        vals = [vals[i] for i in order]
        nm = len(vals)
        seasons.add(mo)
        var18 += nm * (nm - 1) * (2 * nm + 5)
        for i in range(nm):
            for j in range(i + 1, nm):
                if vals[j] > vals[i]:
                    s += 1
                elif vals[j] < vals[i]:
                    s -= 1
                else:
                    ties += 1
    var_s = var18 / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    assert res["n_seasons"] == len(seasons)
    assert res["s_total"] == s
    assert res["ties"] == ties
    assert res["var_s"] == pytest.approx(var_s, abs=1e-3)
    assert res["z"] == pytest.approx(z, abs=1e-3)
