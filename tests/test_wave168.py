"""Semantic invariants for wave 168 (Platt scaling, Cuzick trend,
Fisher z correlation machinery) against numpy/stdlib references."""

from __future__ import annotations

import math
from statistics import NormalDist

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()
_PHI = NormalDist().cdf


def test_platt_scaling_matches_newton(spark):
    res = _Q["ml_platt_scaling"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    f = np.minimum(ev.value.to_numpy() / 500.0, 1.0)
    y = (ev.event_type == "purchase").to_numpy().astype(float)
    a, b = 1.0, 0.0
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(a * f + b)))
        w = p * (1 - p)
        g1, g2 = ((p - y) * f).sum(), (p - y).sum()
        h11, h12, h22 = (w * f * f).sum(), (w * f).sum(), w.sum()
        det = h11 * h22 - h12 * h12
        a -= (h22 * g1 - h12 * g2) / det
        b -= (h11 * g2 - h12 * g1) / det
    assert res.n == len(f)
    assert res.a_hat == pytest.approx(a, abs=5e-3)
    assert res.b_hat == pytest.approx(b, abs=5e-3)
    p2 = 1.0 / (1.0 + np.exp(-(a * f + b)))
    assert res.brier_raw == pytest.approx(((f - y) ** 2).mean(), abs=1e-4)
    assert res.brier_platt == pytest.approx(
        ((p2 - y) ** 2).mean(), abs=1e-4
    )
    # the whole point: calibration must improve Brier on this fixture
    assert res.brier_platt < res.brier_raw


def test_cuzick_trend_matches_reference(spark):
    res = _Q["stats_cuzick_trend"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    s = o.o_orderpriority.str[0].astype(int).to_numpy()
    v = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    rank = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    t_obs = float((s * rank).sum())
    l1 = float(s.sum())
    q1 = float((s.astype(np.int64) ** 2).sum())
    e_t = l1 * (n + 1) / 2.0
    _, counts = np.unique(v, return_counts=True)
    tie3 = float((counts.astype(np.int64) ** 3 - counts).sum())
    var_t = (
        (n + 1.0) / 12.0 * (n * q1 - l1 * l1)
        * (1.0 - tie3 / (float(n) ** 3 - n))
    )
    z = (t_obs - e_t) / math.sqrt(var_t)
    assert res.n_orders == n
    assert res.z == pytest.approx(z, abs=2e-3)
    assert res.p_two_sided == pytest.approx(
        2.0 * (1.0 - _PHI(abs(z))), abs=1e-3
    )


def test_fisher_z_corr_matches_numpy(spark):
    res = (
        _Q["stats_fisher_z_corr"](spark, SF_DIR)
        .toPandas()
        .set_index("year")
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice"],
    )
    yr = pd.to_datetime(li.l_shipdate).dt.year
    zs, ns = {}, {}
    for y in (1996, 1997):
        m = yr == y
        x = li.l_quantity[m].to_numpy().astype(np.int64)
        p = np.floor(li.l_extendedprice[m].to_numpy() * 100.0).astype(
            np.int64
        )
        r = np.corrcoef(x, p)[0, 1]
        n = int(m.sum())
        zr = 0.5 * math.log((1 + r) / (1 - r))
        zs[y], ns[y] = zr, n
        assert res.loc[y].n == n
        assert res.loc[y].r == pytest.approx(r, abs=1e-5)
        for col, sgn in (("ci_lo", -1), ("ci_hi", 1)):
            t = zr + sgn * 1.959964 / math.sqrt(n - 3)
            assert res.loc[y][col] == pytest.approx(math.tanh(t), abs=1e-5)
    zd = (zs[1996] - zs[1997]) / math.sqrt(
        1 / (ns[1996] - 3) + 1 / (ns[1997] - 3)
    )
    assert res.loc[1996].z_diff == pytest.approx(zd, abs=1e-3)
    assert res.loc[1996].p_diff == pytest.approx(
        2.0 * (1.0 - _PHI(abs(zd))), abs=1e-3
    )
