"""Semantic invariants for wave 170 (Diebold-Mariano, Getis-Ord Gi*,
theta method) against independent numpy re-derivations."""

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


def _daily_cents():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["c"] = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    return o.groupby("o_orderdate").c.sum().sort_index()


def test_diebold_mariano_matches_numpy(spark):
    res = _Q["ts_diebold_mariano"](spark, SF_DIR).toPandas().iloc[0]
    y = _daily_cents().to_numpy()
    e1 = np.abs(y[7:] - y[6:-1])   # naive lag-1
    e7 = np.abs(y[7:] - y[:-7])    # seasonal naive lag-7
    d = (e1.astype(np.int64) - e7.astype(np.int64)) / 100.0
    n = len(d)
    dbar = d.mean()
    dev = d - dbar
    gam = [float((dev[: n - k] * dev[k:]).sum()) / n for k in range(7)]
    lrv = gam[0] + 2.0 * sum(gam[1:])
    dm = dbar / math.sqrt(lrv / n)
    h = 7
    dm_h = dm * math.sqrt((n + 1 - 2 * h + h * (h - 1) / n) / n)
    assert res.n_days == n
    assert res.mean_loss_diff == pytest.approx(dbar, abs=1e-2)
    assert res.dm_stat == pytest.approx(dm, abs=2e-3)
    assert res.dm_harvey == pytest.approx(dm_h, abs=2e-3)
    assert res.p_two_sided == pytest.approx(
        2.0 * (1.0 - _PHI(abs(dm_h))), abs=1e-3
    )
    # seasonal-naive must beat naive on this weekly-seasonal series
    assert res.mean_loss_diff > 0


def test_getis_ord_matches_numpy(spark):
    res = (
        _Q["stats_getis_ord"](spark, SF_DIR).toPandas().set_index("nation")
    )
    cust = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    cust["cents"] = np.floor(cust.c_acctbal.to_numpy() * 100.0).astype(
        np.int64
    )
    x = cust.groupby("c_nationkey").cents.sum()
    nat = nat.set_index("n_nationkey").loc[x.index]
    xv = x.to_numpy().astype(float)
    n = len(xv)
    xbar, s = xv.mean(), xv.std(ddof=0)
    for nk, row in nat.iterrows():
        rk = row.n_regionkey
        mask = (nat.n_regionkey == rk).to_numpy()
        nr = int(mask.sum())
        sr = float(xv[mask].sum())
        gi = (sr - xbar * nr) / (
            s * math.sqrt((n * nr - nr * nr) / (n - 1.0))
        )
        assert res.loc[row.n_name].gi_star_z == pytest.approx(gi, abs=1e-3)
        assert res.loc[row.n_name].hotspot == int(gi > 1.96)
        assert res.loc[row.n_name].coldspot == int(gi < -1.96)


def test_theta_method_matches_reference(spark):
    res = (
        _Q["ts_theta_method"](spark, SF_DIR)
        .toPandas()
        .set_index("horizon_days")
    )
    y = [int(v) for v in _daily_cents()]
    n = len(y)
    st = n * (n + 1) // 2
    stt = n * (n + 1) * (2 * n + 1) // 6
    sy = sum(y)
    sty = sum((i + 1) * v for i, v in enumerate(y))
    b = float(n * sty - st * sy) / float(n * stt - st * st)
    a = (float(sy) - b * float(st)) / n
    xa = [math.floor(2.0 * v - (a + b * (i + 1))) for i, v in enumerate(y)]
    lvl = xa[0]
    for i in range(1, n):
        lvl = math.floor((3.0 * xa[i] + 7.0 * lvl) / 10.0)
    for h in range(1, 8):
        fc = (0.5 * (a + b * (n + h)) + 0.5 * lvl) / 100.0
        assert res.loc[h].forecast == pytest.approx(fc, abs=0.011)
    assert res.loc[1].ses_level == pytest.approx(lvl / 100.0, abs=0.011)
    assert res.loc[1].trend_slope == pytest.approx(b / 100.0, abs=1e-5)
