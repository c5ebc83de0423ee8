"""Semantic invariants for wave-88 operators (Dickey–Fuller, KPSS,
turning points) — independent python re-derivations from the daily
revenue series."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _daily_ln_rev_q():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    rev = li.groupby(li["l_shipdate"].dt.normalize())["l_extendedprice"].sum()
    return np.floor(np.log(rev.sort_index().to_numpy()) * 1e6)


def test_dickey_fuller_matches_ols(spark):
    res = _Q["ts_dickey_fuller"](spark, SF_DIR).toPandas().iloc[0]
    x = _daily_ln_rev_q()
    xl, y = x[:-1], np.diff(x)
    t = len(y)
    beta = (t * (xl * y).sum() - xl.sum() * y.sum()) / (
        t * (xl * xl).sum() - xl.sum() ** 2
    )
    alpha = (y.sum() - beta * xl.sum()) / t
    resid = y - alpha - beta * xl
    s2 = (resid**2).sum() / (t - 2)
    se = math.sqrt(s2 * t / (t * (xl * xl).sum() - xl.sum() ** 2))
    assert res["n_obs"] == t
    assert res["beta"] == pytest.approx(beta, abs=1e-5)
    assert res["alpha"] == pytest.approx(alpha / 1e6, abs=1e-5)
    assert res["df_stat"] == pytest.approx(beta / se, abs=1e-3)
    # daily log-revenue of a stationary-ish synthetic series: beta < 0
    assert res["beta"] < 0


def test_kpss_matches_python(spark):
    res = _Q["ts_kpss"](spark, SF_DIR).toPandas().iloc[0]
    x = _daily_ln_rev_q()
    t = len(x)
    e = x - x.mean()
    st = np.cumsum(e)
    gam = [float((e[l:] * e[: t - l]).sum()) for l in range(5)]
    lrv = gam[0] + 2 * sum((1 - l / 5) * gam[l] for l in range(1, 5))
    eta = (st**2).sum() / (t * lrv)
    assert res["n_obs"] == t
    assert res["kpss_eta"] == pytest.approx(eta, abs=1e-4)
    assert res["rho1"] == pytest.approx(gam[1] / gam[0], abs=1e-6)


def test_turning_points_matches_python(spark):
    res = _Q["ts_turning_points"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    rev = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(rev)
    a, b, c = rev[:-2], rev[1:-1], rev[2:]
    tp = int((((b > a) & (b > c)) | ((b < a) & (b < c))).sum())
    ties = int(((b == a) | (b == c)).sum())
    e_tp = 2 * (n - 2) / 3
    z = (tp - e_tp) / math.sqrt((16 * n - 29) / 90)
    assert res["n_obs"] == n
    assert res["n_turning_points"] == tp
    assert res["n_ties"] == ties
    assert res["expected_tp"] == pytest.approx(e_tp, abs=1e-3)
    assert res["z"] == pytest.approx(z, abs=1e-3)
