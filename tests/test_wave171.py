"""Semantic invariants for wave 171 (Chow test, Box-Cox profile
likelihood, Cook's distance) against independent numpy references."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _sse_line(x, y):
    cxx = ((x - x.mean()) ** 2).sum()
    cxy = ((x - x.mean()) * (y - y.mean())).sum()
    cyy = ((y - y.mean()) ** 2).sum()
    return cyy - cxy**2 / cxx


def test_chow_matches_numpy(spark):
    res = _Q["stats_chow_test"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice"],
    )
    yr = pd.to_datetime(li.l_shipdate).dt.year
    li = li[yr.isin([1996, 1997])]
    yr = yr[yr.isin([1996, 1997])]
    x = li.l_quantity.to_numpy().astype(float)
    y = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(float)
    m1, m2 = (yr == 1996).to_numpy(), (yr == 1997).to_numpy()
    sse_p = _sse_line(x, y)
    sse_u = _sse_line(x[m1], y[m1]) + _sse_line(x[m2], y[m2])
    n = len(x)
    f_ref = ((sse_p - sse_u) / 2.0) / (sse_u / (n - 4.0))
    assert res.n_rows == n
    assert res.sse_pooled_m == pytest.approx(sse_p / 1e8, rel=1e-6)
    assert res.sse_split_m == pytest.approx(sse_u / 1e8, rel=1e-6)
    assert res.chow_f == pytest.approx(f_ref, abs=0.02)
    assert res.df1 == 2 and res.df2 == n - 4


def test_box_cox_matches_numpy(spark):
    res = (
        _Q["stats_box_cox_lambda"](spark, SF_DIR)
        .toPandas()
        .set_index("lambda")
    )
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    y = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64) / 100.0
    n = len(y)
    sln = float(np.log(y).sum())
    lls = {}
    for lam in (0.0, 1 / 3, 0.5, 1.0, 2.0):
        t = np.log(y) if lam == 0.0 else (y**lam - 1.0) / lam
        var = float(((t - t.mean()) ** 2).sum()) / n
        lls[round(lam, 4)] = -0.5 * n * math.log(var) + (lam - 1.0) * sln
    best = max(lls, key=lls.get)
    for lam, ll in lls.items():
        assert res.loc[lam].loglik == pytest.approx(ll, abs=0.5)
        assert res.loc[lam].is_best == int(lam == best)
    # revenue-like data should prefer a contracting transform over none
    assert best < 1.0


def test_cooks_distance_matches_numpy(spark):
    res = _Q["stats_cooks_distance"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        ],
    )
    x = li.l_quantity.to_numpy().astype(float)
    y = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(float)
    n = len(x)
    cxx = ((x - x.mean()) ** 2).sum()
    b = ((x - x.mean()) * (y - y.mean())).sum() / cxx
    a = y.mean() - b * x.mean()
    e = y - (a + b * x)
    s2 = _sse_line(x, y) / (n - 2)
    h = 1.0 / n + (x - x.mean()) ** 2 / cxx
    cd = e**2 * h / (2 * s2 * (1 - h) ** 2)
    order = np.lexsort(
        (li.l_linenumber.to_numpy(), li.l_orderkey.to_numpy(), -cd)
    )[:10]
    ref = li.iloc[order]
    assert list(res.orderkey) == list(ref.l_orderkey)
    assert list(res.linenumber) == list(ref.l_linenumber)
    for got, idx in zip(res.cooks_d_ppm, order):
        assert got == pytest.approx(cd[idx] * 1e6, rel=1e-4)
