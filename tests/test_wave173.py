"""Semantic invariants for wave 173 (Huber IRLS regression,
Mahalanobis outliers) against independent numpy re-derivations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _xy():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        ],
    )
    x = li.l_quantity.to_numpy().astype(np.int64).astype(float)
    y = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(float)
    return li, x, y


def test_huber_matches_irls(spark):
    res = _Q["ml_huber_regression"](spark, SF_DIR).toPandas().iloc[0]
    _, x, y = _xy()
    n = len(x)
    cxx = ((x - x.mean()) ** 2).sum()
    cxy = ((x - x.mean()) * (y - y.mean())).sum()
    cyy = ((y - y.mean()) ** 2).sum()
    b = cxy / cxx
    a = y.mean() - b * x.mean()
    s = np.sqrt((cyy - cxy**2 / cxx) / (n - 2))
    k = 1.345 * s
    for _ in range(2):
        e = y - (a + b * x)
        w = np.minimum(1.0, k / np.abs(e))
        sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
        swxy, swxx = (w * x * y).sum(), (w * x * x).sum()
        b = (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
        a = (swy - b * swx) / sw
    assert res.n == n
    assert res.ols_slope == pytest.approx(cxy / cxx / 100.0, abs=1e-4)
    assert res.huber_slope == pytest.approx(b / 100.0, abs=1e-3)
    assert res.huber_intercept == pytest.approx(a / 100.0, abs=2.0)
    e = y - (a + b * x)
    assert res.n_downweighted == pytest.approx(
        int((np.abs(e) > k).sum()), abs=5
    )


def test_mahalanobis_matches_numpy(spark):
    res = _Q["stats_mahalanobis_outliers"](spark, SF_DIR).toPandas()
    li, x, y = _xy()
    n = len(x)
    cxx = ((x - x.mean()) ** 2).sum() / (n - 1)
    cyy = ((y - y.mean()) ** 2).sum() / (n - 1)
    cxy = ((x - x.mean()) * (y - y.mean())).sum() / (n - 1)
    det = cxx * cyy - cxy * cxy
    vx, vy = x - x.mean(), y - y.mean()
    d2 = (cyy * vx**2 - 2 * cxy * vx * vy + cxx * vy**2) / det
    order = np.lexsort(
        (li.l_linenumber.to_numpy(), li.l_orderkey.to_numpy(), -d2)
    )[:10]
    ref = li.iloc[order]
    assert list(res.orderkey) == list(ref.l_orderkey)
    assert list(res.linenumber) == list(ref.l_linenumber)
    for got, idx in zip(res.mahalanobis_d2, order):
        assert got == pytest.approx(d2[idx], rel=1e-5)
    for got, idx in zip(res.beyond_999, order):
        assert got == int(d2[idx] > 13.8155)
