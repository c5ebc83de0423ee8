"""Semantic invariants for wave 169 (ANCOVA, Deming regression, Tukey
non-additivity) against independent numpy re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_ancova_matches_numpy(spark):
    res = (
        _Q["stats_ancova"](spark, SF_DIR).toPandas().set_index("return_flag")
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    g = li.l_returnflag.to_numpy()
    x = li.l_quantity.to_numpy().astype(np.int64).astype(float)
    y = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(float)
    groups = np.sort(np.unique(g))
    k, n = len(groups), len(x)
    wxx = wxy = wyy = 0.0
    for gg in groups:
        m = g == gg
        wxx += ((x[m] - x[m].mean()) ** 2).sum()
        wxy += ((x[m] - x[m].mean()) * (y[m] - y[m].mean())).sum()
        wyy += ((y[m] - y[m].mean()) ** 2).sum()
    bw = wxy / wxx
    sse_full = wyy - wxy**2 / wxx
    txx = ((x - x.mean()) ** 2).sum()
    txy = ((x - x.mean()) * (y - y.mean())).sum()
    tyy = ((y - y.mean()) ** 2).sum()
    sse_red = tyy - txy**2 / txx
    f_ref = ((sse_red - sse_full) / (k - 1)) / (sse_full / (n - k - 1))
    row0 = res.iloc[0]
    assert row0.common_slope == pytest.approx(bw / 100.0, abs=1e-4)
    assert row0.f_stat == pytest.approx(f_ref, rel=2e-3)
    assert row0.df1 == k - 1 and row0.df2 == n - k - 1
    for gg in groups:
        m = g == gg
        adj = (y[m].mean() - bw * (x[m].mean() - x.mean())) / 100.0
        assert res.loc[gg].adj_mean_price == pytest.approx(adj, abs=0.05)
        assert res.loc[gg].n == int(m.sum())


def test_deming_matches_numpy(spark):
    res = _Q["stats_deming_regression"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "value"]
    )
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    ev["c"] = np.floor(ev.value.to_numpy() * 100.0).astype(np.int64)
    piv = ev.pivot_table(
        index="day",
        columns="event_type",
        values="c",
        aggfunc="sum",
        fill_value=0,
    )
    x = piv["click"].to_numpy().astype(float)
    y = piv["purchase"].to_numpy().astype(float)
    cxx = ((x - x.mean()) ** 2).sum()
    cyy = ((y - y.mean()) ** 2).sum()
    cxy = ((x - x.mean()) * (y - y.mean())).sum()
    slope = (cyy - cxx + math.sqrt((cyy - cxx) ** 2 + 4 * cxy**2)) / (
        2 * cxy
    )
    assert res.n_days == len(x)
    assert res.deming_slope == pytest.approx(slope, abs=1e-4)
    assert res.deming_intercept == pytest.approx(
        (y.mean() - slope * x.mean()) / 100.0, abs=0.5
    )
    assert res.ols_slope == pytest.approx(cxy / cxx, abs=1e-4)
    # attenuation: |Deming slope| >= |OLS slope| when both noisy
    assert abs(res.deming_slope) >= abs(res.ols_slope)


def test_tukey_nonadditivity_matches_numpy(spark):
    res = _Q["stats_tukey_nonadditivity"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    o = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(
        np.int64
    )
    cell = (
        o.groupby(["c_mktsegment", "yr"]).cents.mean().unstack().to_numpy()
    )
    # mirror the 1e-6-dollar grid quantization of the cell means
    cell = np.floor(cell * 1e4) / 1e6
    gm = cell.mean()
    a = cell.mean(axis=1) - gm
    b = cell.mean(axis=0) - gm
    s_vab = float((cell * np.outer(a, b)).sum())
    ss_na = s_vab**2 / ((a**2).sum() * (b**2).sum())
    resid = cell - gm - a[:, None] - b[None, :]
    ss_resid = float((resid**2).sum())
    r, cn = cell.shape
    df2 = (r - 1) * (cn - 1) - 1
    f_ref = ss_na / ((ss_resid - ss_na) / df2)
    assert res.n_rows == r and res.n_cols == cn
    assert res.ss_nonadd == pytest.approx(ss_na, rel=1e-3)
    assert res.ss_resid == pytest.approx(ss_resid, rel=1e-3)
    assert res.tukey_f == pytest.approx(f_ref, rel=5e-3)
    assert res.df2 == df2
