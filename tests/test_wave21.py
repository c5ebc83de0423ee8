"""Semantic invariants for wave-21 operators (grid DBSCAN, SMA crossover,
meta-analysis pooling) — independent python/numpy re-implementations on
top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_dbscan_matches_brute_force(spark):
    res = (
        _Q["join_spatial_dbscan"](spark, SF_DIR)
        .toPandas()
        .set_index("s_suppkey")
    )
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    ids = sup["s_suppkey"].to_numpy()
    y = ids * 7919 % 18000
    x = ids * 104729 % 36000
    eps2 = 3000 * 3000
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    within = d2 <= eps2
    n_eps = within.sum(axis=1)
    is_core = n_eps >= 4
    near_core = (within & ~np.eye(len(ids), dtype=bool) & is_core[None, :]).any(
        axis=1
    )
    for i, sid in enumerate(ids):
        row = res.loc[sid]
        assert row["n_eps"] == n_eps[i]
        if is_core[i]:
            expect = "core"
        elif near_core[i]:
            expect = "border"
        else:
            expect = "noise"
        assert row["point_type"] == expect
    # sanity: all three classes exist at this density, and every point
    # counts itself (n_eps >= 1)
    assert (res["n_eps"] >= 1).all()
    if len(ids) == 100:  # sf0.01 fixture: all three classes present
        assert set(res["point_type"]) == {"core", "border", "noise"}


def test_sma_crossover_matches_pandas(spark):
    res = _Q["ts_sma_crossover"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    s20 = cents.rolling(20).sum()
    s50 = cents.rolling(50).sum()
    valid = s50.notna()
    sgn = np.sign(5 * s20[valid] - 2 * s50[valid]).astype(int)
    prev = sgn.shift(1)
    cross = sgn[(prev.notna()) & (sgn != prev) & (sgn != 0)]
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    assert list(got.index) == list(cross.index)
    for day in cross.index:
        direction = (
            "golden_cross" if sgn[day] > prev[day] else "death_cross"
        )
        assert got.loc[day, "signal"] == direction
        assert got.loc[day, "sma20"] == pytest.approx(
            s20[day] / 20.0 / 100.0, abs=0.01
        )
        assert got.loc[day, "sma50"] == pytest.approx(
            s50[day] / 50.0 / 100.0, abs=0.01
        )
    # crossings alternate in direction
    sigs = list(got["signal"])
    assert all(a != b for a, b in zip(sigs, sigs[1:]))


def test_meta_analysis_matches_numpy_pooling(spark):
    res = _Q["stats_meta_analysis"](spark, SF_DIR).toPandas().iloc[0]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    means, ws = [], []
    for _nk, grp in cust.groupby("c_nationkey"):
        xv = grp["c_acctbal"].to_numpy()
        n = len(xv)
        m = np.floor(xv * 100).sum() / 100.0 / n
        var = ((xv - m) ** 2).sum() / (n - 1)
        means.append(m)
        ws.append(n / var)
    means, ws = np.array(means), np.array(ws)
    pooled = (ws * means).sum() / ws.sum()
    q = (ws * (means - pooled) ** 2).sum()
    k = len(means)
    i2 = max(0.0, (q - (k - 1)) / q)
    assert res["k_groups"] == k
    assert res["pooled_mean"] == pytest.approx(pooled, abs=1e-2)
    assert res["cochran_q"] == pytest.approx(q, rel=1e-3)
    assert res["i_squared"] == pytest.approx(i2, abs=1e-3)
    # pooled mean must lie inside the span of group means
    assert means.min() <= res["pooled_mean"] <= means.max()
