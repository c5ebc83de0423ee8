"""Semantic invariants for wave-41 operators (Weibull fit, VIF, price
endings) — independent numpy re-implementations on top of the DuckDB
hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_weibull_matches_numpy(spark):
    res = _Q["stats_weibull_fit"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts"]
    )
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    gaps = []
    for _u, g in us.groupby(ev["user_id"]):
        d = np.diff(g.to_numpy())
        gaps.extend(d[d > 0])
    t = np.sort(np.array(gaps, dtype=float) / 1e6)
    n = len(t)
    i = np.arange(1, n + 1)
    x = np.log(t)
    y = np.log(-np.log(1.0 - (i - 0.3) / (n + 0.4)))
    xq = np.floor(x * 1e6) / 1e6  # engine quantization on the sums only
    sx, sy = np.floor(x * 1e6).sum() / 1e6, np.floor(y * 1e6).sum() / 1e6
    sxx = np.floor(x * x * 1e6).sum() / 1e6
    sxy = np.floor(x * y * 1e6).sum() / 1e6
    syy = np.floor(y * y * 1e6).sum() / 1e6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * sx / n
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert res["n_gaps"] == n
    assert res["shape_k"] == pytest.approx(slope, abs=1e-3)
    assert res["scale_lambda_s"] == pytest.approx(
        math.exp(-intercept / slope), rel=1e-3
    )
    assert res["fit_r2"] == pytest.approx(r2, abs=1e-4)
    # ~uniform arrivals → near-exponential gaps → shape near 1
    assert 0.5 < res["shape_k"] < 1.5
    assert res["fit_r2"] > 0.8


def test_vif_matches_numpy(spark):
    res = _Q["stats_vif"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    X = li[["l_quantity", "l_discount", "l_tax"]].to_numpy().astype(float)
    R = np.corrcoef(X, rowvar=False)
    Rinv = np.linalg.inv(R)
    assert res["r_qty_disc"] == pytest.approx(R[0, 1], abs=1e-4)
    assert res["r_qty_tax"] == pytest.approx(R[0, 2], abs=1e-4)
    assert res["r_disc_tax"] == pytest.approx(R[1, 2], abs=1e-4)
    assert res["vif_quantity"] == pytest.approx(Rinv[0, 0], abs=1e-3)
    assert res["vif_discount"] == pytest.approx(Rinv[1, 1], abs=1e-3)
    assert res["vif_tax"] == pytest.approx(Rinv[2, 2], abs=1e-3)
    # independent synthetic columns: VIFs hug 1 (no multicollinearity)
    assert max(res["vif_quantity"], res["vif_discount"], res["vif_tax"]) < 1.1


def test_price_endings_matches_pandas(spark):
    res = _Q["agg_price_endings"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    endings = (
        np.floor(orders["o_totalprice"].to_numpy() * 100).astype("int64") % 100
    )
    vc = pd.Series(endings).value_counts()
    order = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.cents_ending, r.n) for r in res.itertuples()] == order
    t = len(endings)
    for r in res.itertuples():
        assert r.share == pytest.approx(vc[r.cents_ending] / t, abs=1e-6)
        assert r.lift_vs_uniform == pytest.approx(
            vc[r.cents_ending] / t * 100, abs=1e-3
        )
    # synthetic prices: endings near-uniform, no .99 spike
    assert res["lift_vs_uniform"].max() < 2.0
