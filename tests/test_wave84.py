"""Semantic invariants for wave-84 operators (Lin CCC, one-way ICC,
Krippendorff alpha) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_ccc_matches_python(spark):
    res = _Q["stats_concordance_ccc"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )
    ysum = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_orderkey"])
        .sum()
    )
    m = o.set_index("o_orderkey").join(ysum.rename("y"), how="inner")
    x = (m["o_totalprice"] * 100.0).map(math.floor).astype(float).to_numpy()
    y = m["y"].astype(float).to_numpy()
    n = len(m)
    cxy = ((x * y).sum() - x.sum() * y.sum() / n) / n
    vx = ((x * x).sum() - x.sum() ** 2 / n) / n
    vy = ((y * y).sum() - y.sum() ** 2 / n) / n
    dm = x.mean() - y.mean()
    r = cxy / math.sqrt(vx * vy)
    ccc = 2 * cxy / (vx + vy + dm * dm)
    assert res["n_orders"] == n
    assert res["pearson_r"] == pytest.approx(r, abs=1e-6)
    assert res["ccc"] == pytest.approx(ccc, abs=1e-6)
    assert res["bias_correction_cb"] == pytest.approx(ccc / r, abs=1e-6)
    # |CCC| <= |r| always (C_b <= 1)
    assert abs(res["ccc"]) <= abs(res["pearson_r"]) + 1e-9


def test_icc_matches_python(spark):
    res = _Q["stats_icc_oneway"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    x = (li["l_extendedprice"] * 100.0).map(math.floor).astype(float)
    g = li["l_partkey"]
    per = pd.DataFrame({"g": g, "x": x}).groupby("g")["x"].agg(
        ["count", "sum", lambda s: (s * s).sum()]
    )
    per.columns = ["m", "sx", "sxx"]
    per = per[per["m"] >= 2]
    gg, n = len(per), int(per["m"].sum())
    tx, txx = per["sx"].sum(), per["sxx"].sum()
    groupterm = (per["sx"] ** 2 / per["m"]).sum()
    msb = (groupterm - tx * tx / n) / (gg - 1)
    msw = (txx - groupterm) / (n - gg)
    k0 = (n - (per["m"] ** 2).sum() / n) / (gg - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert res["n_groups"] == gg and res["n_obs"] == n
    assert res["k0"] == pytest.approx(k0, abs=1e-6)
    assert res["msb_dollars2"] == pytest.approx(msb / 1e4, rel=1e-6)
    assert res["msw_dollars2"] == pytest.approx(msw / 1e4, rel=1e-6)
    assert res["icc1"] == pytest.approx(icc, abs=1e-6)
    assert -1.0 <= res["icc1"] <= 1.0


def test_krippendorff_matches_python(spark):
    res = _Q["stats_krippendorff_alpha"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    cell = (
        li.groupby(["l_orderkey", "l_returnflag"]).size().rename("c").reset_index()
    )
    m = cell.groupby("l_orderkey")["c"].sum()
    keep = m[m >= 2].index
    cell = cell[cell["l_orderkey"].isin(keep)]
    mu = cell.groupby("l_orderkey")["c"].sum()
    sc2 = cell.groupby("l_orderkey")["c"].apply(lambda s: (s * s).sum())
    n = int(mu.sum())
    d_o = ((mu**2 - sc2) / (mu - 1)).sum() / n
    nc = cell.groupby("l_returnflag")["c"].sum()
    d_e = (n * n - (nc**2).sum()) / (n * (n - 1))
    alpha = 1 - d_o / d_e
    assert res["n_units"] == len(keep) and res["n_values"] == n
    assert res["d_observed"] == pytest.approx(d_o, abs=1e-5)
    assert res["d_expected"] == pytest.approx(d_e, abs=1e-6)
    assert res["alpha"] == pytest.approx(alpha, abs=1e-5)
    # returnflags are (nearly) independent of order grouping: alpha ~ 0
    assert abs(res["alpha"]) < 0.5
