"""Semantic invariants for wave-153 (HHI per market, Balassa RCA,
RBF-kernel MMD) against independent numpy references."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _joined_rev():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li["rev"] = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100.0
    ).astype(np.int64)
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_type", "p_brand"]
    )
    return li.merge(p, left_on="l_partkey", right_on="p_partkey")


def test_hhi_matches_numpy(spark):
    res = _Q["market_hhi"](spark, SF_DIR).toPandas()
    j = _joined_rev()
    cell = j.groupby(["p_type", "p_brand"])["rev"].sum()
    for _, row in res.iterrows():
        shares = cell[row.p_type] / cell[row.p_type].sum()
        hhi = float((10000.0 * shares**2).sum())
        assert row.n_brands == len(shares)
        assert row.hhi == pytest.approx(hhi, abs=0.02)
        band = "high" if hhi > 2500 else ("moderate" if hhi > 1500 else "low")
        assert row.concentration == band
    # descending HHI order
    assert list(res.hhi) == sorted(res.hhi, reverse=True)


def test_rca_matches_numpy(spark):
    res = _Q["market_rca"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li["rev"] = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100.0
    ).astype(np.int64)
    s = pd.read_parquet(
        f"{SF_DIR}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    n = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_type"]
    )
    j = (
        li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        .merge(p, left_on="l_partkey", right_on="p_partkey")
    )
    flow = j.groupby(["n_name", "p_type"])["rev"].sum()
    nat = flow.groupby("n_name").sum()
    typ = flow.groupby("p_type").sum()
    w = flow.sum()
    rca = {
        (na, ty): (v / nat[na]) / (typ[ty] / w)
        for (na, ty), v in flow.items()
    }
    top = sorted(rca.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(res) == 20
    for row, ((na, ty), r) in zip(res.itertuples(), top):
        assert (row.nation, row.p_type) == (na, ty)
        assert row.rca == pytest.approx(r, abs=1e-3)


def test_mmd_matches_numpy(spark):
    res = _Q["stats_mmd_rbf"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    ev = ev[ev.event_type.isin(["purchase", "view"])]
    b = np.floor(ev.value.to_numpy())
    isp = (ev.event_type == "purchase").to_numpy()
    x, y = b[isp], b[~isp]
    m, n = len(x), len(y)

    def ksum(a, c):
        # counts-weighted full kernel sum between samples a and c
        va, ca = np.unique(a, return_counts=True)
        vc, cc = np.unique(c, return_counts=True)
        k = np.exp(-((va[:, None] - vc[None, :]) ** 2) / 1250.0)
        return float(ca @ k @ cc)

    mmd2 = (
        (ksum(x, x) - m) / (m * (m - 1))
        + (ksum(y, y) - n) / (n * (n - 1))
        - 2.0 * ksum(x, y) / (m * n)
    )
    assert res.n_purchase == m and res.n_view == n
    assert res.mmd2 == pytest.approx(mmd2, abs=1e-6)
