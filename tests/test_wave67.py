"""Semantic invariants for wave-67 market operators."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_price_dispersion_matches_pandas(spark):
    res = _Q["market_price_dispersion"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    u = (li["l_extendedprice"] / li["l_quantity"]).to_numpy()
    frame = pd.DataFrame({"k": li["l_partkey"], "u": u})
    rows = []
    for k, g in frame.groupby("k"):
        n = len(g)
        if n < 5:
            continue
        su = np.floor(g["u"] * 1e4).astype("int64").sum() / 1e4
        suu = np.floor(g["u"] ** 2 * 1e4).astype("int64").sum() / 1e4
        sd = math.sqrt((suu - su * su / n) / (n - 1))
        rows.append((round(sd / (su / n), 6), k, n))
    top = sorted(rows, key=lambda t: (-t[0], t[1]))[:20]
    assert list(res["l_partkey"]) == [t[1] for t in top]
    assert list(res["cv"]) == pytest.approx([t[0] for t in top], abs=2e-6)
    assert (res["cv"] > 0).all()


def test_cross_elasticity_matches_numpy(spark):
    res = _Q["market_cross_elasticity"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey",
                  right_on="p_partkey")
    df = df[df["p_brand"].isin(["Brand#4", "Brand#2"])]
    df["mon"] = df["l_shipdate"].dt.strftime("%Y-%m")
    df["u"] = df["l_extendedprice"] / df["l_quantity"]
    g = df.groupby(["mon", "p_brand"]).agg(
        sp=("u", lambda s: np.floor(s * 1e4).astype("int64").sum() / 1e4),
        q=("l_quantity", lambda s: int(s.astype("int64").sum())),
        n=("u", "size"),
    ).reset_index()
    a = g[g["p_brand"] == "Brand#4"].set_index("mon")
    b = g[g["p_brand"] == "Brand#2"].set_index("mon")
    mons = a.index.intersection(b.index)
    pa = (a.loc[mons, "sp"] / a.loc[mons, "n"]).to_numpy()
    qa = a.loc[mons, "q"].to_numpy(float)
    pb = (b.loc[mons, "sp"] / b.loc[mons, "n"]).to_numpy()
    x1 = np.floor(np.log(pa) * 1e6) / 1e6
    x2 = np.floor(np.log(pb) * 1e6) / 1e6
    y = np.floor(np.log(qa) * 1e6) / 1e6
    X = np.column_stack([x1, x2])
    Xc, yc = X - X.mean(axis=0), y - y.mean()
    beta = np.linalg.solve(Xc.T @ Xc, Xc.T @ yc)
    assert res["n_months"] == len(mons)
    assert res["own_elasticity"] == pytest.approx(beta[0], abs=1e-3)
    assert res["cross_elasticity"] == pytest.approx(beta[1], abs=1e-3)
    icept = y.mean() - X.mean(axis=0) @ beta
    assert res["intercept"] == pytest.approx(icept, abs=1e-2)
