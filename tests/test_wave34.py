"""Semantic invariants for wave-34 operators (MATTR, event study,
Engle-Granger) — independent pandas/numpy re-implementations on top of
the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_mattr_matches_python(spark):
    res = _Q["text_mattr"](spark, SF_DIR).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_checked = 0
    for r in docs.itertuples():
        w = r.text.split(" ")
        if len(w) < 50:
            assert r.doc_id not in res.index
            continue
        uniq = [len(set(w[i : i + 50])) for i in range(len(w) - 49)]
        row = res.loc[r.doc_id]
        n_checked += 1
        assert row["n_tokens"] == len(w)
        assert row["n_windows"] == len(uniq)
        assert row["ttr"] == pytest.approx(len(set(w)) / len(w), abs=1e-6)
        assert row["mattr50"] == pytest.approx(
            sum(uniq) / len(uniq) / 50.0, abs=1e-6
        )
    assert n_checked == len(res) > 0
    # MATTR corrects the length bias: for long docs it exceeds raw TTR
    long_docs = res[res["n_tokens"] > 80]
    if len(long_docs):
        assert (long_docs["mattr50"] >= long_docs["ttr"] - 1e-9).mean() > 0.9


def test_event_study_matches_pandas(spark):
    res = _Q["ab_event_study"](spark, SF_DIR).toPandas().set_index("week")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    day = ev["ts"].dt.day
    err7 = (
        ev[(day <= 7) & (ev["event_type"] == "error")]
        .groupby("user_id")
        .size()
    )
    treated = {
        u: int(err7.get(u, 0) >= 5) for u in ev["user_id"].unique()
    }
    sub = ev[day <= 28].copy()
    sub["week"] = ((day[day <= 28] - 1) // 7).astype(int)
    sub["cents"] = np.floor(sub["value"] * 100).astype("int64")
    sub["tr"] = sub["user_id"].map(treated)
    g = sub.groupby(["week", "tr"]).agg(
        cents=("cents", "sum"), n=("cents", "size"), users=("user_id", "nunique")
    )
    gap0 = (
        g.loc[(0, 1), "cents"] / g.loc[(0, 1), "n"]
        - g.loc[(0, 0), "cents"] / g.loc[(0, 0), "n"]
    )
    for wk in range(4):
        tm = g.loc[(wk, 1), "cents"] / g.loc[(wk, 1), "n"]
        cm = g.loc[(wk, 0), "cents"] / g.loc[(wk, 0), "n"]
        row = res.loc[wk]
        assert row["treated_users"] == g.loc[(wk, 1), "users"]
        assert row["control_users"] == g.loc[(wk, 0), "users"]
        assert row["treated_mean"] == pytest.approx(tm / 100.0, abs=1e-3)
        assert row["control_mean"] == pytest.approx(cm / 100.0, abs=1e-3)
        assert row["gap"] == pytest.approx((tm - cm) / 100.0, abs=1e-3)
        assert row["effect_vs_week0"] == pytest.approx(
            (tm - cm - gap0) / 100.0, abs=1e-3
        )
    # week-0 effect is exactly zero by construction
    assert res.loc[0, "effect_vs_week0"] == 0.0


def test_engle_granger_matches_numpy(spark):
    res = _Q["ts_engle_granger"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    a = (
        (li["l_extendedprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(li["l_shipdate"].dt.date)
        .sum()
    )
    b = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
    )
    j = pd.DataFrame({"a": a, "b": b}).dropna().sort_index()
    n = len(j)
    av, bv = j["a"].to_numpy().astype(float), j["b"].to_numpy().astype(float)
    beta = (n * (av * bv).sum() - av.sum() * bv.sum()) / (
        n * (bv * bv).sum() - bv.sum() ** 2
    )
    alpha = (av.sum() - beta * bv.sum()) / n
    e = np.floor((av - alpha - beta * bv) / 100.0)
    de, el = np.diff(e), e[:-1]
    m = len(de)
    gamma = (el * de).sum() / (el * el).sum()
    sse = (de * de).sum() - (el * de).sum() ** 2 / (el * el).sum()
    se = math.sqrt(sse / (m - 1) / (el * el).sum())
    t = gamma / se
    assert res["n"] == m
    assert res["coint_beta"] == pytest.approx(beta, abs=1e-4)
    assert res["gamma"] == pytest.approx(gamma, abs=1e-4)
    assert res["df_t_stat"] == pytest.approx(t, abs=1e-2)
    assert res["cointegrated_5pct"] == int(t < -3.34)
    # independent synthetic series: residuals behave like white noise, so
    # gamma is strongly negative (fast mean reversion)
    assert res["gamma"] < 0
