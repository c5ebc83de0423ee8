"""Semantic invariants for wave-19 operators (Grubbs, Wilcoxon signed-rank,
price elasticity, window exchange-reuse) — independent numpy/python
re-implementations on top of the DuckDB hash gate, plus the single-shuffle
plan assertion for the window-batching idiom."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.plans import plan_string
from tests.conftest import SF_DIR

_Q = queries()


def test_grubbs_matches_numpy(spark):
    res = _Q["stats_grubbs"](spark, SF_DIR).toPandas().set_index("n_name")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet").set_index("n_nationkey")
    assert len(res) == 25
    for nk, grp in cust.groupby("c_nationkey"):
        x = grp["c_acctbal"].to_numpy()
        n = len(x)
        mean = np.floor(x * 100).sum() / 100.0 / n
        d = x - mean
        s = math.sqrt((d * d).sum() / (n - 1))
        dq = np.floor(np.abs(d) * 1e6).astype("int64")
        order = sorted(
            range(n), key=lambda i: (-dq[i], grp["c_custkey"].iloc[i])
        )
        i = order[0]
        row = res.loc[nat.loc[nk, "n_name"]]
        assert row["n_customers"] == n
        assert row["suspect_custkey"] == grp["c_custkey"].iloc[i]
        assert row["deviation"] == pytest.approx(d[i], abs=0.01)
        assert row["grubbs_g"] == pytest.approx(abs(d[i]) / s, abs=1e-3)
        # G is bounded by (n-1)/sqrt(n) for any sample
        assert row["grubbs_g"] <= (n - 1) / math.sqrt(n) + 1e-9


def test_wilcoxon_matches_python_ranks(spark):
    res = _Q["stats_wilcoxon_signed_rank"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cents = np.floor(ev["value"].to_numpy() * 100).astype("int64")
    first = ev["ts"].dt.day <= 15
    df = pd.DataFrame({"u": ev["user_id"], "c": cents, "h": first})
    dqs = []
    for _u, g in df.groupby("u"):
        g1, g2 = g[g["h"]], g[~g["h"]]
        if len(g1) == 0 or len(g2) == 0:
            continue
        dq = math.floor(
            (g1["c"].sum() / len(g1) - g2["c"].sum() / len(g2)) * 10000.0
        )
        if dq != 0:
            dqs.append(dq)
    adq = np.abs(dqs)
    order = np.argsort(adq, kind="stable")
    ranks = np.empty(len(dqs))
    sorted_a = adq[order]
    i = 0
    while i < len(sorted_a):
        j = i
        while j < len(sorted_a) and sorted_a[j] == sorted_a[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    wp = ranks[np.array(dqs) > 0].sum()
    wm = ranks[np.array(dqs) < 0].sum()
    n = len(dqs)
    z = (wp - n * (n + 1) / 4.0) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    assert res["n"] == n
    assert res["w_plus"] == pytest.approx(wp, abs=1e-9)
    assert res["w_minus"] == pytest.approx(wm, abs=1e-9)
    assert res["z"] == pytest.approx(z, abs=1e-3)
    # W+ + W- always equals n(n+1)/2
    assert res["w_plus"] + res["w_minus"] == pytest.approx(n * (n + 1) / 2)


def test_elasticity_matches_numpy_ols(spark):
    res = _Q["market_elasticity"](spark, SF_DIR).toPandas().set_index("brand")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    x = np.log(j["l_extendedprice"] / j["l_quantity"])
    y = np.log(j["l_quantity"])
    for brand, idx in j.groupby("p_brand").groups.items():
        xs, ys = x[idx].to_numpy(), y[idx].to_numpy()
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        row = res.loc[brand]
        assert row["n"] == len(xs)
        assert row["elasticity"] == pytest.approx(slope, abs=2e-3)
        assert row["intercept"] == pytest.approx(intercept, abs=2e-3)
        assert row["r2"] == pytest.approx(r * r, abs=2e-3)
    # price-independent synthetic quantities → elasticity near 0 on average
    assert res["elasticity"].abs().mean() < 1.0


def test_exchange_reuse_single_hash_shuffle_and_values(spark):
    df = _Q["win_exchange_reuse"](spark, SF_DIR)
    plan = plan_string(df)
    # all four window specs share ONE hashpartitioning exchange; the only
    # other exchange is the final presentation ORDER BY (rangepartitioning)
    assert plan.count("hashpartitioning(o_custkey") == 1
    res = df.toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders["cents"] = np.floor(orders["o_totalprice"] * 100).astype("int64")
    got = res.set_index(["o_custkey", "seq"])
    for ck, g in list(orders.groupby("o_custkey"))[:50]:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        tot = g["cents"].sum()
        run = g["cents"].cumsum()
        for i in range(min(3, len(g))):
            row = got.loc[(ck, i + 1)]
            assert row["o_orderkey"] == g["o_orderkey"].iloc[i]
            assert row["running_spend"] == pytest.approx(
                run.iloc[i] / 100.0, abs=0.01
            )
            assert row["spend_frac"] == pytest.approx(
                run.iloc[i] / tot, abs=1e-6
            )
    assert (res["seq"] <= 3).all()
