"""Semantic invariants for wave-39 operators (nested pruning, tail
dependence, decay scoring) — independent pandas/python
re-implementations, plus the nested-leaf plan assertion."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.plans import plan_string
from tests.conftest import SF_DIR

_Q = queries()


def test_nested_pruning_plan_and_values(spark):
    df = _Q["scan_nested_pruning"](spark, SF_DIR)
    plan = plan_string(df)
    # the struct leaf list must include the referenced leaves but NOT the
    # 1000-char padding leaf — nested schema pruning is on
    assert "regionkey" in plan and "nationkey" in plan
    assert "padding" not in plan
    res = df.toPandas()
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet").sort_values("n_name")
    assert list(res["name"]) == list(nat["n_name"])
    assert (res["regionkey"].to_numpy() == nat["n_regionkey"].to_numpy()).all()
    assert (
        res["geo_id"].to_numpy() == (nat["n_nationkey"] + 1000).to_numpy()
    ).all()


def test_tail_dependence_matches_numpy(spark):
    res = _Q["stats_tail_dependence"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        (li["l_extendedprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(li["l_shipdate"].dt.date).sum()
    )
    y = (
        (orders["o_totalprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(orders["o_orderdate"].dt.date).sum()
    )
    j = pd.DataFrame({"x": x, "y": y}).dropna().sort_index()
    n = len(j)
    k = math.ceil(0.95 * n)
    rx = j.sort_values("x", kind="stable").assign(r=range(1, n + 1))["r"]
    # tie-break by day: sort by (x, day) — index is the day already
    order_x = sorted(j.index, key=lambda d: (j.loc[d, "x"], d))
    order_y = sorted(j.index, key=lambda d: (j.loc[d, "y"], d))
    rx = {d: i + 1 for i, d in enumerate(order_x)}
    ry = {d: i + 1 for i, d in enumerate(order_y)}
    xe = {d for d in j.index if rx[d] > k}
    ye = {d for d in j.index if ry[d] > k}
    assert res["n_days"] == n
    assert res["x_exceed"] == len(xe)
    assert res["y_exceed"] == len(ye)
    assert res["joint_exceed"] == len(xe & ye)
    assert res["lambda_upper"] == pytest.approx(
        len(xe & ye) / len(ye), abs=1e-6
    )
    # independent synthetic series: lambda far from 1
    assert res["lambda_upper"] < 0.5


def test_decay_score_matches_python(spark):
    res = _Q["events_decay_score"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    asof = ev["ts"].dt.date.max()
    age = (asof - ev["ts"].dt.date).apply(lambda td: td.days)
    cents = np.floor(ev["value"] * 100).astype("int64")
    wq = np.floor(cents * np.power(2.0, -age / 7.0) * 1e4).astype("int64")
    g = pd.DataFrame({"u": ev["user_id"], "wq": wq, "c": cents}).groupby("u")
    agg = g.agg(n=("wq", "size"), sq=("wq", "sum"), rc=("c", "sum"))
    order = sorted(agg.index, key=lambda u: (-agg.loc[u, "sq"], u))[:25]
    assert list(res["user_id"]) == order
    for r in res.itertuples():
        row = agg.loc[r.user_id]
        assert r.n_events == row["n"]
        assert r.decay_score == pytest.approx(row["sq"] / 1e4 / 100.0, abs=1e-3)
        assert r.raw_value == pytest.approx(row["rc"] / 100.0, abs=0.01)
    # decay rank differs from raw rank for at least one of the top users
    raw_order = sorted(agg.index, key=lambda u: (-agg.loc[u, "rc"], u))[:25]
    assert order != raw_order
