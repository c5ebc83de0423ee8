"""Semantic invariants for wave-107 operators (recall@FPR, Cox–Stuart,
Kupiec POF) — independent python re-derivations from raw fixture
data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_recall_at_fpr_matches_python(spark):
    res = _Q["ml_recall_at_fpr"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    p, n = int(y.sum()), int((1 - y).sum())
    # walk distinct scores descending; pick the lowest threshold with
    # fp*100 <= n
    df = pd.DataFrame({"sq": sq, "y": y}).groupby("sq").agg(
        pos=("y", "sum"), neg=("y", lambda s: int((1 - s).sum()))
    ).sort_index(ascending=False)
    fp = df["neg"].cumsum()
    tp = df["pos"].cumsum()
    ok = fp * 100 <= n
    thresh = df.index[ok][-1]  # lowest qualifying score
    assert res["n_pos"] == p and res["n_neg"] == n
    assert res["threshold"] == pytest.approx(thresh / 1e6, abs=1e-9)
    assert res["achieved_fpr"] == pytest.approx(fp[thresh] / n, abs=1e-6)
    assert res["recall_at_1pct_fpr"] == pytest.approx(tp[thresh] / p, abs=1e-6)
    assert res["achieved_fpr"] <= 0.01 + 1e-9


def test_cox_stuart_matches_python(spark):
    res = _Q["stats_cox_stuart"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    rev = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(rev)
    h = n // 2
    first = rev[:h]
    second = rev[n - h :]
    up = int((second > first).sum())
    down = int((second < first).sum())
    ties = int((second == first).sum())
    m = up + down
    z = (up - 0.5 * m) / math.sqrt(0.25 * m)
    assert res["n_pairs"] == h
    assert res["n_up"] == up and res["n_down"] == down
    assert res["n_ties"] == ties
    assert res["z"] == pytest.approx(z, abs=1e-3)


def test_kupiec_matches_python(spark):
    res = _Q["ts_kupiec_pof"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    revq = (
        (li["l_extendedprice"] * 10000.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
        .to_numpy()
    )
    r = np.floor(np.log(revq[1:] / revq[:-1]) * 1e6).astype("int64")
    n = len(r)
    srt = np.sort(r)
    var_q = srt[math.ceil(0.05 * n) - 1]
    x = int((r < var_q).sum())
    xr = x / n
    lr = -2 * (
        (n - x) * math.log(0.95)
        + x * math.log(0.05)
        - (n - x) * math.log(1 - xr)
        - x * math.log(xr)
    )
    assert res["n_days"] == n
    assert res["var_5pct_return"] == pytest.approx(var_q / 1e6, abs=1e-9)
    assert res["n_violations"] == x
    assert res["lr_pof"] == pytest.approx(lr, abs=1e-3)
    # in-sample: violation rate must hug 5%, LR small
    assert abs(res["violation_rate"] - 0.05) < 0.02
    assert res["lr_pof"] < 6.0
