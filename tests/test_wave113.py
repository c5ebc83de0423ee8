"""Semantic invariants for wave-113 (grouped jackknife, DeLong AUC CI)
— independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_jackknife_matches_python(spark):
    res = _Q["stats_jackknife_groups"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    y = (m["o_totalprice"] * 100.0).map(math.floor).astype(float)
    g = m["c_nationkey"]
    per = pd.DataFrame({"g": g, "y": y}).groupby("g")["y"].agg(["count", "sum"])
    gg = len(per)
    n, s = per["count"].sum(), per["sum"].sum()
    theta = (s - per["sum"]) / (n - per["count"])
    se = math.sqrt((gg - 1) / gg * ((theta - theta.mean()) ** 2).sum())
    assert res["n_groups"] == gg and res["n_obs"] == n
    assert res["mean_dollars"] == pytest.approx(s / n / 100, abs=1e-2)
    assert res["jackknife_se_dollars"] == pytest.approx(se / 100, abs=1e-2)
    assert res["ci_lower_dollars"] < res["mean_dollars"] < res["ci_upper_dollars"]


def test_delong_matches_python(spark):
    res = _Q["ml_auc_delong_ci"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    pos = np.sort(sq[y == 1].to_numpy())
    neg = np.sort(sq[y == 0].to_numpy())
    m, n = len(pos), len(neg)
    v10 = (
        np.searchsorted(neg, pos, side="left")
        + 0.5 * (np.searchsorted(neg, pos, side="right")
                 - np.searchsorted(neg, pos, side="left"))
    ) / n
    v01 = (
        (m - np.searchsorted(pos, neg, side="right"))
        + 0.5 * (np.searchsorted(pos, neg, side="right")
                 - np.searchsorted(pos, neg, side="left"))
    ) / m
    auc = v10.mean()
    s10 = ((v10 - auc) ** 2).sum() / (m - 1)
    s01 = ((v01 - auc) ** 2).sum() / (n - 1)
    se = math.sqrt(s10 / m + s01 / n)
    assert res["n_pos"] == m and res["n_neg"] == n
    assert res["auc"] == pytest.approx(auc, abs=1e-4)
    assert res["delong_se"] == pytest.approx(se, abs=1e-4)
    assert res["ci_lower"] == pytest.approx(auc - 1.96 * se, abs=2e-4)
    assert res["ci_upper"] == pytest.approx(auc + 1.96 * se, abs=2e-4)
    # CI brackets the point estimate and stays in [0, 1]-adjacent range
    assert res["ci_lower"] < res["auc"] < res["ci_upper"]
