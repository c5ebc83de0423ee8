"""Semantic invariants for wave-104 operators (design effect, covariate
balance) — independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_design_effect_matches_python(spark):
    res = _Q["sample_design_effect"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    y = (m["o_totalprice"] * 100.0).map(math.floor).astype(float)
    cl = m["c_nationkey"]
    per = pd.DataFrame({"cl": cl, "y": y}).groupby("cl")["y"]
    g = per.ngroups
    n = len(y)
    groupterm = (per.sum() ** 2 / per.count()).sum()
    msb = (groupterm - y.sum() ** 2 / n) / (g - 1)
    msw = ((y**2).sum() - groupterm) / (n - g)
    mbar = n / g
    icc = (msb - msw) / (msb + (mbar - 1) * msw)
    deff = 1 + (mbar - 1) * icc
    assert res["n_clusters"] == g and res["n_obs"] == n
    assert res["avg_cluster_size"] == pytest.approx(mbar, abs=0.01)
    assert res["icc_rho"] == pytest.approx(icc, abs=1e-5)
    assert res["design_effect"] == pytest.approx(deff, abs=1e-3)
    assert res["effective_sample_size"] == pytest.approx(n / deff, abs=1.0)
    # effective n can never exceed raw n when icc >= 0
    if res["icc_rho"] >= 0:
        assert res["effective_sample_size"] <= n + 1


def test_covariate_balance_matches_python(spark):
    res = (
        _Q["ab_covariate_balance"](spark, SF_DIR)
        .toPandas()
        .set_index("covariate")
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    per = ev.groupby("user_id").agg(
        total_value=("value", lambda s: (s * 1e4).map(math.floor).sum() / 1e4),
        n_events=("value", "size"),
        n_event_types=("event_type", "nunique"),
    )
    arm = ((per.index.to_numpy().astype(np.int64) * 2654435761) % 4294967296) % 2
    for cov in ("total_value", "n_events", "n_event_types"):
        x0 = per[cov].to_numpy(float)[arm == 0]
        x1 = per[cov].to_numpy(float)[arm == 1]
        v0, v1 = x0.var(ddof=1), x1.var(ddof=1)
        smd = (
            (x1.mean() - x0.mean()) / math.sqrt((v0 + v1) / 2)
            if v0 + v1 > 0
            else 0.0
        )
        row = res.loc[cov]
        assert row["mean_control"] == pytest.approx(x0.mean(), abs=1e-2)
        assert row["mean_treatment"] == pytest.approx(x1.mean(), abs=1e-2)
        assert row["smd"] == pytest.approx(smd, abs=1e-3)
    # the hash split keeps composition near-balanced; the fixture's
    # per-user volume carries a mild (≈0.1) imbalance which the table
    # is precisely there to surface
    assert res["smd"].abs().max() < 0.2
    assert int((res["balanced"] == 1).sum()) >= 2
