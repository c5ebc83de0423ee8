"""Semantic invariants for wave-124 (Fisher g-test, TOPSIS) —
independent python re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_fisher_g_matches_python(spark):
    res = _Q["ts_fisher_g_test"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy(float)
    n = len(cnt)
    mu = cnt.mean()
    t = np.arange(n)
    powers = {}
    for p in range(2, 17):
        cq = math.floor(0)  # mirror per-term quantization loosely
        c = np.floor((cnt - mu) * np.cos(2 * math.pi * t / p) * 1e6).sum() / 1e6
        s = np.floor((cnt - mu) * np.sin(2 * math.pi * t / p) * 1e6).sum() / 1e6
        powers[p] = math.floor((c * c + s * s) / n * 1e6) / 1e6
    k = len(powers)
    tot = sum(powers.values())
    peak = max(sorted(powers), key=lambda p: powers[p])
    g = powers[peak] / tot
    assert res["n_frequencies"] == k
    assert res["peak_period_days"] == peak
    assert res["fisher_g"] == pytest.approx(g, abs=1e-5)
    assert res["p_value_approx"] == pytest.approx(
        k * (1 - g) ** (k - 1), abs=1e-6
    )
    # a dominant line exists and the g ratio reflects it
    assert res["fisher_g"] > 1.0 / k


def test_topsis_matches_python(spark):
    res = _Q["agg_topsis_ranking"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    m["rev"] = (m["o_totalprice"] * 100.0).map(math.floor)
    kpi = m.groupby("n_name").agg(
        rev=("rev", "sum"),
        n_orders=("o_orderkey", "size") if "o_orderkey" in m else ("rev", "size"),
        n_cust=("o_custkey", "nunique"),
    )
    z = kpi / np.sqrt((kpi.astype(float) ** 2).sum())
    best, worst = z.max(), z.min()
    dp = np.sqrt(((z - best) ** 2).sum(axis=1))
    dm = np.sqrt(((z - worst) ** 2).sum(axis=1))
    score = dm / (dp + dm)
    top = score.sort_values(ascending=False).head(10)
    got = res.set_index("nation")["topsis_score"]
    for nation in got.index:
        assert got[nation] == pytest.approx(score[nation], abs=1e-5)
    # scores in [0,1] and descending ranks
    assert (res["topsis_score"].between(0, 1)).all()
    assert res["topsis_score"].is_monotonic_decreasing
