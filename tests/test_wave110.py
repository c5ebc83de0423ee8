"""Semantic invariants for wave-110 (Kendall W, Newcombe CI) —
independent python re-derivations plus the Friedman identity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_kendall_w_matches_python_and_friedman_identity(spark):
    res = _Q["stats_kendall_w"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    cell = cents.groupby(
        [o["o_orderdate"].dt.strftime("%Y-%m"), o["o_orderpriority"]]
    ).sum().unstack().dropna()
    m, k = len(cell), 5
    rj = cell.rank(axis=1, method="average").sum()
    ss = ((rj - rj.mean()) ** 2).sum()
    w = 12 * ss / (m * m * k * (k * k - 1))
    assert res["n_blocks"] == m and res["k"] == k
    assert res["kendall_w"] == pytest.approx(w, abs=1e-5)
    assert 0.0 <= res["kendall_w"] <= 1.0
    # chi2_F = m(k-1)W — the algebraic bridge to Friedman
    assert res["friedman_chi2_identity"] == pytest.approx(
        m * (k - 1) * w, abs=1e-2
    )


def test_newcombe_matches_python(spark):
    res = _Q["stats_newcombe_ci"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_discount"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    arm = (li["l_discount"] >= 0.05).astype(int)
    y = (li["l_returnflag"] == "R").astype(int)

    def wilson(x, n):
        z = 1.96
        center = (x + z * z / 2) / (n + z * z)
        half = z * math.sqrt(x * (n - x) / n + z * z / 4) / (n + z * z)
        return x / n, center - half, center + half

    x1, n1 = int(y[arm == 1].sum()), int((arm == 1).sum())
    x2, n2 = int(y[arm == 0].sum()), int((arm == 0).sum())
    p1, l1, u1 = wilson(x1, n1)
    p2, l2, u2 = wilson(x2, n2)
    diff = p1 - p2
    lo = diff - math.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2)
    hi = diff + math.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2)
    assert res["n_exposed"] == n1 and res["n_unexposed"] == n2
    assert res["diff"] == pytest.approx(diff, abs=1e-5)
    assert res["ci_lower"] == pytest.approx(lo, abs=1e-5)
    assert res["ci_upper"] == pytest.approx(hi, abs=1e-5)
    assert res["ci_lower"] <= res["diff"] <= res["ci_upper"]
