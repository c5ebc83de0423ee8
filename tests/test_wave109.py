"""Semantic invariants for wave-109 (Pettitt changepoint) — the rank
identity must reproduce the O(n²) pairwise definition exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_pettitt_matches_pairwise_definition(spark):
    res = _Q["ts_pettitt"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    rev = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
    )
    x = rev.to_numpy()
    n = len(x)
    # O(n^2) pairwise U_t via sign matrix cumulative (ground truth)
    sgn = np.sign(x[None, :] - x[:, None])
    # U_t = sum_{i<=t} sum_{j>t} sgn(x_j - x_i)
    ut = np.array(
        [sgn[: t + 1, t + 1 :].sum() for t in range(n - 1)], dtype=float
    )
    k_idx = int(np.argmax(np.abs(ut)))
    k = abs(ut[k_idx])
    p = min(1.0, 2 * math.exp(-6 * k * k / (n**3 + n**2)))
    assert res["n_days"] == n
    assert res["split_index"] == k_idx + 1
    assert res["change_day"] == rev.index[k_idx].strftime("%Y-%m-%d")
    assert res["k_stat"] == pytest.approx(k, abs=0.51)  # midrank halves
    assert res["p_approx"] == pytest.approx(p, abs=1e-3)
