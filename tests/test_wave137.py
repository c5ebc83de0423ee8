"""Semantic invariants for wave-137 (Moran's I / Geary's C)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_moran_geary_match_numpy_dense_weights(spark):
    res = _Q["stats_moran_geary"](spark, SF_DIR).toPandas().iloc[0]
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    n_tab = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    cents = (c.c_acctbal * 100.0).map(math.floor)
    per_nat = (
        c.assign(cents=cents)
        .groupby("c_nationkey")["cents"]
        .sum()
        .astype(float)
    )
    nat = n_tab.set_index("n_nationkey").loc[per_nat.index, "n_regionkey"]
    x = per_nat.values
    n = len(x)
    s = x.sum()
    z = (n * x - s) / s
    # dense O(n^2) reference: w_ij = 1 iff same region, i != j
    wmat = (nat.values[:, None] == nat.values[None, :]).astype(float)
    np.fill_diagonal(wmat, 0.0)
    w_sum = wmat.sum()
    num_i = float(z @ wmat @ z)
    num_c = float((wmat * (z[:, None] - z[None, :]) ** 2).sum())
    q = float((z**2).sum())
    moran = n / w_sum * num_i / q
    geary = (n - 1) / (2 * w_sum) * num_c / q
    assert res["n_nations"] == n
    assert res["n_weight_pairs"] == int(w_sum)
    assert res["morans_i"] == pytest.approx(moran, abs=1e-4)
    assert res["expected_i"] == pytest.approx(-1.0 / (n - 1), abs=1e-6)
    assert res["gearys_c"] == pytest.approx(geary, abs=1e-4)
    # Geary's C is non-negative by construction
    assert res["gearys_c"] >= 0.0
