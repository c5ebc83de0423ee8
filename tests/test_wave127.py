"""Semantic invariants for wave-127 (Mood's median test)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_median_test_matches_python(spark):
    res = _Q["stats_median_test"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    y = (o["o_totalprice"] * 100.0).map(math.floor).astype("int64")
    srt = np.sort(y.to_numpy())
    n = len(srt)
    med = srt[math.ceil(0.5 * n) - 1]
    g = o["o_orderpriority"]
    chi = 0.0
    ta = int((y > med).sum())
    tb = n - ta
    k = g.nunique()
    for _, idx in y.groupby(g):
        above = int((idx > med).sum())
        below = len(idx) - above
        ea = len(idx) * ta / n
        eb = len(idx) * tb / n
        chi += (above - ea) ** 2 / ea + (below - eb) ** 2 / eb
    assert res["n_groups"] == k and res["n_obs"] == n
    assert res["df"] == k - 1
    assert res["median_test_chi2"] == pytest.approx(chi, abs=1e-3)
    assert res["median_test_chi2"] >= 0
