"""Semantic invariants for wave-146 (CUSUM of squares)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_cusum_squares_matches_numpy(spark):
    res = _Q["ts_cusum_squares"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = (
        o.assign(
            day=pd.to_datetime(o.o_orderdate).dt.date,
            cents=(o.o_totalprice * 100.0).map(math.floor).astype(object),
        )
        .groupby("day")["cents"]
        .sum()
        .sort_index()
    )
    x = daily.values
    n = len(x)
    s = int(sum(int(v) for v in x))
    u2 = np.array(
        [(float(n * int(v) - s) / float(s)) ** 2 for v in x]
    )
    c = np.cumsum(u2)
    dev = np.abs(c / c[-1] - np.arange(1, n + 1) / n)
    k = int(np.argmax(dev))
    assert res["n_days"] == n
    assert res["worst_rank"] == k + 1
    assert str(res["worst_day"]) == str(daily.index[k])
    assert res["cusum_sq_stat"] == pytest.approx(dev[k], abs=1e-5)
    assert res["scaled_stat"] == pytest.approx(
        math.sqrt(n / 2.0) * dev[k], abs=1e-3
    )
    assert 0.0 <= res["cusum_sq_stat"] <= 1.0
