"""Semantic invariants for wave-135 (Engle ARCH LM test)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_arch_lm_matches_python(spark):
    res = _Q["ts_arch_lm"](spark, SF_DIR).toPandas().iloc[0]
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
    x = np.array([int(v) for v in daily.values], dtype=object)
    n, s = len(x), int(sum(int(v) for v in x))
    z = np.array([(float(n * int(v) - s) / float(s)) ** 2 for v in x])
    y, x1, x2 = z[2:], z[1:-1], z[:-2]
    X = np.column_stack([np.ones_like(y), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ss_res = float(resid @ resid)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    m = len(y)
    assert res["n_obs"] == m
    assert res["n_lags"] == 2
    assert res["r2"] == pytest.approx(r2, abs=1e-4)
    assert res["lm_stat"] == pytest.approx(m * r2, abs=m * 1e-4 + 1e-3)
    assert 0.0 <= res["r2"] <= 1.0
