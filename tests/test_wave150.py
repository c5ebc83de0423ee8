"""Semantic invariants for wave-150 (sample entropy)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_sample_entropy_matches_brute_force(spark):
    res = _Q["ts_sample_entropy"](spark, SF_DIR).toPandas().iloc[0]
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
    u = np.array([float(n * int(v) - s) / float(s) for v in x])
    r = 0.2 * math.sqrt(
        float(sum(math.floor(v * v * 1e12) for v in u)) / 1e12 / n
    )
    # brute-force O(n^2) over length-3 template frame
    t0, t1, t2 = u[:-2], u[1:-1], u[2:]
    m = len(t0)
    d0 = np.abs(t0[:, None] - t0[None, :]) <= r
    d1 = np.abs(t1[:, None] - t1[None, :]) <= r
    d2 = np.abs(t2[:, None] - t2[None, :]) <= r
    iu = np.triu_indices(m, k=1)
    b_cnt = int((d0 & d1)[iu].sum())
    a_cnt = int((d0 & d1 & d2)[iu].sum())
    assert res["n_templates"] == m
    assert res["tolerance_r"] == pytest.approx(r, abs=1e-7)
    assert res["m2_matches"] == b_cnt
    assert res["m3_matches"] == a_cnt
    assert res["sampen"] == pytest.approx(-math.log(a_cnt / b_cnt), abs=1e-5)
    assert res["sampen"] > 0.0
