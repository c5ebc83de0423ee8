"""Semantic invariants for wave-112 (SES alpha sweep, Cohen h) —
independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_ses_alpha_sweep_matches_python(spark):
    res = (
        _Q["ts_ses_alpha_sweep"](spark, SF_DIR).toPandas().set_index("alpha")
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    rev = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    n = len(rev)
    for alpha in (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875):
        w = alpha * (1 - alpha) ** np.arange(40)
        wsum = w.sum()
        sae = 0
        cnt = 0
        for t in range(41, n + 1):  # 1-based t > 40
            hist = rev[t - 2 :: -1][:40]  # y_{t-1}, y_{t-2}, ...
            fq = np.floor(w * hist * 1e2).sum() / 1e2
            fc = fq / wsum
            sae += math.floor(abs(rev[t - 1] - fc) / 1e2)
            cnt += 1
        row = res.loc[alpha]
        assert row["n_forecasts"] == cnt
        assert row["sum_abs_err_dollars"] == sae
        assert row["mae_dollars"] == pytest.approx(sae / cnt, abs=0.01)
    # a best alpha exists and the sweep is not flat
    assert res["mae_dollars"].nunique() > 1


def test_cohen_h_matches_python(spark):
    res = _Q["stats_cohen_h"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_discount"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    arm = (li["l_discount"] >= 0.05).astype(int)
    y = (li["l_returnflag"] == "R").astype(int)
    p1 = y[arm == 1].mean()
    p2 = y[arm == 0].mean()
    h = 2 * math.asin(math.sqrt(p1)) - 2 * math.asin(math.sqrt(p2))
    assert res["p_exposed"] == pytest.approx(p1, abs=1e-6)
    assert res["p_unexposed"] == pytest.approx(p2, abs=1e-6)
    assert res["cohen_h"] == pytest.approx(h, abs=1e-5)
    lbl = (
        "negligible"
        if abs(h) < 0.2
        else "small"
        if abs(h) < 0.5
        else "medium"
        if abs(h) < 0.8
        else "large"
    )
    assert res["magnitude"] == lbl
