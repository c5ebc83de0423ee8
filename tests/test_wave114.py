"""Semantic invariants for wave-114 (Welch ANOVA, Bartlett) —
independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _groups():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    y = (o["o_totalprice"] * 100.0).map(math.floor).astype(float)
    return {g: yy.to_numpy() for g, yy in y.groupby(o["o_orderpriority"])}


def test_welch_anova_matches_python(spark):
    res = _Q["stats_anova_welch"](spark, SF_DIR).toPandas().iloc[0]
    gs = _groups()
    k = len(gs)
    n = {g: len(v) for g, v in gs.items()}
    mean = {g: v.mean() for g, v in gs.items()}
    var = {g: v.var(ddof=1) for g, v in gs.items()}
    w = {g: n[g] / var[g] for g in gs}
    wsum = sum(w.values())
    xw = sum(w[g] * mean[g] for g in gs) / wsum
    num = sum(w[g] * (mean[g] - xw) ** 2 for g in gs) / (k - 1)
    lam = sum((1 - w[g] / wsum) ** 2 / (n[g] - 1) for g in gs)
    f = num / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    assert res["n_groups"] == k and res["df1"] == k - 1
    assert res["welch_f"] == pytest.approx(f, rel=1e-4)
    assert res["df2_approx"] == pytest.approx(df2, rel=1e-4)


def test_bartlett_matches_python(spark):
    res = _Q["stats_bartlett"](spark, SF_DIR).toPandas().iloc[0]
    gs = _groups()
    k = len(gs)
    n = {g: len(v) for g, v in gs.items()}
    var = {g: v.var(ddof=1) for g, v in gs.items()}
    nn = sum(n.values())
    sp2 = sum((n[g] - 1) * var[g] for g in gs) / (nn - k)
    num = (nn - k) * math.log(sp2) - sum(
        (n[g] - 1) * math.log(var[g]) for g in gs
    )
    c = 1 + (sum(1 / (n[g] - 1) for g in gs) - 1 / (nn - k)) / (3 * (k - 1))
    chi2 = num / c
    assert res["n_groups"] == k and res["n_obs"] == nn
    assert res["df"] == k - 1
    assert res["bartlett_chi2"] == pytest.approx(chi2, abs=1e-2)
    assert res["bartlett_chi2"] >= 0
