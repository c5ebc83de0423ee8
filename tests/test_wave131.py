"""Semantic invariants for wave-131 (Lorenz asymmetry)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_lorenz_asymmetry_matches_python(spark):
    res = _Q["agg_lorenz_asymmetry"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    c = np.sort(
        (o["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    )
    n = len(c)
    s = int(c.sum())
    mu = s / n
    below = c[c < mu]
    m = len(below)
    x_m = int(below.max())
    x_m1 = int(c[c >= mu].min())
    delta = (mu - x_m) / (x_m1 - x_m)
    f_mu = (m + delta) / n
    l_mu = (below.sum() + delta * x_m1) / s
    assert res["n_obs"] == n
    assert res["f_mu"] == pytest.approx(f_mu, abs=1e-6)
    assert res["l_mu"] == pytest.approx(l_mu, abs=1e-6)
    assert res["lorenz_asymmetry_s"] == pytest.approx(f_mu + l_mu, abs=1e-6)
    # L(mu) <= F(mu) always (Lorenz curve under the diagonal)
    assert res["l_mu"] <= res["f_mu"] + 1e-9
