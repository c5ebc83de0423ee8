"""Semantic invariants for wave-126 (D'Agostino skewness z)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_dagostino_matches_python(spark):
    res = _Q["stats_dagostino_skew"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    y = (o["o_totalprice"] * 100.0).map(math.floor).astype(float).to_numpy()
    n = len(y)
    m = y.mean()
    mu2 = ((y - m) ** 2).mean()
    mu3 = ((y - m) ** 3).mean()
    g1 = mu3 / mu2**1.5
    yy = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    ww = math.sqrt(w2)
    delta = 1 / math.sqrt(math.log(ww))
    alpha = math.sqrt(2 / (w2 - 1))
    z = delta * math.log(yy / alpha + math.sqrt((yy / alpha) ** 2 + 1))
    assert res["n_obs"] == n
    assert res["sample_skewness"] == pytest.approx(g1, abs=1e-5)
    assert res["dagostino_z"] == pytest.approx(z, abs=1e-3)
    # the skewness direction and the z direction agree
    assert (res["sample_skewness"] > 0) == (res["dagostino_z"] > 0)
