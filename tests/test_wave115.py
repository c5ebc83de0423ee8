"""Semantic invariants for wave-115 (median order-statistic CI) —
independent python re-derivation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_median_ci_matches_python(spark):
    res = _Q["stats_median_ci"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    c = np.sort(
        (o["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    )
    n = len(c)
    rl = math.floor((n - 1.96 * math.sqrt(n)) / 2)
    ru = math.ceil(1 + (n + 1.96 * math.sqrt(n)) / 2)
    rm = math.ceil(0.5 * n)
    assert res["n_obs"] == n
    assert res["rank_lower"] == rl and res["rank_upper"] == ru
    assert res["median_dollars"] == pytest.approx(c[rm - 1] / 100, abs=0.01)
    assert res["ci_lower_dollars"] == pytest.approx(c[rl - 1] / 100, abs=0.01)
    assert res["ci_upper_dollars"] == pytest.approx(c[ru - 1] / 100, abs=0.01)
    assert (
        res["ci_lower_dollars"]
        <= res["median_dollars"]
        <= res["ci_upper_dollars"]
    )
