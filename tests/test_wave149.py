"""Semantic invariants for wave-149 (energy distance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_energy_distance_matches_brute_force(spark):
    res = _Q["stats_energy_distance"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    x = np.floor(
        ev.loc[ev.event_type == "purchase", "value"].values * 1e4
    )
    y = np.floor(ev.loc[ev.event_type == "view", "value"].values * 1e4)
    n1, n2 = len(x), len(y)
    # O(n^2) brute force on the quantized grid (fixture sizes allow it)
    mxy = np.abs(x[:, None] - y[None, :]).mean()
    mxx = np.abs(x[:, None] - x[None, :]).mean()
    myy = np.abs(y[:, None] - y[None, :]).mean()
    e = (2 * mxy - mxx - myy) / 1e4
    assert res["n_a"] == n1 and res["n_b"] == n2
    assert res["e_dist"] == pytest.approx(e, rel=1e-5, abs=1e-5)
    assert res["t_stat"] == pytest.approx(
        n1 * n2 / (n1 + n2) * e, rel=1e-4, abs=1e-3
    )
    # energy distance is non-negative
    assert res["e_dist"] >= 0.0
