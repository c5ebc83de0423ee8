"""Semantic invariant for wave-55 (exact sign test) — independent
python re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.functions.mathtab import LNFACT_Q
from tests.conftest import SF_DIR

_Q = queries()


def test_sign_test_matches_python(spark):
    res = _Q["stats_sign_test"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    d = np.diff(cents.to_numpy())
    d = d[d != 0]
    ups, downs = int((d > 0).sum()), int((d < 0).sum())
    n, k = ups + downs, min(ups, downs)
    pq = 0
    for i in range(k + 1):
        ln_t = (
            LNFACT_Q[n] - LNFACT_Q[i] - LNFACT_Q[n - i]
        ) / 1e9 - n * math.log(2.0)
        pq += math.floor(math.exp(ln_t) * 1e12)
    p2 = min(2 * pq / 1e12, 1.0)
    assert res["n_moves"] == n
    assert (res["up_days"], res["down_days"]) == (ups, downs)
    assert res["p_two_sided"] == pytest.approx(p2, abs=2e-6)
    assert res["trend_5pct"] == int(p2 < 0.05)
    # cross-check against the normal approximation for large n
    z = (ups - n / 2) / math.sqrt(n / 4)
    p_norm = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert res["p_two_sided"] == pytest.approx(p_norm, abs=0.05)
