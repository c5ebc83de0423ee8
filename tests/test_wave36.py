"""Semantic invariants for wave-36 operators (Hill tail index, modular
pseudonymization, incremental stats) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hill_matches_numpy(spark):
    res = _Q["stats_hill_tail"](spark, SF_DIR).toPandas().set_index("k")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.sort(
        np.floor(orders["o_totalprice"].to_numpy() * 100).astype("int64")
    )[::-1]
    for k in (50, 100, 200):
        xk = cents[k]  # (k+1)-th largest
        sq = sum(
            math.floor(math.log(cents[i] / xk) * 1e9) for i in range(k)
        )
        gamma = sq / 1e9 / k
        row = res.loc[k]
        assert row["threshold"] == pytest.approx(xk / 100.0, abs=0.01)
        assert row["hill_gamma"] == pytest.approx(gamma, abs=1e-6)
        assert row["alpha_hat"] == pytest.approx(1 / gamma, abs=1e-2)
    # a bounded-support (uniform-ish) distribution has tiny gamma — far
    # from the heavy-tail regime gamma >= 0.5
    assert (res["hill_gamma"] < 0.5).all()


def test_modinv_roundtrip_matches_python(spark):
    res = _Q["fn_modinv_obfuscate"](spark, SF_DIR).toPandas().iloc[0]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    a, m = 387420489, 2**31
    a_inv = pow(a, -1, m)
    keys = cust["c_custkey"].to_numpy().astype(object)
    tokens = [(k * a) % m for k in keys]
    decoded = [(t * a_inv) % m for t in tokens]
    assert res["n"] == len(keys)
    assert res["distinct_tokens"] == len(set(tokens))
    assert res["distinct_tokens"] == len(keys)  # bijective on the keyspace
    assert res["roundtrip_ok"] == len(keys)
    assert (np.array(decoded, dtype=object) == keys).all()
    assert res["min_token"] == min(tokens)
    assert res["max_token"] == max(tokens)
    # tokens scatter: the max token is near the top of the 2^31 space even
    # though the input keys are small sequential integers
    assert res["max_token"] > 2**30


def test_incremental_stats_matches_pandas(spark):
    res = _Q["sink_incremental_stats"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    day = ev["ts"].dt.day
    base, delta = ev[day <= 20], ev[day > 20]
    assert res["base_n"] == len(base)
    assert res["delta_n"] == len(delta)
    assert res["full_n"] == len(ev)
    assert res["count_merges"] == 1
    assert res["sum_merges"] == 1
    assert res["minmax_merges"] == 1
    assert res["ndv_upper_bound_holds"] == 1
    overlap = (
        base["user_id"].nunique()
        + delta["user_id"].nunique()
        - ev["user_id"].nunique()
    )
    assert res["ndv_overlap"] == overlap
    # most users appear in both halves of a month-long uniform stream
    assert overlap > 0.5 * ev["user_id"].nunique()
