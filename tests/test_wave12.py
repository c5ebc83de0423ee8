"""Semantic invariants for wave-12 operators (Luhn checksum,
deterministic permutation test, Ljung-Box portmanteau)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _luhn_sum(s: str) -> int:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total


def test_luhn_matches_reference_implementation(spark):
    res = _Q["fn_luhn"](spark, SF_DIR).toPandas()
    for r in res.itertuples():
        assert r.acct_no == str((r.o_orderkey * 7919) % 10**12).zfill(12)
        assert r.luhn_mod == _luhn_sum(r.acct_no) % 10
        assert r.is_valid == (r.luhn_mod == 0)
    # a random-ish digit stream validates ~10% of the time
    assert 0.03 < res["is_valid"].mean() < 0.25


def test_permutation_test_matches_numpy(spark):
    res = _Q["stats_permutation_test"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    vq = np.floor(ev["value"].values * 100.0).astype(np.int64)
    u = pd.DataFrame({"user_id": ev["user_id"], "vq": vq}).groupby(
        "user_id", as_index=False
    )["vq"].sum()
    uid = u["user_id"].values.astype(object)  # python ints: no int64 overflow
    diffs = []
    for p in range(200):
        arm = ((uid + p * 1000003) * 2654435761) % 4294967296 % 2
        arm = arm.astype(int)
        m1 = u["vq"].values[arm == 1].mean()
        m0 = u["vq"].values[arm == 0].mean()
        diffs.append(m1 - m0)
    obs = abs(diffs[0])
    n_extreme = sum(1 for d in diffs[1:] if abs(d) >= obs)
    assert res.loc[0, "observed_diff"] == pytest.approx(diffs[0] / 100, abs=1e-4)
    assert res.loc[0, "n_extreme"] == n_extreme
    assert res.loc[0, "p_value"] == pytest.approx((1 + n_extreme) / 200, abs=1e-6)


def test_ljung_box_matches_numpy(spark):
    res = _Q["ts_ljung_box"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        np.floor(orders["o_totalprice"].values * 100.0)
        .astype(np.int64)[np.argsort(orders["o_orderdate"].values, kind="stable")]
    )
    daily = (
        pd.DataFrame(
            {"day": orders["o_orderdate"].values.astype("datetime64[D]"), "x": np.floor(orders["o_totalprice"].values * 100.0)}
        )
        .groupby("day")["x"]
        .sum()
        .sort_index()
        .values
    )
    n = len(daily)
    d = daily - daily.mean()
    dd = (d * d).sum()
    q = 0.0
    for k in range(1, 11):
        rk = (d[k:] * d[:-k]).sum() / dd
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert res.loc[0, "n_days"] == n
    assert res.loc[0, "q_stat"] == pytest.approx(q, rel=1e-6)
