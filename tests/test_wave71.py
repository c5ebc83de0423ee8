"""Semantic invariants for wave-71 operators (uplift/Qini, Tweedie
deviance, distinct-growth profile) — independent pandas re-derivations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_uplift_qini_matches_pandas(spark):
    res = _Q["ab_uplift_qini"](spark, SF_DIR).toPandas().set_index("decile")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users = ev.groupby("user_id").agg(
        score=("value", lambda s: int(np.floor(s * 100).astype("int64").sum())),
        purch=("event_type", lambda s: int((s == "purchase").sum())),
    )
    users["arm"] = ((users.index * 2654435761) % 4294967296 % 2).astype(int)
    users["conv"] = users["purch"] > 0
    users = users.sort_values(
        ["score", "user_id"], ascending=[False, True],
        key=lambda s: s if s.name == "score" else s,
    )
    # pandas can't multi-key with mixed order via sort_values+key easily:
    users = users.reset_index().sort_values(
        ["score", "user_id"], ascending=[False, True]
    )
    n = len(users)
    # NTILE(10) semantics: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    sizes = [base + 1 if i < extra else base for i in range(10)]
    deciles = np.repeat(np.arange(1, 11), sizes)
    users["decile"] = deciles
    ct_n = cc_n = ct_conv = cc_conv = 0
    for d in range(1, 11):
        g = users[users["decile"] == d]
        t, c = g[g["arm"] == 1], g[g["arm"] == 0]
        assert res.loc[d, "n_t"] == len(t)
        assert res.loc[d, "n_c"] == len(c)
        assert res.loc[d, "conv_t"] == int(t["conv"].sum())
        assert res.loc[d, "conv_c"] == int(c["conv"].sum())
        ct_n += len(t)
        cc_n += len(c)
        ct_conv += int(t["conv"].sum())
        cc_conv += int(c["conv"].sum())
        assert res.loc[d, "cum_uplift"] == pytest.approx(
            round(ct_conv / ct_n - cc_conv / cc_n, 6)
        )
        assert res.loc[d, "qini"] == pytest.approx(
            round(ct_conv - cc_conv * ct_n / cc_n, 4)
        )
    # the full-population qini is the overall incremental conversions
    assert res.loc[10, "cum_uplift"] == pytest.approx(
        ct_conv / ct_n - cc_conv / cc_n, abs=1e-6
    )


def test_tweedie_matches_numpy(spark):
    res = (
        _Q["ml_tweedie_deviance"](spark, SF_DIR)
        .toPandas()
        .set_index("o_orderpriority")
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for prio, g in orders.groupby("o_orderpriority"):
        y = g["o_totalprice"].to_numpy(float)
        # engine's quantized mean
        mu = np.floor(y * 1e4).astype("int64").sum() / 1e4 / len(y)
        terms = -4 * np.sqrt(y) + 2 * y / math.sqrt(mu) + 2 * math.sqrt(mu)
        dev = np.floor(terms * 1e4).astype("int64").sum() / 1e4 / len(y) * 2
        row = res.loc[prio]
        assert row["n"] == len(y)
        assert row["mu"] == pytest.approx(round(mu, 4), abs=1e-3)
        assert row["tweedie_deviance"] == pytest.approx(dev, abs=1e-3)
        assert row["tweedie_deviance"] > 0  # deviance is non-negative
        mse = np.floor((y - mu) ** 2 * 1e-4).astype("int64").sum() * 1e4 / len(y)
        assert row["mse"] == pytest.approx(mse, rel=1e-6)


def test_distinct_growth_matches_pandas(spark):
    res = (
        _Q["profile_distinct_growth"](spark, SF_DIR)
        .toPandas()
        .set_index("sample_pct")
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    bucket = orders["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 100
    )
    full_distinct = None
    for pct in (10, 25, 50, 100):
        sel = orders[bucket < pct]
        row = res.loc[pct]
        assert row["n_rows"] == len(sel)
        assert row["n_distinct"] == sel["o_custkey"].nunique()
        if pct == 100:
            full_distinct = sel["o_custkey"].nunique()
    assert res.loc[100, "share_of_full"] == 1.0
    # growth curve is monotone in the sample fraction
    assert res["n_distinct"].is_monotonic_increasing
    assert res["n_rows"].is_monotonic_increasing
