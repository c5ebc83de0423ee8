"""Semantic invariants for wave-32 operators (Bayesian A/B, AR feature
matrix, IQR outlier profile) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bayesian_beta_matches_lgamma(spark):
    res = _Q["ab_bayesian_beta"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    conv = (
        ev.assign(
            c=(
                (ev["event_type"] == "purchase")
                & (ev["ts"].dt.day > 15)
                & (ev["value"] >= 190.0)
            ).astype(int)
        )
        .groupby("user_id")["c"]
        .max()
    )
    arm = pd.Series(conv.index % 2, index=conv.index)
    n0, s0 = int((arm == 0).sum()), int(conv[arm == 0].sum())
    n1, s1 = int((arm == 1).sum()), int(conv[arm == 1].sum())
    aa, ba, ab, bb = s0 + 1, n0 - s0 + 1, s1 + 1, n1 - s1 + 1

    def lnB(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    p = sum(
        math.exp(
            lnB(aa + i, ba + bb) - math.log(bb + i) - lnB(1 + i, bb) - lnB(aa, ba)
        )
        for i in range(ab)
    )
    assert (res["n_a"], res["conv_a"]) == (n0, s0)
    assert (res["n_b"], res["conv_b"]) == (n1, s1)
    assert res["rate_a"] == pytest.approx(s0 / n0, abs=1e-6)
    assert res["rate_b"] == pytest.approx(s1 / n1, abs=1e-6)
    assert res["p_b_beats_a"] == pytest.approx(p, abs=1e-4)
    assert 0.0 <= res["p_b_beats_a"] <= 1.0
    # the split is a null hash assignment: posterior should not be extreme
    assert 0.02 < res["p_b_beats_a"] < 0.98


def test_ar_features_matches_pandas(spark):
    res = _Q["ts_ar_features"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    df = pd.DataFrame({"x": x})
    df["t"] = np.arange(1, len(df) + 1)
    df["lag1"] = df["x"].shift(1)
    df["lag2"] = df["x"].shift(2)
    df["lag7"] = df["x"].shift(7)
    df["s7"] = df["x"].shift(1).rolling(7).sum()
    df["min7"] = df["x"].shift(1).rolling(7).min()
    df["max7"] = df["x"].shift(1).rolling(7).max()
    valid = df.dropna()
    assert len(res) == len(valid)
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    for day, r in valid.iterrows():
        g = got.loc[day]
        assert g["y"] == pytest.approx(r["x"] / 100.0, abs=0.01)
        assert g["trend_idx"] == r["t"]
        assert g["dow_idx"] == r["t"] % 7
        assert g["lag1"] == pytest.approx(r["lag1"] / 100.0, abs=0.01)
        assert g["lag7"] == pytest.approx(r["lag7"] / 100.0, abs=0.01)
        assert g["ma7_prior"] == pytest.approx(r["s7"] / 7 / 100.0, abs=0.01)
        assert g["range7_prior"] == pytest.approx(
            (r["max7"] - r["min7"]) / 100.0, abs=0.01
        )
    # leakage check: the prior-window mean never equals y exactly everywhere
    assert not np.allclose(got["ma7_prior"], got["y"])


def test_iqr_outliers_matches_numpy(spark):
    res = _Q["profile_iqr_outliers"](spark, SF_DIR).toPandas().set_index("col")
    specs = {
        "orders.o_totalprice": ("orders", "o_totalprice"),
        "customer.c_acctbal": ("customer", "c_acctbal"),
        "lineitem.l_extendedprice": ("lineitem", "l_extendedprice"),
        "events.value": ("events", "value"),
    }
    for label, (tbl, col) in specs.items():
        v = np.sort(
            np.floor(
                pd.read_parquet(f"{SF_DIR}/{tbl}.parquet")[col].to_numpy()
                * 100
            ).astype("int64")
        )
        n = len(v)
        q1 = v[math.ceil(0.25 * n) - 1]
        q3 = v[math.ceil(0.75 * n) - 1]
        iqr = q3 - q1
        out = ((2 * v < 2 * q1 - 3 * iqr) | (2 * v > 2 * q3 + 3 * iqr)).sum()
        row = res.loc[label]
        assert row["n"] == n
        assert row["q1"] == pytest.approx(q1 / 100.0, abs=0.01)
        assert row["q3"] == pytest.approx(q3 / 100.0, abs=0.01)
        assert row["iqr"] == pytest.approx(iqr / 100.0, abs=0.01)
        assert row["n_outliers"] == out
        assert row["outlier_rate"] == pytest.approx(out / n, abs=1e-6)
    # money columns are uniform-ish (no Tukey outliers); events.value has a
    # mild high tail — all rates stay under 5%
    assert (res["outlier_rate"] < 0.05).all()
    assert res.loc["orders.o_totalprice", "outlier_rate"] == 0.0
