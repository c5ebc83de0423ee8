"""Semantic invariants for wave-25 operators (Hampel filter, sequential
A/B looks, key discovery) — independent pandas/numpy re-implementations
on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hampel_matches_python_two_pass(spark):
    res = _Q["ts_hampel_filter"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    x = (
        (ev["value"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(ev["ts"].dt.floor("D"))
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(x)

    def med2(arr):
        a = sorted(arr)
        m = len(a)
        return a[(m + 1) // 2 - 1] + a[(m + 2) // 2 - 1]

    med2s = [med2(x[max(0, i - 5) : i + 6]) for i in range(n)]
    dev = [abs(2 * x[i] - med2s[i]) for i in range(n)]
    rows = []
    for i in range(n):
        if i - 5 < 0 or i + 5 >= n:
            continue
        mad2 = med2(dev[i - 5 : i + 6])
        flag = int(dev[i] * 10000 > 3 * 14826 * mad2 / 2)
        rows.append((x[i], med2s[i], mad2, flag))
    assert len(res) == len(rows)
    for got, (xi, m2, mad2, flag) in zip(res.itertuples(), rows):
        assert got.value == pytest.approx(xi / 100.0, abs=0.01)
        assert got.rolling_median == pytest.approx(m2 / 200.0, abs=0.01)
        assert got.rolling_mad == pytest.approx(mad2 / 400.0, abs=0.01)
        assert got.is_outlier == flag
    # MAD is nonnegative and the filter flags only a minority of days
    assert (res["rolling_mad"] >= 0).all()
    assert res["is_outlier"].mean() < 0.5


def test_sequential_looks_matches_numpy(spark):
    res = _Q["ab_sequential_looks"](spark, SF_DIR).toPandas().set_index("boundary_day")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    d = ev["ts"].dt.day
    arm = (ev["user_id"] % 2).to_numpy()
    cents = np.floor(ev["value"].to_numpy() * 100).astype("int64")
    bounds = {6: 4.8769, 12: 3.3569, 18: 2.6803, 24: 2.2898, 30: 2.0310}
    for bd, obf in bounds.items():
        m = (d <= bd).to_numpy()
        c0, c1 = cents[m & (arm == 0)], cents[m & (arm == 1)]
        diff = (c1.mean() - c0.mean()) / 100.0
        var = (c0.var(ddof=1) / len(c0) + c1.var(ddof=1) / len(c1)) / 1e4
        z = diff / math.sqrt(var)
        row = res.loc[bd]
        assert row["n_events"] == len(c0) + len(c1)
        assert row["mean_diff"] == pytest.approx(diff, abs=1e-3)
        assert row["z"] == pytest.approx(z, abs=1e-3)
        assert row["obf_bound"] == obf
        assert row["crossed"] == int(abs(z) > obf)
    # a null A/A-style hash split must not cross the OBF boundary
    assert res["crossed"].sum() == 0


def test_key_discovery_matches_pandas(spark):
    res = _Q["profile_key_discovery"](spark, SF_DIR).toPandas().set_index(["tbl", "col"])
    tables = {
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey", "c_name"],
        "lineitem": ["l_orderkey", "l_partkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
    }
    n_rows = 0
    for tbl, cols in tables.items():
        df = pd.read_parquet(f"{SF_DIR}/{tbl}.parquet")
        for col in cols:
            row = res.loc[(tbl, col)]
            n_rows += 1
            assert row["n"] == len(df)
            assert row["ndv"] == df[col].nunique()
            assert row["is_unique_key"] == int(df[col].nunique() == len(df))
            assert row["uniqueness"] == pytest.approx(
                df[col].nunique() / len(df), abs=1e-6
            )
    assert len(res) == n_rows
    # the fixture's declared pks must be discovered as unique
    for tbl, col in [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
    ]:
        assert res.loc[(tbl, col), "is_unique_key"] == 1
    # fks must not be
    assert res.loc[("orders", "o_custkey"), "is_unique_key"] == 0
