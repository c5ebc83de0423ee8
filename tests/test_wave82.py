"""Semantic invariants for wave-82 operators (price indexes, Croston
intermittent demand, Little's law audit) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_price_index_matches_python(spark):
    res = _Q["market_price_index"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"],
    )
    li = li[
        (li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1998-01-01")
    ]
    li["yr"] = (li["l_shipdate"] >= "1997-01-01").astype(int)
    li["rev"] = (li["l_extendedprice"] * 10000.0).map(math.floor)
    g = (
        li.groupby(["l_partkey", "yr"])
        .agg(rev=("rev", "sum"), qty=("l_quantity", lambda s: int(s.sum())))
        .reset_index()
    )
    p = g.pivot(index="l_partkey", columns="yr", values=["rev", "qty"]).dropna()
    rev0, rev1 = p["rev"][0].astype("int64"), p["rev"][1].astype("int64")
    q0, q1 = p["qty"][0].astype("int64"), p["qty"][1].astype("int64")
    lasp = (rev1 / 1e4 / q1 * q0).sum() / (rev0.sum() / 1e4)
    paas = (rev1.sum() / 1e4) / (rev0 / 1e4 / q0 * q1).sum()
    s0 = rev0 / rev0.sum()
    s1 = rev1 / rev1.sum()
    torn = math.exp(
        (0.5 * (s0 + s1) * np.log((rev1 * q0) / (rev0 * q1))).sum()
    )
    assert res["n_parts"] == len(p)
    assert res["laspeyres"] == pytest.approx(lasp, abs=1e-4)
    assert res["paasche"] == pytest.approx(paas, abs=1e-4)
    assert res["fisher"] == pytest.approx(math.sqrt(lasp * paas), abs=1e-4)
    assert res["tornqvist"] == pytest.approx(torn, abs=1e-4)
    # Fisher lies between Laspeyres and Paasche
    lo, hi = sorted([res["laspeyres"], res["paasche"]])
    assert lo - 1e-9 <= res["fisher"] <= hi + 1e-9


def test_croston_matches_sequential_recursion(spark):
    res = _Q["ts_croston"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity"],
    )
    li = li[li["l_partkey"] % 97 == 0]
    day = (
        li["l_shipdate"].dt.normalize() - pd.Timestamp("1992-01-01")
    ).dt.days
    daily = (
        pd.DataFrame({"day": day, "s": li["l_quantity"].astype("int64")})
        .groupby("day")["s"]
        .sum()
        .sort_index()
    )
    days = daily.index.to_numpy()
    sizes = daily.to_numpy()
    alpha = 0.5
    z = float(sizes[0])
    for s in sizes[1:]:
        z = alpha * s + (1 - alpha) * z
    gaps = np.diff(days)
    x = float(gaps[0])
    for q in gaps[1:]:
        x = alpha * q + (1 - alpha) * x
    assert res["n_demand_days"] == len(sizes)
    assert res["mean_size"] == pytest.approx(sizes.mean(), abs=1e-6)
    assert res["mean_interval"] == pytest.approx(
        (days[-1] - days[0]) / (len(days) - 1), abs=1e-6
    )
    # closed-form weighted sum == sequential recursion
    assert res["croston_size"] == pytest.approx(z, abs=1e-6)
    assert res["croston_interval"] == pytest.approx(x, abs=1e-6)
    assert res["forecast_rate"] == pytest.approx(z / x, abs=1e-5)
    assert res["sba_rate"] == pytest.approx(0.75 * z / x, abs=1e-5)


def test_littles_law_residual_zero(spark):
    res = _Q["ops_littles_law"](spark, SF_DIR).toPandas().iloc[0]
    # the sweep integral and the duration sum are two independent exact
    # integer paths to the same occupancy-time: the law's conservation
    # identity must hold to the microsecond
    assert res["resid_us"] == 0
    # and therefore L == lambda * W up to output rounding
    lhs = res["l_time_avg"]
    rhs = res["lambda_per_hour"] * res["w_hours"]
    assert lhs == pytest.approx(rhs, abs=2e-5)


def test_littles_law_matches_python(spark):
    res = _Q["ops_littles_law"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    us = ev["ts"].astype("int64")  # datetime64[us] -> microseconds
    gap = us.groupby(ev["user_id"]).diff()
    new_s = (gap.isna() | (gap >= 1_800_000_000)).astype(int)
    sno = new_s.groupby(ev["user_id"]).cumsum()
    frame = pd.DataFrame({"u": ev["user_id"], "sno": sno, "us": us})
    sess = frame.groupby(["u", "sno"])["us"].agg(["min", "max"])
    n = len(sess)
    i_dur = int((sess["max"] - sess["min"]).sum())
    span = int(sess["max"].max() - sess["min"].min())
    assert res["n_sessions"] == n
    assert res["span_hours"] == pytest.approx(span / 3.6e9, abs=1e-4)
    assert res["lambda_per_hour"] == pytest.approx(n / (span / 3.6e9), abs=1e-4)
    assert res["w_hours"] == pytest.approx(i_dur / n / 3.6e9, abs=1e-6)
    assert res["l_time_avg"] == pytest.approx(i_dur / span, abs=1e-6)
