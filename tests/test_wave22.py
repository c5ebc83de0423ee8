"""Semantic invariants for wave-22 operators (bot scoring, hierarchical
share-of-parent, time_bucket, Cohen's d) — independent pandas/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bot_detection_matches_pandas_rules(spark):
    res = _Q["events_bot_detection"](spark, SF_DIR).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")  # epoch micros
    g = pd.DataFrame(
        {"u": ev["user_id"], "us": us, "day": ev["ts"].dt.date, "t": ev["event_type"]}
    )
    flagged = {}
    for u, grp in g.groupby("u"):
        n = len(grp)
        if n <= 1:
            continue
        days = grp["day"].nunique()
        span = grp["us"].max() - grp["us"].min()
        top = grp["t"].value_counts().max()
        fv = int(10 * n > 28 * days)
        fm = int(100 * top > 28 * n)
        fr = int(span < 33000000000 * (n - 1))
        if fv + fm + fr >= 1:
            flagged[u] = (n, fv, fm, fr, fv + fm + fr, top, days, span)
    assert set(res.index) == set(flagged)
    for u, (n, fv, fm, fr, sc, top, days, span) in flagged.items():
        row = res.loc[u]
        assert row["n_events"] == n
        assert (row["f_velocity"], row["f_monotone"], row["f_rapid"]) == (
            fv,
            fm,
            fr,
        )
        assert row["bot_score"] == sc
        assert row["events_per_day"] == pytest.approx(n / days, abs=1e-4)
        assert row["top_type_share"] == pytest.approx(top / n, abs=1e-4)
    assert (res["bot_score"] >= 1).all()


def test_share_of_parent_matches_pandas(spark):
    res = _Q["agg_share_of_parent"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    reg = pd.read_parquet(f"{SF_DIR}/region.parquet")
    j = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["cents"] = np.floor(j["o_totalprice"] * 100).astype("int64")
    c = j.groupby(["r_name", "n_name"])["cents"].sum()
    grand = c.sum()
    rtot = c.groupby(level=0).sum()
    got = res.set_index(["region", "nation"])
    assert len(got) == len(c)
    for (r, n), cents in c.items():
        row = got.loc[(r, n)]
        assert row["revenue"] == pytest.approx(cents / 100.0, abs=0.01)
        assert row["share_of_region"] == pytest.approx(cents / rtot[r], abs=1e-6)
        assert row["share_of_total"] == pytest.approx(cents / grand, abs=1e-6)
        assert row["region_share_of_total"] == pytest.approx(
            rtot[r] / grand, abs=1e-6
        )
    # shares within each region sum to ~1
    sums = res.groupby("region")["share_of_region"].sum()
    assert np.allclose(sums, 1.0, atol=1e-4)


def test_time_bucket_matches_pandas(spark):
    res = _Q["fn_time_bucket"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = ev["ts"].astype("datetime64[us]").astype("int64") // 10**6
    bk = secs // 14400
    g = pd.DataFrame(
        {
            "bk": bk,
            "p": ev["event_type"] == "purchase",
            "cents": np.floor(ev["value"] * 100).astype("int64"),
        }
    ).groupby("bk")
    expect = g.agg(n=("p", "size"), purchases=("p", "sum"), cents=("cents", "sum"))
    got = res.copy()
    got["bk"] = (
        pd.to_datetime(got["bucket_start"]).astype("int64") // 10**9 // 14400
    )
    got = got.set_index("bk").sort_index()
    assert list(got.index) == list(expect.index)
    assert (got["n"].to_numpy() == expect["n"].to_numpy()).all()
    assert (got["purchases"].to_numpy() == expect["purchases"].to_numpy()).all()
    assert np.allclose(got["total_value"], expect["cents"] / 100.0, atol=0.01)
    # buckets are exactly 4 h apart where occupied, and epoch-aligned
    starts = pd.to_datetime(got["bucket_start"])
    assert ((starts.dt.hour % 4 == 0) & (starts.dt.minute == 0)).all()


def test_cohens_d_matches_numpy(spark):
    res = _Q["stats_cohens_d"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    x1 = ev.loc[ev["event_type"] == "purchase", "value"].to_numpy()
    x2 = ev.loc[ev["event_type"] != "purchase", "value"].to_numpy()
    m1 = np.floor(x1 * 100).sum() / 100.0 / len(x1)
    m2 = np.floor(x2 * 100).sum() / 100.0 / len(x2)
    ss1 = ((x1 - m1) ** 2).sum()
    ss2 = ((x2 - m2) ** 2).sum()
    psd = math.sqrt((ss1 + ss2) / (len(x1) + len(x2) - 2))
    assert res["n_purchase"] == len(x1)
    assert res["n_other"] == len(x2)
    assert res["mean_diff"] == pytest.approx(m1 - m2, abs=1e-3)
    assert res["pooled_sd"] == pytest.approx(psd, abs=1e-3)
    assert res["cohens_d"] == pytest.approx((m1 - m2) / psd, abs=1e-4)
