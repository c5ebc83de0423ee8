"""Semantic invariants for wave-38 operators (MRR waterfall,
resurrection, self-audited interpolation) — independent pandas
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_mrr_waterfall_matches_pandas(spark):
    res = _Q["events_mrr_waterfall"](spark, SF_DIR).toPandas().set_index("month")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o98 = orders[
        (orders["o_orderdate"] >= "1998-01-01")
        & (orders["o_orderdate"] < "1999-01-01")
    ]
    cm = (
        pd.DataFrame(
            {
                "cust": o98["o_custkey"],
                "month": o98["o_orderdate"].dt.strftime("%Y-%m"),
                "cents": np.floor(o98["o_totalprice"] * 100).astype("int64"),
            }
        )
        .groupby(["cust", "month"])["cents"]
        .sum()
        .unstack(fill_value=0)
    )
    months = sorted(cm.columns)
    for prev_m, cur_m in zip(months, months[1:]):
        p, c = cm[prev_m], cm[cur_m]
        row = res.loc[cur_m]
        assert row["new_rev"] == pytest.approx(
            c[(p == 0) & (c > 0)].sum() / 100.0, abs=0.01
        )
        assert row["churned_rev"] == pytest.approx(
            p[(p > 0) & (c == 0)].sum() / 100.0, abs=0.01
        )
        assert row["expansion_rev"] == pytest.approx(
            (c - p)[(p > 0) & (c > p)].sum() / 100.0, abs=0.01
        )
        assert row["contraction_rev"] == pytest.approx(
            (p - c)[(p > 0) & (c > 0) & (c < p)].sum() / 100.0, abs=0.01
        )
        # accounting identity
        assert row["net_change"] == pytest.approx(
            row["new_rev"]
            - row["churned_rev"]
            + row["expansion_rev"]
            - row["contraction_rev"],
            abs=0.02,
        )
    assert list(res.index) == months[1:]


def test_resurrection_matches_pandas(spark):
    res = _Q["events_resurrection"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    seq = (
        ev.assign(day=ev["ts"].dt.date)[["user_id", "day"]]
        .drop_duplicates()
        .sort_values(["user_id", "day"])
    )
    gaps = []
    for _u, g in seq.groupby("user_id"):
        days = list(g["day"])
        for a, b in zip(days, days[1:]):
            gap = (b - a).days
            if gap >= 7:
                gaps.append((_u, b, gap))
    if not gaps:
        assert res["n_resurrections"] == 0
        return
    assert res["users_resurrected"] == len({u for u, _, _ in gaps})
    assert res["n_resurrections"] == len(gaps)
    assert res["avg_gap_days"] == pytest.approx(
        sum(g for _, _, g in gaps) / len(gaps), abs=1e-3
    )
    assert res["max_gap_days"] == max(g for _, _, g in gaps)
    assert res["first_resurrection_day"] == str(min(d for _, d, _ in gaps))


def test_interpolation_matches_pandas(spark):
    res = _Q["ts_linear_interpolate"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    actual = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(actual)
    rn = np.arange(1, n + 1)
    hole = rn % 7 == 3
    obs = np.where(hole, np.nan, actual.astype(float))
    abs_err = 0
    for i in np.flatnonzero(hole):
        prevs = np.flatnonzero(~hole[: i])
        nexts = np.flatnonzero(~hole[i + 1 :])
        pi = prevs[-1]
        ni = i + 1 + nexts[0]
        filled = math.floor(
            actual[pi]
            + (actual[ni] - actual[pi]) * (i - pi) / (ni - pi)
        )
        abs_err += abs(filled - actual[i])
    assert res["n_days"] == n
    assert res["n_holes"] == hole.sum()
    assert res["interp_mae"] == pytest.approx(
        abs_err / hole.sum() / 100.0, abs=0.01
    )
    assert res["interp_mape"] == pytest.approx(
        abs_err / actual[hole].sum(), abs=1e-5
    )
    # interpolating a noisy series: error is positive but bounded
    assert 0 < res["interp_mape"] < 1
