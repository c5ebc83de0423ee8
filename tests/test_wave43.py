"""Semantic invariants for wave-43 operators (ABC-XYZ matrix, rolling
beta, calendar gaps) — independent pandas/numpy re-implementations on
top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_abc_xyz_matches_pandas(spark):
    res = (
        _Q["agg_abc_xyz"](spark, SF_DIR)
        .toPandas()
        .set_index(["abc", "xyz"])["n_parts"]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pm = (
        pd.DataFrame(
            {
                "pk": li["l_partkey"],
                "m": li["l_shipdate"].dt.strftime("%Y-%m"),
                "c": np.floor(li["l_extendedprice"] * 100).astype("int64"),
            }
        )
        .groupby(["pk", "m"])["c"]
        .sum()
    )
    p = pm.groupby(level=0).agg(["sum", "count", lambda s: (s.astype(float) ** 2).sum()])
    p.columns = ["total", "n", "ss"]
    order = p.sort_values(["total"], ascending=False).sort_index(
        key=None
    )
    ordered = p.reset_index().sort_values(
        ["total", "pk"], ascending=[False, True]
    )
    ordered["cum"] = ordered["total"].cumsum()
    grand = ordered["total"].sum()
    counts: dict = {}
    for r in ordered.itertuples():
        if 5 * r.cum <= 4 * grand:
            abc = "A"
        elif 20 * r.cum <= 19 * grand:
            abc = "B"
        else:
            abc = "C"
        if r.n < 2:
            xyz = "Z"
        else:
            var = max((r.ss - r.total**2 / r.n) / (r.n - 1), 0.0)
            cv = math.sqrt(var) / (r.total / r.n)
            xyz = "X" if cv <= 0.5 else ("Y" if cv <= 1.0 else "Z")
        counts[(abc, xyz)] = counts.get((abc, xyz), 0) + 1
    assert dict(res) == counts
    # all parts are classified exactly once
    assert res.sum() == li["l_partkey"].nunique()


def test_rolling_beta_matches_pandas(spark):
    res = _Q["ts_rolling_beta"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        (li["l_extendedprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(li["l_shipdate"].dt.date).sum() // 100
    )
    y = (
        (orders["o_totalprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(orders["o_orderdate"].dt.date).sum() // 100
    )
    j = pd.DataFrame({"x": x, "y": y}).dropna().sort_index()
    n = 30
    sx = j["x"].rolling(n).sum()
    sy = j["y"].rolling(n).sum()
    sxy = (j["x"] * j["y"]).rolling(n).sum()
    syy = (j["y"] * j["y"]).rolling(n).sum()
    beta = ((n * sxy - sx * sy) / (n * syy - sy * sy)).dropna()
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    assert len(got) == len(beta)
    assert np.allclose(got["beta30"], beta, atol=1e-4)
    # independent series: beta fluctuates around 0
    assert abs(got["beta30"].mean()) < 0.5


def test_calendar_gaps_matches_pandas(spark):
    res = _Q["profile_calendar_gaps"](spark, SF_DIR).toPandas().set_index("tbl")
    specs = {
        "orders": ("orders", "o_orderdate"),
        "lineitem": ("lineitem", "l_shipdate"),
        "events": ("events", "ts"),
    }
    for name, (tbl, col) in specs.items():
        days = sorted(
            pd.read_parquet(f"{SF_DIR}/{tbl}.parquet")[col].dt.date.unique()
        )
        span = (days[-1] - days[0]).days + 1
        gaps = [
            (b - a).days - 1 for a, b in zip(days, days[1:]) if (b - a).days > 1
        ]
        row = res.loc[name]
        assert row["days_present"] == len(days)
        assert row["span_days"] == span
        assert row["days_missing"] == span - len(days)
        assert row["completeness"] == pytest.approx(len(days) / span, abs=1e-6)
        assert row["longest_gap_days"] == (max(gaps) if gaps else 0)
    # dense synthetic calendars: high completeness everywhere
    assert (res["completeness"] > 0.9).all()
