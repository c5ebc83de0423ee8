"""Semantic invariants for wave-33 operators (relative-time curve,
Breusch-Pagan, drill-across) — independent pandas/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_relative_time_curve_matches_pandas(spark):
    res = _Q["events_relative_time_curve"](spark, SF_DIR).toPandas().set_index(
        "rel_day"
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    d0 = ev.groupby("user_id")["ts"].transform(lambda s: s.dt.date.min())
    rel = (ev["ts"].dt.date - d0).apply(lambda td: td.days)
    cents = np.floor(ev["value"] * 100).astype("int64")
    df = pd.DataFrame({"rel": rel, "u": ev["user_id"], "c": cents})
    df = df[df["rel"] <= 21]
    for rd, g in df.groupby("rel"):
        row = res.loc[rd]
        assert row["n_events"] == len(g)
        assert row["n_users"] == g["u"].nunique()
        assert row["avg_value"] == pytest.approx(
            g["c"].sum() / len(g) / 100.0, abs=1e-3
        )
        assert row["events_per_user"] == pytest.approx(
            len(g) / g["u"].nunique(), abs=1e-3
        )
    # day 0 includes every user by construction
    assert res.loc[0, "n_users"] == ev["user_id"].nunique()


def test_breusch_pagan_matches_numpy(spark):
    res = _Q["stats_breusch_pagan"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x = docs["text"].str.split(" ").str.len().to_numpy().astype(float)
    y = docs["n_chars"].to_numpy().astype(float)
    n = len(x)
    b = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    a = (y.sum() - b * x.sum()) / n
    g = np.floor((y - a - b * x) ** 2 * 1e6) / 1e6  # engine quantization
    num = n * (x * g).sum() - x.sum() * g.sum()
    # engine coarsens g^2 terms at 1e3 units
    sgg = np.floor((g**2) / 1e3).sum() * 1e3
    den = (n * (x * x).sum() - x.sum() ** 2) * (n * sgg - g.sum() ** 2)
    r2 = num**2 / den
    assert res["n"] == n
    assert res["r2_aux"] == pytest.approx(r2, abs=1e-4)
    assert res["bp_lm"] == pytest.approx(n * r2, abs=0.1)
    assert res["heteroscedastic_5pct"] == int(n * r2 > 3.841)
    assert 0.0 <= res["r2_aux"] < 1.0


def test_drill_across_matches_pandas(spark):
    res = _Q["join_drill_across"](spark, SF_DIR).toPandas().set_index("month")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    om = orders["o_orderdate"].dt.strftime("%Y-%m")
    em = ev["ts"].dt.strftime("%Y-%m")
    fo = pd.DataFrame(
        {
            "n_orders": orders.groupby(om).size(),
            "rev": np.floor(orders["o_totalprice"] * 100)
            .astype("int64")
            .groupby(om)
            .sum(),
        }
    )
    fe = pd.DataFrame(
        {
            "n_events": ev.groupby(em).size(),
            "users": ev.groupby(em)["user_id"].nunique(),
        }
    )
    months = sorted(set(fo.index) | set(fe.index))
    assert list(res.index) == months
    for m in months:
        row = res.loc[m]
        in_o, in_e = m in fo.index, m in fe.index
        assert row["n_orders"] == (fo.loc[m, "n_orders"] if in_o else 0)
        assert row["n_events"] == (fe.loc[m, "n_events"] if in_e else 0)
        if in_o:
            assert row["revenue"] == pytest.approx(
                fo.loc[m, "rev"] / 100.0, abs=0.01
            )
        expect_cov = (
            "both" if in_o and in_e else ("orders_only" if in_o else "events_only")
        )
        assert row["coverage"] == expect_cov
    # the fixtures overlap for at most one month (orders 1995-2001,
    # events 2024) — so both single-fact coverages must appear
    assert {"orders_only", "events_only"} <= set(res["coverage"])
