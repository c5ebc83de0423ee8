"""Semantic invariants for wave-70 operators (SQL UNPIVOT, CMS width
sweep, pinball loss) — independent pandas re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_unpivot_matches_pandas(spark):
    res = _Q["sql_unpivot_syntax"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    frame = pd.DataFrame(
        {
            "p": orders["o_orderpriority"],
            "s": orders["o_orderstatus"],
            "c": cents,
        }
    )
    exp = (
        frame[frame["s"].isin(["F", "O", "P"])]
        .groupby(["p", "s"])["c"]
        .sum()
        .reset_index()
        .sort_values(["p", "s"])
    )
    assert list(res["o_orderpriority"]) == list(exp["p"])
    assert list(res["status"]) == list(exp["s"])
    assert list(res["total"]) == pytest.approx(
        [c / 100.0 for c in exp["c"]]
    )
    # melt is lossless: totals sum to the table total
    assert res["total"].sum() == pytest.approx(cents.sum() / 100.0)


def test_cms_width_sweep_matches_python(spark):
    res = _Q["sketch_cms_width_sweep"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey"])
    freq = li["l_partkey"].value_counts()
    params = [(2654435761, 97), (2246822519, 193), (3266489917, 389),
              (668265263, 769)]
    p = 2147483647
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = res.set_index("width")
    for w in (128, 512, 2048):
        counters = [dict() for _ in params]
        for k, f in freq.items():
            for i, (a, b) in enumerate(params):
                bkt = ((a * int(k) + b) % p) % w
                counters[i][bkt] = counters[i].get(bkt, 0) + int(f)
        over = []
        for k, f in top:
            est = min(
                counters[i][((a * int(k) + b) % p) % w]
                for i, (a, b) in enumerate(params)
            )
            over.append(est - int(f))
        row = got.loc[w]
        assert row["n_counters"] == w * 4
        assert row["max_overestimate"] == max(over)
        assert row["mean_overestimate"] == pytest.approx(
            round(sum(over) / len(over), 2)
        )
        assert row["n_exact"] == sum(1 for o in over if o == 0)
        assert min(over) >= 0  # CMS never underestimates
    # wider sketch, tighter estimates
    assert got["mean_overestimate"].is_monotonic_decreasing


def test_pinball_loss_matches_numpy(spark):
    res = _Q["ml_pinball_loss"](spark, SF_DIR).toPandas().set_index("tau")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    daily = (
        pd.DataFrame({"day": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("day")["c"]
        .sum()
    )
    days = pd.to_datetime(pd.Series(daily.index))
    x = daily[(days >= "1996-01-01").values & (days < "1997-01-01").values]
    y = (
        daily[(days >= "1997-01-01").values & (days < "1998-01-01").values]
        .to_numpy(float)
        / 100.0
    )
    for tau in (0.1, 0.5, 0.9):
        yhat = float(np.quantile(x.to_numpy(float) / 100.0, tau))
        diff = y - yhat
        terms = np.floor(np.maximum(tau * diff, (tau - 1) * diff) * 1e4) / 1e4
        row = res.loc[tau]
        assert row["forecast"] == pytest.approx(round(yhat, 2), abs=0.02)
        assert row["n_days"] == len(y)
        assert row["pinball_loss"] == pytest.approx(
            round(terms.sum() / len(y), 4), abs=0.01
        )
        assert row["coverage"] == pytest.approx(
            round(float((y <= yhat).mean()), 4), abs=1e-4
        )
    # coverage tracks tau when the two years are similar
    assert res.loc[0.1, "coverage"] < res.loc[0.9, "coverage"]
