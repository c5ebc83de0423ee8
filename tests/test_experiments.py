"""Semantic invariants for the experimentation-analytics family —
independent numpy recomputation from the raw parquet (not the oracle SQL,
which shares algebra with the Spark plan; these tests share nothing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()
_CUT = np.datetime64("2024-01-15")


@pytest.fixture(scope="module")
def events_pd():
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # ns timestamps arrive as datetime64[ns] in pandas either way
    df["ts"] = pd.to_datetime(df["ts"])
    df["arm"] = (df["user_id"] * 2654435761) % 4294967296 % 2
    return df


def test_srm_counts_and_chi2(spark, events_pd):
    row = _Q["ab_srm_check"](spark, SF_DIR).toPandas().iloc[0]
    by_arm = events_pd.groupby("arm")["user_id"].nunique()
    assert row["control"] == by_arm.get(0, 0)
    assert row["treatment"] == by_arm.get(1, 0)
    n = row["control"] + row["treatment"]
    chi2 = (row["control"] - n / 2) ** 2 / (n / 2) + (
        row["treatment"] - n / 2
    ) ** 2 / (n / 2)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert bool(row["srm"]) == (chi2 > 3.841)


def test_cuped_matches_numpy(spark, events_pd):
    res = (
        _Q["ab_cuped_adjust"](spark, SF_DIR)
        .toPandas()
        .set_index("arm")
        .sort_index()
    )
    per = events_pd.assign(
        x=np.where(events_pd["ts"].values < _CUT, events_pd["value"], 0.0),
        y=np.where(events_pd["ts"].values >= _CUT, events_pd["value"], 0.0),
    ).groupby("user_id").agg(arm=("arm", "first"), x=("x", "sum"), y=("y", "sum"))
    x, y = per["x"].values, per["y"].values
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    adj = y - theta * (x - x.mean())
    for arm in (0, 1):
        mask = per["arm"].values == arm
        assert res.loc[arm, "mean_raw"] == pytest.approx(y[mask].mean(), rel=1e-4)
        assert res.loc[arm, "mean_cuped"] == pytest.approx(
            adj[mask].mean(), rel=1e-4
        )
        assert res.loc[arm, "var_raw"] == pytest.approx(
            y[mask].var(ddof=1), rel=1e-3
        )
        assert res.loc[arm, "var_cuped"] == pytest.approx(
            adj[mask].var(ddof=1), rel=1e-3
        )
    # the whole point: pooled variance shrinks (covariate is informative
    # on this fixture — pre/post sums share per-user activity rates)
    assert adj.var(ddof=1) < y.var(ddof=1)


def test_delta_method_matches_numpy(spark, events_pd):
    res = (
        _Q["ab_delta_method_ratio"](spark, SF_DIR)
        .toPandas()
        .set_index("arm")
        .sort_index()
    )
    per = events_pd.groupby("user_id").agg(
        arm=("arm", "first"), y=("value", "sum"), k=("value", "size")
    )
    for arm in (0, 1):
        g = per[per["arm"] == arm]
        n = len(g)
        y, k = g["y"].values.astype(float), g["k"].values.astype(float)
        ratio = y.sum() / k.sum()
        num = (
            np.var(y, ddof=1)
            - 2 * ratio * np.cov(y, k, ddof=1)[0, 1]
            + ratio**2 * np.var(k, ddof=1)
        )
        se = np.sqrt(max(num / n / k.mean() ** 2, 0.0))
        assert res.loc[arm, "ratio"] == pytest.approx(ratio, rel=1e-4)
        assert res.loc[arm, "se"] == pytest.approx(se, rel=1e-3)


def test_diff_in_diff_identity(spark, events_pd):
    row = _Q["ab_diff_in_diff"](spark, SF_DIR).toPandas().iloc[0]
    post = events_pd["ts"].values >= _CUT
    cells = {}
    for arm in (0, 1):
        for p in (False, True):
            m = (events_pd["arm"].values == arm) & (post == p)
            cells[(arm, p)] = events_pd.loc[m, "value"].mean()
    did = (cells[(1, True)] - cells[(1, False)]) - (
        cells[(0, True)] - cells[(0, False)]
    )
    assert row["did"] == pytest.approx(did, abs=1e-3)
    assert row["treat_post"] == pytest.approx(cells[(1, True)], rel=1e-4)


@pytest.fixture(scope="module")
def monthly_rev():
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    m = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    return o.groupby(m.values)["o_totalprice"].sum().sort_index()


def test_mann_kendall_matches_numpy(spark, monthly_rev):
    row = _Q["agg_mann_kendall"](spark, SF_DIR).toPandas().iloc[0]
    x = monthly_rev.values
    n = len(x)
    s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(n, 1)].sum())
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    z = (s - np.sign(s)) / np.sqrt(var_s) if s != 0 else 0.0
    assert row["n_periods"] == n
    assert row["s_stat"] == s
    assert row["z"] == pytest.approx(z, abs=1e-5)


def test_theil_sen_matches_numpy(spark, monthly_rev):
    row = _Q["agg_theil_sen"](spark, SF_DIR).toPandas().iloc[0]
    x = monthly_rev.values
    idx = monthly_rev.index.values.astype(float)
    i, j = np.triu_indices(len(x), 1)
    slopes = (x[j] - x[i]) / (idx[j] - idx[i])
    assert row["n_pairs"] == len(slopes)
    # median via the same middle-element rule (average of the two middle
    # order statistics == numpy median for both parities)
    assert row["slope_per_month"] == pytest.approx(np.median(slopes), rel=1e-4)
