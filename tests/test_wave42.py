"""Semantic invariants for wave-42 operators (drawdown episodes,
Bland-Altman, conformal intervals) — independent pandas/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_drawdown_episodes_matches_pandas(spark):
    res = _Q["ts_drawdown_episodes"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    c = cents.cumsum()
    peak = c.cummax()
    under = (c < peak).to_numpy()
    days = list(c.index)
    eps = []
    i = 0
    while i < len(days):
        if under[i]:
            j = i
            depth = 0
            while j < len(days) and under[j]:
                depth = max(depth, peak.iloc[j] - c.iloc[j])
                j += 1
            eps.append((days[i], j - i, depth))
            i = j
        else:
            i += 1
    top = sorted(eps, key=lambda e: (-e[2], e[0]))[:5]
    assert len(res) == min(5, len(eps))
    for r, (start, dur, depth) in zip(res.itertuples(), top):
        assert r.start_day == str(start)
        assert r.duration_days == dur
        assert r.max_depth == pytest.approx(depth / 100.0, abs=0.01)
    # episodes are disjoint and depths sorted descending
    assert list(res["max_depth"]) == sorted(res["max_depth"], reverse=True)


def test_bland_altman_matches_numpy(spark):
    res = _Q["stats_bland_altman"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li_sum = (
        (li["l_extendedprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(li["l_orderkey"])
        .sum()
    )
    j = orders.merge(
        li_sum.rename("li_cents"), left_on="o_orderkey", right_index=True
    )
    diff = (
        np.floor(j["o_totalprice"] * 100).astype("int64") - j["li_cents"]
    ).to_numpy()
    n = len(diff)
    bias = diff.mean()
    sd = diff.std(ddof=1)
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    within = ((diff >= lo) & (diff <= hi)).mean()
    assert res["n_pairs"] == n
    assert res["bias"] == pytest.approx(bias / 100.0, abs=0.01)
    assert res["sd_diff"] == pytest.approx(sd / 100.0, abs=0.01)
    assert res["loa_lower"] == pytest.approx(lo / 100.0, abs=0.01)
    assert res["loa_upper"] == pytest.approx(hi / 100.0, abs=0.01)
    assert res["within_loa"] == pytest.approx(within, abs=1e-6)
    # limits of agreement contain ~95% of pairs for any roughly
    # symmetric difference distribution
    assert res["within_loa"] > 0.85


def test_conformal_matches_numpy(spark):
    res = _Q["ml_conformal_interval"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x = docs["text"].str.split(" ").str.len().to_numpy().astype(float)
    y = docs["n_chars"].to_numpy().astype(float)
    cal = (docs["doc_id"] % 2 == 0).to_numpy()
    n = cal.sum()
    sx, sy = x[cal].sum(), y[cal].sum()
    sxx, sxy = (x[cal] ** 2).sum(), (x[cal] * y[cal]).sum()
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    rq = np.floor(np.abs(y - a - b * x) * 1e4).astype("int64")
    rq_cal = np.sort(rq[cal])
    k = math.ceil(0.9 * (n + 1))
    q = rq_cal[k - 1]
    covered = (rq[~cal] <= q).mean()
    assert res["n_calibration"] == n
    assert res["n_test"] == (~cal).sum()
    assert res["interval_halfwidth"] == pytest.approx(q / 1e4, abs=1e-4)
    assert res["test_coverage"] == pytest.approx(covered, abs=1e-6)
    # the conformal guarantee: realized coverage near the 90% nominal
    assert 0.8 <= res["test_coverage"] <= 1.0
