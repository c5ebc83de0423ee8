"""Semantic invariants for wave-8 operators (temporal overlap pairs,
Markov stationary mix, cost-sensitive threshold sweep)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_temporal_overlap_matches_pandas(spark):
    res = _Q["join_temporal_overlap_pairs"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o = o.sort_values("o_orderkey")
    counts = {}
    for ck, g in o.groupby("o_custkey"):
        s = g["o_orderdate"].values
        e = s + np.timedelta64(7, "D")
        n = 0
        for i in range(len(g)):
            n += int(((s[i] < e[:i]) & (s[:i] < e[i])).sum())
        if n:
            counts[ck] = n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(res["custkey"]) == [k for k, _ in top]
    assert list(res["overlapping_pairs"]) == [v for _, v in top]


def test_markov_stationary_matches_numpy(spark):
    res = (
        _Q["events_markov_stationary"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    tr = ev.dropna(subset=["nxt"]).groupby(["event_type", "nxt"]).size()
    types = sorted(ev["event_type"].unique())
    P = np.zeros((len(types), len(types)))
    for (s, d), c in tr.items():
        P[types.index(s), types.index(d)] = c
    P = P / P.sum(axis=1, keepdims=True)
    v = np.full(len(types), 1 / 5)
    for _ in range(2):
        v = v @ P
    for i, t in enumerate(types):
        assert res.loc[t, "stationary_share"] == pytest.approx(v[i], abs=1e-5)
    # two steps of a stochastic matrix preserve total mass
    assert res["stationary_share"].sum() == pytest.approx(1.0, abs=1e-4)


def test_threshold_sweep_cost_consistency(spark):
    res = _Q["ml_threshold_sweep_cost"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    y = (ev["event_type"] == "purchase").values
    for _, r in res.iterrows():
        pred = ev["value"].values >= r["threshold"]
        fp = int((pred & ~y).sum())
        fn = int((~pred & y).sum())
        # bucketed sweep == exact confusion at the bucket edges
        assert r["fp"] == fp
        assert r["fn"] == fn
        assert r["total_cost"] == fp + 10 * fn
    assert res["is_optimal"].sum() >= 1
    assert (
        res.loc[res["is_optimal"], "total_cost"].iloc[0]
        == res["total_cost"].min()
    )
