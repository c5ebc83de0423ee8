"""Semantic invariants for wave-18 operators (RSI, peak detection,
Atkinson index, ROUGE-1 overlap) — each checked against an independent
numpy/python re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_rsi_matches_pandas_cutler(spark):
    res = _Q["ts_rsi"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    d = cents.diff()
    sg = d.clip(lower=0).rolling(14).sum()
    sl = (-d).clip(lower=0).rolling(14).sum()
    rsi = (100.0 * sg / (sg + sl)).dropna()
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    assert len(got) == len(rsi)
    assert np.allclose(got["rsi"], rsi, atol=1e-3)
    sig = np.where(rsi > 70, "overbought", np.where(rsi < 30, "oversold", "neutral"))
    assert (got["signal"].to_numpy() == sig).all()
    assert got["rsi"].between(0, 100).all()


def test_peak_detection_matches_pandas_scan(spark):
    res = _Q["events_peak_detection"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index()
    s = cnt.rolling(11, center=True).sum()
    prv, nxt = cnt.shift(1), cnt.shift(-1)
    mask = (
        s.notna()
        & (cnt > prv.fillna(np.inf))
        & (cnt > nxt.fillna(np.inf))
        & (100 * 11 * cnt > 105 * s)
    )
    expect = cnt[mask]
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    assert list(got.index) == list(expect.index)
    assert (got["cnt"].to_numpy() == expect.to_numpy()).all()
    assert np.allclose(got["local_mean"], (s[mask] / 11.0).round(2))
    # every reported peak clears the 5% prominence bar
    assert (got["prominence"] > 1.05).all()


def test_atkinson_matches_numpy(spark):
    res = _Q["agg_atkinson"](spark, SF_DIR).toPandas().set_index("segment")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100.0).astype("int64")
    spend = j.groupby(["c_mktsegment", "o_custkey"])["cents"].sum()
    for seg, grp in spend.groupby(level=0):
        x = grp.to_numpy() / 100.0
        mean = x.mean()
        atk = 1.0 - (np.sqrt(x).mean()) ** 2 / mean
        row = res.loc[seg]
        assert row["n"] == len(x)
        assert row["mean_spend"] == pytest.approx(mean, abs=0.01)
        assert row["atkinson"] == pytest.approx(atk, abs=1e-4)
        assert 0.0 <= row["atkinson"] < 1.0


def test_rouge_matches_python_clipped_counts(spark):
    res = _Q["text_rouge_overlap"](spark, SF_DIR).toPandas().set_index("pair_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")
    n_pairs = 0
    for pid in range(250):
        ref_id, cand_id = 2 * pid, 2 * pid + 1
        if ref_id not in docs.index or cand_id not in docs.index:
            continue
        rc = Counter(docs.loc[ref_id, "text"].split(" "))
        cc = Counter(docs.loc[cand_id, "text"].split(" "))
        ov = sum(min(rc[t], cc[t]) for t in rc)
        rl, cl = sum(rc.values()), sum(cc.values())
        row = res.loc[pid]
        n_pairs += 1
        assert row["overlap"] == ov
        assert (row["ref_len"], row["cand_len"]) == (rl, cl)
        assert row["rouge1_precision"] == pytest.approx(ov / cl, abs=1e-6)
        assert row["rouge1_recall"] == pytest.approx(ov / rl, abs=1e-6)
        assert row["rouge1_f1"] == pytest.approx(2 * ov / (cl + rl), abs=1e-6)
    assert len(res) == n_pairs
    # clipping: precision and recall can never exceed 1
    assert (res["rouge1_precision"] <= 1.0).all()
    assert (res["rouge1_recall"] <= 1.0).all()
