"""Semantic invariants for wave-24 operators (periodogram, event-order
violations, power analysis, stemmer vocabulary) — independent
pandas/numpy re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_periodogram_matches_numpy_dft(spark):
    res = _Q["ts_periodogram"](spark, SF_DIR).toPandas().set_index("period_days")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy()
    mu = cnt.mean()
    t = np.arange(len(cnt))
    for p in (7, 14, 30):
        c = sum(
            math.floor((x - mu) * math.cos(2 * math.pi * ti / p) * 1e6)
            for x, ti in zip(cnt, t)
        ) / 1e6
        s = sum(
            math.floor((x - mu) * math.sin(2 * math.pi * ti / p) * 1e6)
            for x, ti in zip(cnt, t)
        ) / 1e6
        power = (c * c + s * s) / len(cnt)
        row = res.loc[p]
        assert row["n_days"] == len(cnt)
        assert row["power"] == pytest.approx(power, abs=1e-3)
    assert (res["power"] >= 0).all()


def test_order_violations_matches_pandas(spark):
    res = _Q["events_order_violations"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    sub = ev[ev["event_type"].isin(["view", "click", "purchase"])].copy()
    sub["day"] = sub["ts"].dt.date
    sub["us"] = sub["ts"].astype("datetime64[us]").astype("int64")
    cbv = pbc = pbv = n = 0
    for (_u, _d), g in sub.groupby(["user_id", "day"]):
        n += 1
        fv = g.loc[g["event_type"] == "view", "us"].min()
        fc = g.loc[g["event_type"] == "click", "us"].min()
        fp = g.loc[g["event_type"] == "purchase", "us"].min()
        if not np.isnan(fc) and (np.isnan(fv) or fc < fv):
            cbv += 1
        if not np.isnan(fp) and (np.isnan(fc) or fp < fc):
            pbc += 1
        if not np.isnan(fp) and (np.isnan(fv) or fp < fv):
            pbv += 1
    assert res["n_sessions"] == n
    assert res["click_before_view"] == cbv
    assert res["purchase_before_click"] == pbc
    assert res["purchase_before_view"] == pbv
    # ~uniform random ordering of 5 event types: violations must exist
    assert res["violation_rate"] > 0


def test_power_analysis_matches_numpy(spark):
    res = _Q["ab_power_analysis"](spark, SF_DIR).toPandas().set_index("segment")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    for seg, grp in cust.groupby("c_mktsegment"):
        x = grp["c_acctbal"].to_numpy()
        n = len(x)
        mean = np.floor(x * 100).sum() / 100.0 / n
        var = ((x - mean) ** 2).sum() / (n - 1)
        mde = abs(mean) * 0.01
        n_req = math.ceil(2 * (1.959964 + 0.841621) ** 2 * var / mde**2)
        row = res.loc[seg]
        assert row["n_current"] == n
        assert row["mean"] == pytest.approx(mean, abs=0.01)
        assert row["sd"] == pytest.approx(math.sqrt(var), abs=0.01)
        assert row["mde_abs"] == pytest.approx(mde, abs=1e-3)
        assert abs(row["n_required_per_arm"] - n_req) <= 1  # ceil boundary
        assert row["multiple_of_current"] == pytest.approx(
            row["n_required_per_arm"] / n, abs=0.01
        )
    # a 1% MDE on a high-variance metric needs far more than the fixture has
    assert (res["n_required_per_arm"] > res["n_current"]).all()


def _stem(t: str) -> str:
    if len(t) > 5 and t.endswith("ing"):
        return t[:-3]
    if len(t) > 4 and t.endswith("ed"):
        return t[:-2]
    if len(t) > 3 and t.endswith("es"):
        return t[:-2]
    if len(t) > 3 and t.endswith("s") and not t.endswith("ss"):
        return t[:-1]
    return t


def test_stem_vocab_matches_python(spark):
    res = _Q["text_stem_vocab"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = [t for text in docs["text"] for t in text.split(" ") if t]
    stems = [_stem(t) for t in toks]
    assert res["n_tokens"] == len(toks)
    assert res["vocab_raw"] == len(set(toks))
    assert res["vocab_stemmed"] == len(set(stems))
    assert res["tokens_changed"] == sum(1 for t, s in zip(toks, stems) if t != s)
    assert res["vocab_reduction"] == pytest.approx(
        1 - len(set(stems)) / len(set(toks)), abs=1e-6
    )
    # stemming can only shrink the vocabulary
    assert res["vocab_stemmed"] <= res["vocab_raw"]
