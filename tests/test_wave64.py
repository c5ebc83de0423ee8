"""Semantic invariants for wave-64 operators (quality-filter ablation,
frequent episodes, Sharpe/Sortino) — independent pandas re-derivations."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()

_STOPWORDS = ("the", "a", "of", "and", "to")


def test_quality_ablation_matches_pandas(spark):
    res = _Q["pipeline_quality_ablation"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for text in docs["text"]:
        toks = text.split(" ")
        n = len(toks)
        stop = sum(1 for t in toks if t in _STOPWORDS)
        rows.append((n, math.floor(stop * 10000.0 / n)))
    frame = pd.DataFrame(rows, columns=["n_tok", "bp"])
    all_docs, all_toks = len(frame), int(frame["n_tok"].sum())
    got = res.set_index("threshold_bp")
    for t in (1000, 1500, 2000, 2500, 3000, 3500, 4000):
        kept = frame[frame["bp"] >= t]
        row = got.loc[t]
        assert row["docs_kept"] == len(kept)
        assert row["tokens_kept"] == int(kept["n_tok"].sum())
        assert row["doc_share"] == pytest.approx(
            round(len(kept) / all_docs, 4)
        )
        assert row["token_share"] == pytest.approx(
            round(int(kept["n_tok"].sum()) / all_toks, 4)
        )
    # monotone: a stricter threshold never keeps more
    assert res["docs_kept"].is_monotonic_decreasing
    assert res["tokens_kept"].is_monotonic_decreasing


def test_frequent_episodes_matches_pandas(spark):
    res = _Q["events_frequent_episodes"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    occ = Counter()
    sup = {}
    for uid, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for i in range(len(types) - 2):
            ep = ">".join(types[i : i + 3])
            occ[ep] += 1
            sup.setdefault(ep, set()).add(uid)
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(res["episode"]) == [e for e, _ in top]
    assert list(res["n_occurrences"]) == [c for _, c in top]
    assert list(res["support_users"]) == [len(sup[e]) for e, _ in top]
    assert (res["support_users"] <= res["n_occurrences"]).all()


def test_sharpe_sortino_matches_numpy(spark):
    res = _Q["ts_sharpe_sortino"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    daily = (
        pd.DataFrame({"day": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    r = np.floor((daily[1:] / daily[:-1] - 1.0) * 1e9) / 1e9
    n = len(r)
    mean, vol = float(r.mean()), float(r.std(ddof=1))
    dd = math.sqrt(float((np.minimum(r, 0.0) ** 2).sum()) / n)
    assert res["n_days"] == n
    assert res["n_down_days"] == int((r < 0).sum())
    assert res["mean_daily_ret"] == pytest.approx(round(mean, 6), abs=1e-5)
    assert res["vol_daily"] == pytest.approx(round(vol, 6), abs=1e-5)
    assert res["downside_dev"] == pytest.approx(round(dd, 6), abs=1e-5)
    assert res["sharpe_annual"] == pytest.approx(
        mean / vol * math.sqrt(365.0), abs=1e-3
    )
    assert res["sortino_annual"] == pytest.approx(
        mean / dd * math.sqrt(365.0), abs=1e-3
    )
    # downside-only deviation is never above full volatility here
    assert res["downside_dev"] <= res["vol_daily"] + 1e-9
