"""Semantic invariants for wave-23 operators (column entropy profile,
sampling estimator audit, attribution-window sensitivity, MMR rerank) —
independent pandas/numpy re-implementations; MMR additionally pins the
greedy selection since it has no SQL oracle (Tier-R)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_column_entropy_matches_python(spark):
    res = _Q["profile_column_entropy"](spark, SF_DIR).toPandas().set_index("col")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cols = {
        "orders.o_orderpriority": orders["o_orderpriority"],
        "orders.o_orderstatus": orders["o_orderstatus"],
        "lineitem.l_returnflag": li["l_returnflag"],
        "lineitem.l_linestatus": li["l_linestatus"],
        "customer.c_mktsegment": cust["c_mktsegment"],
    }
    assert set(res.index) == set(cols)
    for name, series in cols.items():
        vc = series.value_counts()
        p = vc / vc.sum()
        h = sum(math.floor(-pi * math.log2(pi) * 1e9) for pi in p) / 1e9
        row = res.loc[name]
        assert row["n"] == len(series)
        assert row["ndv"] == len(vc)
        assert row["entropy_bits"] == pytest.approx(h, abs=1e-6)
        assert row["normalized"] == pytest.approx(
            h / math.log2(len(vc)), abs=1e-4
        )
        assert 0.0 <= row["normalized"] <= 1.0 + 1e-9


def test_sample_estimator_matches_pandas(spark):
    res = _Q["sample_estimator_audit"](spark, SF_DIR).toPandas().set_index("segment")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100).astype("int64")
    j["in_sample"] = ((j["o_orderkey"] * 2654435761) % 4294967296) % 10 == 0
    for seg, grp in j.groupby("c_mktsegment"):
        N = len(grp)
        s = grp[grp["in_sample"]]
        n = len(s)
        est = N * s["cents"].sum() / n / 100.0
        s2 = s["cents"].to_numpy().astype(float).var(ddof=1)
        var = N * N * (1 - n / N) * s2 / n / 1e4
        row = res.loc[seg]
        assert row["big_n"] == N and row["n"] == n
        assert row["true_total"] == pytest.approx(
            grp["cents"].sum() / 100.0, abs=0.01
        )
        assert row["estimated_total"] == pytest.approx(est, rel=1e-6)
        assert row["variance_est"] == pytest.approx(var, rel=1e-6)
        assert row["ci95_halfwidth"] == pytest.approx(
            1.96 * math.sqrt(var * 1e4) / 100.0, rel=1e-4
        )
        # the hash sample is ~10%: estimate should land within ~3 CI widths
        assert abs(row["estimated_total"] - row["true_total"]) < 4 * max(
            row["ci95_halfwidth"], 1.0
        )


def test_conversion_windows_matches_pandas(spark):
    res = _Q["events_conversion_windows"](spark, SF_DIR).toPandas().set_index("w_days")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    d = pd.DataFrame({"u": ev["user_id"], "us": us, "t": ev["event_type"]})
    sign = d[d["t"] == "signup"].groupby("u")["us"].min()
    lags = {}
    for u, s_us in sign.items():
        purch = d[(d["u"] == u) & (d["t"] == "purchase") & (d["us"] >= s_us)]
        lags[u] = purch["us"].min() - s_us if len(purch) else None
    for w in (1, 3, 7):
        conv = sum(
            1 for v in lags.values() if v is not None and v <= w * 86400000000
        )
        row = res.loc[w]
        assert row["n_signup_users"] == len(lags)
        assert row["n_converted"] == conv
        assert row["conversion_rate"] == pytest.approx(
            conv / len(lags), abs=1e-6
        )
    # monotone: wider window can only convert more
    assert res["n_converted"].is_monotonic_increasing


def test_mmr_matches_independent_greedy(spark):
    res = _Q["sim_mmr_rerank"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}

    def qcos(a, b):
        dot = np.floor(a * b * 1e12).sum() / 1e12
        na = np.floor(a * a * 1e12).sum() / 1e12
        nb = np.floor(b * b * 1e12).sum() / 1e12
        return dot / math.sqrt(na * nb)

    for qid in range(5):
        qv = vecs[qid]
        rel = {
            vid: math.floor(qcos(v, qv) * 1e6)
            for vid, v in vecs.items()
            if vid >= 10
        }
        short = sorted(rel, key=lambda v: (-rel[v], v))[:50]
        selected, max_sim = [], {v: 0 for v in short}
        picks = []
        for rank in range(1, 11):
            best = min(
                (v for v in short if v not in selected),
                key=lambda v: (
                    -int(math.floor(0.7 * rel[v] - 0.3 * max_sim[v])),
                    v,
                ),
            )
            picks.append(
                (rank, best, int(math.floor(0.7 * rel[best] - 0.3 * max_sim[best])))
            )
            selected.append(best)
            for v in short:
                sim_q = math.floor(qcos(vecs[best], vecs[v]) * 1e6)
                max_sim[v] = max(max_sim[v], sim_q)
        got = res[res["query_id"] == qid].sort_values("rank")
        assert list(got["vec_id"]) == [b for _, b, _ in picks]
        assert np.allclose(
            got["mmr_score"], [s / 1e6 for _, _, s in picks], atol=1e-6
        )
        # diversity: picked set is distinct and rank-1 is the raw top hit
        assert got["vec_id"].is_unique
        assert got.iloc[0]["vec_id"] == short[0]
