"""Semantic invariants for wave-29 operators (LSH tuning table, blocked
propensity matching, VaR/CVaR) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.operators.dedup import _MH_P, _MH_PERMS
from tests.conftest import SF_DIR

_Q = queries()


def test_lsh_tuning_matches_python(spark):
    res = _Q["dedup_lsh_tuning"](spark, SF_DIR).toPandas().set_index("config")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sigs = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        shingles = {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
        hs = [
            int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % _MH_P
            for sh in shingles
        ]
        sigs[r.doc_id] = [
            min((a * h + b) % _MH_P for h in hs) for a, b in _MH_PERMS
        ]
    ids = sorted(sigs)
    for bb, rr in ((8, 1), (4, 2), (2, 4), (1, 8)):
        n_cand = 0
        for i, da in enumerate(ids):
            for db in ids[i + 1 :]:
                sa, sb = sigs[da], sigs[db]
                if any(
                    all(sa[band * rr + k] == sb[band * rr + k] for k in range(rr))
                    for band in range(bb)
                ):
                    n_cand += 1
        row = res.loc[f"b{bb}r{rr}"]
        assert row["n_candidates"] == n_cand
        assert row["p_candidate_at_s50"] == pytest.approx(
            1 - (1 - 0.5**rr) ** bb, abs=1e-6
        )
        assert row["s50_threshold"] == pytest.approx(
            (1 - (1 - 0.5) ** (1 / bb)) ** (1 / rr), abs=1e-6
        )
    # monotone: more bands / shorter rows can only add candidates
    assert (
        res.loc["b8r1", "n_candidates"]
        >= res.loc["b4r2", "n_candidates"]
        >= res.loc["b2r4", "n_candidates"]
        >= res.loc["b1r8", "n_candidates"]
    )


def test_propensity_match_matches_python(spark):
    res = _Q["ab_propensity_match"](spark, SF_DIR).toPandas().set_index("block")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    day = ev["ts"].dt.day
    cents = np.floor(ev["value"] * 100).astype("int64")
    u = pd.DataFrame(
        {
            "pre_n": ev[day <= 7].groupby(ev["user_id"]).size(),
            "pre_err": ev[(day <= 7) & (ev["event_type"] == "error")]
            .groupby(ev["user_id"])
            .size(),
            "out": cents[(day > 7) & (ev["event_type"] == "purchase")]
            .groupby(ev["user_id"])
            .sum(),
        }
    ).fillna(0).astype(int)
    u = u.reindex(sorted(ev["user_id"].unique()), fill_value=0)
    u["treated"] = (u["pre_err"] >= 5).astype(int)
    order = u.sort_values(["pre_n"]).sort_values(
        ["pre_n"], kind="stable"
    )
    ordered = u.reset_index().sort_values(["pre_n", "user_id"]).reset_index(
        drop=True
    )
    n = len(ordered)
    # NTILE(4) semantics: first (n % 4) tiles get ceil(n/4)
    sizes = [n // 4 + (1 if i < n % 4 else 0) for i in range(4)]
    blk = np.concatenate([[i + 1] * s for i, s in enumerate(sizes)])
    ordered["blk"] = blk
    for b in range(1, 5):
        grp = ordered[ordered["blk"] == b].sort_values(["pre_n", "user_id"])
        t = grp[grp["treated"] == 1].reset_index(drop=True)
        c = grp[grp["treated"] == 0].reset_index(drop=True)
        k = min(len(t), len(c))
        if k == 0:
            assert b not in res.index
            continue
        att = (t["out"][:k].to_numpy() - c["out"][:k].to_numpy()).sum() / k
        row = res.loc[b]
        assert row["n_pairs"] == k
        assert row["treated_mean"] == pytest.approx(
            t["out"][:k].mean() / 100.0, abs=0.01
        )
        assert row["control_mean"] == pytest.approx(
            c["out"][:k].mean() / 100.0, abs=0.01
        )
        assert row["att"] == pytest.approx(att / 100.0, abs=1e-3)
    # a null treatment (hash-independent errors) should give small |ATT|
    # relative to outcome scale across blocks on average
    assert res["att"].abs().mean() < res["treated_mean"].mean()


def test_var_cvar_matches_numpy(spark):
    res = _Q["ts_var_cvar"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    d = np.diff(cents.to_numpy())
    n = len(d)
    k = math.ceil(0.05 * n)
    var_c = np.sort(d)[k - 1]
    tail = d[d <= var_c]
    assert res["n_days"] == n
    assert res["var95"] == pytest.approx(var_c / 100.0, abs=0.01)
    assert res["cvar95"] == pytest.approx(tail.mean() / 100.0, abs=0.01)
    assert res["worst_day_change"] == pytest.approx(d.min() / 100.0, abs=0.01)
    assert res["n_tail_days"] == len(tail)
    # CVaR is at least as extreme as VaR
    assert res["cvar95"] <= res["var95"]
