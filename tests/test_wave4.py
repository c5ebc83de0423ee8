"""Semantic invariants for the round-3 wave-4 operators (BH FDR, robust
location, binned range join, conversion lag, interleave, lang-ID audit) —
independent pandas/numpy recomputation from the raw parquet."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bh_fdr_matches_numpy(spark):
    res = _Q["stats_bh_fdr"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    g = cust.groupby("c_nationkey").agg(
        n=("c_acctbal", "size"), conv=("c_acctbal", lambda s: (s > 5000).sum())
    )
    p0 = g["conv"].sum() / g["n"].sum()
    z = (g["conv"] / g["n"] - p0) / np.sqrt(p0 * (1 - p0) / g["n"])
    for _, r in res.iterrows():
        assert r["z"] == pytest.approx(z.loc[r["nation"]], abs=1e-5)
        # independent tail: erfc-based exact normal CDF vs the operator's
        # Abramowitz-Stegun polynomial (|err| <= 7.5e-8)
        exact = 2 * 0.5 * math.erfc(abs(z.loc[r["nation"]]) / math.sqrt(2))
        assert r["p_value"] == pytest.approx(exact, abs=2e-7)
    # reject decisions must equal the BH step-up applied to the emitted ps
    m = len(res)
    ranked = res.sort_values("rank")
    ok = ranked["p_value"].values <= np.arange(1, m + 1) * 0.10 / m
    k = np.max(np.nonzero(ok)[0]) + 1 if ok.any() else 0
    assert (ranked["rank"].values <= k).tolist() == ranked["rejected"].tolist()


def test_hodges_lehmann_matches_numpy(spark):
    row = _Q["agg_hodges_lehmann"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    mkey = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    rev = o.groupby(mkey.values)["o_totalprice"].sum().values
    i, j = np.triu_indices(len(rev), 0)
    walsh = (rev[i] + rev[j]) / 2
    assert row["n_walsh"] == len(walsh)
    assert row["hl_location"] == pytest.approx(np.median(walsh), rel=1e-6)


def test_range_binned_matches_bruteforce(spark):
    res = _Q["join_range_binned"](spark, SF_DIR).toPandas()
    part = pd.read_parquet(f"{SF_DIR}/part.parquet").sort_values("p_partkey")
    price = part["p_retailprice"].values
    i, j = np.triu_indices(len(price), 1)
    gap = np.abs(price[i] - price[j])
    keep = gap <= 0.5
    bucket = np.floor(price[i][keep]).astype(np.int64)
    bf = (
        pd.DataFrame({"bucket": bucket, "gap": gap[keep]})
        .groupby("bucket")
        .agg(n_pairs=("gap", "size"), sum_gap=("gap", "sum"))
        .sort_values(["n_pairs", "bucket"], ascending=[False, True])
    )
    top = bf.head(20)
    assert res["n_pairs"].sum() == top["n_pairs"].sum()
    for _, r in res.iterrows():
        assert bf.loc[r["bucket"], "n_pairs"] == r["n_pairs"]
        # the operator floor-quantizes each gap at 1e-4 before summing, so
        # the exact float sum can exceed it by up to n_pairs * 1e-4
        assert r["sum_gap"] == pytest.approx(
            bf.loc[r["bucket"], "sum_gap"], abs=r["n_pairs"] * 1e-4 + 1e-6
        )


def test_conversion_lag_matches_pandas(spark):
    row = _Q["events_conversion_lag"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # normalize whatever resolution the parquet arrives at to epoch-µs
    ev["us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
    s = ev[ev.event_type == "signup"].groupby("user_id")["us"].min()
    pur = ev[ev.event_type == "purchase"].merge(
        s.rename("s_us"), left_on="user_id", right_index=True
    )
    pur = pur[pur["us"] > pur["s_us"]]
    lag = (pur.groupby("user_id")["us"].min() - s).dropna().sort_values()
    lags = lag.values
    n = len(lags)
    assert row["n_converted"] == n
    assert row["avg_lag_hours"] == pytest.approx(lags.mean() / 3.6e9, abs=1e-3)
    assert row["p50_lag_hours"] == pytest.approx(
        lags[(n + 1) // 2 - 1] / 3.6e9, abs=1e-3
    )
    assert row["p90_lag_hours"] == pytest.approx(
        lags[math.ceil(0.9 * n) - 1] / 3.6e9, abs=1e-3
    )


def test_interleave_round_robin(spark):
    res = _Q["pipeline_interleave_sources"](spark, SF_DIR).toPandas()
    assert list(res["position"]) == list(range(1, 31))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_sources = docs["source"].nunique()
    # the first pass over the sources emits each source exactly once
    first_block = res.head(n_sources)
    assert first_block["source"].nunique() == n_sources
    assert (first_block["rank_in_source"] == 1).all()
    # sources appear in lexicographic order within a rank block
    assert list(first_block["source"]) == sorted(first_block["source"])


def test_langid_confusion_row_sums(spark):
    res = _Q["text_langid_confusion"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per_lang = docs.groupby("lang").size()
    sums = res.groupby("lang")["n"].sum()
    for lang, n in per_lang.items():
        assert sums[lang] == n
    shares = res.groupby("lang")["share_of_lang"].sum()
    assert np.allclose(shares.values, 1.0, atol=1e-4)
