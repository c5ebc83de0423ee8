"""Semantic invariants for wave-10 operators (gaps-and-islands,
burstiness, per-nation Spearman, deterministic bottom-k sample) —
independent pandas/numpy recomputation on top of the DuckDB hash gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_gaps_islands_matches_pandas(spark):
    res = _Q["win_gaps_islands"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    du = (
        ev.assign(d=pd.to_datetime(ev["ts"]).dt.normalize())[["user_id", "d"]]
        .drop_duplicates()
        .sort_values(["user_id", "d"])
    )
    expected = []
    for uid, g in du.groupby("user_id"):
        days = g["d"].values.astype("datetime64[D]")
        start = days[0]
        prev = days[0]
        for d in days[1:]:
            if (d - prev).astype(int) > 1:
                expected.append((uid, start, prev))
                start = d
            prev = d
        expected.append((uid, start, prev))
    exp = pd.DataFrame(expected, columns=["user_id", "s", "e"])
    exp["days"] = (
        (exp["e"].values.astype("datetime64[D]") - exp["s"].values.astype("datetime64[D]"))
        .astype(int)
        + 1
    )
    assert len(res) == len(exp)
    got = res.sort_values(["user_id", "start_day"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "s"]).reset_index(drop=True)
    assert (got["user_id"].values == exp["user_id"].values).all()
    assert (
        got["start_day"].values
        == np.datetime_as_string(exp["s"].values.astype("datetime64[D]"))
    ).all()
    assert (got["days"].values == exp["days"].values).all()
    # islands tile each user's active days exactly
    assert res.groupby("user_id")["days"].sum().sort_index().equals(
        du.groupby("user_id")["d"].nunique().sort_index().astype("int64")
    )


def test_burstiness_matches_numpy(spark):
    res = _Q["events_burstiness"](spark, SF_DIR).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = ev["ts"].astype("int64") // 1000  # epoch-µs, matches unix_micros
    ev = ev.assign(us=us).sort_values(["user_id", "us", "event_id"])
    gaps = ev.groupby("user_id")["us"].diff().dropna() // 1000  # ms
    for uid, g in gaps.groupby(ev["user_id"]):
        v = g.values.astype(float)
        if len(v) < 5:
            assert uid not in res.index
            continue
        mu, sd = v.mean(), v.std()  # population std
        b = (sd - mu) / (sd + mu)
        assert res.loc[uid, "n_gaps"] == len(v)
        assert res.loc[uid, "burstiness"] == pytest.approx(b, abs=1e-5)
        assert -1.0 <= res.loc[uid, "burstiness"] <= 1.0


def test_spearman_matches_scipy_free_numpy(spark):
    res = _Q["ml_spearman"](spark, SF_DIR).toPandas().set_index("nation")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    spend = (
        np.floor(orders["o_totalprice"] * 100.0)
        .groupby(orders["o_custkey"])
        .sum()
        .rename("spend_q")
    )
    j = cust.join(spend, on="c_custkey", how="inner")
    for nk, g in j.groupby("c_nationkey"):
        if len(g) < 10:
            assert nk not in res.index
            continue
        rx = pd.Series(g["c_acctbal"]).rank(method="average").values
        ry = pd.Series(g["spend_q"]).rank(method="average").values
        rho = np.corrcoef(rx, ry)[0, 1]
        assert res.loc[nk, "n"] == len(g)
        assert res.loc[nk, "rho_spearman"] == pytest.approx(rho, abs=1e-5)


def test_bottom_k_is_true_bottom_k_and_stable(spark):
    res = _Q["sample_bottom_k"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs["h"] = (docs["doc_id"] * 2654435761) % 4294967296
    for src, g in docs.groupby("source"):
        want = g.sort_values(["h", "doc_id"]).head(3)["doc_id"].tolist()
        got = (
            res[res["source"] == src]
            .sort_values("sample_rank")["doc_id"]
            .tolist()
        )
        assert got == want
    # mergeability: bottom-k of a union == bottom-k of pooled candidates
    pooled = docs.sort_values(["h", "doc_id"]).head(3)["doc_id"].tolist()
    cand = res.sort_values(["bucket_hash", "doc_id"]).head(60)
    assert cand.sort_values(["bucket_hash", "doc_id"]).head(3)[
        "doc_id"
    ].tolist() == pooled
