"""Semantic invariants for wave-9 operators (percentile cont/disc,
ANY/ALL rewrites, freshness SLA, bounce rate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_percentile_cont_disc_matches_numpy(spark):
    res = (
        _Q["agg_percentile_disc_cont"](spark, SF_DIR)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        x = np.sort(g["l_quantity"].values)
        for p, cc, dc in ((0.25, "p25_cont", "p25_disc"),
                          (0.50, "p50_cont", "p50_disc"),
                          (0.75, "p75_cont", "p75_disc")):
            cont = np.quantile(x, p, method="linear")
            disc = np.quantile(x, p, method="inverted_cdf")
            assert res.loc[flag, cc] == pytest.approx(cont, abs=1e-5)
            assert res.loc[flag, dc] == pytest.approx(disc, abs=1e-9)
        # DISC returns an actual data value; CONT may not
        assert res.loc[flag, "p50_disc"] in x


def test_any_all_matches_pandas(spark):
    row = _Q["sql_any_all_quantifiers"](spark, SF_DIR).toPandas().iloc[0]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    assert row["richer_than_all_suppliers"] == int(
        (cust["c_acctbal"] > supp["s_acctbal"].max()).sum()
    )
    assert row["richer_than_some_supplier"] == int(
        (cust["c_acctbal"] > supp["s_acctbal"].min()).sum()
    )
    assert row["shares_nation_with_supplier"] == int(
        cust["c_nationkey"].isin(supp["s_nationkey"].unique()).sum()
    )


def test_freshness_head_has_zero_lag(spark):
    res = _Q["profile_freshness"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert res["n_events"].sum() == len(ev)
    # exactly the newest stream has zero lag; lags are non-negative
    assert (res["lag_minutes"] >= 0).all()
    assert (res["lag_minutes"] == 0).sum() >= 1
    assert res["stale_12h"].tolist() == (
        res["lag_minutes"] > 720
    ).tolist()


def test_bounce_rate_matches_pandas(spark):
    res = _Q["events_bounce_rate"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
    gap = ev.groupby("user_id")["us"].diff()
    ev["new_s"] = (gap.isna() | (gap > 1_800_000_000)).astype(int)
    ev["sno"] = ev.groupby("user_id")["new_s"].cumsum()
    sized = ev.groupby(["user_id", "sno"]).agg(
        n=("us", "size"), day=("us", lambda s: s.min() // 86_400_000_000)
    )
    per_day = sized.groupby("day").agg(
        sessions=("n", "size"), bounces=("n", lambda s: int((s == 1).sum()))
    )
    for _, r in res.iterrows():
        assert per_day.loc[r["epoch_day"], "sessions"] == r["sessions"]
        assert per_day.loc[r["epoch_day"], "bounces"] == r["bounces"]
        assert r["bounce_rate"] == pytest.approx(
            per_day.loc[r["epoch_day"], "bounces"]
            / per_day.loc[r["epoch_day"], "sessions"],
            abs=1e-5,
        )
