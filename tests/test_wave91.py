"""Semantic invariants for wave-91 operators (TOST equivalence, Wald
SPRT, HDR histogram) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _arm(uid):
    return ((uid * 2654435761) % 4294967296) % 2


def test_tost_matches_python(spark):
    res = _Q["ab_equivalence_tost"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "value"])
    yq = (
        (ev["value"] * 1e4).map(math.floor).groupby(ev["user_id"]).sum() / 1e4
    )
    arm = _arm(yq.index.to_numpy().astype(np.int64))
    y0, y1 = yq[arm == 0].to_numpy(), yq[arm == 1].to_numpy()
    n0, n1 = len(y0), len(y1)
    m0, m1 = y0.mean(), y1.mean()
    v0, v1 = y0.var(ddof=1), y1.var(ddof=1)
    diff = m1 - m0
    margin = 0.05 * ((m0 + m1) / 2)
    se = math.sqrt(v0 / n0 + v1 / n1)
    assert res["n0"] == n0 and res["n1"] == n1
    assert res["diff"] == pytest.approx(diff, abs=1e-3)
    assert res["margin"] == pytest.approx(margin, abs=1e-3)
    assert res["t_lower"] == pytest.approx((diff + margin) / se, abs=1e-3)
    assert res["t_upper"] == pytest.approx((margin - diff) / se, abs=1e-3)
    expect_eq = int((diff + margin) / se > 1.645 and (margin - diff) / se > 1.645)
    assert res["equivalent"] == expect_eq


def test_sprt_matches_python(spark):
    res = _Q["ab_sprt_boundary"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    arm = _arm(ev["user_id"].to_numpy().astype(np.int64))
    ctrl = ev[arm == 0]
    p0 = (
        math.floor(
            (ctrl["event_type"] == "purchase").sum() / len(ctrl) * 1e4
        )
        / 1e4
    )
    p1 = 1.2 * p0
    tr = ev[arm == 1]
    daily = tr.groupby(tr["ts"].dt.normalize()).agg(
        n=("event_type", "size"),
        x=("event_type", lambda s: int((s == "purchase").sum())),
    )
    llr = 0.0
    cross = None
    for day, row in daily.sort_index().iterrows():
        llr += row["x"] * math.log(1.2) + (row["n"] - row["x"]) * math.log(
            (1 - p1) / (1 - p0)
        )
        if cross is None and abs(llr) > math.log(19):
            cross = day.strftime("%Y-%m-%d")
    assert res["p0"] == pytest.approx(p0, abs=1e-9)
    assert res["p1"] == pytest.approx(p1, abs=1e-6)
    assert res["n_days"] == len(daily)
    assert res["final_llr"] == pytest.approx(llr, abs=1e-3)
    assert res["first_cross_day"] == (cross or "none")
    if llr > math.log(19):
        assert res["decision"] == "accept_h1"
    elif llr < -math.log(19):
        assert res["decision"] == "accept_h0"
    else:
        assert res["decision"] == "continue"


def test_hdr_histogram_matches_python_and_bound(spark):
    res = _Q["agg_hdr_histogram"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    c = (o["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    n = len(c)
    e = np.frompyfunc(int.bit_length, 1, 1)(c).astype(np.int64) - 1
    s = (c * 32) // (1 << e).astype(object) - 32
    lo = (1 << e).astype(object) + s * ((1 << e).astype(object) // 32)
    svals = np.sort(c)
    buckets = pd.DataFrame(
        {"key": e.astype(np.int64) * 100 + s.astype(np.int64), "lo": lo}
    )
    for _, row in res.iterrows():
        q = row["quantile"]
        rank = math.ceil(q * n)
        exact = svals[rank - 1]
        assert row["exact_value"] == pytest.approx(exact / 100, abs=0.01)
        # HDR estimate = lower bound of the bucket containing the rank-th
        # value in (e, s) order == value order (bucketing is monotone)
        order = np.argsort(c, kind="stable")
        est_lo = int(lo[order[rank - 1]])
        assert row["hdr_estimate"] == pytest.approx(est_lo / 100, abs=0.01)
        # the published guarantee holds
        assert row["rel_err"] <= row["guaranteed_bound"] + 1e-9


def test_hdr_bucketing_is_monotone_in_value(spark):
    # sanity for the reconstruction argument used above
    import random

    rnd = random.Random(7)
    vals = sorted(rnd.randrange(100, 10_000_000) for _ in range(1000))
    keys = []
    for v in vals:
        e = v.bit_length() - 1
        s = (v * 32) // (1 << e) - 32
        keys.append((e, s))
    assert keys == sorted(keys)
