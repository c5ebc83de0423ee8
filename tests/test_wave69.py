"""Semantic invariants for wave-69 operators (generalized ESD, fatigue
curve, Bloom FPR audit) — independent python re-derivations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_esd_matches_numpy(spark):
    res = _Q["stats_esd_outliers"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    daily = (
        pd.DataFrame(
            {"day": orders["o_orderdate"].dt.strftime("%Y-%m-%d"), "c": cents}
        )
        .groupby("day")["c"]
        .sum()
    )
    remaining = daily.copy()
    expect = []
    for r in range(1, 6):
        x = remaining.to_numpy(float)
        z = np.abs(x - x.mean()) / x.std(ddof=1)
        # argmax with day tie-break
        frame = pd.DataFrame({"day": remaining.index, "z": z}).sort_values(
            ["z", "day"], ascending=[False, True]
        )
        day = frame.iloc[0]["day"]
        expect.append((r, day, round(remaining[day] / 100.0, 2),
                       frame.iloc[0]["z"]))
        remaining = remaining.drop(day)
    assert list(res["round"]) == [e[0] for e in expect]
    assert list(res["day"]) == [e[1] for e in expect]
    assert list(res["revenue"]) == [e[2] for e in expect]
    assert list(res["z_score"]) == pytest.approx(
        [e[3] for e in expect], abs=1e-4
    )
    # each removal can only come from the current extreme tail
    assert (res["z_score"] > 2.0).all()


def test_fatigue_curve_matches_pandas(spark):
    res = _Q["events_fatigue_curve"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["n_seen"] = ev.groupby("user_id").cumcount() + 1

    def bucket(n):
        if n <= 5:
            return str(n)
        if n <= 10:
            return "06-10"
        if n <= 20:
            return "11-20"
        if n <= 50:
            return "21-50"
        return "51+"

    ev["b"] = ev["n_seen"].map(bucket)
    got = res.set_index("exposure_bucket")
    for b, g in ev.groupby("b"):
        conv = int((g["event_type"] == "purchase").sum())
        assert got.loc[b, "n_events"] == len(g)
        assert got.loc[b, "n_purchases"] == conv
        assert got.loc[b, "purchase_rate"] == pytest.approx(
            round(conv / len(g), 6)
        )
    # every event lands in exactly one bucket
    assert res["n_events"].sum() == len(ev)


def _bit(j: int, key: int, m: int = 4096) -> int:
    return int(hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:15], 16) % m


def test_bloom_fpr_matches_python(spark):
    res = _Q["sketch_bloom_fpr"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_suppkey"])
    keys = sorted(li["l_suppkey"].unique())
    bits = {_bit(j, k) for k in keys for j in range(3)}
    fp = 0
    for p in range(10_000_000, 10_005_000):
        if all(_bit(j, p) in bits for j in range(3)):
            fp += 1
    assert res["n_keys"] == len(keys)
    assert res["bits_set"] == len(bits)
    assert res["false_positives"] == fp
    assert res["fpr_measured"] == pytest.approx(round(fp / 5000, 6))
    assert res["fpr_expected"] == pytest.approx(
        round((len(bits) / 4096) ** 3, 6)
    )
    # occupancy model and measurement agree within sampling noise
    assert abs(res["fpr_measured"] - res["fpr_expected"]) < 0.05
