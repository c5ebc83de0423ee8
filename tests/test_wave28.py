"""Semantic invariants for wave-28 operators (scene cuts, record highs,
TWAP) — independent pandas/numpy re-implementations on top of the DuckDB
hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_scene_cuts_matches_python(spark):
    res = _Q["mm_scene_cuts"](spark, SF_DIR).toPandas().set_index("video_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vids = sorted(docs.loc[docs["doc_id"] < 40, "doc_id"])
    assert list(res.index) == vids
    for vid in vids:
        n_frames = 8 + vid % 9
        hashes = [
            (vid * 1000003 + i * 2654435761) % 4294967296
            for i in range(n_frames)
        ]
        hams = [
            bin(a ^ b).count("1") for a, b in zip(hashes, hashes[1:])
        ]
        row = res.loc[vid]
        assert row["n_transitions"] == len(hams)
        assert row["n_cuts"] == sum(1 for h in hams if h >= 18)
        assert row["max_hamming"] == max(hams)
        assert row["mean_hamming"] == pytest.approx(
            sum(hams) / len(hams), abs=1e-4
        )
    # 32-bit random-ish hashes: mean hamming hovers near 16
    assert res["mean_hamming"].mean() == pytest.approx(16, abs=3)


def test_record_highs_matches_pandas(spark):
    res = _Q["ts_record_highs"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
    )
    run_max = cents.cummax().shift(1)
    is_rec = run_max.isna() | (cents > run_max)
    rec_rns = np.flatnonzero(is_rec.to_numpy()) + 1
    assert res["n_records"] == len(rec_rns)
    assert res["last_record_day"] == str(cents.index[rec_rns[-1] - 1])
    assert res["all_time_high"] == pytest.approx(
        cents.max() / 100.0, abs=0.01
    )
    assert res["longest_drought_days"] == np.diff(rec_rns).max()
    assert res["record_rate"] == pytest.approx(
        len(rec_rns) / len(cents), abs=1e-6
    )
    # record count for this noisy-but-unscaled series: more than ln(n)
    # of a pure i.i.d. series would be suspicious to assert tightly —
    # just require monotone sanity
    assert 1 <= res["n_records"] <= len(cents)


def test_twap_matches_pandas(spark):
    res = _Q["ts_twap"](spark, SF_DIR).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts"]
    )
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        c = g["cents"].to_numpy()[:-1]
        dur = np.diff(g["us"].to_numpy())
        num = int((c.astype(object) * dur.astype(object)).sum())
        den = int(dur.sum())
        twap = math.floor(num / den * 100.0) / 10000.0
        naive = math.floor(c.sum() / len(c) * 100.0) / 10000.0
        row = res.loc[uid]
        assert row["n"] == len(c)
        assert row["twap"] == pytest.approx(twap, abs=1e-9)
        assert row["naive_mean"] == pytest.approx(naive, abs=1e-9)
        assert row["twap_bias"] == pytest.approx(twap - naive, abs=1e-9)
    # TWAP and naive mean agree in expectation for ~uniform arrivals:
    # the median absolute bias stays small relative to the mean level
    assert res["twap_bias"].abs().median() < res["naive_mean"].median() * 0.2
