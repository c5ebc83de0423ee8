"""Semantic invariants for wave-37 operators (chain ladder, audio VAD,
semver ordering) — independent pandas/python re-implementations on top
of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_chain_ladder_matches_pandas(spark):
    res = _Q["agg_chain_ladder"](spark, SF_DIR).toPandas().set_index("from_delay")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j[j["l_shipdate"] >= j["o_orderdate"]]
    cohort = j["o_orderdate"].dt.strftime("%Y-%m")
    delay = np.minimum(
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize()).dt.days // 30, 3
    )
    cents = np.floor(j["l_extendedprice"] * 100).astype("int64")
    tri = (
        pd.DataFrame({"c": cohort, "d": delay, "v": cents})
        .groupby(["c", "d"])["v"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=[0, 1, 2, 3], fill_value=0)
    )
    cum = tri.cumsum(axis=1)
    for d in range(3):
        mask = cum[d] > 0
        s_from = cum.loc[mask, d].sum()
        s_to = cum.loc[mask, d + 1].sum()
        row = res.loc[d]
        assert row["n_cohorts"] == mask.sum()
        assert row["cum_from"] == pytest.approx(s_from / 100.0, abs=0.01)
        assert row["cum_to"] == pytest.approx(s_to / 100.0, abs=0.01)
        assert row["dev_factor"] == pytest.approx(s_to / s_from, abs=1e-6)
    # development factors are >= 1 (cumulative never shrinks)
    assert (res["dev_factor"] >= 1.0).all()


def test_audio_vad_matches_python(spark):
    res = _Q["mm_audio_vad"](spark, SF_DIR).toPandas().set_index("clip_id")
    for clip in range(100, 130):
        n_frames = 40 + clip % 21
        energies = [
            (clip * 48271 + i * 2654435761) % 4294967296 % 1000
            for i in range(n_frames)
        ]
        speech = [int(e >= 500) for e in energies]
        segs = []
        run = 0
        for s in speech:
            if s:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        if run:
            segs.append(run)
        row = res.loc[clip]
        assert row["n_frames"] == n_frames
        assert row["speech_frames"] == sum(speech)
        assert row["speech_ratio"] == pytest.approx(
            sum(speech) / n_frames, abs=1e-4
        )
        assert row["n_segments"] == len(segs)
        assert row["longest_segment"] == (max(segs) if segs else 0)
    # ~50% threshold on uniform energies
    assert res["speech_ratio"].mean() == pytest.approx(0.5, abs=0.1)


def test_semver_matches_python(spark):
    res = _Q["fn_semver"](spark, SF_DIR).toPandas().set_index("p_brand")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    by_brand: dict[str, list] = defaultdict(list)
    for r in part.itertuples():
        maj, mi, pa = r.p_partkey % 5, r.p_partkey % 20, r.p_partkey % 50
        by_brand[r.p_brand].append(
            (maj * 1000000 + mi * 1000 + pa, f"v{maj}.{mi}.{pa}", maj)
        )
    for brand, vs in by_brand.items():
        latest = sorted(vs, key=lambda t: (-t[0], t[1]))[0]
        row = res.loc[brand]
        assert row["distinct_versions"] == len({v for _, v, _ in vs})
        assert row["latest_version"] == latest[1]
        assert row["latest_major"] == latest[2]
        assert row["v0_parts"] == sum(1 for _, _, m in vs if m == 0)
    # numeric ordering: the global latest major is 4 (partkey % 5 max)
    assert res["latest_major"].max() == 4
