"""Semantic invariants for wave-103 operators (exposure fairness,
log-odds keywords, float-sum stability) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_exposure_fairness_matches_python(spark):
    res = _Q["ml_exposure_fairness"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    rev = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_partkey"])
        .sum()
        .rename("rel")
        .reset_index()
        .merge(p, left_on="l_partkey", right_on="p_partkey")
    )
    rev = rev.sort_values(["rel", "p_partkey"], ascending=[False, True]).head(
        100
    )
    rev["rnk"] = np.arange(1, len(rev) + 1)
    rev["expo"] = 1.0 / np.log2(rev["rnk"] + 1.0)
    g = rev.groupby("p_brand").agg(
        expo=("expo", "sum"), rel=("rel", "sum"), n=("rnk", "size")
    )
    got = res.set_index("brand")
    for b, row in g.iterrows():
        assert got.loc[b, "n_items"] == row["n"]
        assert got.loc[b, "exposure_share"] == pytest.approx(
            row["expo"] / g["expo"].sum(), abs=1e-4
        )
        assert got.loc[b, "relevance_share"] == pytest.approx(
            row["rel"] / g["rel"].sum(), abs=1e-5
        )
    assert got["exposure_share"].sum() == pytest.approx(1.0, abs=1e-3)
    assert got["relevance_share"].sum() == pytest.approx(1.0, abs=1e-3)


def test_log_odds_matches_python(spark):
    res = _Q["text_keyword_log_odds"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["source", "text"]
    )
    srcs = sorted(docs["source"].unique())[:2]
    cnt = {1: Counter(), 2: Counter()}
    for i, s in enumerate(srcs, start=1):
        for t in docs[docs["source"] == s]["text"]:
            cnt[i].update(w for w in t.strip().split(" ") if w)
    vocab = set(cnt[1]) | set(cnt[2])
    n1, n2 = sum(cnt[1].values()), sum(cnt[2].values())
    a0 = (n1 + n2) * 0.01
    zs = {}
    for w in vocab:
        y1, y2 = cnt[1][w], cnt[2][w]
        aw = (y1 + y2) * 0.01
        delta = math.log((y1 + aw) / (n1 + a0 - y1 - aw)) - math.log(
            (y2 + aw) / (n2 + a0 - y2 - aw)
        )
        zs[w] = delta / math.sqrt(1 / (y1 + aw) + 1 / (y2 + aw))
    top = sorted(vocab, key=lambda w: (-abs(zs[w]), w))[:10]
    assert list(res["word"]) == top
    for _, row in res.iterrows():
        assert row["log_odds_z"] == pytest.approx(zs[row["word"]], abs=1e-3)
        assert row["count_src1"] == cnt[1][row["word"]]
        assert row["count_src2"] == cnt[2][row["word"]]


def test_float_sum_stability_demonstrates_discipline(spark):
    res = (
        _Q["profile_float_sum_stability"](spark, SF_DIR).toPandas().iloc[0]
    )
    # quantized totals are bit-identical across partitionings
    assert res["quantized_stable"] == 1
    assert res["quantized_spread"] == 0.0
    # naive double sums sit near the truth but the layout spread is real
    # (usually nonzero; at worst it can only be a tiny multiple of ulp)
    assert res["naive_spread"] >= 0.0
    assert res["naive_spread"] < 1.0  # dollars of drift, not correctness
    assert res["quantized_total"] == pytest.approx(res["naive_p1"], abs=1.0)
