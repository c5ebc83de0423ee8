"""Semantic invariants for wave-16 operators (skyline sweep, decision
stump, weighted bottom-k sample, readability) — each checked against an
independent numpy/python re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_skyline_equals_brute_force_dominance(spark):
    res = _Q["join_skyline"](spark, SF_DIR).toPandas()
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    price = part["p_retailprice"].to_numpy()
    size = part["p_size"].to_numpy()
    dominated = np.zeros(len(part), dtype=bool)
    for i in range(len(part)):
        dom = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        dominated[i] = dom.any()
    expect = set(part.loc[~dominated, "p_partkey"])
    assert set(res["p_partkey"]) == expect
    # frontier size strictly increases with price: a later (pricier) point
    # must offer more size or it would be dominated by an earlier one
    r = res.sort_values("price")
    assert (np.diff(r["size"].to_numpy()) > 0).all() or len(r) == 1


def test_decision_stump_matches_numpy_gini_scan(spark):
    res = _Q["ml_decision_stump"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    v = np.floor(ev["value"].to_numpy()).astype(np.int64)
    y = (ev["event_type"] == "purchase").to_numpy()
    bins = pd.DataFrame({"v": v, "y": y}).groupby("v").agg(
        n=("y", "size"), pos=("y", "sum")
    )
    nt, pt = bins["n"].sum(), bins["pos"].sum()
    nl = bins["n"].cumsum().shift(1).fillna(0).astype(int)
    pl = bins["pos"].cumsum().shift(1).fillna(0).astype(int)
    nr, pr = nt - nl, pt - pl
    ok = (nl > 0) & (nr > 0)
    gl = nl - (pl**2 + (nl - pl) ** 2) / nl.where(ok)
    gr = nr - (pr**2 + (nr - pr) ** 2) / nr.where(ok)
    gini = ((gl + gr) / nt)[ok]
    gini_q = np.floor(gini * 1e9).astype(np.int64)
    order = sorted(zip(gini_q, gini.index))
    best_q, best_t = order[0]
    assert res["best_threshold"] == best_t
    # engine reports ROUND(quantized, 6)
    assert res["gini"] == pytest.approx(best_q / 1e9, abs=5e-7)
    assert res["n_left"] == nl.loc[best_t]
    assert res["n_right"] == nr.loc[best_t]
    acc = ((nl.loc[best_t] - pl.loc[best_t]) + pr.loc[best_t]) / nt
    assert res["accuracy"] == pytest.approx(acc, abs=1e-6)
    # a stump must beat the majority-class baseline on its own split score
    assert 0.0 < res["gini"] < 0.5


def test_weighted_bottom_k_matches_python_race(spark):
    res = _Q["sample_weighted_bottom_k"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    keys = []
    for r in docs.itertuples():
        u = ((r.doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        kq = math.floor(-math.log(u) / r.n_chars * 1e12)
        keys.append((kq, r.doc_id, r.n_chars))
    keys.sort()
    expect = keys[:50]
    assert len(res) == 50
    assert list(res["doc_id"]) == [d for _, d, _ in expect]
    assert list(res["weight"]) == [w for _, _, w in expect]
    assert list(res["rank"]) == list(range(1, 51))
    # weight-proportional: the sample must skew heavier than the corpus
    assert res["weight"].mean() > docs["n_chars"].mean()


def test_readability_matches_python_syllable_heuristic(spark):
    res = _Q["text_readability"](spark, SF_DIR).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(res) == len(docs)
    for r in docs.sample(60, random_state=7).itertuples():
        toks = r.text.split(" ")
        syls = [max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks]
        words = len(toks)
        sentences = max(1, words // 15)
        flesch = 206.835 - 1.015 * (words / sentences) - 84.6 * (
            sum(syls) / words
        )
        row = res.loc[r.doc_id]
        assert row["words"] == words
        assert row["syllables"] == sum(syls)
        assert row["poly"] == sum(1 for s in syls if s >= 3)
        assert row["sentences"] == sentences
        assert row["flesch"] == pytest.approx(flesch, abs=1e-3)
    assert res["poly_ratio"].between(0, 1).all()
