"""Semantic invariants for wave-75 operators (rounding-policy audit,
Kneser–Ney bigrams) — independent python re-derivations."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_round_half_even_matches_python(spark):
    res = _Q["fn_round_half_even"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    x = (li["l_extendedprice"] * (1.0 - li["l_discount"])).to_numpy()
    j = np.floor(x * 10000.0).astype("int64")
    hu = (j + 50) // 100
    q, r = j // 100, j % 100
    he = q + np.where(r > 50, 1, np.where(r == 50, q % 2, 0))
    assert res["n_rows"] == len(j)
    assert res["n_differ"] == int((hu != he).sum())
    assert res["n_exact_ties"] == int((r == 50).sum())
    assert res["total_half_up"] == pytest.approx(round(hu.sum() / 100.0, 2))
    assert res["total_half_even"] == pytest.approx(round(he.sum() / 100.0, 2))
    assert res["rounding_drift"] == pytest.approx(
        round((hu - he).sum() / 100.0, 2)
    )
    # policies only differ on exact ties, and drift is one cent per tie
    assert res["n_differ"] <= res["n_exact_ties"]
    assert abs(res["rounding_drift"]) <= res["n_differ"] / 100.0 + 1e-9


def test_kneser_ney_matches_python(spark):
    res = _Q["text_kneser_ney_bigram"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bi = Counter()
    for text in docs["text"]:
        toks = [t for t in text.strip().split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    c1, n_follow, n_precede = Counter(), Counter(), Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n_follow[a] += 1
        n_precede[b] += 1
    n_types = len(bi)
    rows = []
    for (a, b), c in bi.items():
        if c < 25:
            continue
        p_kn = max(c - 0.75, 0.0) / c1[a] + 0.75 * n_follow[a] / c1[a] * (
            n_precede[b] / n_types
        )
        rows.append((round(p_kn, 6), a, b, c, round(c / c1[a], 6)))
    top = sorted(rows, key=lambda t: (-t[0], t[1], t[2]))[:20]
    assert list(zip(res["w1"], res["w2"])) == [(t[1], t[2]) for t in top]
    assert list(res["c12"]) == [t[3] for t in top]
    assert list(res["p_mle"]) == pytest.approx([t[4] for t in top])
    assert list(res["p_kneser_ney"]) == pytest.approx(
        [t[0] for t in top], abs=2e-6
    )
    # KN discounts mass from seen bigrams: p_kn <= p_mle + continuation
    assert (res["p_kneser_ney"] <= 1.0).all()
    assert (res["p_kneser_ney"] > 0.0).all()
