"""Semantic invariants for wave-120 (McNemar model comparison, source
overlap matrix) — independent python re-derivations."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_mcnemar_models_matches_python(spark):
    res = _Q["ml_mcnemar_models"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    y = (ev["event_type"] == "purchase").astype(int)
    m1 = (ev["value"] >= 100.0).astype(int)
    m2 = (ev["value"] >= 200.0).astype(int)
    b = int(((m1 == y) & (m2 != y)).sum())
    c = int(((m1 != y) & (m2 == y)).sum())
    assert res["only_m1_right"] == b and res["only_m2_right"] == c
    assert res["both_right"] == int(((m1 == y) & (m2 == y)).sum())
    assert res["both_wrong"] == int(((m1 != y) & (m2 != y)).sum())
    assert res["mcnemar_chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=1e-3)
    assert res["mcnemar_chi2_corrected"] == pytest.approx(
        (abs(b - c) - 1) ** 2 / (b + c), abs=1e-3
    )
    # rows partition the dataset
    total = (
        res["only_m1_right"]
        + res["only_m2_right"]
        + res["both_right"]
        + res["both_wrong"]
    )
    assert total == len(ev)


def test_source_overlap_matrix_matches_python(spark):
    res = _Q["text_source_overlap_matrix"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["source", "text"]
    )
    vocab = defaultdict(set)
    for _, row in docs.iterrows():
        vocab[row["source"]].update(
            w for w in row["text"].strip().split(" ") if w
        )
    srcs = sorted(vocab)
    n_pairs = len(srcs) * (len(srcs) - 1) // 2
    assert len(res) == n_pairs
    got = res.set_index(["src_a", "src_b"])
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in got.index
                continue
            row = got.loc[(a, b)]
            assert row["vocab_a"] == len(vocab[a])
            assert row["vocab_b"] == len(vocab[b])
            assert row["vocab_common"] == inter
            union = len(vocab[a] | vocab[b])
            assert row["jaccard"] == pytest.approx(inter / union, abs=1e-6)
            assert row["containment"] == pytest.approx(
                inter / min(len(vocab[a]), len(vocab[b])), abs=1e-6
            )
