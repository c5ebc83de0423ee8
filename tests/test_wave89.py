"""Semantic invariants for wave-89 operators (span corruption planning,
length bucketing, DP composition) — independent python re-derivations
from raw fixture data."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_span_corruption_matches_python(spark):
    res = _Q["pipeline_span_corruption"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    total = spans = masked = unmasked_docs = 0
    for _, row in docs.iterrows():
        toks = row["text"].strip().split(" ")
        n = len(toks)
        total += n
        starts = [
            i
            for i in range(1, n + 1)
            if _h60(f"{row['doc_id']}:{i}") % 10 == 0
        ]
        spans += len(starts)
        sset = set(starts)
        covered = sum(
            1
            for i in range(1, n + 1)
            if any((i - d) in sset for d in range(3))
        )
        masked += covered
        if not starts:
            unmasked_docs += 1
    assert res["n_docs"] == len(docs)
    assert res["total_tokens"] == total
    assert res["n_spans"] == spans
    assert res["masked_tokens"] == masked
    assert res["mask_ratio"] == pytest.approx(masked / total, abs=1e-6)
    assert res["docs_unmasked"] == unmasked_docs
    # deterministic draws at p=0.1, span 3: coverage below 3x starts
    assert res["masked_tokens"] <= 3 * res["n_spans"]


def test_length_bucketing_matches_python(spark):
    res = (
        _Q["pipeline_length_bucketing"](spark, SF_DIR)
        .toPandas()
        .set_index("policy")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    lens = docs["text"].str.strip().str.split(" ").str.len()
    n_docs, true_t = len(lens), int(lens.sum())
    mx = int(lens.max())
    pow2 = lens.map(lambda n: 2 ** math.ceil(math.log(n) / math.log(2)))
    expect = {
        "pad_to_max": n_docs * mx,
        "pad_to_pow2": int(pow2.sum()),
        "pack_concat": math.ceil(true_t / 512) * 512,
    }
    for policy, padded in expect.items():
        row = res.loc[policy]
        assert row["n_docs"] == n_docs
        assert row["true_tokens"] == true_t
        assert row["padded_tokens"] == padded
        assert row["waste_pct"] == pytest.approx(
            100 * (padded - true_t) / padded, abs=1e-3
        )
    # packing is never worse than padding
    assert (
        res.loc["pack_concat", "padded_tokens"]
        <= res.loc["pad_to_pow2", "padded_tokens"]
        <= res.loc["pad_to_max", "padded_tokens"]
    )


def test_dp_composition_matches_formula(spark):
    res = _Q["pipeline_dp_composition"](spark, SF_DIR).toPandas()
    assert list(res["n_releases"]) == list(range(1, 11))
    eps0, delta = 0.5, 1e-6
    for _, row in res.iterrows():
        k = int(row["n_releases"])
        basic = k * eps0
        adv = math.sqrt(2 * k * math.log(1 / delta)) * eps0 + k * eps0 * (
            math.exp(eps0) - 1
        )
        assert row["eps_basic"] == pytest.approx(basic, abs=1e-3)
        assert row["eps_advanced"] == pytest.approx(adv, abs=1e-3)
        assert row["tighter_bound"] == ("basic" if basic <= adv else "advanced")
