"""Semantic invariants for wave-147 (kappa adjuncts: PABAK etc.)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _label(tag, doc_id, n_chars, base, boost):
    h = hashlib.md5(f"{tag}{doc_id}".encode()).hexdigest()[:8]
    slot = int(h, 16) % 100
    thresh = base + (boost if n_chars >= 300 else 0)
    return 1 if slot < thresh else 0


def test_kappa_adjuncts_match_python(spark):
    res = _Q["ml_kappa_adjusted"](spark, SF_DIR).toPandas().iloc[0]
    d = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ra = [
        _label("a", i, c, 55, 20) for i, c in zip(d.doc_id, d.n_chars)
    ]
    rb = [
        _label("b", i, c, 50, 25) for i, c in zip(d.doc_id, d.n_chars)
    ]
    n = len(d)
    a = sum(1 for x, y in zip(ra, rb) if x == 1 and y == 1)
    b = sum(1 for x, y in zip(ra, rb) if x == 1 and y == 0)
    c_ = sum(1 for x, y in zip(ra, rb) if x == 0 and y == 1)
    dd = sum(1 for x, y in zip(ra, rb) if x == 0 and y == 0)
    assert res["n_docs"] == n
    po = (a + dd) / n
    assert res["observed_agreement"] == pytest.approx(po, abs=1e-5)
    assert res["pabak"] == pytest.approx(2 * po - 1, abs=2e-5)
    assert res["prevalence_index"] == pytest.approx(abs(a - dd) / n, abs=1e-5)
    assert res["bias_index"] == pytest.approx(abs(b - c_) / n, abs=1e-5)
    assert res["disagreement_rate"] == pytest.approx((b + c_) / n, abs=1e-5)
    # identity: observed_agreement + disagreement_rate == 1
    assert res["observed_agreement"] + res["disagreement_rate"] == pytest.approx(
        1.0, abs=2e-5
    )
