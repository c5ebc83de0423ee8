"""Semantic invariants for wave-141 (frequency-spectrum richness)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_freq_spectrum_matches_python(spark):
    res = _Q["text_freq_spectrum"](spark, SF_DIR).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    tf = Counter()
    for t in d.text:
        tf.update(w for w in t.strip().split(" ") if w)
    n = sum(tf.values())
    v = len(tf)
    v1 = sum(1 for c in tf.values() if c == 1)
    v2 = sum(1 for c in tf.values() if c == 2)
    assert res["n_tokens"] == n
    assert res["vocab"] == v
    assert res["hapax"] == v1
    assert res["dis_legomena"] == v2
    assert res["hapax_ratio"] == pytest.approx(v1 / v, abs=1e-5)
    # the query ROUNDs the derived constants to 4 decimals (oracle
    # quantization), so compare at the quantization granularity
    assert res["honore_r"] == pytest.approx(
        100.0 * math.log(n) / (1.0 - v1 / v), abs=5.1e-5
    )
    assert res["sichel_s"] == pytest.approx(v2 / v, abs=1e-5)
    assert res["brunet_w"] == pytest.approx(
        n ** (v**-0.165), abs=5.1e-5
    )
    assert res["uber_u"] == pytest.approx(
        math.log(n) ** 2 / (math.log(n) - math.log(v)), abs=5.1e-5
    )
    # spectrum sanity: hapax dominate dis legomena in natural text
    assert res["hapax"] >= res["dis_legomena"]
