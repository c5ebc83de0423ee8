"""Semantic invariants for wave-145 (Ansari-Bradley scale test)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_ansari_bradley_matches_brute_force(spark):
    res = _Q["stats_ansari_bradley"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    ev = ev[ev.event_type.isin(["purchase", "view"])].reset_index(drop=True)
    n = len(ev)
    order = ev.value.sort_values(kind="mergesort")
    pos = np.arange(1, n + 1)
    raw_scores = np.minimum(pos, n + 1 - pos).astype(float)
    # tie-average the scores per distinct value
    df = pd.DataFrame({"value": order.values, "s": raw_scores})
    avg = df.groupby("value")["s"].transform("mean")
    scores = pd.Series(avg.values, index=order.index).sort_index()
    is_a = ev.event_type == "purchase"
    n1, n2 = int(is_a.sum()), int((~is_a).sum())
    w = float(scores[is_a].sum())
    sbar = float(scores.sum()) / n
    s2 = float((scores**2).sum())
    expected = n1 * sbar
    var = n1 * n2 * (s2 - n * sbar**2) / (n * (n - 1))
    z = (w - expected) / np.sqrt(var)
    assert res["n_a"] == n1 and res["n_b"] == n2
    assert res["ab_stat"] == pytest.approx(w, rel=1e-6, abs=1e-2)
    assert res["expected"] == pytest.approx(expected, rel=1e-6, abs=1e-2)
    assert res["z_score"] == pytest.approx(z, abs=1e-3)
