"""Semantic invariants for wave-133 (rank-biased overlap)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_rbo_matches_python(spark):
    res = _Q["ml_rank_biased_overlap"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_quantity"],
    )
    g = li.groupby("l_partkey").agg(
        r=("l_extendedprice", lambda s: int((s * 100.0).map(math.floor).sum())),
        q=("l_quantity", lambda s: int(s.sum())),
    )
    depth, p = 50, 0.9
    top_r = list(
        g.sort_values(["r"], ascending=False)
        .reset_index()
        .sort_values(["r", "l_partkey"], ascending=[False, True])["l_partkey"]
        .head(depth)
    )
    top_q = list(
        g.reset_index()
        .sort_values(["q", "l_partkey"], ascending=[False, True])["l_partkey"]
        .head(depth)
    )
    # per-depth overlap definition of truncated RBO
    rbo = 0.0
    for d in range(1, depth + 1):
        ov = len(set(top_r[:d]) & set(top_q[:d]))
        rbo += p ** (d - 1) * ov / d
    rbo *= 1 - p
    common = len(set(top_r) & set(top_q))
    assert res["depth"] == depth
    assert res["n_common"] == common
    assert res["rbo_truncated"] == pytest.approx(rbo, abs=1e-5)
    assert 0.0 <= res["rbo_truncated"] <= 1.0
