"""Semantic invariants for wave-48 operators (golden record, Wilson CI)
— independent python re-implementations on top of the DuckDB hash
gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_golden_record_matches_python(spark):
    res = _Q["pipeline_golden_record"](spark, SF_DIR).toPandas().iloc[0]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = len(cust)
    golden_bal = 0
    mixed = 0
    unresolved = 0
    for r in cust.itertuples():
        bal = math.floor(r.c_acctbal * 100)
        # name survivorship: longest wins; the corrupted copy has the SAME
        # length (upper-case), so the tie-break (lower priority number
        # wins via +(10-src_priority)) keeps the primary
        name2 = r.c_name.upper() if r.c_custkey % 3 == 0 else r.c_name
        key1 = len(r.c_name) * 10 + 9
        key2 = len(name2) * 10 + 8
        g_name = r.c_name if key1 >= key2 else name2
        if g_name != g_name.upper():
            mixed += 1
        seg2 = None if r.c_custkey % 5 == 0 else r.c_mktsegment
        g_seg = r.c_mktsegment  # primary always non-null, key 9 beats 8/-1
        if g_seg is None:
            unresolved += 1
        golden_bal += bal  # balance: trust primary
    assert res["n_entities"] == n
    assert res["n_variants"] == 2 * n
    assert res["unresolved_segment"] == unresolved == 0
    assert res["golden_balance_total"] == pytest.approx(
        golden_bal / 100.0, abs=0.01
    )
    assert res["mixed_case_names"] == mixed
    # every corrupted-name entity resolved back to the primary casing
    assert mixed == n - sum(
        1
        for r in cust.itertuples()
        if r.c_custkey % 3 == 0 and r.c_name == r.c_name.upper()
    ) - sum(
        1
        for r in cust.itertuples()
        if r.c_custkey % 3 != 0 and r.c_name == r.c_name.upper()
    )


def test_wilson_ci_matches_python(spark):
    res = _Q["stats_wilson_ci"](spark, SF_DIR).toPandas().set_index("segment")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for seg, grp in j.groupby("c_mktsegment"):
        n = len(grp)
        k = (grp["o_orderstatus"] == "F").sum()
        p = k / n
        z = 1.96
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        row = res.loc[seg]
        assert row["n"] == n and row["k"] == k
        assert row["rate"] == pytest.approx(p, abs=1e-6)
        assert row["wilson_lower"] == pytest.approx(
            (center - half) / denom, abs=1e-5
        )
        assert row["wilson_upper"] == pytest.approx(
            (center + half) / denom, abs=1e-5
        )
        # wilson interval stays in [0, 1] and brackets the rate
        assert 0 <= row["wilson_lower"] <= p <= row["wilson_upper"] <= 1
