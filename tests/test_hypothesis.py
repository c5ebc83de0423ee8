"""Hypothesis property tests: core kernels checked against independent
in-Python references on RANDOM inputs — a direction neither the DuckDB
differential (fixed fixtures) nor the metamorphic tests cover. Example
counts are small and deadlines off: each example drives a real Spark job.
"""

from __future__ import annotations

import pytest

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_processor_spark.functions.exact import dsum
from hive_processor_spark.operators.asof import asof_join
from hive_processor_spark.operators.dedup import _min_label_components

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@given(xs=_floats, parts=st.integers(min_value=1, max_value=7))
@settings(**_SETTINGS)
def test_dsum_matches_decimal_reference_any_partitioning(spark, xs, parts):
    """dsum == exact Decimal arithmetic of the same quantization, at every
    partition count — the property the whole hash gate rests on."""
    df = spark.createDataFrame([(float(x),) for x in xs], "v double").repartition(parts)
    got = df.agg(dsum("v").alias("s")).head()["s"]
    expect = float(
        sum(Decimal(int(__import__("math").floor(x * 10**4))) for x in xs)
        / Decimal(10**4)
    )
    assert got == expect


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, left, right):
    """asof_join == the obvious per-row reference: latest right payload at
    ts <= left.ts with equal key, greatest payload winning timestamp ties
    (the documented tie rule)."""
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, epoch + dt.timedelta(seconds=t)) for k, t in left], "k int, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, epoch + dt.timedelta(seconds=t), p) for k, t, p in right],
        "k int, ts timestamp, payload long",
    )
    got = {
        (r.k, r.ts): r.asof_payload
        for r in asof_join(ldf, rdf, keys=["k"], ts="ts", payload=["payload"]).collect()
    }
    for k, t in left:
        lts = epoch + dt.timedelta(seconds=t)
        cands = [(rt, p) for rk, rt, p in right if rk == k and rt <= t]
        # latest right timestamp wins; equal timestamps break by greatest
        # payload (the operator's documented tie rule)
        expect = max(cands)[1] if cands else None
        assert got[(k, lts)] == expect, (k, t)


@pytest.mark.slow
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_label_propagation_matches_union_find(spark, edges):
    """_min_label_components == a plain union-find over the same edges
    (min element as the component label)."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.lbl for r in _min_label_components(df).collect()}
    assert got == expect
