"""Fixture-drift guard: the driver regenerates /root/testdata between
rounds and physical types have changed before (TIMESTAMP(NANOS) →
µs NTZ, SURVEY §2.3.1). When a whole query family breaks at once, THIS
test tells you in one line whether the fixtures moved under us — check
it before debugging any operator."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

#: column -> acceptable physical/arrow type names (prefix match).
_EXPECTED = {
    "region": {"r_regionkey": ("int32",), "r_name": ("string", "large_string")},
    "nation": {"n_nationkey": ("int32",), "n_regionkey": ("int32",)},
    "customer": {
        "c_custkey": ("int64",),
        "c_acctbal": ("double",),
        "c_mktsegment": ("string", "large_string"),
    },
    "supplier": {"s_suppkey": ("int64",), "s_acctbal": ("double",)},
    "part": {"p_partkey": ("int64",), "p_retailprice": ("double",)},
    "orders": {
        "o_orderkey": ("int64",),
        "o_custkey": ("int64",),
        "o_totalprice": ("double",),
        # any timestamp resolution acceptable; load_table normalizes
        "o_orderdate": ("timestamp",),
    },
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_shipdate": ("timestamp",),
    },
    "events": {
        "event_id": ("int64",),
        "user_id": ("int64",),
        "ts": ("timestamp",),
        "value": ("double",),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int64",),
        "text": ("string", "large_string"),
        "lang": ("string", "large_string"),
        "source": ("string", "large_string"),
        "n_chars": ("int64",),
    },
    "embeddings": {
        "vec_id": ("int64",),
        "embedding": ("list", "large_list"),
        "label": ("int32",),
    },
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_fixture_schema_is_what_operators_assume(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    fields = {f.name: str(f.type) for f in schema}
    for col, accepted in _EXPECTED[table].items():
        assert col in fields, (
            f"{table}.{col} MISSING — fixtures regenerated with a new "
            f"schema; re-read TESTDATA.md and update operators"
        )
        assert any(fields[col].startswith(a) for a in accepted), (
            f"{table}.{col} is now {fields[col]!r} (expected one of "
            f"{accepted}) — fixture physical type drifted; check "
            f"sources/tables.load_table normalization first"
        )


def test_fixture_embedding_dims_are_64():
    import pandas as pd

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    lens = emb["embedding"].str.len().unique()
    assert list(lens) == [64], (
        f"embedding dims changed to {lens} — RANGE(1,65) oracles and the "
        f"quantized vector kernels assume 64"
    )


def test_fixture_lang_and_segment_domains():
    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert set(docs["lang"].unique()) == {"de", "en", "es", "fr", "zh"}, (
        "documents.lang domain drifted — text_langid marker tables and "
        "stratified samplers enumerate these five"
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert set(ev["event_type"].unique()) == {
        "click",
        "error",
        "purchase",
        "signup",
        "view",
    }, "events.event_type domain drifted — funnel/markov ops enumerate these"
