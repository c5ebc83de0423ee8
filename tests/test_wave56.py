"""Semantic invariants for wave-56 operators (fuzzy string matching) —
independent python re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import pandas as pd

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_levenshtein_matches_python(spark):
    res = _Q["fn_levenshtein"](spark, SF_DIR).toPandas()
    for _, r in res.iterrows():
        d = _lev(r["p_name"], "small ring")
        assert r["dist_ref"] == d
        assert r["dist_ref_capped"] == (d if d <= 3 else -1)
        expected_sim = round(1.0 - d / max(len(r["p_name"]), 10), 4)
        assert abs(r["sim_norm"] - expected_sim) < 1e-9


def test_fuzzy_pairs_verified_and_blocked(spark):
    res = _Q["dedup_fuzzy_names"](spark, SF_DIR).toPandas()
    assert len(res) > 0
    names = set(res["name_a"]) | set(res["name_b"])
    for _, r in res.iterrows():
        # verification is exact
        assert _lev(r["name_a"], r["name_b"]) == r["dist"] <= 3
        # candidates share a blocking token by construction
        ta, tb = r["name_a"].split(" "), r["name_b"].split(" ")
        assert ta[0] == tb[0] or ta[1] == tb[1]
        assert r["name_a"] < r["name_b"]  # canonical pair order, no dupes
    # row counts joined back correctly
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    counts = part.groupby("p_name").size()
    for _, r in res.iterrows():
        assert counts[r["name_a"]] == r["rows_a"]
        assert counts[r["name_b"]] == r["rows_b"]
    assert names  # sanity: vocabulary non-trivial


def test_fuzzy_lookup_is_argmin(spark):
    res = _Q["text_fuzzy_lookup"](spark, SF_DIR).toPandas()
    part = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    canon = list(part["n_name"])
    assert len(res) == len({n.lower().replace("_", " ") for n in canon})
    for _, r in res.iterrows():
        dists = {c: _lev(r["raw_name"], c) for c in canon}
        best = min(dists.values())
        assert r["dist"] == best
        # tie-break: smallest name among the argmins
        assert r["resolved_name"] == min(c for c, d in dists.items() if d == best)
