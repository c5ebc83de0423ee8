"""Semantic invariants for wave-119 (Allen interval relations) —
python re-derivation plus the sessionizer-invariant audit."""

from __future__ import annotations

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_allen_relations_match_python_and_invariant(spark):
    res = _Q["join_allen_relations"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    us = ev["ts"].astype("int64")
    gap = us.groupby(ev["user_id"]).diff()
    new_s = (gap.isna() | (gap >= 1_800_000_000)).astype(int)
    sno = new_s.groupby(ev["user_id"]).cumsum()
    frame = pd.DataFrame({"u": ev["user_id"], "sno": sno, "us": us})
    sess = frame.groupby(["u", "sno"])["us"].agg(["min", "max"])
    sess["f"] = sess["max"] + 60_000_000
    counts = {}
    for u, g in sess.groupby(level=0):
        g = g.sort_values(["min", "f"])
        s_arr = g["min"].to_numpy()
        f_arr = g["f"].to_numpy()
        for i in range(len(g) - 1):
            s1, f1, s2, f2 = s_arr[i], f_arr[i], s_arr[i + 1], f_arr[i + 1]
            if s1 == s2 and f1 == f2:
                r = "equals"
            elif f1 < s2:
                r = "before"
            elif f1 == s2:
                r = "meets"
            elif s1 == s2 and f1 < f2:
                r = "starts"
            elif s1 == s2 and f1 > f2:
                r = "started_by"
            elif s1 < s2 and f1 == f2:
                r = "finished_by"
            elif s1 > s2 and f1 == f2:
                r = "finishes"
            elif s1 < s2 and f1 > f2:
                r = "contains"
            elif s1 > s2 and f1 < f2:
                r = "during"
            elif s1 < s2 < f1 < f2:
                r = "overlaps"
            else:
                r = "other"
            counts[r] = counts.get(r, 0) + 1
    got = dict(zip(res["relation"], res["n_pairs"]))
    assert got == counts
    # 30-minute-gap sessionization with a 60s pad (< gap) implies every
    # adjacent pair is strictly 'before' — the sessionizer invariant
    assert set(got) == {"before"}
