"""Semantic invariants for wave-77 operators (BPE merge step, SAX
motifs, histogram gradient boosting) — independent python re-derivations
using the sequential/textbook form of each algorithm."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bpe_merges_matches_python(spark):
    out = _Q["text_bpe_merges"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    wordfreq = Counter()
    for text in docs["text"]:
        for w in text.strip().split(" "):
            if w:
                wordfreq[w] += 1
    totals, support = Counter(), defaultdict(set)
    for w, f in wordfreq.items():
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            totals[pair] += f
            support[pair].add(w)
    expected = sorted(
        ((p, c, len(support[p])) for p, c in totals.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = list(out.itertuples(index=False, name=None))
    assert got == expected


def test_sax_motifs_matches_python(spark):
    out = _Q["ts_sax_motifs"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (orders["o_totalprice"] * 100.0).map(math.floor).astype("int64")
    days = pd.to_datetime(orders["o_orderdate"]).dt.date
    daily = (
        pd.DataFrame({"day": days, "c": cents})
        .groupby("day", as_index=False)["c"].sum()
    )
    epoch = pd.Timestamp("1992-01-01").date()
    segs = defaultdict(lambda: [0, 0])  # (win, seg) -> [sum, n_days]
    for day, c in zip(daily["day"], daily["c"]):
        i = (day - epoch).days
        key = (i // 8, (i % 8) // 2)
        segs[key][0] += int(c)
        segs[key][1] += 1
    win_days = Counter()
    for (w, s), (v, nd) in segs.items():
        win_days[w] += nd
    full = {w for w, nd in win_days.items() if nd == 8}
    ranked = sorted(
        ((v, w, s) for (w, s), (v, _) in segs.items() if w in full)
    )
    q = {}
    n = len(ranked)
    for pos, (v, w, s) in enumerate(ranked):
        # NTILE(4) bucket for 1-based rank pos+1 over n rows
        size, rem = divmod(n, 4)
        r = pos
        tile = 1
        while True:
            chunk = size + (1 if tile <= rem else 0)
            if r < chunk:
                break
            r -= chunk
            tile += 1
        q[(w, s)] = tile
    words = Counter()
    firsts, lasts = {}, {}
    for w in full:
        word = "".join(chr(96 + q[(w, s)]) for s in range(4))
        words[word] += 1
        firsts[word] = min(firsts.get(word, w), w)
        lasts[word] = max(lasts.get(word, w), w)
    expected = sorted(
        (
            (
                word,
                c,
                str(epoch + pd.Timedelta(days=8 * firsts[word])),
                str(epoch + pd.Timedelta(days=8 * lasts[word])),
            )
            for word, c in words.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:15]
    got = list(out.itertuples(index=False, name=None))
    assert got == expected


def test_gradient_boost_stumps_matches_sequential_python(spark):
    out = _Q["ml_gradient_boost_stumps"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    cents = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64")
    g = (
        pd.DataFrame({"x": li["l_quantity"].astype("int64"), "sy": cents})
        .groupby("x")
        .agg(n=("sy", "size"), sy=("sy", "sum"))
        .sort_index()
    )
    xs = list(g.index)
    n = {x: int(g.loc[x, "n"]) for x in xs}
    sy = {x: int(g.loc[x, "sy"]) for x in xs}
    nn, syy = sum(n.values()), sum(sy.values())
    pred = {x: math.floor(syy / nn) for x in xs}
    expected = []
    for r in (1, 2, 3):
        rs = {x: sy[x] - n[x] * pred[x] for x in xs}
        rst = sum(rs.values())
        best = None
        cn = crs = 0
        for x in xs[:-1]:
            cn += n[x]
            crs += rs[x]
            gain = (float(crs) * crs) / cn + (
                float(rst - crs) * (rst - crs)
            ) / (nn - cn)
            if best is None or gain > best[0]:
                best = (gain, x, cn, crs)
        gain, s, cnl, crsl = best
        vl = math.floor(crsl / (2.0 * cnl))
        vr = math.floor((rst - crsl) / (2.0 * (nn - cnl)))
        expected.append(
            (
                r,
                s,
                cnl,
                nn - cnl,
                round(vl / 100.0, 2),
                round(vr / 100.0, 2),
                round(gain / 10000.0, 2),
            )
        )
        for x in xs:
            pred[x] += vl if x <= s else vr
    got = list(out.itertuples(index=False, name=None))
    assert got == expected
    # boosting must keep choosing informative splits: gains positive
    assert all(row[6] > 0 for row in expected)
