"""Semantic invariants for wave-63 operators (Dunning LLR collocations,
Heaps'-law fit, Zipf fit) — independent python re-derivations."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _tokens():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values("doc_id")
    return [
        (did, [t for t in txt.strip().split(" ") if t])
        for did, txt in zip(docs["doc_id"], docs["text"])
    ]


def test_llr_matches_python(spark):
    res = _Q["text_collocation_llr"](spark, SF_DIR).toPandas()
    bi = Counter()
    for _, toks in _tokens():
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    n = sum(bi.values())
    cf, cs = Counter(), Counter()
    for (a, b), k in bi.items():
        cf[a] += k
        cs[b] += k

    def llr(a, b):
        k11 = bi[(a, b)]
        r1, c1 = cf[a], cs[b]
        k12, k21 = r1 - k11, c1 - k11
        k22 = n - r1 - c1 + k11
        out = 0.0
        for k, rr, cc in (
            (k11, r1, c1),
            (k12, r1, n - c1),
            (k21, n - r1, c1),
            (k22, n - r1, n - c1),
        ):
            if k > 0:
                out += k * math.log(k * n / (float(rr) * cc))
        return 2.0 * out

    cand = sorted(
        ((round(llr(a, b), 4), a, b, k) for (a, b), k in bi.items() if k >= 25),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    assert list(res["llr"]) == pytest.approx([c[0] for c in cand], abs=2e-4)
    assert list(zip(res["w1"], res["w2"])) == [(c[1], c[2]) for c in cand]
    assert list(res["n_pair"]) == [c[3] for c in cand]
    # LLR is a likelihood-ratio statistic: non-negative
    assert (res["llr"] >= 0).all()


def _ols(xs, ys):
    x, y = np.log(np.asarray(xs, float)), np.log(np.asarray(ys, float))
    n = len(x)
    sx, sy, sxy, sxx, syy = x.sum(), y.sum(), (x * y).sum(), (x * x).sum(), (y * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    coef = math.exp(sy / n - slope * sx / n)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return n, slope, coef, r2


def test_heaps_fit_matches_python(spark):
    res = _Q["text_heaps_fit"](spark, SF_DIR).toPandas().iloc[0]
    seen, cum_tok, xs, ys = set(), 0, [], []
    for _, toks in _tokens():
        cum_tok += len(toks)
        seen.update(toks)
        if cum_tok > 0:
            xs.append(cum_tok)
            ys.append(len(seen))
    n, slope, coef, r2 = _ols(xs, ys)
    assert res["n_points"] == n
    assert res["slope"] == pytest.approx(slope, abs=1e-4)
    assert res["coef"] == pytest.approx(coef, rel=1e-3)
    assert res["r2"] == pytest.approx(r2, abs=1e-4)
    # Heaps beta: sublinear growth. The synthetic corpus draws from a
    # finite generator vocabulary, so V(n) saturates early and the
    # global fit's r2 is legitimately low — only bound its range.
    assert 0.0 < res["slope"] < 1.0
    assert 0.0 <= res["r2"] <= 1.0


def test_zipf_fit_matches_python(spark):
    res = _Q["text_zipf_fit"](spark, SF_DIR).toPandas().iloc[0]
    uni = Counter()
    for _, toks in _tokens():
        uni.update(toks)
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    xs = list(range(1, len(ranked) + 1))
    ys = [c for _, c in ranked]
    n, slope, coef, r2 = _ols(xs, ys)
    assert res["n_points"] == n
    assert res["slope"] == pytest.approx(slope, abs=1e-4)
    assert res["coef"] == pytest.approx(coef, rel=1e-3)
    assert res["r2"] == pytest.approx(r2, abs=1e-4)
    # Zipf slope is negative (frequency decays with rank)
    assert res["slope"] < 0
