"""Semantic invariants for wave-76 operators (portable HLL, closed-form
CUSUM, minimax isotonic calibration) — independent python re-derivations
that use the SEQUENTIAL/classic form of each algorithm, so the
closed-form DataFrame plans are checked against the textbook recursions
they replace."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hll_portable_matches_python_registers(spark):
    res = _Q["sketch_hll_portable"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey"])
    keys = set(li["l_partkey"].tolist())
    m, wbits = 512, 51
    regs = {}
    for key in keys:
        h60 = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
        b, w = h60 % m, h60 // m
        rho = (wbits + 1) if w == 0 else (wbits - w.bit_length() + 1)
        regs[b] = max(regs.get(b, 0), rho)
    z_int = sum(1 << (wbits + 1 - r) for r in regs.values())
    z_int += (m - len(regs)) * (1 << (wbits + 1))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(2 ** (wbits + 1)) / z_int
    v = m - len(regs)
    if raw <= 2.5 * m and v > 0:
        est, regime = m * math.log(m / v), "linear"
    else:
        est, regime = raw, "raw"
    assert res["n_exact"] == len(keys)
    assert res["occupied"] == len(regs)
    assert res["v_zero"] == v
    assert res["regime"] == regime
    assert res["hll_raw"] == pytest.approx(round(raw, 2))
    assert res["hll_estimate"] == pytest.approx(round(est, 2))
    # the point of a 512-register HLL: ~4.6% standard error
    assert res["rel_err_pct"] < 15.0


def test_cusum_closed_form_equals_sequential_recursion(spark):
    out = _Q["spc_cusum"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (orders["o_totalprice"] * 100.0).map(math.floor).astype("int64")
    daily = (
        pd.DataFrame({"day": pd.to_datetime(orders["o_orderdate"]).dt.date,
                      "c": cents})
        .groupby("day", as_index=False)["c"].sum()
        .sort_values("day")
    )
    base = daily[pd.to_datetime(daily["day"]).dt.year == 1995]
    a, t = len(base), int(base["c"].sum())
    s_abs = int((a * base["c"] - t).abs().sum())
    mon = daily[pd.to_datetime(daily["day"]).dt.year >= 1996]
    su = sd = 0
    expected = []
    for _, row in mon.iterrows():
        dev = a * int(row["c"]) - t
        su = max(0, su + 2 * a * dev - s_abs)
        sd = max(0, sd - 2 * a * dev - s_abs)
        scale = 2.0 * a * a * 100.0
        for side, stat in (("high", su), ("low", sd)):
            if stat > 8 * s_abs:
                expected.append(
                    (str(row["day"]), side, round(stat / scale, 2))
                )
    got = list(
        out[["day", "side", "cusum_stat"]].itertuples(index=False, name=None)
    )
    assert got == expected
    assert (out["threshold_stat"] > 0).all()


def test_isotonic_minimax_equals_pava(spark):
    out = _Q["ml_isotonic_calibration"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["text", "n_chars"]
    )
    rows = []
    for text, n_chars in zip(docs["text"], docs["n_chars"]):
        n_tok = len([w for w in text.strip().split(" ") if w])
        if n_tok == 0:
            continue
        z = -3.0 + 0.9 * math.log(1.0 + n_tok) - 0.2 * (n_chars / n_tok)
        p = round(1.0 / (1.0 + math.exp(-z)), 4)
        rows.append((min(49, math.floor(p * 50.0)), int(n_chars >= 250)))
    df = pd.DataFrame(rows, columns=["b", "y"])
    g = df.groupby("b").agg(n=("y", "size"), wy=("y", "sum")).reset_index()
    g = g.sort_values("b")
    # classic sequential PAVA on (weight, mean) blocks
    blocks = [
        [int(r.n), r.wy / r.n, [r.b]] for r in g.itertuples(index=False)
    ]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] > blocks[i + 1][1] + 1e-15:
            w1, m1, bs1 = blocks[i]
            w2, m2, bs2 = blocks[i + 1]
            blocks[i : i + 2] = [
                [w1 + w2, (w1 * m1 + w2 * m2) / (w1 + w2), bs1 + bs2]
            ]
            i = max(0, i - 1)
        else:
            i += 1
    pava = {}
    for w_, mean, bs in blocks:
        for b in bs:
            pava[b] = mean
    assert list(out["bucket"]) == list(g["b"])
    for b, iso in zip(out["bucket"], out["iso_rate"]):
        assert iso == pytest.approx(round(pava[b], 6), abs=2e-6)
    # monotone nondecreasing and mean-preserving
    assert (out["iso_rate"].diff().dropna() >= -1e-12).all()
    assert (out["n"] * out["iso_rate"]).sum() == pytest.approx(
        df["y"].sum(), rel=1e-4
    )
