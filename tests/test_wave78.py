"""Semantic invariants for wave-78 operators (Cramér–von Mises,
mutual information, IVF recall curve) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_cvm_matches_python_rank_form(spark):
    res = _Q["stats_cvm_test"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    cents = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64")
    is_x = (li["l_returnflag"] == "R").astype(int)
    df = pd.DataFrame({"v": cents, "x": is_x}).sort_values(["v", "x"])
    # pooled ranks under the deterministic (value, sample) tie order:
    # stable sort puts x=0 before x=1 within a value, matching the
    # operator's grouped construction
    df = df.reset_index(drop=True)
    df["r"] = np.arange(1, len(df) + 1)
    xr = df[df["x"] == 1]["r"].to_numpy()
    yr = df[df["x"] == 0]["r"].to_numpy()
    n, m = len(xr), len(yr)
    sx = int(((xr - np.arange(1, n + 1)) ** 2).sum())
    sy = int(((yr - np.arange(1, m + 1)) ** 2).sum())
    u = n * sx + m * sy
    t = u / (float(n) * m * (n + m)) - (4.0 * n * m - 1.0) / (
        6.0 * (n + m)
    )
    assert res["n_x"] == n and res["n_y"] == m
    assert res["t_stat"] == pytest.approx(round(t, 6), abs=2e-6)
    assert res["t_expected_h0"] == pytest.approx(
        round(1.0 / 6.0 + 1.0 / (6.0 * (n + m)), 6)
    )


def test_mutual_info_matches_python(spark):
    res = _Q["profile_mutual_info"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus"],
    )
    cells = Counter(zip(li["l_returnflag"], li["l_linestatus"]))
    rx = Counter(li["l_returnflag"])
    ry = Counter(li["l_linestatus"])
    n = len(li)
    mi = sum(
        c * math.log(c * n / (rx[a] * ry[b]))
        for (a, b), c in cells.items()
    ) / n
    hx = -sum(c * math.log(c / n) for c in rx.values()) / n
    hy = -sum(c * math.log(c / n) for c in ry.values()) / n
    assert res["n_rows"] == n
    assert res["n_cells"] == len(cells)
    assert res["mi_nats"] == pytest.approx(mi, abs=1e-5)
    assert res["h_returnflag"] == pytest.approx(hx, abs=1e-5)
    assert res["h_linestatus"] == pytest.approx(hy, abs=1e-5)
    assert res["nmi"] == pytest.approx(mi / min(hx, hy), abs=1e-4)
    # information inequalities: 0 <= MI <= min(H)
    assert 0.0 <= res["nmi"] <= 1.0


def test_ivf_recall_curve_matches_numpy(spark):
    out = _Q["sim_ivf_recall_curve"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    vecs = np.stack(
        [np.floor(np.asarray(v, dtype=np.float64) * 1e6) for v in emb["embedding"]]
    )
    labels = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    qmask, cmask = ids < 50, ids >= 50
    qv, cv = vecs[qmask], vecs[cmask]
    clab, cid = labels[cmask], ids[cmask]
    # exact truth: quantized cosine, (sim desc, cid) order
    sims = (qv @ cv.T) / (
        np.sqrt((qv**2).sum(1))[:, None] * np.sqrt((cv**2).sum(1))[None, :]
    )
    truth_labels = []
    for qi in range(qv.shape[0]):
        order = sorted(
            range(cv.shape[0]), key=lambda j: (-sims[qi, j], cid[j])
        )[:10]
        truth_labels.append([clab[j] for j in order])
    # centroids: per-(label, dim) floor(mean of quantized comps)
    cells = sorted(set(clab))
    cent = np.stack(
        [np.floor(cv[clab == L].mean(axis=0)) for L in cells]
    )
    csim = (qv @ cent.T) / (
        np.sqrt((qv**2).sum(1))[:, None]
        * np.sqrt((cent**2).sum(1))[None, :]
    )
    sizes = {L: int((clab == L).sum()) for L in cells}
    n_q, n_c = qv.shape[0], cv.shape[0]
    for _, row in out.iterrows():
        npb = int(row["nprobe"])
        hits = scanned = 0
        for qi in range(n_q):
            ranked = sorted(cells, key=lambda L: (-csim[qi, cells.index(L)], L))
            probed = set(ranked[:npb])
            hits += sum(1 for L in truth_labels[qi] if L in probed)
            scanned += sum(sizes[L] for L in probed)
        assert row["mean_recall_at_10"] == pytest.approx(
            round(hits / (10.0 * n_q), 6)
        )
        assert row["mean_scan_frac"] == pytest.approx(
            round(scanned / (float(n_q) * n_c), 6)
        )
    # the curve must be monotone in nprobe and reach high recall at 8
    r = out.sort_values("nprobe")["mean_recall_at_10"].to_numpy()
    assert (np.diff(r) >= 0).all() and r[-1] >= 0.5
