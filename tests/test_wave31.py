"""Semantic invariants for wave-31 operators (4-4-5 fiscal calendar,
quantization distortion, sparse-matmul 2-hop) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter
from datetime import date

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_fiscal_445_matches_python(spark):
    res = (
        _Q["fn_fiscal_445"](spark, SF_DIR)
        .toPandas()
        .set_index(["fiscal_year", "fiscal_quarter", "period_in_q"])
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    epoch = date(1995, 1, 1)
    agg: dict = {}
    for r in orders.itertuples():
        d = r.o_orderdate.date()
        dno = (d - epoch).days
        if dno < 0:
            continue
        fy = dno // 364
        wk = (dno % 364) // 7
        fq = wk // 13 + 1
        piq = 1 if wk % 13 < 4 else (2 if wk % 13 < 8 else 3)
        key = (fy, fq, piq)
        n, c = agg.get(key, (0, 0))
        agg[key] = (n + 1, c + math.floor(r.o_totalprice * 100))
    assert len(res) == len(agg)
    for key, (n, cents) in agg.items():
        row = res.loc[key]
        assert row["n_orders"] == n
        assert row["revenue"] == pytest.approx(cents / 100.0, abs=0.01)
    # every fiscal year exposes exactly 4 quarters x 3 periods once full
    counts = Counter(k[0] for k in agg)
    full_years = [y for y, c in counts.items() if c == 12]
    assert len(full_years) >= 5


def test_quantize_distortion_matches_numpy(spark):
    res = (
        _Q["embed_quantize_distortion"](spark, SF_DIR)
        .toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    for label, grp in emb.groupby("label"):
        sq = en = dims = 0
        for e in grp["embedding"]:
            v = np.asarray(e, dtype=np.float64)
            sc = np.abs(v).max() / 127.0
            rec = np.floor(v / sc) * sc
            sq += int(np.floor((v - rec) ** 2 * 1e12).sum())
            en += int(np.floor(v * v * 1e12).sum())
            dims += len(v)
        row = res.loc[label]
        assert row["n_vectors"] == len(grp)
        assert row["mse"] == pytest.approx(sq / 1e12 / dims, abs=1e-10)
        assert row["snr_db"] == pytest.approx(
            10 * math.log10(en / sq), abs=1e-3
        )
    # int8 symmetric quantization of N(0, 0.1) vectors: healthy SNR band
    assert res["snr_db"].between(20, 60).all()


def test_matmul_2hop_matches_python(spark):
    res = _Q["graph_matmul_2hop"](spark, SF_DIR).toPandas()
    # rebuild the 3-NN edge set exactly as tests/test_wave15 does
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 200].sort_values("vec_id")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.floor(v * v * 1e12).sum(axis=1) / 1e12
    ids = emb["vec_id"].to_numpy()
    edges = set()
    for i in range(len(ids)):
        sims = np.floor(v[i] * v * 1e12).sum(axis=1) / 1e12
        sims = sims / np.sqrt(norms[i] * norms)
        for j in sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[j], ids[j]),
        )[:3]:
            edges.add((ids[i], ids[j]))
            edges.add((ids[j], ids[i]))
    paths: Counter = Counter()
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for i in adj:
        for j in adj[i]:
            for k in adj.get(j, []):
                if k != i:
                    paths[(i, k)] += 1
    order = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.node_i, r.node_k) for r in res.itertuples()] == [
        p for p, _ in order
    ]
    for r in res.itertuples():
        assert r.paths == paths[(r.node_i, r.node_k)]
        assert r.direct_edge == int((r.node_i, r.node_k) in edges)
    # symmetric graph: A^2 top entries come in mirrored pairs
    pairs = {(r.node_i, r.node_k) for r in res.itertuples()}
    assert any((b, a) in pairs for a, b in pairs)
