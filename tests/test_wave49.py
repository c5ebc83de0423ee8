"""Semantic invariants for wave-49 operators (lexical density, label
modularity) — independent python re-implementations on top of the
DuckDB hash gate."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_lexical_density_matches_python(spark):
    res = _Q["text_lexical_density"](spark, SF_DIR).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    allc: Counter = Counter()
    per_lang: dict[str, list] = {}
    for r in docs.itertuples():
        ts = [t for t in r.text.split(" ") if t]
        allc.update(ts)
        per_lang.setdefault(r.lang, []).append(ts)
    stop = {
        t
        for t, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    for lang, doclists in per_lang.items():
        toks = [t for ts in doclists for t in ts]
        stops = sum(1 for t in toks if t in stop)
        row = res.loc[lang]
        assert row["n_tokens"] == len(toks)
        assert row["stop_tokens"] == stops
        assert row["lexical_density"] == pytest.approx(
            1 - stops / len(toks), abs=1e-6
        )
    assert res["lexical_density"].between(0, 1).all()


def test_label_modularity_matches_python(spark):
    res = _Q["graph_label_modularity"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sub = emb[emb["vec_id"] < 200].sort_values("vec_id")
    v = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
    norms = np.floor(v * v * 1e12).sum(axis=1) / 1e12
    ids = sub["vec_id"].to_numpy()
    labels = dict(zip(sub["vec_id"], sub["label"]))
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
    m2 = len(edges)
    within = sum(1 for a, b in edges if labels[a] == labels[b])
    dc: Counter = Counter(labels[a] for a, _ in edges)
    expected = sum(d * d for d in dc.values()) / (m2 * m2)
    q = within / m2 - expected
    assert res["n_directed_edges"] == m2
    assert res["within_class_frac"] == pytest.approx(within / m2, abs=1e-6)
    assert res["expected_frac"] == pytest.approx(expected, abs=1e-6)
    assert res["modularity"] == pytest.approx(q, abs=1e-5)
    # isotropic embeddings: labels do not cluster in the kNN graph
    assert abs(res["modularity"]) < 0.15
