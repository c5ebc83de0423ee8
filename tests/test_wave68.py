"""Semantic invariants for wave-68 operators (MAP@10, trigram
similarity, SCD2 interval audit) — independent pandas re-derivations."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _quantized_cosine(M):
    def sqn(v):
        return np.floor(v * v * 1e12).astype("int64").sum() / 1e12

    norms = np.array([sqn(r) for r in M])
    return norms


def test_map_at_k_matches_numpy(spark):
    res = _Q["sim_map_at_k"](spark, SF_DIR).toPandas().set_index("label")
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    qmask, cmask = ids < 50, ids >= 50
    by_label = defaultdict(list)
    cn = np.array(
        [np.floor(r * r * 1e12).astype("int64").sum() / 1e12 for r in M]
    )
    for qi in np.where(qmask)[0]:
        dots = np.array(
            [
                np.floor(M[qi] * M[ci] * 1e12).astype("int64").sum() / 1e12
                for ci in np.where(cmask)[0]
            ]
        )
        sims = dots / np.sqrt(cn[qi] * cn[cmask])
        cids = ids[cmask]
        order = np.lexsort((cids, -sims))
        ranked_labels = labels[cmask][order]
        n_rel = int((ranked_labels == labels[qi]).sum())
        hits = np.where(ranked_labels[:10] == labels[qi])[0]
        if len(hits) == 0:
            continue
        terms = sum(
            math.floor((i + 1) / (pos + 1) * 1e9)
            for i, pos in enumerate(hits)
        )
        ap = math.floor(terms / 1e9 / min(n_rel, 10) * 1e9)
        by_label[labels[qi]].append(ap)
    for lbl, aps in by_label.items():
        row = res.loc[lbl]
        assert row["n_queries_with_hits"] == len(aps)
        assert row["map_at_10"] == pytest.approx(
            round(sum(aps) / len(aps) / 1e9, 6), abs=2e-6
        )
    # MAP is a [0,1] metric and never exceeds precision@k's ceiling
    assert res["map_at_10"].between(0, 1).all()


def _trigrams(s: str) -> set[str]:
    s = s.lower()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def test_trigram_similarity_matches_python(spark):
    res = _Q["fn_trigram_similarity"](spark, SF_DIR).toPandas()
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    rows = []
    by_brand = defaultdict(list)
    for k, brand, name in zip(
        part["p_partkey"], part["p_brand"], part["p_name"]
    ):
        by_brand[brand].append((k, name))
    # brute force within brand: the PPJoin prefix filter is lossless,
    # so the engine's result must equal the unfiltered join's top-20
    for brand, items in by_brand.items():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ka, na), (kb, nb) = items[i], items[j]
                ta, tb = _trigrams(na), _trigrams(nb)
                inter = len(ta & tb)
                sim = inter / (len(ta) + len(tb) - inter)
                if sim >= 0.8:
                    rows.append((round(sim, 6), ka, kb, brand, inter))
    top = sorted(rows, key=lambda t: (-t[0], t[1], t[2]))[:20]
    assert list(zip(res["part_a"], res["part_b"])) == [
        (t[1], t[2]) for t in top
    ]
    assert list(res["trigram_sim"]) == pytest.approx([t[0] for t in top])
    assert list(res["n_shared"]) == [t[4] for t in top]


def test_scd2_audit_matches_pandas(spark):
    res = _Q["dq_scd2_audit"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    p = ev[ev["event_type"] == "purchase"]
    counts = p.groupby("user_id").size()
    assert res["n_keys"] == len(counts)
    assert res["n_versions"] == int(counts.sum())
    assert res["max_versions_per_key"] == int(counts.max())
    # a LEAD-closed history is structurally sound
    assert res["keys_bad_current"] == 0
    assert res["n_overlaps"] == 0
    assert res["n_gaps"] == 0
    durs = []
    for _, g in p.groupby("user_id"):
        ts = sorted(
            int(t.timestamp()) for t in g.sort_values(["ts", "event_id"])["ts"]
        )
        durs.extend(b - a for a, b in zip(ts, ts[1:]))
    assert res["avg_version_duration_s"] == pytest.approx(
        round(sum(durs) / len(durs), 2)
    )
