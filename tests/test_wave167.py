"""Semantic invariants for wave 167 (SemDeDup semantic dedup, DSIR
importance weights, watermark greenlist detection) against independent
numpy/pandas/hashlib re-derivations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _md5_int(s: str, nhex: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def test_dedup_semantic_matches_numpy(spark):
    res = (
        _Q["dedup_semantic"](spark, SF_DIR).toPandas().set_index("label")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    removed = set()
    for lbl, grp in emb.groupby("label"):
        grp = grp.sort_values("vec_id")
        ids = grp.vec_id.to_numpy()
        m = np.array(list(grp.embedding), dtype=np.float64)
        norm = np.linalg.norm(m, axis=1)
        sim = (m @ m.T) / np.outer(norm, norm)
        for bi in range(len(ids)):
            for ai in range(bi):
                if round(sim[ai, bi], 4) >= 0.4:
                    removed.add(int(ids[bi]))
                    break
    for lbl, grp in emb.groupby("label"):
        n = len(grp)
        nrem = sum(1 for v in grp.vec_id if int(v) in removed)
        assert res.loc[lbl].n_vecs == n
        assert res.loc[lbl].n_removed == nrem
        assert res.loc[lbl].retention == pytest.approx(
            1 - nrem / n, abs=1e-4
        )


def _bigrams(text: str):
    w = text.split(" ")
    return [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]


def test_dsir_weights_match_reference(spark):
    res = (
        _Q["pipeline_dsir_weights"](spark, SF_DIR)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    raw = np.zeros(256, dtype=np.int64)
    tgt = np.zeros(256, dtype=np.int64)
    feats = []
    for row in docs.itertuples():
        counts = {}
        for bg in _bigrams(row.text):
            b = _md5_int(bg, 4) % 256
            counts[b] = counts.get(b, 0) + 1
            raw[b] += 1
            if row.lang == "en":
                tgt[b] += 1
        feats.append((row.source, counts))
    lam = np.log((tgt + 1.0) / (tgt.sum() + 256.0)) - np.log(
        (raw + 1.0) / (raw.sum() + 256.0)
    )
    per_source = {}
    for src, counts in feats:
        w = sum(c * lam[b] for b, c in counts.items())
        per_source.setdefault(src, []).append(w)
    for src, ws in per_source.items():
        assert res.loc[src].n_docs == len(ws)
        assert res.loc[src].avg_weight == pytest.approx(
            sum(ws) / len(ws), abs=1e-4
        )
        assert res.loc[src].pct_toward_target == pytest.approx(
            sum(1 for w in ws if w > 0) / len(ws), abs=1e-4
        )


def test_watermark_greenlist_matches_reference(spark):
    res = (
        _Q["text_watermark_greenlist"](spark, SF_DIR)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["text", "source"]
    )
    per_source = {}
    for row in docs.itertuples():
        w = row.text.split(" ")
        n = len(w) - 1
        if n < 10:
            continue
        g = sum(
            1
            for i in range(n)
            if _md5_int(f"{w[i]}|{w[i+1]}", 8) % 2 == 0
        )
        z = (2.0 * g - n) / math.sqrt(n)
        per_source.setdefault(row.source, []).append(z)
    for src, zs in per_source.items():
        assert res.loc[src].n_docs == len(zs)
        assert res.loc[src].mean_z == pytest.approx(
            sum(zs) / len(zs), abs=1e-3
        )
        assert res.loc[src].max_z == pytest.approx(max(zs), abs=1e-3)
        assert res.loc[src].n_flagged == sum(1 for z in zs if z > 2.0)
    # clean corpus: the detector must NOT fire systematically
    assert abs(res.mean_z.mean()) < 0.5


def test_dedup_semantic_zero_vector_clones(spark, tmp_path):
    """Adversarial fixture the sf tables can't provide: duplicate
    all-zero embeddings. cos(0, 0) is NaN, so the oracle's row-level
    rule removes NONE of them — the clone-collapse expansion must
    exclude zero-norm groups from its cnt-1 term (round-7 ADVICE #2).
    Differential against the registered DuckDB oracle on the same
    synthetic table, plus the exact expected counts."""
    import duckdb

    from hive_processor_spark import oracles

    rows = []
    # label 0: three identical zero vectors + one pair of near-dup
    # non-zero vectors -> removed must be exactly 1 (vec 4), not 3.
    for vid in range(3):
        rows.append((vid, np.zeros(4, dtype=np.float32), 0))
    rows.append((3, np.array([1, 0, 0, 0], dtype=np.float32), 0))
    rows.append((4, np.array([0.99, 0.01, 0, 0], dtype=np.float32), 0))
    # label 1: two clones of one non-zero value -> removed = 1.
    rows.append((5, np.array([0, 1, 0, 0], dtype=np.float32), 1))
    rows.append((6, np.array([0, 1, 0, 0], dtype=np.float32), 1))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["label"] = pdf["label"].astype("int32")
    d = tmp_path / "synth"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")

    res = (
        _Q["dedup_semantic"](spark, str(d))
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    assert res.loc[0].n_vecs == 5 and res.loc[0].n_removed == 1
    assert res.loc[1].n_vecs == 2 and res.loc[1].n_removed == 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    ora = (
        con.execute(oracles()["dedup_semantic"])
        .df()
        .set_index("label")
        .sort_index()
    )
    assert list(res.n_vecs) == list(ora.n_vecs)
    assert list(res.n_removed) == list(ora.n_removed)
    assert list(res.retention) == pytest.approx(list(ora.retention))
