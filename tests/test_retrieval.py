"""Semantic invariants for the retrieval-evaluation family — independent
numpy recomputation from the raw parquet (shares no algebra with either
the Spark plan or the DuckDB oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


@pytest.fixture(scope="module")
def emb():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = np.vstack(df["embedding"].values).astype(np.float64)
    order = np.argsort(df["vec_id"].values)
    return df["vec_id"].values[order], df["label"].values[order], vecs[order]


def _cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    return an @ bn.T


def test_precision_at_k_matches_numpy(spark, emb):
    ids, labels, vecs = emb
    res = _Q["sim_precision_at_k"](spark, SF_DIR).toPandas().set_index("label")
    sims = _cosine_matrix(vecs[:50], vecs[50:])
    p10 = {}
    for qi in range(50):
        # sort by (-sim, cid): mirror the operator's tie-break
        order = np.lexsort((ids[50:], -sims[qi]))[:10]
        hits = (labels[50:][order] == labels[qi]).sum()
        p10.setdefault(labels[qi], []).append(hits / 10)
    for lab, vals in p10.items():
        assert res.loc[lab, "n_queries"] == len(vals)
        assert res.loc[lab, "precision_at_10"] == pytest.approx(
            np.mean(vals), abs=1e-5
        )


def test_mrr_matches_numpy(spark, emb):
    ids, labels, vecs = emb
    row = _Q["sim_mrr"](spark, SF_DIR).toPandas().iloc[0]
    sims = _cosine_matrix(vecs[:50], vecs[50:])
    rr = []
    for qi in range(50):
        order = np.lexsort((ids[50:], -sims[qi]))
        first = int(np.argmax(labels[50:][order] == labels[qi])) + 1
        rr.append(1.0 / first)
    assert row["n_queries"] == 50
    assert row["mrr"] == pytest.approx(np.mean(rr), abs=1e-5)


def test_rrf_fusion_ranks(spark, emb):
    ids, labels, vecs = emb
    res = _Q["sim_rrf_fusion"](spark, SF_DIR).toPandas()
    assert len(res) == 10
    assert list(res["rank"]) == list(range(1, 11))
    # fused score recomputed from the emitted channel ranks
    expect = 1.0 / (60 + res["r_cos"]) + 1.0 / (60 + res["r_ham"])
    assert np.allclose(res["rrf"], expect.round(6))
    # top fused item must be top-ish in at least one channel
    assert min(res.iloc[0]["r_cos"], res.iloc[0]["r_ham"]) <= 10


def test_dim_variance_matches_numpy(spark, emb):
    _, _, vecs = emb
    res = _Q["embed_dim_variance"](spark, SF_DIR).toPandas()
    var = vecs.var(axis=0, ddof=1)
    top = np.argsort(-var)[:10]
    assert set(res["dim"]) == set(top.tolist())
    for _, r in res.iterrows():
        assert r["variance"] == pytest.approx(var[int(r["dim"])], rel=1e-4)
        assert r["mean"] == pytest.approx(vecs[:, int(r["dim"])].mean(), abs=1e-5)


def test_label_margin_matches_numpy(spark, emb):
    ids, labels, vecs = emb
    res = _Q["embed_label_margin"](spark, SF_DIR).toPandas().set_index("label")
    sims = _cosine_matrix(vecs, vecs)
    iu = np.triu_indices(len(vecs), 1)
    la, lb, s = labels[iu[0]], labels[iu[1]], sims[iu]
    for lab in np.unique(labels):
        intra = s[(la == lab) & (lb == lab)]
        inter = s[((la == lab) | (lb == lab)) & (la != lb)]
        assert res.loc[lab, "intra_mean"] == pytest.approx(intra.mean(), abs=1e-5)
        assert res.loc[lab, "inter_mean"] == pytest.approx(inter.mean(), abs=1e-5)
        assert res.loc[lab, "margin"] == pytest.approx(
            intra.mean() - inter.mean(), abs=1e-4
        )
