"""Hybrid RRF fusion (extras/hybrid.py): serial equality + edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.hybrid import (
    cosine_scores_vs_anchors,
    hybrid_rrf,
    rank_by_rounded_score,
)


def test_rrf_fusion_matches_hand_computation():
    sparse = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [5, 7, 9], "rank": [0, 1, 2]}
    )
    dense = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [7, 11, 5], "rank": [0, 1, 2]}
    )
    out = hybrid_rrf(sparse, dense, k=60, top_k=10)
    got = {int(r.doc_id): float(r.rrf_score) for r in out.itertuples()}
    # doc 7: 1/61 + 1/60; doc 5: 1/60 + 1/62; doc 9: 1/62; doc 11: 1/61
    assert got[7] == round(1 / 61 + 1 / 60, 6)
    assert got[5] == round(1 / 60 + 1 / 62, 6)
    assert got[9] == round(1 / 62, 6)
    assert got[11] == round(1 / 61, 6)
    # fused order: 7 (highest) first
    assert out.iloc[0].doc_id == 7
    # ranks are dense 0..n-1 and ids stay int
    assert list(out["rank"]) == list(range(len(out)))
    assert out["doc_id"].dtype == np.int64


def test_rank_by_rounded_score_tie_break():
    rows = pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1],
            "doc_id": [9, 3, 5, 4],
            "score": [0.5000004, 0.5, 0.5, 0.2],
        }
    )
    r = rank_by_rounded_score(rows, k_each=3)
    # 0.5000004 rounds to 0.5: three-way tie broken by doc_id
    assert list(r.doc_id) == [3, 5, 9]
    assert list(r["rank"]) == [0, 1, 2]


def test_cosine_partial_topk_matches_full(ray_session):
    rng = np.random.default_rng(11)
    n, d = 400, 16
    mat = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat],
                                  pa.list_(pa.float32())),
        }
    )
    anchors = {0: mat[0].astype(np.float32).astype(np.float64),
               1: mat[1].astype(np.float32).astype(np.float64)}
    ds = rd.from_arrow(tbl).repartition(9)
    got = cosine_scores_vs_anchors(ds, anchors, k_each=25)
    ranks = rank_by_rounded_score(got, k_each=25)
    # serial reference over the float32-stored vectors
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-30)
    for qid, v in anchors.items():
        qn = np.asarray(v) / np.linalg.norm(v)
        sims = np.round((vecs @ qn) / norms, 6)
        order = np.lexsort((np.arange(n), -sims))
        want = list(order[:25])
        have = list(ranks[ranks.query_id == qid].doc_id)
        assert have == want, qid
