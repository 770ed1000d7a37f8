"""Hybrid sparse + dense retrieval with Reciprocal Rank Fusion.

The reference ships BOTH a lexical engine (SPIMI BM25/TF-IDF,
``app/InvertedIndexFinal.py``) and a vector engine
(``app/MultiDim.py``); a production retrieval stack fuses them.
``hybrid_rrf`` implements the standard RRF combination
(Cormack/Clarke/Buettcher 2009): each retriever contributes
``1 / (k + rank)`` for every document it ranks, contributions sum, and
documents re-rank by the fused score.

Scale shape: both input rank lists come from DISTRIBUTED retrievers —
``distributed_query.bulk_search`` (one streaming pass over index
segments) and the brute/IVF KNN paths (partial top-k per batch) — and
are OUTPUT-sized (k_each rows per query). The fusion itself is driver
arithmetic over those tiny lists; nothing corpus-sized leaves the
workers.

Determinism contract (what lets the contract entry hash-match a DuckDB
oracle): ranks on both sides are positions under (round(score, 6)
DESC, id ASC) — the same overfetch-then-re-rank shim the BM25 contract
uses — and the fused score is the two-term IEEE sum
``1/(k + sparse_rank) + 1/(k + dense_rank)`` in that fixed order, so no
rounding is needed before the final ordering."""

from __future__ import annotations

import numpy as np
import pandas as pd

RRF_K = 60


def rank_by_rounded_score(
    rows: pd.DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    k_each: int = 20,
    dp: int = 6,
) -> pd.DataFrame:
    """(query, id, rank) with rank = position under
    (round(score, dp) DESC, id ASC) within each query, keeping
    rank < k_each. Input should OVERFETCH (e.g. top-50 for k_each=20)
    so sub-ulp engine differences at the fetch boundary cannot reach
    the kept ranks."""
    r = rows[[query_col, id_col, score_col]].copy()
    r[score_col] = r[score_col].round(dp)
    r = r.sort_values(
        [query_col, score_col, id_col], ascending=[True, False, True]
    )
    r["rank"] = r.groupby(query_col).cumcount()
    return r[r["rank"] < k_each][[query_col, id_col, "rank"]].reset_index(
        drop=True
    )


def hybrid_rrf(
    sparse_ranks: pd.DataFrame,
    dense_ranks: pd.DataFrame,
    *,
    k: int = RRF_K,
    top_k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Fuse two (query, id, rank) lists into
    (query_id, rank, doc_id, rrf_score).

    rrf = 1/(k + sparse_rank) + 1/(k + dense_rank), with a missing side
    contributing 0 — computed sparse-term-first so the float sum is
    bit-identical to ``coalesce(...) + coalesce(...)`` in SQL. Final
    order: (rrf DESC, doc_id ASC); rrf_score rounded to 6dp for
    display/hashing only."""
    merged = sparse_ranks.merge(
        dense_ranks,
        on=[query_col, id_col],
        how="outer",
        suffixes=("_s", "_d"),
    )
    rs = merged["rank_s"].to_numpy(dtype=np.float64)
    rd_ = merged["rank_d"].to_numpy(dtype=np.float64)
    contrib_s = np.where(np.isnan(rs), 0.0, 1.0 / (k + rs))
    contrib_d = np.where(np.isnan(rd_), 0.0, 1.0 / (k + rd_))
    merged["rrf"] = contrib_s + contrib_d
    merged = merged.sort_values(
        [query_col, "rrf", id_col], ascending=[True, False, True]
    )
    merged["rank"] = merged.groupby(query_col).cumcount()
    out = merged[merged["rank"] < top_k].copy()
    out["rrf_score"] = out["rrf"].round(6)
    return out[[query_col, "rank", id_col, "rrf_score"]].reset_index(drop=True)


def cosine_scores_vs_anchors(
    embeddings, anchors: dict[int, np.ndarray], *, k_each: int = 50
) -> pd.DataFrame:
    """(query_id, doc_id, score) = float64 cosine of each anchor vector
    against the embedding table, computed distributed with the exact
    float op order of the ``knn_cosine`` contract path
    (``(vecs @ unit_anchor) / row_norms``).

    Each batch ships only its per-query partial top ``k_each`` (the
    global top-k_each is a subset of the per-batch tops), so the driver
    sees n_batches x n_queries x k_each rows — output-sized, never the
    corpus.

    ``embeddings``: a Ray Dataset with (vec_id, embedding);
    ``anchors``: {query_id: raw anchor vector}."""
    import pyarrow as pa

    units = {
        qid: np.asarray(v, dtype=np.float64)
        / np.linalg.norm(np.asarray(v, dtype=np.float64))
        for qid, v in anchors.items()
    }

    def score(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-30)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        qids, ids, scores = [], [], []
        for qid, qn in units.items():
            sims = (vecs @ qn) / norms
            if sims.size > k_each:
                keep = np.argpartition(-sims, k_each - 1)[:k_each]
            else:
                keep = np.arange(sims.size)
            qids.append(np.full(keep.size, qid, dtype=np.int64))
            ids.append(vec_ids[keep])
            scores.append(sims[keep])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids), pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "score": pa.array(np.concatenate(scores), pa.float64()),
            }
        )

    return embeddings.map_batches(score, batch_format="pyarrow").to_pandas()
