"""Similarity search over an embedding column (stretch path of the
reference's Part 2 KNN backends, ``app/MultiDim.py:68-166``).

- ``brute_force_topk``: exact cosine top-k. The query matrix is
  broadcast ONCE via ``ray.put`` and read in every map_batches task
  (never re-shipped per batch); each batch does one numpy matmul and
  keeps only its partial top-k, so the driver merge sees
  num_blocks x k rows — the distributed form of the reference's
  bounded-heap sequential scan (``app/MultiDim.py:73-87``).
- ``lsh_topk``: random-hyperplane LSH variant — the scale path: bucket
  by sign-pattern, search only matching buckets. Recall < 1 by design;
  partitioning assumption: queries and corpus share the same projection
  matrix (fixed seed).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _as_matrix(batch_col) -> np.ndarray:
    return np.asarray(batch_col.to_pylist(), dtype=np.float32)


def brute_force_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> list[list[tuple[int, float]]]:
    """Exact top-k for each query row; returns per-query
    [(vec_id, score)] sorted by (-score, vec_id)."""
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if metric == "cosine":
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    else:
        qn = q
    q_ref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _as_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if metric == "cosine":
            norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
            sims = (vecs / norms) @ qm.T  # (n, nq)
        else:
            sims = -np.sqrt(
                np.maximum(
                    (vecs**2).sum(1)[:, None] - 2 * vecs @ qm.T + (qm**2).sum(1)[None, :],
                    0.0,
                )
            )
        kk = min(k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(ids[top].tolist())
            out_s.extend(col[top].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = embeddings.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    results: list[list[tuple[int, float]]] = []
    for j in range(qn.shape[0]):
        sub = partials[partials["query_id"] == j]
        best = heapq.nsmallest(
            k, zip(sub["score"], sub["vec_id"]), key=lambda t: (-t[0], t[1])
        )
        results.append([(int(v), float(s)) for s, v in best])
    return results


def lsh_topk(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_planes: int = 12,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, float]]]:
    """Approximate cosine top-k: random-hyperplane bucket then exact
    rerank within the query's bucket (fallback to brute force when the
    bucket is empty)."""
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    planes_ref = ray.put(planes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = _as_matrix(batch.column(vec_col))
        signs = (vecs @ pl) > 0
        buckets = (signs @ (1 << np.arange(n_planes))).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "bucket": pa.array(buckets, type=pa.int64()),
            }
        )

    bucketed = embeddings.map_batches(add_bucket, batch_format="pyarrow")
    q_signs = (q @ planes) > 0
    q_buckets = (q_signs @ (1 << np.arange(n_planes))).astype(np.int64)
    wanted = set(int(x) for x in q_buckets)
    in_buckets = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("bucket"), value_set=pa.array(sorted(wanted)))
        ),
        batch_format="pyarrow",
    )
    sub = in_buckets.to_pandas()
    results = []
    for j in range(q.shape[0]):
        cand = sub[sub["bucket"] == int(q_buckets[j])]
        if len(cand) == 0:
            results.append(brute_force_topk(embeddings, q[j], k,
                                            id_col=id_col, vec_col=vec_col)[0])
            continue
        vecs = np.asarray(cand[vec_col].tolist(), dtype=np.float32)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        qv = q[j] / max(float(np.linalg.norm(q[j])), 1e-30)
        sims = vn @ qv
        ids = cand[id_col].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        results.append([(int(ids[i]), float(sims[i])) for i in order])
    return results


def embedding_near_dups(
    embeddings: rd.Dataset,
    threshold: float = 0.45,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    The whole normalized matrix is broadcast once via ``ray.put``; each
    batch computes its block of the similarity matrix (one matmul) and
    emits only pairs above threshold — a blockwise self-join. Scale
    path: replace the broadcast side with LSH buckets (``lsh_topk``'s
    hyperplane signatures) so only same-bucket blocks multiply.
    """
    full = embeddings.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    mat = np.asarray(full[vec_col].tolist(), dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids_all)

    def block_pairs(batch: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        all_ids = ray.get(ids_ref)
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = vecs @ m.T
        rows_a, rows_b, rows_s = [], [], []
        for i in range(ids.size):
            mask = sims[i] >= threshold
            for j in np.flatnonzero(mask):
                if ids[i] < all_ids[j]:
                    rows_a.append(int(ids[i]))
                    rows_b.append(int(all_ids[j]))
                    rows_s.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "score": pa.array(rows_s, pa.float64()),
            }
        )

    return embeddings.map_batches(block_pairs, batch_format="pyarrow")


def range_search(
    embeddings: rd.Dataset,
    query: np.ndarray,
    radius: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, float]]:
    """All vectors with euclidean distance <= radius, sorted by distance
    (reference ``app/MultiDim.py:90-101``), as a filter + driver sort."""
    qv = np.asarray(query, dtype=np.float32).ravel()
    q_ref = ray.put(qv)

    def within(batch: pa.Table) -> pa.Table:
        qq = ray.get(q_ref)
        vecs = _as_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d = np.linalg.norm(vecs - qq[None, :], axis=1)
        mask = d <= radius
        return pa.table(
            {
                "vec_id": pa.array(ids[mask], type=pa.int64()),
                "dist": pa.array(d[mask].astype(np.float64), type=pa.float64()),
            }
        )

    out = embeddings.map_batches(within, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["dist", "vec_id"])
    return [(int(v), float(d)) for v, d in zip(out["vec_id"], out["dist"])]
