"""Per-partition graph ANN (extras/graph.py): build correctness,
reachability after symmetrization, entry coverage of disconnected
components, and end-to-end parity with the flat resident scan."""

import numpy as np
import pytest

from pyfuseray.extras.graph import (
    bidirectional_csr,
    graph_entries,
    graph_topk_ids,
    knn_graph,
)
from pyfuseray.extras.knn import _norm_rows


def _clustered(n, dim=32, n_clusters=4, seed=0, spread=0.4):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    a = rng.integers(0, n_clusters, n)
    return _norm_rows(centers[a] + spread * rng.standard_normal((n, dim))).astype(
        np.float32
    ), a


def test_knn_graph_matches_bruteforce():
    vecs, _ = _clustered(300, seed=1)
    nbrs = knn_graph(vecs, 5)
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(0, 300, 37):
        exact = set(np.argsort(-sims[i])[:5].tolist())
        assert set(nbrs[i].tolist()) == exact
    # sorted by similarity descending
    row = sims[0][nbrs[0]]
    assert np.all(np.diff(row) <= 1e-6)


def test_knn_graph_chunking_invariant():
    vecs, _ = _clustered(500, seed=2)
    a = knn_graph(vecs, 8, chunk_rows=64)
    b = knn_graph(vecs, 8, chunk_rows=1024)
    assert np.array_equal(a, b)


def test_nn_descent_recall_vs_exact():
    """The approximate neighbor-list build used above EXACT_BUILD_LIMIT
    must land close to the exact kNN graph — beam-search recall degrades
    smoothly with graph quality, so pin mean neighbor recall and
    determinism here (n=4096 forces the real NN-descent path: the
    small-n shortcut kicks in at max(2048, 4m))."""
    from pyfuseray.extras.graph import nn_descent

    m = 16
    vecs, _ = _clustered(4096, dim=32, n_clusters=6, seed=3)
    exact = knn_graph(vecs, m)
    approx = nn_descent(vecs, m, seed=7)
    assert approx.shape == exact.shape
    # no self-edges, ids in range
    assert not np.any(approx == np.arange(4096)[:, None])
    assert approx.min() >= 0 and approx.max() < 4096
    recall = np.mean(
        [len(set(a) & set(e)) / m for a, e in zip(approx.tolist(), exact.tolist())]
    )
    assert recall >= 0.85, recall
    # deterministic for a fixed seed
    assert np.array_equal(approx, nn_descent(vecs, m, seed=7))


def test_bidirectional_csr_contains_fwd_and_reverse():
    vecs, _ = _clustered(200, seed=3)
    nbrs = knn_graph(vecs, 4)
    indptr, indices = bidirectional_csr(nbrs)
    adj = {u: set(indices[indptr[u]:indptr[u + 1]].tolist()) for u in range(200)}
    for u in range(200):
        for v in nbrs[u]:
            assert int(v) in adj[u]            # forward edge kept
    # reverse edges exist (up to the degree cap): a random spot check
    for u in (0, 57, 130):
        for v in nbrs[u]:
            v = int(v)
            if len(adj[v]) < 3 * 4:            # under cap => must contain
                assert u in adj[v]
    # no self edges, degrees capped
    for u in range(200):
        assert u not in adj[u]
        assert len(adj[u]) <= 3 * 4


def test_entries_cover_disconnected_components():
    # two far-apart tight clusters => kNN graph is two components
    rng = np.random.default_rng(4)
    a = rng.standard_normal((100, 16)) * 0.01 + 10.0
    b = rng.standard_normal((100, 16)) * 0.01 - 10.0
    vecs = _norm_rows(np.vstack([a, b])).astype(np.float32)
    nbrs = knn_graph(vecs, 4)
    indptr, indices = bidirectional_csr(nbrs)
    entries = graph_entries(vecs, indptr, indices)
    assert (entries < 100).any() and (entries >= 100).any()


def test_graph_search_exhaustive_ef_is_exact():
    vecs, _ = _clustered(400, seed=5)
    nbrs = knn_graph(vecs, 8)
    indptr, indices = bidirectional_csr(nbrs)
    entries = graph_entries(vecs, indptr, indices)
    rng = np.random.default_rng(6)
    for q in _norm_rows(rng.standard_normal((5, 32))).astype(np.float32):
        ids, sims = graph_topk_ids(
            vecs, indptr, indices, entries, q, 10, ef=400, beam=64
        )
        exact = np.argsort(-(vecs @ q), kind="stable")[:10]
        assert set(ids.tolist()) == set(exact.tolist())
        # canonical (-sim, id) ordering
        key = list(zip((-sims).tolist(), ids.tolist()))
        assert key == sorted(key)


def test_graph_search_scratch_reuse_clean():
    vecs, _ = _clustered(300, seed=7)
    nbrs = knn_graph(vecs, 8)
    indptr, indices = bidirectional_csr(nbrs)
    entries = graph_entries(vecs, indptr, indices)
    q = _norm_rows(np.random.default_rng(8).standard_normal((1, 32)))[0].astype(
        np.float32
    )
    scratch = np.zeros(300, bool)
    i1, _ = graph_topk_ids(vecs, indptr, indices, entries, q, 10, ef=64, visited=scratch)
    assert not scratch.any()  # reset via touched ids, not full clear
    i2, _ = graph_topk_ids(vecs, indptr, indices, entries, q, 10, ef=64, visited=scratch)
    assert np.array_equal(i1, i2)


def test_resident_graph_vs_flat_resident(tmp_path, ray_session):
    """End-to-end: graph tier over the same IVF layout reaches the flat
    scan's recall (same probed partitions) on clustered data."""
    import pyarrow as pa
    import ray.data as rd

    from pyfuseray.extras.graph import ResidentGraphIVF
    from pyfuseray.extras.ivf import ResidentIVF, build_ivf

    rng = np.random.default_rng(9)
    n, dim = 4000, 32
    centers = rng.standard_normal((16, dim))
    a = rng.integers(0, 16, n)
    mat = (centers[a] + 0.6 * rng.standard_normal((n, dim))).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    ix = build_ivf(ds, str(tmp_path / "ivf"), n_centroids=8, sample_fraction=0.5, seed=5)
    queries = mat[:6].astype(np.float64)

    flat = ResidentIVF(ix, n_shards=2)
    graph = ResidentGraphIVF(ix, n_shards=2, m=12)
    try:
        rf = flat.topk(queries, 10, nprobe=2)
        rg = graph.topk(queries, 10, nprobe=2, ef=256, beam=32)
        for f, g in zip(rf, rg):
            fids = {v for v, _ in f}
            gids = {v for v, _ in g}
            assert len(fids & gids) >= 8  # same partitions, >=0.8 agreement
    finally:
        flat.close()
        graph.close()
