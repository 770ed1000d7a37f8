"""Per-partition navigable-graph ANN on top of the IVF layout.

The graph tier of the ANN stack (the role FAISS HNSW plays in the
reference, ``app/MultiDim.py:152-166``): each IVF centroid partition
gets a small k-NN graph, held actor-resident next to its vectors, and
a query beam-searches the graphs of only its ``nprobe`` probed
partitions instead of flat-scanning them.

Why graph-over-IVF rather than one global graph: a single navigable
graph is a pointer-chasing structure that cannot be sharded without
cross-node hops on every step. Per-PARTITION graphs keep every search
hop node-local — the partition is the unit of distribution (same
layout ``ResidentIVF`` shards), so a 256-node cluster holds 256x the
partitions with zero cross-node traffic per hop. This is the published
IVF+graph hybrid shape (DiskANN's sharded indexes, FAISS's
IVF-with-HNSW-quantizer).

Scale regimes (measured, see BASELINE.md):

- small partitions (~3k vecs): a flat BLAS scan of the probed
  partitions is already memory-resident and beats any Python-driven
  traversal — use ``ResidentIVF``.
- large partitions (>~20k vecs, the 100 TB regime where each partition
  is millions of vectors): beam search visits ``O(ef * M)`` vectors per
  query regardless of partition size while the flat scan pays
  ``O(|partition|)`` memory bandwidth — the graph wins and keeps
  winning as partitions grow.

Build cost is one exact top-M neighbor pass per partition (chunked
matmul, O(|P|^2 d) flops but bounded memory); at very large |P| swap in
NN-descent — the search side is unchanged.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import ray

from pyfuseray.extras.ivf import IVFIndex
from pyfuseray.extras.knn import _norm_rows


def knn_graph(vecs: np.ndarray, m: int = 16, *, chunk_rows: int = 1024) -> np.ndarray:
    """Exact top-``m`` cosine neighbor lists (n, m) int32, self excluded.

    Chunked matmul: peak extra memory is one (chunk, n) sim block plus
    argpartition's same-shaped permutation output — bounding the chunk
    keeps both small enough to stay in warm allocator blocks (a full
    n x n alloc pays first-touch page-fault stalls that dwarf the
    compute on this class of machine). Neighbor lists come out sorted
    by similarity descending (greedy expansion visits the best edges
    first)."""
    vecs = np.ascontiguousarray(vecs)
    n = vecs.shape[0]
    m_eff = max(1, min(m, n - 1))
    if n <= 1:
        return np.zeros((n, m_eff), dtype=np.int32)
    chunk = max(64, min(n, chunk_rows))
    nbrs = np.empty((n, m_eff), dtype=np.int32)
    sims_buf = np.empty((chunk, n), dtype=vecs.dtype)
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        sims = np.matmul(vecs[i0:i1], vecs.T, out=sims_buf[: i1 - i0])
        rows = np.arange(i1 - i0)
        sims[rows, np.arange(i0, i1)] = -np.inf  # exclude self
        # top-m = LAST m of an ascending partition (no full negation copy)
        idx = np.argpartition(sims, n - m_eff, axis=1)[:, n - m_eff :]
        top = np.take_along_axis(sims, idx, axis=1)
        order = np.argsort(-top, axis=1, kind="stable")
        nbrs[i0:i1] = np.take_along_axis(idx, order, axis=1).astype(np.int32)
    return nbrs


def nn_descent(
    vecs: np.ndarray,
    m: int = 16,
    *,
    iters: int = 8,
    seed: int = 0,
    chunk_rows: int = 512,
) -> np.ndarray:
    """Approximate top-``m`` cosine neighbor lists via NN-descent
    (Dong, Moses & Li, WWW'11): start from random neighbors and
    repeatedly try each node's neighbors-of-neighbors (including
    reverse edges) — O(n * m^2 * d) per iteration instead of the exact
    build's O(n^2 * d), the difference between seconds and hours on the
    >100k-vector partitions a 100 TB corpus produces.

    Fully vectorized: each chunk gathers its (chunk, (2m)^2) candidate
    ids, scores them with one einsum, and merges via per-row sort +
    dedup + argpartition. Deterministic for a given seed.
    """
    vecs = np.ascontiguousarray(vecs)
    n, dim = vecs.shape
    m_eff = max(1, min(m, n - 1))
    if n <= max(2048, 4 * m_eff):  # small partition: exact is cheaper
        return knn_graph(vecs, m_eff)
    rng = np.random.default_rng(seed)
    nbr = rng.integers(0, n - 1, size=(n, m_eff), dtype=np.int64)
    nbr += nbr >= np.arange(n, dtype=np.int64)[:, None]  # never self
    sims = np.empty((n, m_eff), dtype=vecs.dtype)
    for i0 in range(0, n, 8192):
        i1 = min(i0 + 8192, n)
        g = vecs[nbr[i0:i1].ravel()].reshape(i1 - i0, m_eff, dim)
        sims[i0:i1] = np.einsum("ijd,id->ij", g, vecs[i0:i1])
    # active-row filtering: once a row's neighbor list stops changing,
    # skip it (the standard new-pair optimization at row granularity —
    # converged regions cost nothing in later iterations)
    active = np.arange(n, dtype=np.int64)
    half = max(1, m_eff // 2)
    for _ in range(iters):
        if active.size == 0:
            break
        # reverse sample: up to m//2 reverse-neighbors per node
        rev = np.full((n, half), -1, dtype=np.int64)
        src = np.repeat(np.arange(n, dtype=np.int64), m_eff)
        dst = nbr.ravel()
        perm = rng.permutation(src.size)  # random which reverses survive
        si, di = src[perm], dst[perm]
        order = np.argsort(di, kind="stable")
        di_s, si_s = di[order], si[order]
        starts = np.concatenate(([True], di_s[1:] != di_s[:-1]))
        gstart = np.maximum.accumulate(np.where(starts, np.arange(di_s.size), 0))
        rank = np.arange(di_s.size) - gstart
        ok = rank < half
        rev[di_s[ok], rank[ok]] = si_s[ok]
        # candidate sampling (rho=0.5): half the forward edges + the
        # reverse sample form the join list — quadratically fewer
        # second-hop candidates at a small convergence-rate cost
        join = np.concatenate([nbr[:, :half], rev], axis=1)  # (n, m), -1 pad
        changed_rows: list[np.ndarray] = []
        for i0 in range(0, active.size, chunk_rows):
            rows = active[i0 : i0 + chunk_rows]
            c = rows.size
            j = join[rows]
            jj = np.where(j >= 0, j, 0)
            cand = join[jj.ravel()].reshape(c, -1)  # (c, m^2)
            cand = np.where(np.repeat(j >= 0, join.shape[1], axis=1), cand, -1)
            cand = np.concatenate([nbr[rows], cand], axis=1)
            valid = cand >= 0
            safe = np.where(valid, cand, 0)
            g = vecs[safe.ravel()].reshape(c, cand.shape[1], dim)
            s = np.einsum("ijd,id->ij", g, vecs[rows])
            s[~valid] = -np.inf
            s[cand == rows[:, None]] = -np.inf
            # per-row dedup: sort by id, mask repeats
            o = np.argsort(cand, axis=1, kind="stable")
            cand = np.take_along_axis(cand, o, axis=1)
            s = np.take_along_axis(s, o, axis=1)
            dup = np.zeros_like(cand, dtype=bool)
            dup[:, 1:] = cand[:, 1:] == cand[:, :-1]
            s[dup] = -np.inf
            idx = np.argpartition(-s, m_eff - 1, axis=1)[:, :m_eff]
            new_c = np.take_along_axis(cand, idx, axis=1)
            new_s = np.take_along_axis(s, idx, axis=1)
            o2 = np.argsort(-new_s, axis=1, kind="stable")
            new_c = np.take_along_axis(new_c, o2, axis=1)
            new_s = np.take_along_axis(new_s, o2, axis=1)
            row_changed = (new_c != nbr[rows]).any(axis=1)
            changed_rows.append(rows[row_changed])
            nbr[rows] = new_c
            sims[rows] = new_s
        if changed_rows:
            ch = np.concatenate(changed_rows)
            # a row whose NEIGHBOR improved can improve next round even
            # if it didn't change itself: re-activate the neighborhood
            active = np.unique(
                np.concatenate([ch, nbr[ch].ravel()]) if ch.size else ch
            )
        else:
            active = np.array([], np.int64)
    return nbr.astype(np.int32)


def bidirectional_csr(
    nbrs: np.ndarray, *, cap_factor: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Symmetrize the directed kNN edge list into CSR adjacency.

    Directed kNN graphs strand peripheral nodes: a node nobody lists in
    their top-m has in-degree 0 and is UNREACHABLE by any search
    (measured ~14% recall ceiling loss on clustered data). Adding every
    edge's reverse fixes reachability; per-node degree is capped at
    ``cap_factor * m`` (kNN edges are kept first — the cap only trims
    reverse edges into hub nodes, whose own out-edges already cover
    their neighborhood).

    Returns (indptr, indices): node u's neighbors are
    ``indices[indptr[u]:indptr[u+1]]``.
    """
    n, m = nbrs.shape
    src = np.repeat(np.arange(n, dtype=np.int64), m)
    dst = nbrs.ravel().astype(np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    is_fwd = np.zeros(s.size, dtype=bool)
    is_fwd[: src.size] = True
    # pass 1 — dedupe: sort by (s, d, fwd-first) so a mutual edge's two
    # occurrences are ADJACENT and the kept one is marked forward
    order = np.lexsort((~is_fwd, d, s))
    s, d, is_fwd = s[order], d[order], is_fwd[order]
    pair = s * n + d
    keep = np.concatenate(([True], pair[1:] != pair[:-1]))
    s, d, is_fwd = s[keep], d[keep], is_fwd[keep]
    # pass 2 — cap: rank within each src group with forward edges first,
    # so the cap only ever trims reverse edges
    order = np.lexsort((d, ~is_fwd, s))
    s, d = s[order], d[order]
    starts = np.concatenate(([True], s[1:] != s[:-1]))
    group_start = np.maximum.accumulate(np.where(starts, np.arange(s.size), 0))
    rank = np.arange(s.size) - group_start
    cap = cap_factor * m
    ok = rank < cap
    s, d = s[ok], d[ok]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(s, minlength=n), out=indptr[1:])
    return indptr, d.astype(np.int32)


def _components(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Connected-component label per node of the (undirected) CSR graph
    (vectorized min-label propagation with pointer jumping)."""
    n = indptr.size - 1
    labels = np.arange(n, dtype=np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dst = indices.astype(np.int64)
    for _ in range(128):
        new = labels.copy()
        np.minimum.at(new, src, labels[dst])
        np.minimum.at(new, dst, labels[src])
        # pointer-jump: compress one level per round
        new = new[new]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def graph_entries(
    vecs: np.ndarray, indptr: np.ndarray, indices: np.ndarray,
    *, max_entries: int = 64
) -> np.ndarray:
    """Entry points that make beam search robust on clustered data: the
    kNN graph of a partition holding several natural sub-clusters is
    DISCONNECTED (each sub-cluster is its own component), so a single
    entry point can never reach the others. Seeding the search with one
    medoid per connected component (largest components first, capped)
    guarantees every major component gets explored; scoring the entry
    set against the query is one small gemv."""
    n = vecs.shape[0]
    if n == 0:
        return np.array([], dtype=np.int64)
    labels = _components(indptr, indices)
    uniq, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
    order = np.argsort(-counts, kind="stable")[:max_entries]
    entries = []
    for c in order:
        members = np.flatnonzero(inv == c)
        centroid = vecs[members].mean(axis=0)
        entries.append(int(members[np.argmax(vecs[members] @ centroid)]))
    # pad with evenly-spaced extras so tiny single-component partitions
    # still get a few diverse starts
    if len(entries) < min(8, n):
        extras = np.linspace(0, n - 1, min(8, n), dtype=np.int64)
        entries = list(dict.fromkeys([*entries, *extras.tolist()]))
    return np.asarray(entries, dtype=np.int64)


def graph_topk_ids(
    vecs: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    entries: int | np.ndarray,
    q: np.ndarray,
    k: int,
    *,
    ef: int = 64,
    beam: int = 8,
    visited: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Beam search one partition's graph for one query.

    Round-based best-first expansion: each round pops the ``beam`` best
    unexpanded candidates, gathers ALL their unvisited neighbors and
    scores them in one matmul — the Python loop runs O(ef/beam) rounds,
    not O(ef * M) scalar heap ops. Terminates when the best unexpanded
    candidate cannot improve the current ef-th best (standard
    best-first stopping rule).

    ``entries`` may be several seeds (see ``graph_entries``): all are
    scored and enter the initial beam, so every graph component with a
    seed is reachable.

    Returns (ids, sims) of the top-k visited nodes, canonically ordered
    by (-sim, id). ``visited`` is an optional reusable bool scratch
    (callers with many queries avoid an O(n) alloc per query; it is
    reset via the ids this search touched, not a full clear).
    """
    n = vecs.shape[0]
    if n == 0:
        return np.array([], np.int64), np.array([], np.float64)
    owns_scratch = visited is None
    if owns_scratch:
        visited = np.zeros(n, dtype=bool)
    touched: list[np.ndarray] = []
    entry_arr = np.atleast_1d(np.asarray(entries, dtype=np.int64))
    visited[entry_arr] = True
    touched.append(entry_arr)
    sims0 = vecs[entry_arr] @ q
    pool_ids = [entry_arr]
    pool_sims = [sims0]
    cand_ids = entry_arr
    cand_sims = sims0.copy()
    n_pool = entry_arr.size
    # worst sim still inside the ef-pool (the expansion frontier bound)
    ef_bound = -np.inf
    max_rounds = max(16, (8 * ef) // max(1, beam) + 16)
    for _ in range(max_rounds):
        if cand_ids.size == 0:
            break
        b = min(beam, cand_ids.size)
        take = np.argpartition(-cand_sims, b - 1)[:b] if cand_ids.size > b else np.arange(cand_ids.size)
        if n_pool >= ef and float(cand_sims[take].max()) <= ef_bound:
            break  # nothing unexpanded can enter the ef-pool
        expand = cand_ids[take]
        keep = np.ones(cand_ids.size, dtype=bool)
        keep[take] = False
        cand_ids = cand_ids[keep]
        cand_sims = cand_sims[keep]
        nb = np.concatenate(
            [indices[indptr[u] : indptr[u + 1]] for u in expand]
        )
        nb = nb[~visited[nb]]
        if nb.size == 0:
            continue
        nb = np.unique(nb)
        visited[nb] = True
        touched.append(nb)
        s = vecs[nb] @ q
        pool_ids.append(nb)
        pool_sims.append(s)
        n_pool += nb.size
        cand_ids = np.concatenate([cand_ids, nb])
        cand_sims = np.concatenate([cand_sims, s])
        # keep only candidates that could still beat the ef-th best
        if n_pool > ef:
            all_sims = np.concatenate(pool_sims)
            ef_bound = float(np.partition(all_sims, -ef)[-ef])
            alive = cand_sims > ef_bound
            cand_ids = cand_ids[alive]
            cand_sims = cand_sims[alive]
    ids = np.concatenate(pool_ids)
    sims = np.concatenate(pool_sims).astype(np.float64)
    if owns_scratch:
        pass  # scratch dies with the call
    else:
        for t in touched:
            visited[t] = False
    kk = min(k, ids.size)
    top = np.argpartition(-sims, kk - 1)[:kk] if ids.size > kk else np.arange(ids.size)
    # canonical (-sim, id) order
    order = np.lexsort((ids[top], -sims[top]))
    top = top[order]
    return ids[top].astype(np.int64), sims[top]


@ray.remote(num_cpus=1)
class _GraphShardActor:
    """One shard of the graph tier: a subset of centroid partitions,
    each loaded once as (ids, float32 vectors, neighbor lists, entry
    point). Float32 halves memory bandwidth vs the flat float64 scan —
    recall comparisons use ids only, so the cast costs nothing."""

    # above this partition size the exact O(|P|^2) neighbor build hands
    # off to NN-descent (O(|P| m^2) per iter)
    EXACT_BUILD_LIMIT = 8192

    def __init__(self, files_by_cid: dict, id_col: str, vec_col: str, m: int,
                 dtype: str = "float32", max_entries: int = 64):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyfuseray.extras.vecs import as_matrix

        self.parts = {}
        for cid, files in files_by_cid.items():
            tbl = pa.concat_tables(
                [pq.read_table(f, columns=[id_col, vec_col]) for f in files]
            )
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            vecs = _norm_rows(as_matrix(tbl.column(vec_col), dtype=np.float64)).astype(
                np.dtype(dtype)
            )
            if vecs.shape[0] > self.EXACT_BUILD_LIMIT:
                nbrs = nn_descent(vecs, m, seed=int(cid))
            else:
                nbrs = knn_graph(vecs, m)
            indptr, indices = bidirectional_csr(nbrs)
            entries = graph_entries(vecs, indptr, indices, max_entries=max_entries)
            self.parts[int(cid)] = (ids, vecs, indptr, indices, entries)
        self._scratch = {
            cid: np.zeros(p[1].shape[0], dtype=bool) for cid, p in self.parts.items()
        }

    def topk(self, qn: np.ndarray, probes: np.ndarray, k: int, ef: int, beam: int):
        out_q: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for j in range(qn.shape[0]):
            for c in probes[j]:
                part = self.parts.get(int(c))
                if part is None:
                    continue
                ids, vecs, indptr, indices, entries = part
                loc, sims = graph_topk_ids(
                    vecs, indptr, indices, entries,
                    qn[j].astype(vecs.dtype), k, ef=ef, beam=beam,
                    visited=self._scratch[int(c)],
                )
                if loc.size:
                    out_q.append(np.full(loc.size, j, dtype=np.int64))
                    out_id.append(ids[loc])
                    out_s.append(sims)
        if not out_q:
            e = np.array([], dtype=np.int64)
            return e, e, np.array([], dtype=np.float64)
        return (
            np.concatenate(out_q),
            np.concatenate(out_id),
            np.concatenate(out_s),
        )


class ResidentGraphIVF:
    """Actor-resident IVF+graph search: ``ResidentIVF``'s sharding (one
    actor per balanced subset of centroid partitions) with beam search
    over per-partition k-NN graphs instead of flat scans.

    Same probe step as ``ivf_topk``/``ResidentIVF`` (so partition
    recall is identical); inside each probed partition the graph visits
    ~ef*M vectors instead of all of them. Per-query work is independent
    of partition size — the property that matters when a partition is
    millions of vectors on a real cluster.
    """

    def __init__(self, index: IVFIndex, n_shards: int = 4, *, m: int = 16,
                 dtype: str = "float32", max_entries: int = 64):
        """``dtype``/``max_entries`` tune the precision-vs-speed point:
        float32 halves memory traffic (the default — ids-only recall is
        unaffected); exactness mode (``dtype='float64'``,
        ``max_entries`` >= partition size, ``ef`` >= partition size at
        query time) makes the search provably exhaustive per probed
        partition: every connected component holds an entry, and with
        ef >= n the beam never prunes, so traversal IS component-complete
        BFS with float64 scoring."""
        import glob as _glob

        files_by_cid: dict[int, list[str]] = {}
        sizes: dict[int, int] = {}
        for c in range(index.n_centroids):
            fs = sorted(
                _glob.glob(os.path.join(index.data_dir, f"centroid_id={c}", "*.parquet"))
            )
            if fs:
                files_by_cid[c] = fs
                sizes[c] = sum(os.path.getsize(f) for f in fs)
        n_shards = max(1, min(n_shards, len(files_by_cid) or 1))
        shard_files: list[dict[int, list[str]]] = [{} for _ in range(n_shards)]
        shard_load = [0] * n_shards
        for c in sorted(sizes, key=sizes.get, reverse=True):
            s = int(np.argmin(shard_load))
            shard_files[s][c] = files_by_cid[c]
            shard_load[s] += sizes[c]
        self.index = index
        self.actors = [
            _GraphShardActor.remote(
                sf, index.id_col, index.vec_col, m, dtype, max_entries
            )
            for sf in shard_files
            if sf
        ]
        self.shard_cids = [set(sf) for sf in shard_files if sf]
        # block until every shard finished its graph build (load cost is
        # paid here, not on the first query)
        ray.get([a.__ray_ready__.remote() for a in self.actors])

    def topk(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        nprobe: int = 4,
        ef: int = 64,
        beam: int = 8,
    ) -> list[list[tuple[int, float]]]:
        q = np.asarray(queries, dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        qn = _norm_rows(q)
        nprobe = min(nprobe, self.index.n_centroids)
        c_sims = qn @ self.index.centroids.T
        probes = np.argsort(-c_sims, axis=1)[:, :nprobe]
        probe_set = {int(c) for row in probes for c in row}
        futs = [
            a.topk.remote(qn, probes, k, ef, beam)
            for a, cids in zip(self.actors, self.shard_cids)
            if cids & probe_set
        ]
        parts = ray.get(futs)
        qs = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
        ids = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
        ss = np.concatenate([p[2] for p in parts]) if parts else np.array([], np.float64)
        results: list[list[tuple[int, float]]] = []
        for j in range(qn.shape[0]):
            sel = qs == j
            best = heapq.nsmallest(
                k, zip(ss[sel], ids[sel]), key=lambda t: (-t[0], t[1])
            )
            results.append([(int(v), float(s)) for s, v in best])
        return results

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
