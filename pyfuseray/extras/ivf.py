"""IVF (inverted-file) approximate nearest neighbour index.

The sub-linear ANN counterpart of the reference's FAISS HNSW backend
(reference ``app/MultiDim.py:152-166``): FAISS/HNSW itself is not
available in this sandbox, so the scale path is the other classic
sub-linear family — coarse quantization (IVF):

- **fit**: a seeded ``ds.random_sample`` draws a bounded training
  sample; spherical k-means (Lloyd's, fixed iterations, driver-side
  numpy — the sample is small by construction) fits ``n_centroids``
  unit centroids.
- **assign**: one ``map_batches`` pass appends ``centroid_id`` (argmax
  cosine against the broadcast centroid matrix) and writes the table
  partitioned by centroid — the object store / parquet layout IS the
  inverted file.
- **search**: a query probes only its ``nprobe`` closest centroids;
  partition pruning (hive ``centroid_id=k`` directories) means only
  ~nprobe/n_centroids of the data is ever read, each batch keeping a
  partial top-k (the same broadcast-once / partial-top-k shape as
  ``knn.brute_force_topk``).

Partitioning assumptions: centroids (n_centroids x dim floats) fit in
one broadcast; cluster sizes are balanced enough that nprobe partitions
are much smaller than the corpus (k-means on a uniform sample gives
that unless the data is single-cluster degenerate). Recall < 1 by
design; ``nprobe = n_centroids`` degrades gracefully to exact search
(pinned by ``tests/test_extras.py``).
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from pyfuseray.extras.knn import _norm_rows
from pyfuseray.extras.vecs import as_matrix, series_matrix


def kmeans_fit(
    x: np.ndarray, n_centroids: int, *, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Spherical k-means (cosine): unit-normalized data and centroids.

    Deterministic: seeded init (random distinct rows), fixed iteration
    count, empty clusters re-seeded from the farthest points.
    """
    x = _norm_rows(np.asarray(x, dtype=np.float64))
    n = x.shape[0]
    k = min(n_centroids, n)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        sims = x @ centroids.T
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(centroids)
        np.add.at(new, assign, x)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # re-seed empty clusters from the worst-assigned points
            worst = np.argsort(sims[np.arange(n), assign])[: int(empty.sum())]
            new[empty] = x[worst]
            counts[empty] = 1
        centroids = _norm_rows(new / counts[:, None])
    return centroids


class IVFIndex:
    """Handle to a built IVF layout: centroid matrix + partitioned data."""

    def __init__(self, data_dir: str, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.data_dir = data_dir
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def n_centroids(self) -> int:
        return self.centroids.shape[0]


def build_ivf(
    embeddings: rd.Dataset,
    out_dir: str,
    *,
    n_centroids: int = 64,
    sample_fraction: float = 0.2,
    iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFIndex:
    """Fit centroids on a seeded sample, assign every vector, write the
    inverted file as hive-partitioned parquet (one dir per centroid)."""
    sample = embeddings.random_sample(min(1.0, sample_fraction), seed=seed)
    sample_df = sample.select_columns([vec_col]).to_pandas()
    if len(sample_df) < n_centroids:
        # degenerate sample (tiny corpus / tiny fraction): top up with a
        # BOUNDED prefix — never the whole table (the corpus may not fit
        # on the driver)
        cap = max(n_centroids * 50, 10_000)
        sample_df = embeddings.select_columns([vec_col]).limit(cap).to_pandas()
    x = series_matrix(sample_df[vec_col], dtype=np.float64)
    centroids = kmeans_fit(x, n_centroids, iters=iters, seed=seed)
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vecs = _norm_rows(as_matrix(batch.column(vec_col), dtype=np.float64))
        cid = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
        # centroid_id becomes the hive partition path; cid stays INSIDE
        # the files so probed reads (which pass explicit file lists, not
        # the hive root) still see the assignment
        batch = batch.append_column("centroid_id", pa.array(cid, pa.int32()))
        return batch.append_column("cid", pa.array(cid, pa.int32()))

    assigned = embeddings.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )
    # layout: out_dir/data/centroid_id=k/*.parquet + out_dir/centroids.npy
    # (the npy lives OUTSIDE the parquet root so dataset scans never
    # trip over a non-parquet file). Write to a tmp dir and swap into
    # place: rebuilding over a stale/partial layout would otherwise
    # leave old files inside centroid_id=k dirs for the probe globs.
    import shutil

    data_dir = os.path.join(out_dir, "data")
    tmp_dir = data_dir + ".writing"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    assigned.write_parquet(tmp_dir, partition_cols=["centroid_id"])
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return IVFIndex(data_dir, centroids, id_col, vec_col)


def load_ivf(out_dir: str, *, id_col: str = "vec_id",
             vec_col: str = "embedding") -> IVFIndex:
    centroids = np.load(os.path.join(out_dir, "centroids.npy"))
    return IVFIndex(os.path.join(out_dir, "data"), centroids, id_col, vec_col)


def ivf_topk(
    index: IVFIndex,
    queries: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
) -> list[list[tuple[int, float]]]:
    """Cosine top-k per query probing only the nprobe closest centroids.

    Reads ONLY the probed centroid partitions (hive partition pruning),
    scores them with per-batch partial top-k, and merges blocks x k rows
    on the driver — sub-linear in corpus size when
    nprobe << n_centroids."""
    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    qn = _norm_rows(q)
    nprobe = min(nprobe, index.n_centroids)
    c_sims = qn @ index.centroids.T  # (nq, k_centroids)
    probes = np.argsort(-c_sims, axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(c) for row in probes for c in row})
    import glob

    # physical partition pruning: only the probed centroid directories'
    # files are ever opened (explicit file lists — Ray's read_parquet
    # rejects lists of directories, and reading the hive root would
    # scan every partition)
    files = [
        f
        for c in wanted
        for f in sorted(
            glob.glob(os.path.join(index.data_dir, f"centroid_id={c}", "*.parquet"))
        )
    ]
    if not files:
        return [[] for _ in range(qn.shape[0])]
    ds = rd.read_parquet(files)
    q_ref = ray.put((qn, probes))
    id_col, vec_col = index.id_col, index.vec_col

    def partial(batch: pa.Table) -> pa.Table:
        qm, prb = ray.get(q_ref)
        vecs = _norm_rows(as_matrix(batch.column(vec_col), dtype=np.float64))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cids = batch.column("cid").to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            sel = np.flatnonzero(np.isin(cids, prb[j]))
            if sel.size == 0:
                continue
            sims = vecs[sel] @ qm[j]
            kk = min(k, sel.size)
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(ids[sel][top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    results: list[list[tuple[int, float]]] = []
    for j in range(qn.shape[0]):
        sub = partials[partials["query_id"] == j]
        best = heapq.nsmallest(
            k, zip(sub["score"], sub["vec_id"]), key=lambda t: (-t[0], t[1])
        )
        results.append([(int(v), float(s)) for s, v in best])
    return results


@ray.remote(num_cpus=1)
class _IVFShardActor:
    """One shard of the resident IVF index: owns a subset of centroid
    partitions, loaded into actor memory ONCE at construction (ids +
    pre-normalized float64 matrix per centroid). Queries are pure
    in-memory matmuls — no per-query file reads."""

    def __init__(self, files_by_cid: dict, id_col: str, vec_col: str):
        import pyarrow.parquet as pq

        from pyfuseray.extras.knn import _norm_rows
        from pyfuseray.extras.vecs import as_matrix

        self.parts = {}
        for cid, files in files_by_cid.items():
            tbl = pa.concat_tables(
                [pq.read_table(f, columns=[id_col, vec_col]) for f in files]
            )
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            vecs = _norm_rows(as_matrix(tbl.column(vec_col), dtype=np.float64))
            self.parts[int(cid)] = (ids, vecs)

    def topk(self, qn: np.ndarray, probes: np.ndarray, k: int):
        """Partial top-k per query over the probed centroids THIS shard
        owns. Returns (query_ids, vec_ids, scores) flat arrays."""
        out_q: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        owned = self.parts
        for j in range(qn.shape[0]):
            mats = [owned[int(c)] for c in probes[j] if int(c) in owned]
            if not mats:
                continue
            ids = np.concatenate([m[0] for m in mats])
            sims = np.concatenate([m[1] @ qn[j] for m in mats])
            kk = min(k, ids.size)
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(ids[top])
            out_s.append(sims[top])
        if not out_q:
            e = np.array([], dtype=np.int64)
            return e, e, np.array([], dtype=np.float64)
        return (
            np.concatenate(out_q),
            np.concatenate(out_id),
            np.concatenate(out_s),
        )


class ResidentIVF:
    """Actor-resident IVF search: the partitioned inverted file is
    loaded once into a pool of shard actors (each owning a balanced
    subset of centroid partitions), and every query is a couple of
    actor RPCs + in-memory matmuls.

    This is the latency-tier counterpart of ``ivf_topk`` (which reads
    the probed partitions from parquet per call — right for one-shot /
    cold queries): rank-identical results (same normalized float64
    scoring and (-score, vec_id) tie-break; scores agree to 1 ulp —
    BLAS blocking differs with matrix shape; pytest-pinned),
    ~10-50x lower latency for repeated queries. The multi-node shape:
    shards scale out with the cluster, each node holding its centroids
    in its own memory — the same role FAISS HNSW plays in the reference
    (``app/MultiDim.py:152-166``) with an index that shards instead of
    a single-process graph.
    """

    def __init__(self, index: IVFIndex, n_shards: int = 4):
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
        # balance shards by partition byte size (largest-first greedy)
        n_shards = max(1, min(n_shards, len(files_by_cid) or 1))
        shard_files: list[dict[int, list[str]]] = [{} for _ in range(n_shards)]
        shard_load = [0] * n_shards
        for c in sorted(sizes, key=sizes.get, reverse=True):
            s = int(np.argmin(shard_load))
            shard_files[s][c] = files_by_cid[c]
            shard_load[s] += sizes[c]
        self.index = index
        self.actors = [
            _IVFShardActor.remote(sf, index.id_col, index.vec_col)
            for sf in shard_files
            if sf
        ]
        self.shard_cids = [set(sf) for sf in shard_files if sf]

    def topk(
        self, queries: np.ndarray, k: int = 10, *, nprobe: int = 4
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
            a.topk.remote(qn, probes, k)
            for a, cids in zip(self.actors, self.shard_cids)
            if cids & probe_set
        ]
        results: list[list[tuple[int, float]]] = []
        parts = ray.get(futs)
        qs = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
        ids = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
        ss = np.concatenate([p[2] for p in parts]) if parts else np.array([], np.float64)
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


def ivf_range_search(
    index: IVFIndex,
    query: np.ndarray,
    radius: float,
    *,
    nprobe: int = 4,
) -> list[tuple[int, float]]:
    """Euclidean range search probing only the nprobe closest centroid
    partitions (the IVF analogue of ``knn.range_search``; with
    nprobe = n_centroids it reads everything and equals the exhaustive
    scan exactly — the reference's Sequential-vs-RTree equal-range-count
    consistency check, ``app/tests/image_knn_test.py:47-63``)."""
    import glob

    qv = np.asarray(query, dtype=np.float64).ravel()
    qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
    nprobe = min(nprobe, index.n_centroids)
    probes = np.argsort(-(index.centroids @ qn))[:nprobe]
    files = [
        f
        for c in sorted(int(x) for x in probes)
        for f in sorted(
            glob.glob(os.path.join(index.data_dir, f"centroid_id={c}", "*.parquet"))
        )
    ]
    if not files:
        return []
    q_ref = ray.put(qv)
    id_col, vec_col = index.id_col, index.vec_col

    def within(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        vecs = as_matrix(batch.column(vec_col), dtype=np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d = np.linalg.norm(vecs - q[None, :], axis=1)
        mask = d <= radius
        return pa.table(
            {
                "vec_id": pa.array(ids[mask], pa.int64()),
                "dist": pa.array(d[mask], pa.float64()),
            }
        )

    out = (
        rd.read_parquet(files)
        .map_batches(within, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["dist", "vec_id"])
    )
    return [(int(v), float(d)) for v, d in zip(out["vec_id"], out["dist"])]
