"""Deterministic global shuffle for training-data epoch ordering.

A training run wants each epoch to see the corpus in a pseudo-random
order that is (a) reproducible across runs and engines, (b) cheap to
re-derive after a failure, and (c) written as N shard files a data
loader can stream round-robin. ``random_shuffle`` gives none of that:
its order is a function of the run, not the data.

Here the order IS the data: every row draws a 60-bit key from
``md5(f"{seed}:{id}")`` (the same process-stable convention as
``extras/sampling`` / the stratified sampler — NEVER builtin ``hash``,
see CLAUDE.md), its shard is ``key % n_shards``, and the within-shard
order is ascending key. Changing ``seed`` is a fresh epoch permutation.
Because key and shard are pure functions of the id, the assignment is
SQL-expressible and hash-checked against DuckDB by the ``shuffle_shards``
contract entry.

Scale shape: assignment is ONE streaming ``map_batches`` — no shuffle at
all. The shard write is the one unavoidable all-to-all (a global
permutation moves every row by definition); it rides Ray Data's
range-partitioned distributed sort on ``(shard, key)`` rather than a
driver-side pass, then hive-partitions by shard so a crashed write can
be diagnosed per shard and readers open only the shards they own.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

_MASK60 = (1 << 60) - 1


def _epoch_keys(ids: list, seed: int) -> np.ndarray:
    """id -> 60-bit md5 int of ``f"{seed}:{id}"`` (fits int64, >= 0)."""
    return np.fromiter(
        (
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


def shuffle_assign(
    ds: rd.Dataset,
    n_shards: int,
    *,
    seed: int = 0,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Append ``key`` (60-bit md5 epoch key) and ``shard`` (key mod
    ``n_shards``) columns. Pure streaming; deterministic in (data, seed)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def fn(batch: pa.Table) -> pa.Table:
        keys = _epoch_keys(batch.column(id_col).to_pylist(), seed)
        batch = batch.append_column("key", pa.array(keys, pa.int64()))
        return batch.append_column(
            "shard", pa.array(keys % np.int64(n_shards), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def write_training_shards(
    ds: rd.Dataset,
    out_dir: str,
    n_shards: int,
    *,
    seed: int = 0,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Shuffle ``ds`` deterministically and write hive-partitioned
    parquet (``shard=K/``) ordered by epoch key within each shard.

    Returns the assigned dataset (pre-write) so callers can pipeline
    further. The sort is the global permutation's inherent all-to-all;
    everything before it streams.
    """
    assigned = shuffle_assign(ds, n_shards, seed=seed, id_col=id_col)
    assigned.sort(["shard", "key"]).write_parquet(
        out_dir, partition_cols=["shard"]
    )
    return assigned
