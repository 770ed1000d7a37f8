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

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.md5vec import md5_hi60_ints

_MASK60 = (1 << 60) - 1
MANIFEST_NAME = "_shuffle_manifest.json"


def _epoch_keys(ids, seed: int) -> np.ndarray:
    """id -> 60-bit md5 int of ``f"{seed}:{id}"`` (fits int64, >= 0).

    Vectorized single-block MD5 (extras/md5vec) — no per-row Python
    hash objects in a stage that touches every corpus row."""
    return md5_hi60_ints(ids, prefix=f"{seed}:")


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
        keys = _epoch_keys(batch.column(id_col), seed)
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
    # a rerun into a reused out_dir must not leave stale shard=K/ dirs
    # behind (a previous write with more shards or another seed would
    # silently mix epochs on a full read): clear prior shuffle output
    # before writing the new one
    if os.path.isdir(out_dir):
        import shutil

        for d in os.listdir(out_dir):
            if d.startswith("shard="):
                shutil.rmtree(os.path.join(out_dir, d))
        stale = os.path.join(out_dir, MANIFEST_NAME)
        if os.path.exists(stale):
            os.remove(stale)

    assigned = shuffle_assign(ds, n_shards, seed=seed, id_col=id_col)
    assigned.sort(["shard", "key"]).write_parquet(
        out_dir, partition_cols=["shard"]
    )
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(
            {"n_shards": n_shards, "seed": seed, "id_col": id_col}, f
        )
    return assigned


def read_training_shards(
    out_dir: str, shards: list[int] | None = None, *, ordered: bool = False
) -> rd.Dataset:
    """Read a training-shard layout back; with ``shards`` given, open
    ONLY those ``shard=K/`` directories (a data-loader rank reads just
    the shards it owns — physical pruning, not a post-read filter).

    Row ORDER: rows arrive grouped by shard but NOT in epoch-key order —
    a shard spanning multiple write-task files has no cross-file order
    guarantee, and ``read_parquet`` does not preserve row order under
    the streaming executor. Pass ``ordered=True`` to restore the epoch
    order with a per-shard ``sort`` over exactly the shards this reader
    owns (bounded to the reader's own slice, never the corpus).

    The hive ``shard`` column comes back as a string partition value, so
    it is re-derived as int64 from ``key % n_shards`` (the same pure
    function that assigned it) using the manifest written at shuffle
    time; a missing directory just means that shard drew zero rows — an
    explicit in-range ``shards`` list whose directories are all empty
    returns an EMPTY dataset with the expected schema (a loader rank
    that owns only empty shards must not crash).
    """
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    n_shards = int(manifest["n_shards"])

    if shards is None:
        paths = [
            os.path.join(out_dir, d)
            for d in sorted(os.listdir(out_dir))
            if d.startswith("shard=")
        ]
    else:
        bad = [s for s in shards if not 0 <= s < n_shards]
        if bad:
            raise ValueError(f"shards {bad} outside [0, {n_shards})")
        paths = [
            p
            for s in shards
            if os.path.isdir(p := os.path.join(out_dir, f"shard={s}"))
        ]
    # expand dirs to files: read_parquet treats list entries as files
    files = [
        os.path.join(d, f)
        for d in paths
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        if shards is not None:
            # all requested shards validly drew zero rows: any written
            # shard file carries the schema (key + payload columns)
            any_files = [
                os.path.join(out_dir, d, f)
                for d in sorted(os.listdir(out_dir))
                if d.startswith("shard=")
                for f in sorted(os.listdir(os.path.join(out_dir, d)))
                if f.endswith(".parquet")
            ]
            if any_files:
                import pyarrow.parquet as pq

                # hive files do not store the partition column; append
                # the restored int64 shard to the empty table directly
                empty = pq.read_schema(any_files[0]).empty_table()
                if "shard" in empty.column_names:
                    empty = empty.remove_column(
                        empty.column_names.index("shard")
                    )
                empty = empty.append_column(
                    "shard", pa.array([], pa.int64())
                )
                return rd.from_arrow(empty)
            raise FileNotFoundError(f"no shard files under {out_dir}")
        raise FileNotFoundError(f"no shard files under {out_dir}")
    ds = rd.read_parquet(files)

    def restore_shard(batch: pa.Table) -> pa.Table:
        # the hive partition value may come back as a string column (and
        # pyarrow can surface it alongside a stored copy): drop every
        # existing shard field, then append the int64 derivation
        while "shard" in batch.column_names:
            batch = batch.remove_column(batch.column_names.index("shard"))
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array(keys % np.int64(n_shards), pa.int64())
        )

    out = ds.map_batches(restore_shard, batch_format="pyarrow")
    if ordered:
        out = out.sort(["shard", "key"])
    return out
