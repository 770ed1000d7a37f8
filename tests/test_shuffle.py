"""Deterministic training-shard shuffle (pyfuseray/extras/shuffle.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

import pytest

from pyfuseray.extras.shuffle import (
    read_training_shards,
    shuffle_assign,
    write_training_shards,
)


def _docs(n=200):
    return pa.table(
        {"doc_id": np.arange(n, dtype=np.int64), "val": np.arange(n) * 2}
    )


def test_assignment_deterministic_across_batch_structure():
    tbl = _docs()
    a = shuffle_assign(rd.from_arrow(tbl), 8, seed=3).to_pandas()
    b = (
        shuffle_assign(rd.from_arrow(tbl).repartition(7), 8, seed=3)
        .to_pandas()
    )
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["key"].values == b["key"].values).all()
    assert (a["shard"].values == b["shard"].values).all()
    assert (a["shard"].values == a["key"].values % 8).all()
    # a different seed is a different permutation
    c = shuffle_assign(rd.from_arrow(tbl), 8, seed=4).to_pandas()
    c = c.sort_values("doc_id").reset_index(drop=True)
    assert (a["key"].values != c["key"].values).any()


def test_shards_roughly_balanced():
    out = shuffle_assign(rd.from_arrow(_docs(400)), 8, seed=0).to_pandas()
    counts = out["shard"].value_counts()
    assert len(counts) == 8
    assert counts.max() < 3 * counts.min()


def test_write_training_shards_round_trip(tmp_path):
    tbl = _docs(120)
    out = str(tmp_path / "shards")
    write_training_shards(rd.from_arrow(tbl), out, 4, seed=1)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == 4
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 120
    assert sorted(back["doc_id"].tolist()) == list(range(120))
    # within each shard file, rows are in ascending epoch-key order
    for d in shard_dirs:
        for f in os.listdir(os.path.join(out, d)):
            keys = pq.read_table(os.path.join(out, d, f))["key"].to_numpy()
            assert (np.diff(keys) > 0).all()


def test_read_training_shards_prunes_and_restores_shard(tmp_path):
    tbl = _docs(160)
    out = str(tmp_path / "shards")
    assigned = write_training_shards(rd.from_arrow(tbl), out, 4, seed=5)
    want = assigned.to_pandas()

    # full read restores int64 shard == key % n_shards
    full = read_training_shards(out).to_pandas()
    assert len(full) == 160
    assert full["shard"].dtype == np.int64
    merged = full.merge(want, on="doc_id", suffixes=("", "_w"))
    assert (merged["shard"] == merged["shard_w"]).all()

    # a rank reading only shards [1, 3] sees exactly those rows
    part = read_training_shards(out, shards=[1, 3]).to_pandas()
    assert set(part["shard"].unique()) <= {1, 3}
    assert sorted(part["doc_id"]) == sorted(
        want[want["shard"].isin([1, 3])]["doc_id"]
    )

    with pytest.raises(ValueError, match="outside"):
        read_training_shards(out, shards=[4])


def test_rewrite_clears_stale_shards(tmp_path):
    """A rerun with fewer shards / another seed must not leave stale
    shard=K dirs that a full read would silently mix in."""
    tbl = _docs(120)
    out = str(tmp_path / "shards")
    write_training_shards(rd.from_arrow(tbl), out, 8, seed=1)
    assert sum(d.startswith("shard=") for d in os.listdir(out)) == 8
    assigned = write_training_shards(rd.from_arrow(tbl), out, 3, seed=2)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2"]
    back = read_training_shards(out).to_pandas()
    assert len(back) == 120
    want = assigned.to_pandas()
    merged = back.merge(want, on="doc_id", suffixes=("", "_w"))
    assert (merged["shard"] == merged["shard_w"]).all()


def test_read_empty_valid_shard_returns_empty(tmp_path):
    """A loader rank whose in-range shards all drew zero rows gets an
    EMPTY dataset with the expected schema, not FileNotFoundError."""
    import shutil

    tbl = _docs(60)
    out = str(tmp_path / "shards")
    write_training_shards(rd.from_arrow(tbl), out, 4, seed=1)
    # simulate a shard that drew zero rows
    shutil.rmtree(os.path.join(out, "shard=2"))
    empty = read_training_shards(out, shards=[2])
    assert empty.count() == 0
    assert {"doc_id", "val", "key", "shard"} <= set(empty.schema().names)


def test_read_ordered_restores_epoch_order_across_files(tmp_path):
    """ordered=True guarantees ascending key within each shard even
    when a shard spans multiple write-task files (cross-file order is
    otherwise undefined)."""
    tbl = _docs(600)
    out = str(tmp_path / "shards")
    # many input blocks -> multiple write tasks -> multi-file shards
    write_training_shards(rd.from_arrow(tbl).repartition(12), out, 2, seed=3)
    multi = [
        d
        for d in os.listdir(out)
        if d.startswith("shard=")
        and len(os.listdir(os.path.join(out, d))) > 1
    ]
    assert multi, "expected at least one multi-file shard"
    got = read_training_shards(out, ordered=True).to_pandas()
    for s in got["shard"].unique():
        keys = got[got["shard"] == s]["key"].to_numpy()
        assert (np.diff(keys) > 0).all()
