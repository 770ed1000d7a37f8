"""General equi-joins for Dataset pairs.

Ray Data 2.49 has no native join, and the engine's broadcast joins
(``sqlfront``, ``orders_by_segment``) only cover the small-side case.
This module adds the BIG x BIG shape: a repartition hash join — both
sides shuffle ONCE on a coarse hash of the key (bounded group count,
same policy as the dedup family), and each group runs one vectorized
pandas merge. That is the textbook distributed join plan; skewed hot
keys would be salted exactly like the segment merge's hot terms
(``segments.build_bucket_segment``), which these synthetic keys don't
need.

``join_pair_payloads`` in ``extras.dedup`` is the specialized
two-payload variant of the same idea; ``hash_join`` is the general
relational form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

COARSE_JOIN_GROUPS = 512


def _vec_key_hash(col: pa.ChunkedArray, n_groups: int) -> np.ndarray:
    """Deterministic vectorized bucket hash for int or string keys."""
    typ = col.type
    if pa.types.is_integer(typ):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        # Fibonacci-style mix so sequential keys spread across buckets
        return ((v * np.uint64(11400714819323198485)) >> np.uint64(32)) % np.uint64(
            n_groups
        )
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        from pyfuseray.docids import _utf8_fixed_width

        b = _utf8_fixed_width(col)
        w = b.dtype.itemsize
        m = np.frombuffer(b.tobytes(), dtype=np.uint8).reshape(-1, w).astype(np.uint64)
        weights = np.power(
            np.uint64(1099511628211), np.arange(w, dtype=np.uint64), dtype=np.uint64
        )
        return (m @ weights) % np.uint64(n_groups)
    raise TypeError(f"unsupported join key type: {typ}")


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    coarse_groups: int = COARSE_JOIN_GROUPS,
) -> rd.Dataset:
    """Repartition hash join of two Datasets on an equi-key.

    Both sides are tagged, bucketed by the same coarse key hash, and
    shuffled ONCE; each group merges its two sides with a vectorized
    pandas merge. Column collisions follow pandas' _x/_y suffixing;
    ``how`` supports 'inner' and 'left'.
    """
    right_on = right_on or left_on
    assert how in ("inner", "left")
    # normalize both sides to arrow blocks so schemas carry arrow types
    # (pandas-block datasets report numpy/python types)
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_cols = [f.name for f in _schema_fields(left)]
    r_cols = [f.name for f in _schema_fields(right)]

    def tag(side: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            cb = _vec_key_hash(batch.column(key_col), coarse_groups)
            out = batch.append_column("_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
            return out.append_column("_cb", pa.array(cb.astype(np.int64), pa.int64()))

        return fn

    # align the union schema: each side carries the other's columns as nulls
    def widen(own: list[str], other: list[str], other_schema):
        types = {f.name: f.type for f in other_schema}

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            for c in other:
                if c not in batch.column_names:
                    batch = batch.append_column(c, pa.nulls(n, types[c]))
            return batch.select(sorted(batch.column_names))

        return fn

    lt = left.map_batches(tag(0, left_on), batch_format="pyarrow").map_batches(
        widen(l_cols, r_cols, _schema_fields(right)), batch_format="pyarrow"
    )
    rt = right.map_batches(tag(1, right_on), batch_format="pyarrow").map_batches(
        widen(r_cols, l_cols, _schema_fields(left)), batch_format="pyarrow"
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["_side"] == 0][l_cols]
        rg = group[group["_side"] == 1][r_cols]
        return lg.merge(rg, left_on=left_on, right_on=right_on, how=how)

    # output schema: left fields then right fields (minus the duplicate
    # key column when the names coincide); non-key columns present on
    # BOTH sides follow pandas' _x/_y suffixing. The union's null padding
    # makes pandas widen int columns to float inside the groups, so the
    # final pass casts every column back to its source arrow type.
    overlap = set(l_cols) & set(r_cols)
    if left_on == right_on:
        overlap.discard(left_on)
    out_fields = [
        pa.field(f.name + "_x", f.type) if f.name in overlap else f
        for f in _schema_fields(left)
    ] + [
        pa.field(f.name + "_y", f.type) if f.name in overlap else f
        for f in _schema_fields(right)
        if f.name != left_on or right_on != left_on
    ]

    def normalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for f in out_fields:
            if f.name in t.column_names:
                col = t.column(f.name)
                if col.type != f.type:
                    if pa.types.is_floating(col.type) and not pa.types.is_floating(f.type):
                        # left-join unmatched rows surface as NaN; make
                        # them proper nulls before the int cast
                        col = pc.if_else(
                            pc.is_nan(col), pa.scalar(None, col.type), col
                        )
                    col = col.cast(f.type)
                cols[f.name] = col
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    joined = (
        lt.union(rt)
        .groupby("_cb")
        .map_groups(merge, batch_format="pandas")
    )
    return joined.map_batches(normalize, batch_format="pyarrow")


def _schema_fields(ds: rd.Dataset):
    sch = ds.schema()
    return [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
